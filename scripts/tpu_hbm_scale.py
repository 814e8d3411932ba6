"""HBM-scale v2 index served end-to-end on the real TPU (VERDICT r4 item 2).

Round 4's HPRC capacity claim ("9 v5e chips for year 1") extrapolated
from an 8-virtual-CPU dryrun; the real chip had only ever held the 4M-key
bench index.  This script builds the largest v2-geometry index that fits
one chip's HBM — default 112M postings / ~32M+ distinct keys in the
bucketed probe+postings planes (`_shard_probe_planes` layout, the
serving structure of `sharded_query_v2_e2e_step`) — uploads it, runs the
FULL distributed e2e query step against it on a 1-device mesh (real TPU
lowering, degenerate collectives), certifies flags + host anchor-count
parity untimed, then reports ms/step, Mb/s, ns/key, bytes/posting, and
the device memory high-water vs docs/ROADMAP.md's 118.9 B/posting model.

The planes are synthesized HOST-SIDE in the exact device layout (same
bucket function, same stable orders): decoy keys never hit; the REAL
postings are the repeat-seeded bench corpus's own pairs (tandem-3
multiplicity passes the filters; the 16-copy CNV tandem makes the
per-(pair, sid) count filter fire live in the timed loop).

Run (claims the TPU session; NEVER concurrently with another python):
  cd /root/repo && python scripts/tpu_hbm_scale.py [n_postings] [iters]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_tpu"
)

import numpy as np

from scripts._tpu_common import init_device, watchdog

PROBE_W = 128


def build_corpus():
    """bench.py's repeat-seeded corpus (tandem16 CNV in target 0 only,
    shared tandem3 + segdup) and SNP-mutated full-length queries."""
    from pgrtk_tpu.utils import synth

    B, L = 8, 1_048_576
    QB = 65_536
    S16, U16, N16 = 3 * QB + 8_192, 3_072, 16
    E16 = S16 + U16 * N16
    S3, U3, N3 = 7 * QB + 16_384, 8_192, 3
    SD1, SD2, SDL = 9 * QB + 4_096, 13 * QB + 4_096, 24_576

    prng = np.random.default_rng(2)
    base = prng.integers(0, 4, size=L, dtype=np.uint8)
    base[S16:E16] = np.tile(synth.pick_tandem_unit(prng, U16, N16), N16)
    base[S3:S3 + U3 * N3] = np.tile(
        synth.pick_tandem_unit(prng, U3, N3), N3
    )
    sd = prng.integers(0, 4, SDL, dtype=np.uint8)
    base[SD1:SD1 + SDL] = sd
    base[SD2:SD2 + SDL] = sd

    def mutate(rng, drop16=False):
        out = base.copy()
        if drop16:
            out[S16:E16] = rng.integers(0, 4, E16 - S16, dtype=np.uint8)
        n = rng.binomial(L, 1e-4)
        pos = rng.choice(L, size=n, replace=False)
        pos = pos[(pos < S16) | (pos >= E16)]
        out[pos] = (out[pos] + rng.integers(1, 4, size=len(pos))) % 4
        return out

    C = 8
    targets = np.stack([mutate(prng, drop16=(sid != 0)) for sid in range(C)])
    queries = np.stack([mutate(prng) for _ in range(B)])
    return targets, queries


def real_postings(targets):
    """Host reference pipeline: the corpus's pair postings in builder
    convention and reference (sid, position) order, plus the lookup dict
    for the host-parity count."""
    from pgrtk_tpu.core.seqdb import CompactSeqDB
    from pgrtk_tpu.core.spec import ShmmrSpec

    # NOT load_from_seq_list: that PyO3 surface pins the reference's
    # sketch=False/min_span=8 asymmetry; the device pipeline is mode-2
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    sdb = CompactSeqDB(ShmmrSpec(w=80, k=56, r=4, min_span=64, sketch=True))
    sdb.load_seqs(
        [("m", f"t{i}", BASES[t].tobytes()) for i, t in enumerate(targets)]
    )
    fm = sdb.frag_map
    n = sum(len(v) for v in fm.values())
    cols = {kk: np.empty(n, dtype=np.uint64) for kk in ("k0", "k1")}
    for kk in ("sid", "bgn", "end", "ori", "frg"):
        cols[kk] = np.empty(n, dtype=np.uint32)
    w = 0
    lookup = {}
    for (h0, h1), lst in fm.items():
        lookup[(h0, h1)] = [(0, s, b, e, o) for _f, s, b, e, o in lst]
        for frg_id, s, b, e, o in lst:
            cols["k0"][w] = h0
            cols["k1"][w] = h1
            cols["sid"][w] = s
            cols["bgn"][w] = b
            cols["end"][w] = e
            cols["ori"][w] = o
            cols["frg"][w] = frg_id
            w += 1
    return cols, lookup


def build_planes_host(cols, n_decoys, bits, seed=7):
    """Synthesize the 7 (2^bits, 128) u32 probe+postings planes in the
    exact _shard_probe_planes layout (parallel/mesh.py:312-369): entries
    key-sorted (stable -> reference postings order within a key), bucket
    = k0_lo >> (32-bits), column = stable rank within bucket."""
    rng = np.random.default_rng(seed)
    n_real = len(cols["k0"])
    n = n_real + n_decoys
    # decoy keys: canonical-ordered random 128-bit pairs, k0_hi kept
    # below the all-ones invalid marker
    d0 = rng.integers(0, 1 << 63, size=n_decoys, dtype=np.uint64)
    d1 = rng.integers(0, 1 << 63, size=n_decoys, dtype=np.uint64)
    dk0 = np.minimum(d0, d1)
    dk1 = np.maximum(d0, d1)

    k0 = np.concatenate([cols["k0"], dk0])
    k1 = np.concatenate([cols["k1"], dk1])
    sid = np.concatenate(
        [cols["sid"], np.zeros(n_decoys, dtype=np.uint32)]
    )
    bgn = np.concatenate(
        [cols["bgn"], np.ones(n_decoys, dtype=np.uint32)]
    )
    end = np.concatenate(
        [cols["end"], np.full(n_decoys, 2, dtype=np.uint32)]
    )
    ori = np.concatenate(
        [cols["ori"], np.zeros(n_decoys, dtype=np.uint32)]
    )
    # reference postings order within a key = (sid, frg) build order;
    # cols are already emitted that way, decoys are single-posting.
    # Key-sort (stable) like the v2 shard table:
    k0h = (k0 >> np.uint64(32)).astype(np.uint32)
    k0l = (k0 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    k1h = (k1 >> np.uint64(32)).astype(np.uint32)
    k1l = (k1 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    order = np.lexsort((k1l, k1h, k0l, k0h))
    nb = 1 << bits
    bucket = (k0l[order] >> np.uint32(32 - bits)).astype(np.int64)
    # stable bucket sort -> within-bucket column rank
    border = np.argsort(bucket, kind="stable")
    bsort = bucket[border]
    counts = np.bincount(bsort, minlength=nb)
    if counts.max() > PROBE_W:
        raise ValueError(
            f"bucket overflow: {counts.max()} > {PROBE_W} (resize bits)"
        )
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    col = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    target = bsort * PROBE_W + col

    planes = []
    bgnori = (ori << np.uint32(31)) | bgn
    for plane, fill in (
        (k0h, 0xFFFFFFFF), (k0l, 0xFFFFFFFF),
        (k1h, 0xFFFFFFFF), (k1l, 0xFFFFFFFF),
        (sid, 0), (bgnori, 0), (end, 0),
    ):
        flat = np.full(nb * PROBE_W, fill, dtype=np.uint32)
        flat[target] = plane[order][border]
        planes.append(flat.reshape(nb, PROBE_W))
    sk0, sk1 = k0[order], k1[order]
    n_keys = 1 + int(((sk0[1:] != sk0[:-1]) | (sk1[1:] != sk1[:-1])).sum())
    return planes, n, n_keys


def main():
    n_postings = int(sys.argv[1]) if len(sys.argv) > 1 else 112_000_000
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    record = {"n_postings_target": n_postings}

    jax, dev = init_device("tpu_hbm_scale")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pgrtk_tpu.parallel import mesh as pmesh

    record["device"] = f"{dev.platform}:{dev.device_kind}"

    t0 = time.time()
    targets, queries = build_corpus()
    cols, lookup = real_postings(targets)
    record["n_real_postings"] = len(cols["k0"])
    n_decoys = n_postings - len(cols["k0"])
    bits = pmesh.probe_bits_for(n_postings)
    planes_np, n_total, n_keys = build_planes_host(cols, n_decoys, bits)
    nb = planes_np[0].shape[0]
    plane_bytes = sum(p.nbytes for p in planes_np)
    record.update(
        n_postings=n_total, n_keys=n_keys, probe_bits=bits,
        plane_bytes=plane_bytes,
        bytes_per_posting=round(plane_bytes / n_total, 1),
        host_build_s=round(time.time() - t0, 1),
    )
    print(
        f"host build: {n_total:,} postings, ~{n_keys:,} keys, "
        f"{plane_bytes / 1e9:.2f} GB planes "
        f"({record['bytes_per_posting']} B/posting), "
        f"{record['host_build_s']}s", flush=True,
    )

    run_wd = watchdog(4800, "finish", "tpu_hbm_scale")
    mesh = pmesh.make_mesh(1)
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis, None))
    shard1 = NamedSharding(mesh, P(axis))

    t0 = time.time()
    planes_d = tuple(
        jax.device_put(jnp.asarray(p), shard1) for p in planes_np
    )
    jax.block_until_ready(planes_d)
    record["upload_s"] = round(time.time() - t0, 1)
    print(f"upload: {record['upload_s']}s", flush=True)
    del planes_np

    B, L = queries.shape
    lens = np.full(B, L, dtype=np.int32)
    seqs_d = jax.device_put(jnp.asarray(queries), shard)
    lens_d = jax.device_put(jnp.asarray(lens), shard1)
    rids_d = jax.device_put(jnp.asarray(np.arange(B, dtype=np.uint32)), shard1)

    C = targets.shape[0]
    e2e_step = pmesh.sharded_query_v2_e2e_step(
        mesh, n_postings, n_targets=C, slots2=384, M=4, postings_cap=32
    )
    t0 = time.time()
    e2e = e2e_step(seqs_d, lens_d, rids_d, *planes_d)
    n_hits = int(e2e["n_hits"])
    record["e2e_compile_plus_first_run_s"] = round(time.time() - t0, 1)
    for flag in ("compact_overflow", "route_overflow", "postings_overflow"):
        assert not bool(e2e[flag]), flag
    gvalid = np.asarray(e2e["gvalid"])
    assert not np.asarray(e2e["row_ovf"]).any()
    assert not np.asarray(e2e["mult_ovf"]).any()
    record["n_hits"] = n_hits
    print(
        f"e2e on-chip vs {n_total:,}-posting index: n_hits={n_hits} "
        f"({record['e2e_compile_plus_first_run_s']}s incl. compile)",
        flush=True,
    )

    # ---- untimed certification: host anchor-count parity --------------
    from pgrtk_tpu.core import query as query_mod
    from pgrtk_tpu.core.spec import ShmmrSpec

    spec = ShmmrSpec(80, 56, 4, 64, True)
    BASES = b"ACGT"
    host_total = 0
    host_per_group = {}
    for b in range(B):
        qbytes = bytes(bytearray(BASES[v] for v in queries[b]))
        raw = query_mod.raw_query_fragment(
            lambda s0, s1: lookup.get((s0, s1), []), qbytes, spec
        )
        th = query_mod.collect_target_hits(raw)
        for c in range(C):
            host_per_group[(b, c)] = len(th.get(c, []))
            host_total += len(th.get(c, []))
    dev_per_group = gvalid.sum(axis=1)
    for b in range(B):
        for c in range(C):
            assert dev_per_group[b * C + c] == host_per_group[(b, c)], (
                b, c, int(dev_per_group[b * C + c]), host_per_group[(b, c)]
            )
    assert n_hits == host_total
    record["host_parity"] = f"per-group anchor counts exact ({host_total})"
    print(f"host parity: {host_total} anchors, per-group exact", flush=True)

    try:
        stats = dev.memory_stats() or {}
        record["hbm_peak_bytes"] = int(
            stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
        )
    except Exception:
        record["hbm_peak_bytes"] = None

    # ---- timed: chained data-dependent steps --------------------------
    @jax.jit
    def chain(s, ln, rd, p0, p1, p2, p3, p4, p5, p6, n):
        def body(_, carry):
            ss, acc = carry
            out = e2e_step(ss, ln, rd, p0, p1, p2, p3, p4, p5, p6)
            a = out["n_hits"].astype(jnp.uint32)
            nxt = jnp.roll(ss, (a & jnp.uint32(3)).astype(jnp.int32), axis=0)
            return (nxt, acc + a)

        return jax.lax.fori_loop(jnp.int32(0), n, body, (s, jnp.uint32(0)))

    int(chain(seqs_d, lens_d, rids_d, *planes_d, jnp.int32(1))[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        int(chain(seqs_d, lens_d, rids_d, *planes_d, jnp.int32(n_iters))[1])
        best = min(best, (time.time() - t0) / n_iters)
    total_bases = B * L
    # n_loc routed key slots per step (padding included, as executed)
    Pc = (-(-((L // 512) * 12) // 512)) * 384
    record.update(
        e2e_ms_per_step=round(best * 1e3, 2),
        mbases_s=round(total_bases / best / 1e6, 1),
        ns_per_key=round(best / (B * Pc) * 1e9, 1),
        n_key_slots_per_step=B * Pc,
        n_timing_iters=n_iters,
    )
    run_wd.clear()
    print(
        f"timed: {record['e2e_ms_per_step']} ms/step, "
        f"{record['mbases_s']} Mb/s, {record['ns_per_key']} ns/key-slot, "
        f"HBM peak {record['hbm_peak_bytes']}", flush=True,
    )

    # ---- production SERVING shape: 64 kb chunk-row queries ------------
    # (the bench geometry: chunk rows fill the chain's 128-lane axis —
    # G = 128*8 = 1024 lanes instead of the lane-starved G=64; each
    # chunk is an independent query on both sides, so host parity is
    # exact at the same semantics)
    run_wd2 = watchdog(2400, "finish the chunked config", "tpu_hbm_scale")
    QC = 16
    qch = queries.reshape(B * QC, L // QC)
    BQ, LQ = qch.shape
    qch_d = jax.device_put(jnp.asarray(qch), shard)
    qlens_d = jax.device_put(
        jnp.asarray(np.full(BQ, LQ, dtype=np.int32)), shard1
    )
    qrids_d = jax.device_put(
        jnp.asarray(np.arange(BQ, dtype=np.uint32)), shard1
    )
    e2e_ch = pmesh.sharded_query_v2_e2e_step(
        mesh, n_postings, n_targets=C, slots2=192, M=3, postings_cap=32
    )

    @jax.jit
    def chain_ch(s, ln, rd, p0, p1, p2, p3, p4, p5, p6, n):
        def body(_, carry):
            ss, _nh, _fl = carry
            out = e2e_ch(ss, ln, rd, p0, p1, p2, p3, p4, p5, p6)
            flags = (
                out["compact_overflow"].astype(jnp.uint32)
                + out["route_overflow"].astype(jnp.uint32)
                + out["postings_overflow"].astype(jnp.uint32)
                + out["row_ovf"].any().astype(jnp.uint32)
                + out["mult_ovf"].any().astype(jnp.uint32)
                + out["lane_ovf"].any().astype(jnp.uint32)
            )
            nh = out["n_hits"].astype(jnp.uint32)
            nxt = jnp.roll(ss, (nh & jnp.uint32(3)).astype(jnp.int32), axis=0)
            return (nxt, nh, flags)

        z = jnp.uint32(0)
        return jax.lax.fori_loop(jnp.int32(0), n, body, (s, z, z))[1:]

    t0 = time.time()
    nh_ch, fl_ch = (
        int(v)
        for v in chain_ch(qch_d, qlens_d, qrids_d, *planes_d, jnp.int32(1))
    )
    record["chunked_compile_plus_first_run_s"] = round(time.time() - t0, 1)
    assert fl_ch == 0, "chunked e2e flags dirty"
    # host parity: each 64 kb chunk is its own query
    host_ch = 0
    for b in range(BQ):
        qbytes = bytes(bytearray(BASES[v] for v in qch[b]))
        raw = query_mod.raw_query_fragment(
            lambda s0, s1: lookup.get((s0, s1), []), qbytes, spec
        )
        th = query_mod.collect_target_hits(raw)
        host_ch += sum(len(th.get(c, [])) for c in range(C))
    assert nh_ch == host_ch, (nh_ch, host_ch)
    record["chunked_n_hits"] = nh_ch
    print(f"chunked serving config: n_hits={nh_ch} == host "
          f"({record['chunked_compile_plus_first_run_s']}s incl. compile)",
          flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        int(chain_ch(qch_d, qlens_d, qrids_d, *planes_d,
                     jnp.int32(n_iters))[0])
        best = min(best, (time.time() - t0) / n_iters)
    record.update(
        chunked_ms_per_step=round(best * 1e3, 2),
        chunked_mbases_s=round(total_bases / best / 1e6, 1),
    )
    run_wd2.clear()
    print(
        f"chunked serving: {record['chunked_ms_per_step']} ms/step, "
        f"{record['chunked_mbases_s']} Mb/s", flush=True,
    )

    suffix = f"_{sys.argv[3]}" if len(sys.argv) > 3 else ""
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", f"TPU_HBM_SCALE{suffix}.json",
    )
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
