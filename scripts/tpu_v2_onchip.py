"""Lower the v2 hash-range-sharded index+query program on the REAL TPU.

Every sharded_* execution before round 5 ran on the virtual CPU mesh
(VERDICT r4 weak #1) — a shard_map + all_to_all program that lowers on
CPU XLA can still fail or mis-perform under the TPU compiler (see the
Mosaic notes in docs/ROADMAP.md for how different that backend is).
This script compiles and runs `sharded_index_v2_step` +
`sharded_query_v2_e2e_step` on a 1-device mesh through the axon tunnel
(degenerate collectives still exercise TPU lowering of the whole
shard_map/all_to_all program), asserts CONTENT parity — anchors AND
chain tuples — against the host pipeline on-chip, times both steps with
chained data-dependent iterations, and writes docs/TPU_V2_ONCHIP.json.

Compile discipline (measured this round): the axon relay does NOT cache
compiles across sessions and each big program costs minutes (the v2
build alone ~110 s; the e2e program several times that).  Each step is
therefore compiled EXACTLY ONCE, as a fori_loop chain taking the
iteration count as a device scalar: n=1 serves certification and the
parity outputs (the content perturbation applies after outputs), n=N
serves the timed run — bench.py's one-compile trick.

Corpus: the same mini-pangenome as __graft_entry__.dryrun_multichip
(B=8 x ~1.06 Mb, SNP-mutated copies of one base with a tandem-TRIPLED
8 kb block and ragged per-sequence lengths), so postings carry real
per-(key, sid) multiplicity and the count filters are live.

Reference frame: this is our analog of the reference's
read_mdb_file_parallel + query actually running where it claims to
(pgr-db/src/seq_db.rs:1506-1523).

Run (claims the TPU session; NEVER concurrently with another python):
  cd /root/repo && python scripts/tpu_v2_onchip.py [n_timing_iters]
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

from scripts._tpu_common import (
    init_device, make_scalar_timed_chain, time_best_of, watchdog,
)


def build_corpus(n_devices: int = 1):
    """dryrun_multichip's corpus, verbatim semantics (ragged lengths,
    tandem-tripled block)."""
    B = n_devices * max(1, -(-8 // n_devices))
    L = 1_048_576
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, size=L, dtype=np.uint8)
    blk_b, blk_e, copies = 500_000, 508_000, 3
    LT = L + (blk_e - blk_b) * (copies - 1)
    pad = (-LT) % 512
    seqs = np.zeros((B, LT + pad), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for b in range(B):
        s = base.copy()
        nmut = rng.binomial(L, 3e-4)
        pos = rng.choice(L, size=nmut, replace=False)
        s[pos] = (s[pos] + rng.integers(1, 4, size=nmut)) % 4
        s = np.concatenate(
            [s[:blk_e]] + [s[blk_b:blk_e]] * (copies - 1) + [s[blk_e:]]
        )
        cut = 512 * (b % 4)  # ragged true lengths across devices
        lens[b] = LT - cut
        seqs[b, : lens[b]] = s[: lens[b]]
    rids = np.arange(B, dtype=np.uint32)
    return seqs, lens, rids


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    record = {"device": None, "n_devices_mesh": 1}

    jax, dev = init_device("tpu_v2_onchip")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pgrtk_tpu.parallel import mesh as pmesh

    record["device"] = str(dev.platform) + ":" + str(dev.device_kind)
    # generous: several big uncached remote compiles (the relay
    # compiles every session from scratch)
    run_wd = watchdog(5400, "finish", "tpu_v2_onchip")

    seqs, lens, rids = build_corpus(1)
    B = seqs.shape[0]
    mesh = pmesh.make_mesh(1)
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis, None))
    shard1 = NamedSharding(mesh, P(axis))
    seqs_d = jax.device_put(jnp.asarray(seqs), shard)
    lens_d = jax.device_put(jnp.asarray(lens), shard1)
    rids_d = jax.device_put(jnp.asarray(rids), shard1)

    # ---- v2 build: ONE compiled chain program -------------------------
    # (returns the probe planes too, so no standalone v2_step compile)
    cap = 65_536
    v2_step = pmesh.sharded_index_v2_step(mesh, cap, chunk=512)
    v2_shapes = jax.eval_shape(v2_step, seqs_d, lens_d, rids_d)
    plane_shapes = v2_shapes["probe"]["planes"]

    @jax.jit
    def build_chain(s, ln, rd, n):
        def body(_, carry):
            ss = carry[0]
            out = v2_step(ss, ln, rd)
            flags = (
                out["shard_overflow"].astype(jnp.uint32)
                + out["route_overflow"].astype(jnp.uint32)
                + out["probe_overflow"].astype(jnp.uint32)
                + out["compact_overflow"].astype(jnp.uint32)
            )
            npair = out["n_pairs"].astype(jnp.uint32)
            nxt = jnp.roll(
                ss, (npair & jnp.uint32(3)).astype(jnp.int32), axis=0
            )
            return (nxt, npair, flags, *out["probe"]["planes"])

        z = jnp.uint32(0)
        init = (s, z, z) + tuple(
            jnp.zeros(ps.shape, ps.dtype) for ps in plane_shapes
        )
        return jax.lax.fori_loop(jnp.int32(0), n, body, init)[1:]

    t0 = time.time()
    out1 = build_chain(seqs_d, lens_d, rids_d, jnp.int32(1))
    n_pairs, bflags = int(out1[0]), int(out1[1])
    planes_d = tuple(out1[2:])
    jax.block_until_ready(planes_d)
    record["build_compile_plus_first_run_s"] = round(time.time() - t0, 2)
    assert bflags == 0, "v2 build flags dirty on-chip"
    record["n_pairs"] = n_pairs
    print(f"v2 build on-chip: n_pairs={n_pairs} "
          f"({record['build_compile_plus_first_run_s']}s incl. compile)",
          flush=True)

    # scalar-only timing chain (the plane-returning chain above copies
    # its carry every iteration — the round-5 timing-artifact lesson)
    build_timed = make_scalar_timed_chain(jax, jnp, v2_step, 0)

    int(build_timed(seqs_d, lens_d, rids_d, jnp.int32(1)))  # warm
    best = time_best_of(
        lambda: int(build_timed(seqs_d, lens_d, rids_d, jnp.int32(n_iters))),
        n_iters,
    )
    record["build_ms_per_step"] = round(best * 1e3, 2)
    print(f"v2 build: {record['build_ms_per_step']} ms/step", flush=True)

    # ---- v2 end-to-end query: ONE compiled chain program --------------
    e2e_step = pmesh.sharded_query_v2_e2e_step(
        mesh, cap, n_targets=B, slots2=384, M=4, postings_cap=32
    )
    e2e_shapes = jax.eval_shape(
        e2e_step, seqs_d, lens_d, rids_d, *planes_d
    )

    @jax.jit
    def e2e_chain(s, ln, rd, p0, p1, p2, p3, p4, p5, p6, n):
        def body(_, carry):
            ss = carry[0]
            out = e2e_step(ss, ln, rd, p0, p1, p2, p3, p4, p5, p6)
            flags = (
                out["compact_overflow"].astype(jnp.uint32)
                + out["route_overflow"].astype(jnp.uint32)
                + out["postings_overflow"].astype(jnp.uint32)
                + out["row_ovf"].any().astype(jnp.uint32)
                + out["mult_ovf"].any().astype(jnp.uint32)
            )
            nh = out["n_hits"].astype(jnp.uint32)
            nxt = jnp.roll(ss, (nh & jnp.uint32(3)).astype(jnp.int32), axis=0)
            return (
                nxt, nh, flags,
                out["anchors"], out["gvalid"], out["scores"], out["prev"],
                out["dup"], out["inexact"],
            )

        z = jnp.uint32(0)
        init = (s, z, z) + tuple(
            jnp.zeros(e2e_shapes[kk].shape, e2e_shapes[kk].dtype)
            for kk in ("anchors", "gvalid", "scores", "prev", "dup",
                       "inexact")
        )
        return jax.lax.fori_loop(jnp.int32(0), n, body, init)[1:]

    t0 = time.time()
    out1 = e2e_chain(seqs_d, lens_d, rids_d, *planes_d, jnp.int32(1))
    n_hits, qflags = int(out1[0]), int(out1[1])
    record["e2e_compile_plus_first_run_s"] = round(time.time() - t0, 2)
    assert qflags == 0, "v2 e2e flags dirty on-chip"
    record["n_hits"] = n_hits
    print(f"v2 e2e query on-chip: n_hits={n_hits} "
          f"({record['e2e_compile_plus_first_run_s']}s incl. compile)",
          flush=True)

    # parity planes from the n=1 run (outputs precede the perturbation)
    t0 = time.time()
    anchors = np.asarray(out1[2])
    gvalid = np.asarray(out1[3])
    scores = np.asarray(out1[4])
    prev = np.asarray(out1[5])
    dup = np.asarray(out1[6])
    inexact = np.asarray(out1[7])
    record["plane_pull_s"] = round(time.time() - t0, 2)
    print(f"parity planes pulled ({record['plane_pull_s']}s)", flush=True)

    # timing chain with a SCALAR-ONLY carry: the parity chain above
    # carries the (G, N, 6) output planes through the fori_loop
    # (~160 MB copied per iteration), which inflated the round-5 first
    # measurement ~4x (55 vs 14 ms/step).  One extra ~60 s compile buys
    # the honest number.
    e2e_timed = make_scalar_timed_chain(jax, jnp, e2e_step, 7)

    int(e2e_timed(seqs_d, lens_d, rids_d, *planes_d, jnp.int32(1)))  # warm
    best = time_best_of(
        lambda: int(
            e2e_timed(seqs_d, lens_d, rids_d, *planes_d, jnp.int32(n_iters))
        ),
        n_iters,
        windows=3,
    )
    record["e2e_ms_per_step"] = round(best * 1e3, 2)
    total_bases = int(lens.sum())
    record["bases_per_step"] = total_bases
    record["e2e_mbases_s"] = round(total_bases / best / 1e6, 1)
    print(f"v2 e2e: {record['e2e_ms_per_step']} ms/step "
          f"({record['e2e_mbases_s']} Mb/s)", flush=True)

    # ---- CONTENT parity vs the host pipeline, on-chip planes ----------
    clean = ~dup & ~inexact

    from pgrtk_tpu.core import query as query_mod
    from pgrtk_tpu.core.spec import ShmmrSpec
    from pgrtk_tpu.ops import chain as chain_ops
    from pgrtk_tpu.ops import query_e2e

    idx = query_e2e.build_index(seqs, target_lens=lens, n_decoys=0)
    assert idx["n_multi"] > 0  # tandem block -> real multiplicity
    lookup = idx["lookup"]
    spec = ShmmrSpec(80, 56, 4, 64, True)
    bases_tab = b"ACGT"
    dev_chains = chain_ops.traceback(scores, prev, gvalid, anchors)
    n_anchor_groups = n_chain_groups = 0
    for b in range(B):
        qbytes = bytes(bytearray(bases_tab[v] for v in seqs[b, : lens[b]]))
        raw = query_mod.raw_query_fragment(
            lambda s0, s1: lookup.get((s0, s1), []), qbytes, spec
        )
        th = query_mod.collect_target_hits(raw)
        host_chains = dict(query_mod.query_fragment_to_hps(raw, 0.025))
        for c in range(B):
            g = b * B + c
            dev_rows = [tuple(int(v) for v in row)
                        for row in anchors[g][gvalid[g]]]
            host = [(*lft, *t) for lft, t in th.get(c, [])]
            assert dev_rows == host, f"anchor mismatch b={b} sid={c}"
            n_anchor_groups += 1
            if clean[g] and len(host) > 1:
                hch = host_chains[c]
                dch = dev_chains[g]
                assert len(hch) == len(dch), (b, c)
                for (hs, htr), (ds, dtr) in zip(hch, dch):
                    assert np.float32(hs) == np.float32(ds), (b, c)
                    assert htr == dtr, (b, c)
                n_chain_groups += 1
    assert n_chain_groups >= (B * B) * 9 // 10
    record["anchor_groups_exact"] = n_anchor_groups
    record["chain_groups_exact"] = n_chain_groups
    record["parity"] = "ok"
    run_wd.clear()

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "TPU_V2_ONCHIP.json",
    )
    record["n_timing_iters"] = n_iters
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
