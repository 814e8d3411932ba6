"""Lower the v1 (replicated-index) sharded programs on the REAL TPU.

Companion to scripts/tpu_v2_onchip.py: runs the round-1/2 replicated
pipeline — `sharded_sketch_index_step` (full device index build with
psum'd stats), `sharded_query_count_step` (binary-search key lookup)
and `sharded_query_probe_step` (bucketed probe planes) — on a 1-device
mesh through the axon tunnel, asserting the self-query identity
(every indexed pair found by both lookup strategies) that
__graft_entry__.dryrun_multichip checks on the virtual CPU mesh.

Each step compiles ONCE (chain with device-scalar n); writes
docs/TPU_V1_ONCHIP.json.

Run (claims the TPU session; NEVER concurrently with another python):
  cd /root/repo && python scripts/tpu_v1_onchip.py [n_timing_iters]
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


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    record = {"n_devices_mesh": 1}

    jax, dev = init_device("tpu_v1_onchip")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pgrtk_tpu.ops import probe as probe_ops
    from pgrtk_tpu.parallel import mesh as pmesh

    record["device"] = f"{dev.platform}:{dev.device_kind}"
    run_wd = watchdog(3600, "finish", "tpu_v1_onchip")

    from scripts.tpu_v2_onchip import build_corpus

    seqs, lens, rids = build_corpus(1)
    B = seqs.shape[0]
    mesh = pmesh.make_mesh(1)
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis, None))
    shard1 = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    seqs_d = jax.device_put(jnp.asarray(seqs), shard)
    lens_d = jax.device_put(jnp.asarray(lens), shard1)
    rids_d = jax.device_put(jnp.asarray(rids), shard1)

    # ---- v1 index build (ONE compiled chain; returns the key table) ---
    index_step = pmesh.sharded_sketch_index_step(mesh, chunk=512)
    shapes = jax.eval_shape(index_step, seqs_d, lens_d, rids_d)
    tab_keys = ("k0_hi", "k0_lo", "k1_hi", "k1_lo", "valid")

    @jax.jit
    def build_chain(s, ln, rd, n):
        def body(_, carry):
            ss = carry[0]
            out = index_step(ss, ln, rd)
            npair = out["n_pairs"].astype(jnp.uint32)
            nxt = jnp.roll(
                ss, (npair & jnp.uint32(3)).astype(jnp.int32), axis=0
            )
            return (nxt, npair) + tuple(out["table"][kk] for kk in tab_keys)

        init = (s, jnp.uint32(0)) + tuple(
            jnp.zeros(shapes["table"][kk].shape, shapes["table"][kk].dtype)
            for kk in tab_keys
        )
        return jax.lax.fori_loop(jnp.int32(0), n, body, init)[1:]

    t0 = time.time()
    out1 = build_chain(seqs_d, lens_d, rids_d, jnp.int32(1))
    n_pairs = int(out1[0])
    table = {kk: np.asarray(v) for kk, v in zip(tab_keys, out1[1:])}
    record["index_compile_plus_first_run_s"] = round(time.time() - t0, 2)
    record["n_pairs"] = n_pairs
    print(f"v1 index on-chip: n_pairs={n_pairs} "
          f"({record['index_compile_plus_first_run_s']}s incl. compile)",
          flush=True)

    # scalar-only timing chain (the table-returning chain above copies
    # five key planes through its carry every iteration)
    index_timed = make_scalar_timed_chain(jax, jnp, index_step, 0)

    int(index_timed(seqs_d, lens_d, rids_d, jnp.int32(1)))  # warm
    best = time_best_of(
        lambda: int(index_timed(seqs_d, lens_d, rids_d, jnp.int32(n_iters))),
        n_iters,
    )
    record["index_ms_per_step"] = round(best * 1e3, 2)
    total_bases = int(lens.sum())
    record["index_mbases_s"] = round(
        total_bases / (record["index_ms_per_step"] / 1e3) / 1e6, 1
    )
    print(f"v1 index: {record['index_ms_per_step']} ms/step "
          f"({record['index_mbases_s']} Mb/s)", flush=True)

    # ---- v1 query (binary search) vs replicated key table -------------
    keys_d = tuple(
        jax.device_put(jnp.asarray(table[kk]), rep)
        for kk in ("k0_hi", "k0_lo", "k1_hi", "k1_lo")
    )
    count_step = pmesh.sharded_query_count_step(mesh, chunk=512)

    @jax.jit
    def count_chain(s, ln, rd, h0, l0, h1, l1, n):
        def body(_, carry):
            ss, _nh, _ovf = carry
            nh, _found, ovf = count_step(ss, ln, rd, h0, l0, h1, l1)
            nh = nh.astype(jnp.uint32)
            nxt = jnp.roll(ss, (nh & jnp.uint32(3)).astype(jnp.int32), axis=0)
            return (nxt, nh, ovf.astype(jnp.uint32))

        z = jnp.uint32(0)
        return jax.lax.fori_loop(
            jnp.int32(0), n, body, (s, z, z)
        )[1:]

    t0 = time.time()
    n_hits, ovf = (
        int(v)
        for v in count_chain(seqs_d, lens_d, rids_d, *keys_d, jnp.int32(1))
    )
    record["count_compile_plus_first_run_s"] = round(time.time() - t0, 2)
    assert ovf == 0
    assert n_hits >= n_pairs  # self-query finds every indexed pair
    record["count_n_hits"] = n_hits
    t0 = time.time()
    int(count_chain(seqs_d, lens_d, rids_d, *keys_d, jnp.int32(n_iters))[0])
    record["count_ms_per_step"] = round((time.time() - t0) / n_iters * 1e3, 2)
    record["count_mbases_s"] = round(
        total_bases / (record["count_ms_per_step"] / 1e3) / 1e6, 1
    )
    print(f"v1 binary-search query: n_hits={n_hits}, "
          f"{record['count_ms_per_step']} ms/step "
          f"({record['count_mbases_s']} Mb/s)", flush=True)

    # ---- v1 query (bucketed probe planes) ------------------------------
    valid = table["valid"].astype(bool)
    keys_np = np.zeros((int(valid.sum()), 2), dtype=np.uint64)
    keys_np[:, 0] = (
        table["k0_hi"][valid].astype(np.uint64) << np.uint64(32)
    ) | table["k0_lo"][valid]
    keys_np[:, 1] = (
        table["k1_hi"][valid].astype(np.uint64) << np.uint64(32)
    ) | table["k1_lo"][valid]
    pt = probe_ops.build_probe_table(keys_np)
    planes_d = tuple(
        jax.device_put(jnp.asarray(pt["planes"][i]), rep) for i in range(4)
    )
    probe_step = pmesh.sharded_query_probe_step(mesh, pt["bits"], chunk=512)

    @jax.jit
    def probe_chain(s, ln, rd, p0, p1, p2, p3, n):
        def body(_, carry):
            ss, _nh, _ovf = carry
            nh, _found, ovf = probe_step(ss, ln, rd, p0, p1, p2, p3)
            nh = nh.astype(jnp.uint32)
            nxt = jnp.roll(ss, (nh & jnp.uint32(3)).astype(jnp.int32), axis=0)
            return (nxt, nh, ovf.astype(jnp.uint32))

        z = jnp.uint32(0)
        return jax.lax.fori_loop(
            jnp.int32(0), n, body, (s, z, z)
        )[1:]

    t0 = time.time()
    n_hits2, ovf2 = (
        int(v)
        for v in probe_chain(seqs_d, lens_d, rids_d, *planes_d, jnp.int32(1))
    )
    record["probe_compile_plus_first_run_s"] = round(time.time() - t0, 2)
    assert ovf2 == 0
    assert n_hits2 == n_hits, (n_hits2, n_hits)  # strategies agree
    record["probe_n_hits"] = n_hits2
    t0 = time.time()
    int(probe_chain(seqs_d, lens_d, rids_d, *planes_d, jnp.int32(n_iters))[0])
    record["probe_ms_per_step"] = round((time.time() - t0) / n_iters * 1e3, 2)
    record["probe_mbases_s"] = round(
        total_bases / (record["probe_ms_per_step"] / 1e3) / 1e6, 1
    )
    record["parity"] = "ok"
    record["n_timing_iters"] = n_iters
    run_wd.clear()
    print(f"v1 probe query: n_hits={n_hits2}, "
          f"{record['probe_ms_per_step']} ms/step "
          f"({record['probe_mbases_s']} Mb/s)", flush=True)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "TPU_V1_ONCHIP.json",
    )
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
