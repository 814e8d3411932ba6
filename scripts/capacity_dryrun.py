"""HPRC-scale capacity dryrun for the v2 hash-range-sharded topology.

Allocates the v2 sharded index at PRODUCTION shard shapes — default
8 shards x 12.5M-posting capacity = 100M postings total, the scale of
a whole-pangenome index (HPRC year-1: ~730M signatures, pgr-db pair
map; reference workload pgr-tk/src/lib.rs:40-42) — on the virtual CPU
mesh, runs one build + one end-to-end query step through it, and
reports MEASURED per-shard bytes so docs/ROADMAP.md's capacity plan is
grounded in allocation, not estimates.

The corpus content is small (the planes are statically sized by
shard_capacity, which is what we measure); the point is that the
full-scale program compiles, executes, and stays within per-shard
memory on every step.

Run (CPU mesh):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/capacity_dryrun.py [shard_capacity] [n_devices]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# FORCE the CPU platform (the interactive shell on this box exports
# JAX_PLATFORMS=axon + a pool IP; setdefault would inherit them and
# claim the TPU tunnel)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import numpy as np

V5E_HBM = 16 << 30
HPRC_POSTINGS = 730e6  # ~300 Gbp at ~2.4k pairs/Mbp, ~97x shared keys


def tree_bytes(x):
    import jax

    return sum(
        v.nbytes for v in jax.tree_util.tree_leaves(x)
        if hasattr(v, "nbytes")
    )


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 12_500_000
    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax

    # the axon sitecustomize sets the jax_platforms CONFIG (not just the
    # env var) to "axon,cpu" at interpreter start — override the config
    # back, exactly as tests/conftest.py does, or the mesh lands on the
    # single remote TPU device
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pgrtk_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(n_dev)
    axis = mesh.axis_names[0]

    B, L = n_dev, 1_048_576
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, size=L, dtype=np.uint8)
    seqs = np.stack([base.copy() for _ in range(B)])
    for b in range(B):
        n = rng.binomial(L, 2e-4)
        pos = rng.choice(L, size=n, replace=False)
        seqs[b, pos] = (seqs[b, pos] + rng.integers(1, 4, size=n)) % 4

    shard = NamedSharding(mesh, P(axis, None))
    shard1 = NamedSharding(mesh, P(axis))
    seqs_d = jax.device_put(jnp.asarray(seqs), shard)
    lens_d = jax.device_put(jnp.full(B, L, jnp.int32), shard1)
    rids_d = jax.device_put(jnp.arange(B, dtype=jnp.uint32), shard1)

    print(
        f"v2 capacity dryrun: {n_dev} shards x {cap:,} postings "
        f"= {n_dev * cap:,} total capacity",
        flush=True,
    )

    t0 = time.time()
    v2 = pmesh.sharded_index_v2_step(mesh, cap, chunk=512)(
        seqs_d, lens_d, rids_d
    )
    jax.block_until_ready(v2)
    t_build = time.time() - t0
    assert not bool(v2["shard_overflow"]) and not bool(v2["route_overflow"])
    assert not bool(v2["probe_overflow"])
    n_pairs = int(v2["n_pairs"])

    shard_tab_b = tree_bytes(v2["shard"]) // n_dev
    probe_b = tree_bytes(v2["probe"]) // n_dev
    per_shard = shard_tab_b + probe_b

    t0 = time.time()
    e2e = pmesh.sharded_query_v2_e2e_step(
        mesh, cap, n_targets=B, slots2=384, M=4, postings_cap=16,
    )(seqs_d, lens_d, rids_d, *v2["probe"]["planes"])
    jax.block_until_ready(e2e["scores"])
    t_query = time.time() - t0
    for flag in ("compact_overflow", "route_overflow", "postings_overflow"):
        assert not bool(e2e[flag]), flag
    assert not np.asarray(e2e["row_ovf"]).any()
    n_hits = int(e2e["n_hits"])
    assert n_hits >= n_pairs  # self-query of the corpus

    bytes_per_posting = per_shard / cap
    # serving needs the probe+shard planes resident + workspace; size
    # chips by planes at 60% HBM (leaves room for query batch + fanout)
    usable = 0.6 * V5E_HBM
    postings_per_chip = usable / bytes_per_posting
    chips = int(np.ceil(HPRC_POSTINGS / postings_per_chip))

    print(f"build: {t_build:.1f}s  e2e query: {t_query:.1f}s  "
          f"(pairs={n_pairs}, hits={n_hits})")
    print(f"per-shard shard-table bytes: {shard_tab_b / 1e9:.2f} GB")
    print(f"per-shard probe+postings bytes: {probe_b / 1e9:.2f} GB")
    print(f"per-shard total: {per_shard / 1e9:.2f} GB "
          f"({bytes_per_posting:.1f} B/posting capacity)")
    print(f"HPRC year-1 (~{HPRC_POSTINGS / 1e6:.0f}M signatures): "
          f"{postings_per_chip / 1e6:.0f}M postings/chip at 60% HBM "
          f"-> {chips} v5e chips (BUILD-time footprint: table + planes)")
    # serving-only (probe+postings planes, shard table freed after the
    # build) measured ON-CHIP at 67.1 B/posting — scripts/tpu_hbm_scale
    serve_b = 67.1
    serve_per_chip = V5E_HBM * 0.6 / serve_b
    print(f"serving-only (67.1 B/posting measured on-chip, "
          f"docs/TPU_HBM_SCALE.json): {serve_per_chip / 1e6:.0f}M "
          f"postings/chip -> "
          f"{int(np.ceil(HPRC_POSTINGS / serve_per_chip))} v5e chips")


if __name__ == "__main__":
    main()
