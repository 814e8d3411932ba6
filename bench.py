"""Benchmark: SHIMMER indexing throughput on one chip.

Runs the full single-chip device indexing pipeline — batched mode-2
SHIMMER sketch (two-level scan register walk + Wang hashing) -> compaction
-> min_span filter -> canonical pair construction -> sorted pair table —
on synthetic sequence data, timed as N chained iterations inside one jit
(the hosting tunnel makes per-dispatch host sync unreliable/expensive).

Baseline: the reference pgr-mdb builds the HPRC year-1 index (~300 Gbp)
in 30-40 min on a CPU server (reference: pgr-tk/src/lib.rs:40-42) —
~143 Mbases/s.  vs_baseline = ours / 143e6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compile cache: remote TPU compiles through the tunnel are
# erratic (10s-10min); a warm cache makes reruns start in seconds
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_tpu"
)

BASELINE_BASES_PER_S = 143e6


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pgrtk_tpu.ops import pairs as pairs_ops
    from pgrtk_tpu.ops import sketch as sketch_ops

    B, L = 8, 1_048_576
    CHUNK = 512
    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    lens = jnp.full((B,), L, dtype=jnp.int32)
    rids = jnp.arange(B, dtype=jnp.uint32)

    def index_once(seqs_u8):
        out = sketch_ops.sketch_mode2_dense(
            seqs_u8, lens, rids, 56, 4, 64, CHUNK
        )
        xh, xl, yl, valid, _ovf = pairs_ops.compact_mers_packed(
            out["x_hi"], out["x_lo"], out["y_lo"], out["selected"]
        )
        keep = pairs_ops.min_span_filter_gapped(xh, xl, yl, valid, 64)
        pr = pairs_ops.pair_mers_gapped(xh, xl, yl, keep)
        table = pairs_ops.sort_pairs(pr, rids)
        # fold the table into a scalar so iterations chain (data dependency
        # prevents overlap across timed iterations)
        acc = (
            table["valid"].sum().astype(jnp.uint32)
            + (table["k0_lo"].sum() & jnp.uint32(3))
        )
        return acc

    @jax.jit
    def chain(seqs_u8, n):
        def body(_, carry):
            s, acc = carry
            a = index_once(s)
            pert = (a & jnp.uint32(3)).astype(jnp.uint8)
            return ((s + pert) % jnp.uint8(4), acc + a)

        return jax.lax.fori_loop(0, n, body, (seqs_u8, jnp.uint32(0)))

    # warm-up / compile
    _, acc = chain(arr, 1)
    acc = int(acc)

    N = 20
    t0 = time.time()
    _, acc = chain(arr, N)
    acc = int(acc)  # forces full sync (4-byte transfer)
    dt = (time.time() - t0) / N

    bases_per_s = B * L / dt
    print(
        json.dumps(
            {
                "metric": "shimmer_index_throughput",
                "value": round(bases_per_s / 1e6, 1),
                "unit": "Mbases/s/chip",
                "vs_baseline": round(bases_per_s / BASELINE_BASES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
