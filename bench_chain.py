"""Batched device chain-DP vs the native host path.

Chains G anchor groups (the per-(query,target) groups of a batch query)
once through ops/chain.py and once serially through the C++ arbiter.
Prints one JSON line with groups/s for both and the speedup.  Run
standalone on the TPU host (not by the driver).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_tpu")


def main():
    import numpy as np

    from pgrtk_tpu.native import api as native
    from pgrtk_tpu.ops import chain as dchain

    rng = np.random.RandomState(1)
    G, N = 1024, 128
    groups = []
    for _ in range(G):
        n = int(rng.randint(N // 2, N))
        qb = np.sort(rng.randint(0, 40000, n).astype(np.uint32))
        qe = qb + rng.randint(50, 300, n).astype(np.uint32)
        drift = rng.randint(-200, 200, n).astype(np.int64)
        tb = (qb.astype(np.int64) + drift).clip(0).astype(np.uint32)
        te = tb + (qe - qb)
        g = np.stack(
            [qb, qe, rng.randint(0, 2, n).astype(np.uint32),
             tb, te, rng.randint(0, 2, n).astype(np.uint32)], axis=1
        )
        groups.append(np.ascontiguousarray(g, dtype=np.uint32))

    dchain.chain_groups(groups, 0.025, max_span=8)  # warm-up compile
    t0 = time.time()
    out_dev = dchain.chain_groups(groups, 0.025, max_span=8)
    dt_dev = time.time() - t0

    t0 = time.time()
    out_host = []
    for g in groups:
        chains = native.sparse_aln(g, 8, 0.025, None, False)
        out_host.append(
            [
                (
                    score,
                    [((int(r[0]), int(r[1]), int(r[2])),
                      (int(r[3]), int(r[4]), int(r[5]))) for r in track],
                )
                for score, track in chains
            ]
        )
    dt_host = time.time() - t0

    assert out_dev == out_host, "device/host mismatch"
    print(
        json.dumps(
            {
                "metric": "chain_batch_speedup",
                "value": round(dt_host / dt_dev, 2),
                "unit": "x vs serial host",
                "groups": G,
                "device_groups_per_s": round(G / dt_dev, 1),
                "host_groups_per_s": round(G / dt_host, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
