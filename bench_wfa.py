"""Batched device WFA vs the native host path (SV-pipeline penalties).

Aligns G mutated ~400 bp gap segments: once through ops/wfa.py (banded
device forward + host backtrace), once through the C++ arbiter on a
thread pool (the production host path), and once serially.  Prints one
JSON line with segments/s for all three.  Run standalone on the TPU
host (not by the driver).
"""
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_tpu")


def main():
    import numpy as np

    from pgrtk_tpu.core import wfa as host_wfa
    from pgrtk_tpu.ops import wfa as dev_wfa

    rng = np.random.RandomState(0)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def mutate(t):
        s = bytearray(t)
        for _ in range(int(rng.randint(1, 6))):
            p = rng.randint(16, len(s) - 16)
            s[p] = bases[(int(np.where(bases == s[p])[0][0]) + 1
                          + rng.randint(3)) % 4]
        for _ in range(int(rng.randint(0, 2))):
            p = rng.randint(16, len(s) - 40)
            del s[p : p + rng.randint(1, 25)]
        return bytes(s)

    G = int(os.environ.get("BENCH_WFA_SEGMENTS", "512"))
    pairs = []
    for _ in range(G):
        t = bytes(rng.choice(bases, int(rng.randint(200, 480))).tolist())
        pairs.append((t, mutate(t)))

    # device: warm-up compile, then timed
    out_dev = dev_wfa.batch_wfa_align(pairs)
    t0 = time.time()
    out_dev = dev_wfa.batch_wfa_align(pairs)
    dt_dev = time.time() - t0

    def host_one(p):
        t, q = p
        return host_wfa.wfa_align_bases(t.decode(), q.decode(), 384, 3, 3, 1)

    n_threads = os.cpu_count() or 4
    with ThreadPoolExecutor(n_threads) as pool:
        pool.map(host_one, pairs[:8])  # warm-up
    t0 = time.time()
    with ThreadPoolExecutor(n_threads) as pool:
        out_thr = list(pool.map(host_one, pairs))
    dt_thr = time.time() - t0

    t0 = time.time()
    out_ser = [host_one(p) for p in pairs[: max(1, G // 8)]]
    dt_ser = (time.time() - t0) * (G / max(1, G // 8))

    assert out_dev == out_thr, "device/host mismatch"
    assert out_ser == out_thr[: len(out_ser)]
    print(
        json.dumps(
            {
                "metric": "wfa_batch_speedup",
                "value": round(dt_thr / dt_dev, 2),
                "unit": "x vs threaded host",
                "segments": G,
                "host_threads": n_threads,
                "device_seg_per_s": round(G / dt_dev, 1),
                "threaded_host_seg_per_s": round(G / dt_thr, 1),
                "serial_host_seg_per_s": round(G / dt_ser, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
