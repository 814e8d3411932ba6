"""Batched device WFA vs the native host path (SV-pipeline penalties).

Aligns G mutated ~400 bp gap segments: once through ops/wfa.py (one
device forward batch + host backtrace) and once serially through the
C++ arbiter.  Prints one JSON line with segments/s for both and the
speedup.  Run standalone on the TPU host (not by the driver).
"""
import json
import os
import sys
import time

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

    G = 64
    pairs = []
    for _ in range(G):
        t = bytes(rng.choice(bases, int(rng.randint(200, 480))).tolist())
        pairs.append((t, mutate(t)))

    # device: warm-up compile, then timed
    out_dev = dev_wfa.batch_wfa_align(pairs)
    t0 = time.time()
    out_dev = dev_wfa.batch_wfa_align(pairs)
    dt_dev = time.time() - t0

    t0 = time.time()
    out_host = [
        host_wfa.wfa_align_bases(t.decode(), q.decode(), 384, 3, 3, 1)
        for t, q in pairs
    ]
    dt_host = time.time() - t0

    assert out_dev == out_host, "device/host mismatch"
    print(
        json.dumps(
            {
                "metric": "wfa_batch_speedup",
                "value": round(dt_host / dt_dev, 2),
                "unit": "x vs serial host",
                "segments": G,
                "device_seg_per_s": round(G / dt_dev, 1),
                "host_seg_per_s": round(G / dt_host, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
