"""Device (JAX) kernel exactness tests — run on the CPU backend with a
virtual 8-device mesh (see conftest); the same code path runs on TPU."""
import os
import random

import numpy as np
import pytest

from pgrtk_tpu.core import sketch_ref
from pgrtk_tpu.core.fasta import read_fastx_all
from pgrtk_tpu.core.spec import ShmmrSpec


def test_u64_ops_random():
    import jax.numpy as jnp

    from pgrtk_tpu.ops import u64

    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 64, size=256, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=256, dtype=np.uint64)
    ja, jb = u64.from_numpy(a), u64.from_numpy(b)
    assert np.array_equal(u64.to_numpy(u64.add(ja, jb)), a + b)
    assert np.array_equal(u64.to_numpy(u64.xor(ja, jb)), a ^ b)
    assert np.array_equal(u64.to_numpy(u64.not_(ja)), ~a)
    for s in (0, 1, 8, 21, 24, 31, 32, 33, 55, 63):
        assert np.array_equal(
            u64.to_numpy(u64.shl_const(ja, s)), a << np.uint64(s)
        ), s
        assert np.array_equal(
            u64.to_numpy(u64.shr_const(ja, s)), a >> np.uint64(s)
        ), s
    shifts = rng.integers(0, 64, size=256).astype(np.uint32)
    assert np.array_equal(
        u64.to_numpy(u64.shl(ja, jnp.asarray(shifts))), a << shifts.astype(np.uint64)
    )
    assert np.array_equal(
        u64.to_numpy(u64.shr(ja, jnp.asarray(shifts))), a >> shifts.astype(np.uint64)
    )
    assert np.array_equal(np.asarray(u64.lt(ja, jb)), a < b)
    assert np.array_equal(np.asarray(u64.le(ja, jb)), a <= b)


def test_u64_wang_hash():
    from pgrtk_tpu.ops import u64

    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 64, size=512, dtype=np.uint64)
    expect = np.asarray(
        [sketch_ref.u64hash(int(v)) for v in a], dtype=np.uint64
    )
    got = u64.to_numpy(u64.wang_hash(u64.from_numpy(a)))
    assert np.array_equal(got, expect)


def test_device_sketch_mode2_exact(test_data_dir):
    from pgrtk_tpu.ops import sketch as dsk

    spec = ShmmrSpec(sketch=True)
    recs = read_fastx_all(os.path.join(test_data_dir, "test_seqs.fa"))[:12]
    seqs = [r.seq for r in recs]
    # adversarial extras: Ns, lowercase, short seqs, homopolymers
    seqs += [
        b"ACGTNNNNacgtACGTACGGTTACA" * 40,
        b"A" * 300,
        b"ACGT" * 20,
        b"",
        bytes(
            random.Random(3).choice(b"ACGTN") for _ in range(5000)
        ),
    ]
    out = dsk.sketch_mode2(seqs, spec=spec)
    for i, s in enumerate(seqs):
        ref = sketch_ref.sequence_to_shmmrs(i, s, spec)
        rx = np.asarray([m[0] for m in ref], dtype=np.uint64)
        ry = np.asarray([m[1] for m in ref], dtype=np.uint64)
        dx, dy = out[i]
        assert np.array_equal(rx, dx), f"seq {i} x mismatch"
        assert np.array_equal(ry, dy), f"seq {i} y mismatch"


def test_device_sketch_various_k_r(test_data_dir):
    from pgrtk_tpu.ops import sketch as dsk

    recs = read_fastx_all(os.path.join(test_data_dir, "test_rev.fa"))
    seqs = [r.seq for r in recs]
    for k, r, ms in ((56, 4, 64), (48, 2, 16), (33, 6, 0), (56, 1, 64)):
        spec = ShmmrSpec(w=80, k=k, r=r, min_span=ms, sketch=True)
        out = dsk.sketch_mode2(seqs, spec=spec)
        for i, s in enumerate(seqs):
            ref = sketch_ref.sequence_to_shmmrs(i, s, spec)
            rx = np.asarray([m[0] for m in ref], dtype=np.uint64)
            dx, _ = out[i]
            assert np.array_equal(rx, dx), (k, r, ms, i)
