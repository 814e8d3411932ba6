"""Auto host/device dispatch (utils/dispatch.py) + per-sequence mode-1
palindrome fallback (ops/sketch1.py)."""
import numpy as np

from pgrtk_tpu.core.spec import ShmmrSpec
from pgrtk_tpu.utils import dispatch


def test_use_device_forced_modes(monkeypatch):
    monkeypatch.setattr(dispatch, "_accel", True)
    assert dispatch.use_device(10, forced="device")
    assert not dispatch.use_device(10**9, forced="native")
    assert not dispatch.use_device(10**9, forced="python")


def test_use_device_threshold_and_accelerator(monkeypatch):
    monkeypatch.delenv("PGRTK_DEVICE_MIN_BASES", raising=False)
    monkeypatch.setattr(dispatch, "_accel", True)
    assert dispatch.use_device(dispatch.DEFAULT_MIN_BASES)
    assert not dispatch.use_device(dispatch.DEFAULT_MIN_BASES - 1)
    monkeypatch.setattr(dispatch, "_accel", False)
    assert not dispatch.use_device(10**9)


def test_use_device_env_threshold(monkeypatch):
    monkeypatch.setattr(dispatch, "_accel", True)
    monkeypatch.setenv("PGRTK_DEVICE_MIN_BASES", "100")
    assert dispatch.use_device(100)
    assert not dispatch.use_device(99)


def test_tests_run_on_cpu_backend_no_auto_device():
    # conftest forces JAX_PLATFORMS=cpu: the real accelerator probe must
    # say "no accelerator" here, keeping tests on the host path
    dispatch._accel = None
    assert not dispatch.accelerator_present()


def test_mode1_palindrome_fallback_is_per_sequence():
    """One palindromic k-mer must only send ITS sequence to the scalar
    path; the rest of the batch stays device-computed — and every result
    stays exact (ops/sketch1.py)."""
    from pgrtk_tpu.native import api as native
    from pgrtk_tpu.ops import sketch1

    spec = ShmmrSpec(w=24, k=16, r=1, min_span=0, sketch=False)
    rng = np.random.RandomState(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = [bytes(rng.choice(bases, 3000).tolist()) for _ in range(4)]
    # splice a k-palindrome (s + revcomp(s), k=16) into sequence 2
    half = b"ACGTTGCACCGGATAC"[: spec.k // 2]
    comp = bytes(reversed(half.translate(bytes.maketrans(b"ACGT", b"TGCA"))))
    palin = half + comp
    s2 = bytearray(seqs[2])
    s2[1500 : 1500 + spec.k] = palin
    seqs[2] = bytes(s2)

    dense = sketch1.sketch_mode1_dense(
        *_pad(seqs), spec.k, spec.w, 512
    )
    flags = np.asarray(dense["palindrome_seen"])
    assert flags.shape == (4,)
    assert flags[2] and not flags[0] and not flags[1] and not flags[3]

    got = sketch1.sketch_mode1(seqs, spec=spec)
    want = native.batch_sequence_to_shmmrs(
        [(i, s) for i, s in enumerate(seqs)], spec
    )
    assert got == want


def _pad(seqs, chunk=512):
    import jax.numpy as jnp

    from pgrtk_tpu.ops import sketch as sketch_ops

    arr, lens = sketch_ops.pad_batch(seqs, multiple=chunk)
    return jnp.asarray(arr), jnp.asarray(lens)
