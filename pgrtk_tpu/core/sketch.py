"""SHIMMER sketch backend dispatch.

Backends, in preference order for host batch sketching:
  1. native  — C++ libpgrtk (multi-threaded, exact)
  2. python  — sketch_ref (exact arbiter, slow)

The JAX/TPU device kernel lives in pgrtk_tpu.ops.sketch and is used by the
device query/index pipelines; it is validated against these host backends.
"""
from __future__ import annotations

import os
from typing import List, Sequence, Tuple

from . import sketch_ref
from .spec import ShmmrSpec

_FORCE = os.environ.get("PGRTK_SKETCH_BACKEND")  # "native" | "python" | None


def _native():
    if _FORCE == "python":
        return None
    try:
        from ..native import api as native_api

        return native_api if native_api.available() else None
    except Exception:
        if _FORCE == "native":
            raise
        return None


def sequence_to_shmmrs(
    rid: int, seq: bytes, spec: ShmmrSpec, padding: bool = False
) -> List[Tuple[int, int]]:
    nat = _native()
    if nat is not None:
        return nat.sequence_to_shmmrs(rid, seq, spec, padding)
    return sketch_ref.sequence_to_shmmrs(rid, seq, spec, padding)


def batch_sequence_to_shmmrs(
    seqs: Sequence[Tuple[int, bytes]], spec: ShmmrSpec, padding: bool = False
) -> List[List[Tuple[int, int]]]:
    """Sketch many (rid, seq) pairs; parallel across sequences natively
    (the reference parallelizes the same way: seq_db.rs:456-469)."""
    nat = _native()
    if nat is not None:
        return nat.batch_sequence_to_shmmrs(seqs, spec, padding)
    return [sketch_ref.sequence_to_shmmrs(rid, s, spec, padding) for rid, s in seqs]
