"""Synthetic repeat-seeded corpus helpers for benchmarks and tests.

Perfect tandem repeats of SHORT units are systematically suppressed by
the reference sketch: mode-2 keeps ~1 mer per ~256 bases (hash <
u64::MAX >> 4 >> r, shmmrutils.rs:621), then the min_span/distinctness
filter drops any mer whose hash equals its previous OR next mer's hash
(`px != x && x != nx`, shmmrutils.rs:545-548) — a unit that keeps only
one mer per copy emits a run of equal hashes and vanishes entirely.  A
corpus that needs VISIBLE multiplicity (postings with per-(key, sid)
multiplicity == copies) must therefore verify its unit actually
survives; `pick_tandem_unit` draws deterministic candidates until one
does.
"""
from __future__ import annotations

import numpy as np

_BASES = b"ACGT"


def _to_bytes(arr2bit: np.ndarray) -> bytes:
    return bytes(bytearray(_BASES[b] for b in arr2bit))


def tandem_pair_mults(seq2bit: np.ndarray, spec=None) -> dict:
    """Sketch a 2-bit sequence with the host arbiter and return
    {(k0, k1): occurrence_count} over its builder-canonical shimmer
    pairs (seq_db.rs:386-399 tie -> orientation 0)."""
    from collections import Counter

    from ..core import sketch as sketch_mod
    from ..core.spec import ShmmrSpec

    if spec is None:
        spec = ShmmrSpec(80, 56, 4, 64, True)
    mx, _my = sketch_mod.sequence_to_shmmrs_arrays(
        0, _to_bytes(seq2bit), spec, False
    )
    if len(mx) < 2:
        return {}
    h = (mx >> np.uint64(8)).astype(np.uint64)
    s0, s1 = h[:-1], h[1:]
    swap = s0 > s1
    k0 = np.where(swap, s1, s0)
    k1 = np.where(swap, s0, s1)
    return Counter(zip(k0.tolist(), k1.tolist()))


def pick_tandem_unit(
    rng: np.random.Generator,
    unit_len: int,
    copies: int,
    flank: int = 2048,
    min_keys: int = 2,
    max_tries: int = 64,
) -> np.ndarray:
    """Draw a random 2-bit unit whose perfect `copies`-fold tandem keeps
    at least `min_keys` pair keys at full multiplicity == `copies` under
    the default sketch spec (w=80, k=56, r=4, min_span=64, sketch).

    Deterministic given the rng state.  Raises if no candidate survives
    within max_tries (expected ~1-3 tries at unit_len >= 2 kb)."""
    for _ in range(max_tries):
        unit = rng.integers(0, 4, size=unit_len, dtype=np.uint8)
        probe = np.concatenate(
            [
                rng.integers(0, 4, size=flank, dtype=np.uint8),
                np.tile(unit, copies),
                rng.integers(0, 4, size=flank, dtype=np.uint8),
            ]
        )
        mults = tandem_pair_mults(probe)
        n_full = sum(1 for c in mults.values() if c == copies)
        if n_full >= min_keys:
            return unit
    raise RuntimeError(
        f"no {unit_len}-base unit with visible x{copies} tandem "
        f"multiplicity found in {max_tries} tries"
    )
