"""Batched SHIMMER sketching on device (JAX/XLA, TPU-first).

Design notes (vs the reference's sequential scalar walk,
pgr-db/src/shmmrutils.rs:417-669):

  * Sequences are presented as a padded (B, L) uint8 batch.  All per-base
    state (the rolling forward / reverse-complement k-mer registers) is
    computed with one `jax.lax.associative_scan` over the length axis — the
    register update "shift-in one 2-bit base unless the base is ambiguous"
    composes associatively as (shift_count, packed_bits) pairs, so XLA
    parallelizes the scan in O(log L) depth instead of O(L).
  * All u64 quantities live as (hi, lo) uint32 planes (ops.u64) — TPU has
    no useful 64-bit integer path.
  * Mode-2 ("sketch") emission — hash under threshold — is a pure
    elementwise filter and runs entirely on device, including the
    min_span/distinctness filter, which needs the previous/next *kept*
    neighbor of every kept mer: two more last-valid associative scans.
  * The output is fixed-shape: per-position (x_hi, x_lo, pos, strand,
    keep) planes.  Compaction happens in the consumer (sort/segment ops on
    device, or np.flatnonzero on host).

Exactness: bit-identical to the scalar reference for mode 2 on any input
(including non-ACGT bases and padding); enforced by tests/test_ops_sketch.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import u64
from ..core.spec import ShmmrSpec

U32 = jnp.uint32


def _byte_to_code_table() -> np.ndarray:
    t = np.full(256, 4, dtype=np.uint32)
    t[0:4] = [0, 1, 2, 3]
    for b, c in ((65, 0), (67, 1), (71, 2), (84, 3)):
        t[b] = c
        t[b + 32] = c
    return t


_CODE_TABLE = _byte_to_code_table()


def encode_bases(seqs_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 bytes -> 2-bit codes (4 = ambiguous), elementwise."""
    table = jnp.asarray(_CODE_TABLE)
    return table[seqs_u8.astype(jnp.int32)]


def _register_scan(code: jnp.ndarray, k: int):
    """Rolling k-mer registers for every position via associative scan.

    Returns f0, f1, r0, r1 as (hi, lo) u32 pairs, each (B, L), matching the
    reference register update (shmmrutils.rs:459-476).
    """
    valid = code < 4
    n = valid.astype(U32)  # shift count: 1 if base consumed else 0
    lob = jnp.where(valid, code & 1, 0).astype(U32)
    hib = jnp.where(valid, (code >> 1) & 1, 0).astype(U32)
    rc = jnp.where(valid, 3 ^ code, 0).astype(U32)
    rlob = rc & 1
    rhib = (rc >> 1) & 1

    km1 = k - 1
    zero = jnp.zeros_like(n)

    def seed_f(bit):  # new low bit for the shift-left register
        return (zero, bit)

    def seed_r(bit):  # new bit at position k-1 for the shift-right register
        return u64.shl_const((zero, bit), km1)

    elems = dict(
        n=n,
        f0=seed_f(lob),
        f1=seed_f(hib),
        r0=seed_r(rlob),
        r1=seed_r(rhib),
    )

    def combine(a, b):
        bn = b["n"]
        out = {"n": jnp.minimum(a["n"] + bn, jnp.uint32(63))}
        for ch in ("f0", "f1"):
            # X -> (X << n | v): compose v = (va << nb) | vb
            out[ch] = u64.or_(u64.shl(a[ch], bn), b[ch])
        for ch in ("r0", "r1"):
            # X -> (X >> n | v): compose v = (va >> nb) | vb
            out[ch] = u64.or_(u64.shr(a[ch], bn), b[ch])
        return out

    res = jax.lax.associative_scan(combine, elems, axis=code.ndim - 1)
    mask = (1 << k) - 1
    f0 = u64.mask_const(res["f0"], mask)
    f1 = u64.mask_const(res["f1"], mask)
    r0 = u64.mask_const(res["r0"], mask)
    r1 = u64.mask_const(res["r1"], mask)
    return f0, f1, r0, r1


def _last_valid_scan(values: dict, valid: jnp.ndarray, axis: int, reverse=False):
    """Propagate the most recent valid element's values along axis.

    Returns (values_from_previous_valid, has_previous_valid); "previous"
    means strictly earlier positions (later if reverse=True).
    """
    shifted_valid = jnp.roll(valid, -1 if reverse else 1, axis=axis)
    idx = [slice(None)] * valid.ndim
    idx[axis] = -1 if reverse else 0
    shifted_valid = shifted_valid.at[tuple(idx)].set(False)
    sh = -1 if reverse else 1

    def roll(v):
        r = jnp.roll(v, sh, axis=axis)
        return r.at[tuple(idx)].set(0)

    vals = {k: jax.tree.map(roll, v) for k, v in values.items()}

    elems = dict(has=shifted_valid, **vals)

    def combine(a, b):
        keep_b = b["has"]
        out = {"has": a["has"] | keep_b}
        for k in vals:
            out[k] = jax.tree.map(
                lambda av, bv: jnp.where(keep_b, bv, av), a[k], b[k]
            )
        return out

    res = jax.lax.associative_scan(combine, elems, axis=axis, reverse=reverse)
    has = res.pop("has")
    return res, has


@functools.partial(jax.jit, static_argnames=("k", "r", "min_span"))
def sketch_mode2_dense(
    seqs_u8: jnp.ndarray,
    lengths: jnp.ndarray,
    rids: jnp.ndarray,
    k: int,
    r: int,
    min_span: int,
):
    """Mode-2 SHIMMER sketch of a padded batch.

    Args:
      seqs_u8: (B, L) uint8 (pad with any non-ACGT byte, e.g. 0xNN/0xFF)
      lengths: (B,) int32 true lengths
      rids:    (B,) uint32 sequence ids
    Returns dict of (B, L) planes:
      x_hi, x_lo : MM128.x = hash<<8|k as u32 pair
      y_lo       : pos<<1|strand (y_hi is rids broadcast)
      keep       : bool, final kept-mer mask (post min_span filter)
    """
    B, L = seqs_u8.shape
    code = encode_bases(seqs_u8)
    f0, f1, r0, r1 = _register_scan(code, k)

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    in_seq = pos < lengths[:, None]
    palindrome = u64.eq(f0, r0) & u64.eq(f1, r1)
    emits = in_seq & ~palindrome & (pos >= k)

    reverse = u64.lt(r0, f0)
    xor_const = u64.from_int(0xAD12CF59, like=f0[0])
    h_f = u64.xor(u64.wang_hash(f0), u64.wang_hash(u64.xor(f1, xor_const)))
    h_r = u64.xor(u64.wang_hash(r0), u64.wang_hash(u64.xor(r1, xor_const)))
    h = u64.where(reverse, h_r, h_f)
    strand = reverse.astype(U32)

    threshold = u64.from_int(((1 << 64) - 1) >> 4 >> r, like=f0[0])
    selected = emits & u64.lt(h, threshold)

    x = u64.or_(u64.shl_const(h, 8), u64.from_int(k, like=h[0]))
    y_lo = (pos.astype(U32) << 1) | strand

    # min_span / distinctness filter over the selected subsequence
    posu = pos.astype(U32)
    prev, has_prev = _last_valid_scan(
        dict(x=x, p=posu), selected, axis=1, reverse=False
    )
    nxt, has_next = _last_valid_scan(
        dict(x=x, p=posu), selected, axis=1, reverse=True
    )
    interior_ok = (
        (posu - prev["p"] > min_span)
        & (nxt["p"] - posu > min_span)
        & ~u64.eq(prev["x"], x)
        & ~u64.eq(x, nxt["x"])
    )
    keep = selected & (~has_prev | ~has_next | interior_ok)

    return dict(
        x_hi=x[0],
        x_lo=x[1],
        y_lo=y_lo,
        y_hi=jnp.broadcast_to(rids[:, None].astype(U32), (B, L)),
        keep=keep,
    )


def pad_batch(seqs, pad_to=None) -> Tuple[np.ndarray, np.ndarray]:
    """Host helper: list of byte strings -> (B, L) uint8 + lengths."""
    L = max((len(s) for s in seqs), default=0)
    if pad_to is not None:
        L = max(L, pad_to)
    B = len(seqs)
    arr = np.full((B, L), 0xFF, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(seqs):
        b = np.frombuffer(bytes(s), dtype=np.uint8)
        arr[i, : len(b)] = b
        lens[i] = len(b)
    return arr, lens


def sketch_mode2(seqs, rids=None, spec: ShmmrSpec = None):
    """Convenience host API: sketch byte sequences on device, return per-seq
    (x, y) uint64 numpy arrays (compacted), matching the scalar reference."""
    spec = spec or ShmmrSpec(sketch=True)
    assert spec.sketch, "sketch_mode2 requires spec.sketch=True"
    if rids is None:
        rids = list(range(len(seqs)))
    arr, lens = pad_batch(seqs)
    out = sketch_mode2_dense(
        jnp.asarray(arr),
        jnp.asarray(lens),
        jnp.asarray(np.asarray(rids, dtype=np.uint32)),
        spec.k,
        spec.r,
        spec.min_span,
    )
    keep = np.asarray(out["keep"])
    x = (np.asarray(out["x_hi"], dtype=np.uint64) << np.uint64(32)) | np.asarray(
        out["x_lo"], dtype=np.uint64
    )
    y_lo = np.asarray(out["y_lo"], dtype=np.uint64)
    res = []
    for i in range(len(seqs)):
        sel = np.flatnonzero(keep[i])
        xs = x[i, sel]
        ys = (np.uint64(int(rids[i])) << np.uint64(32)) | y_lo[i, sel]
        res.append((xs, ys))
    return res
