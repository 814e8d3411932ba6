"""Device-side SHIMMER pair construction and index building blocks.

The reference keys its fragment index by canonical shimmer pairs held in a
hash map (pgr-db/src/seq_db.rs:72-78).  On TPU the equivalent structure is
a **sorted columnar table**: pair keys sorted lexicographically with
segment boundaries, queried by vectorized binary search — hash maps are
pointer-chasing, sorts and searches are XLA-native.

All fixed-shape: kept mers are compacted to a static capacity per sequence
(mode-2 density is ~2^-8 by construction; capacity defaults to L/64 which
is ~4x the expected count), with validity masks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

U32 = jnp.uint32


def _rank_extract_planes(planes, selected, block: int, slots: int):
    """Blockwise sort-free compaction of N u32/i32 planes: intra-block
    cumsum ranks each selected element; one masked u32 reduction per
    output slot pulls it out (exactly one element matches each
    (block, slot) rank, so a plain sum is exact — no sorting network,
    no gathers).

    (B, L) planes -> (B, (L/block)*slots) planes + valid + overflow.
    Output preserves position order WITHIN each block and across blocks,
    but invalid slots are interspersed (each block packs its own prefix).
    """
    B, L = planes[0].shape
    if L % block:
        pad = block - (L % block)
        pad2 = [(0, 0), (0, pad)]
        planes = [jnp.pad(p, pad2) for p in planes]
        selected = jnp.pad(selected, pad2, constant_values=False)
        L += pad
    nb = L // block
    selb = selected.reshape(B * nb, block)
    overflow = (selb.sum(axis=1) > slots).any()
    rank = jnp.cumsum(selb.astype(jnp.int32), axis=1) - 1
    rank = jnp.where(selb, rank, -1)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, slots, 1), 1)
    hit = rank.reshape(B * nb, 1, block) == slot_ids
    m = hit.astype(jnp.uint32)

    def extract(v):
        vb = v.reshape(B * nb, 1, block)
        return (m * vb.astype(jnp.uint32)).sum(axis=2).astype(
            v.dtype
        ).reshape(B, nb * slots)

    return (
        [extract(p) for p in planes],
        hit.any(axis=2).reshape(B, nb * slots),
        overflow,
    )


def _rank_extract(x_hi, x_lo, y_lo, selected, block: int, slots: int):
    """Three-plane _rank_extract_planes (the mer-stream layout)."""
    (xh, xl, yl), valid, overflow = _rank_extract_planes(
        (x_hi, x_lo, y_lo), selected, block, slots
    )
    return xh, xl, yl, valid, overflow


# conservative sizing for the overflow rerun: 8x level-1 headroom,
# P(overflow) < 1e-12 per batch at mode-2 density
SAFE_COMPACT_KW = dict(block=512, slots=16, block2=512, slots2=128)


@functools.partial(
    jax.jit, static_argnames=("block", "slots", "block2", "slots2")
)
def compact_mers_packed(
    x_hi, x_lo, y_lo, selected, block: int = 512, slots: int = 12,
    block2: int = 512, slots2: int = 144
):
    """Sort-free two-level compaction to a (B, ~L/152) POSITION-ORDERED
    stream with inter-block gaps (no dense prefix): level 1 squeezes the
    sparse selection, level 2 packs ~3.5x more.  Downstream consumers
    (min_span_filter_gapped, pair_mers_gapped) handle the gaps with
    jump-pointer neighbor propagation, so no payload sort is needed at
    all until the final key sort of the pair table.

    Sized for mode-2 density 2^-8 (r=4): level-1 blocks of 512 see
    lambda=2 selected (12 slots = 6x headroom, P(overflow) ~ 2e-7/block,
    ~3e-3 per 8-Mbase batch), level-2 blocks of 512 see lambda~85
    (144 slots, P ~ 5e-8/block).  The aggressive sizing is a measured
    26% win on the full index path (8.2 -> 6.1 ms at 8.4 Mbase on the
    v5e); on the rare overflow, callers rerun with **SAFE_COMPACT_KW
    (amortized cost ~0.03 ms/batch) and fall back to compact_mers only
    if the safe sizing overflows too.
    """
    xh, xl, yl, valid, ovf1 = _rank_extract(
        x_hi, x_lo, y_lo, selected, block, slots
    )
    xh, xl, yl, valid, ovf2 = _rank_extract(
        xh, xl, yl, valid, block2, slots2
    )
    return xh, xl, yl, valid, ovf1 | ovf2


def _next_valid(planes, valid, reverse: bool = False):
    """Jump-pointer propagation: for each index i, the planes of the
    nearest valid entry strictly after i (or before, if reverse), plus a
    has-neighbor mask.  log2(C) shift+select rounds."""
    B, C = valid.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    sgn = 1 if reverse else -1

    def shift(v, by, fill):
        r = jnp.roll(v, sgn * by, axis=1)
        if reverse:
            return jnp.where(idx < by, fill, r)
        return jnp.where(idx >= C - by, fill, r)

    has = shift(valid, 1, False)
    out = [shift(p, 1, jnp.zeros((), p.dtype)) for p in planes]
    d = 1
    while d < C:
        take = ~has & shift(has, d, False)
        out = [jnp.where(take, shift(p, d, jnp.zeros((), p.dtype)), p)
               for p in out]
        has = has | take
        d *= 2
    return out, has


def min_span_filter_gapped(x_hi, x_lo, y_lo, valid, min_span: int):
    """min_span/distinctness filter on a position-ordered stream WITH
    gaps (reference: shmmrutils.rs:536-555).  Same semantics as
    min_span_filter_dense, neighbors found by jump-pointer propagation."""
    pos = (y_lo >> 1).astype(jnp.int32)
    (n_hi, n_lo, n_pos), has_n = _next_valid((x_hi, x_lo, pos), valid)
    (p_hi, p_lo, p_pos), has_p = _next_valid(
        (x_hi, x_lo, pos), valid, reverse=True
    )
    distinct = ((p_hi != x_hi) | (p_lo != x_lo)) & (
        (n_hi != x_hi) | (n_lo != x_lo)
    )
    interior_ok = (
        (pos - p_pos > min_span) & (n_pos - pos > min_span) & distinct
    )
    return valid & (~has_p | ~has_n | interior_ok)


@functools.partial(jax.jit, static_argnames=("capacity", "block", "slots"))
def compact_mers(
    x_hi, x_lo, y_lo, selected, capacity: int, block: int = 512,
    slots: int = 16
):
    """Per-sequence compaction of selected mers to fixed capacity.

    Two stages, neither of which gathers (take_along_axis is
    pathologically slow on TPU):
      1. sort-free rank extraction per `block`-wide stripe: intra-block
         cumsum ranks each selected element; one masked u32 reduction per
         output slot pulls it out (exactly one element matches each
         (block, slot) rank, so a plain sum is exact);
      2. one payload sort of the (B, nb*slots) semi-compacted stream by
         global position (invalid -> 0xFFFFFFFF), keep first `capacity`.

    A block holding more than `slots` selected mers loses the excess; the
    returned `overflow` scalar flags that (mode-2 density is ~2^-8, so
    slots=16 per 512 gives 8x headroom — callers must check overflow and
    fall back to an exact path if it fires).

    Args: (B, L) planes from sketch_mode2_dense.
    Returns (x_hi, x_lo, y_lo, valid) of shape (B, capacity) + overflow
    bool scalar.
    """
    B, L = x_hi.shape
    if L % block:
        pad = block - (L % block)
        pad2 = [(0, 0), (0, pad)]
        x_hi = jnp.pad(x_hi, pad2)
        x_lo = jnp.pad(x_lo, pad2)
        y_lo = jnp.pad(y_lo, pad2)
        selected = jnp.pad(selected, pad2, constant_values=False)
        L += pad
    nb = L // block
    selb = selected.reshape(B * nb, block)
    overflow = (selb.sum(axis=1) > slots).any()

    # stage 1, sort-free: intra-block rank of each selected element (its
    # output slot), then one masked u32 reduction per slot.  Exactly one
    # element per (block, slot) has rank == slot, so a plain sum extracts
    # it exactly — no sorting network, no gathers.
    rank = jnp.cumsum(selb.astype(jnp.int32), axis=1) - 1  # (B*nb, block)
    rank = jnp.where(selb, rank, -1)
    xh_b = x_hi.reshape(B * nb, 1, block)
    xl_b = x_lo.reshape(B * nb, 1, block)
    yl_b = y_lo.reshape(B * nb, 1, block)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, slots, 1), 1)
    hit = (rank.reshape(B * nb, 1, block) == slot_ids)  # (B*nb, slots, block)
    m = hit.astype(jnp.uint32)
    xh3 = (m * xh_b).sum(axis=2).reshape(B, nb * slots)
    xl3 = (m * xl_b).sum(axis=2).reshape(B, nb * slots)
    yl3 = (m * yl_b).sum(axis=2).reshape(B, nb * slots)
    valid3 = hit.any(axis=2).reshape(B, nb * slots)

    # stage 2: one small payload sort by global position over the
    # slots-per-block stream
    gpos = jnp.where(valid3, yl3 >> 1, jnp.uint32(0xFFFFFFFF))
    gpos2, xh4, xl4, yl4 = jax.lax.sort((gpos, xh3, xl3, yl3), num_keys=1)
    valid = gpos2[:, :capacity] != jnp.uint32(0xFFFFFFFF)
    return (
        xh4[:, :capacity],
        xl4[:, :capacity],
        yl4[:, :capacity],
        valid,
        overflow,
    )


def min_span_filter_dense(x_hi, x_lo, y_lo, valid, min_span: int):
    """min_span/distinctness filter on compacted (B, C) mer planes
    (reference: shmmrutils.rs:536-555).  First/last valid mers are always
    kept; interior mers need spacing > min_span and distinct neighbors."""
    B, C = x_hi.shape
    pos = (y_lo >> 1).astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    n_valid = valid.sum(axis=1, keepdims=True)
    is_first = idx == 0
    is_last = idx == (n_valid - 1)

    def shift(v, by, fill):
        return jnp.roll(v, by, axis=1).at[:, 0 if by > 0 else -1].set(fill)

    p_pos = shift(pos, 1, 0)
    n_pos = shift(pos, -1, 0)
    p_hi, p_lo = shift(x_hi, 1, 0), shift(x_lo, 1, 0)
    n_hi, n_lo = shift(x_hi, -1, 0), shift(x_lo, -1, 0)
    distinct = ((p_hi != x_hi) | (p_lo != x_lo)) & (
        (n_hi != x_hi) | (n_lo != x_lo)
    )
    interior_ok = (
        (pos - p_pos > min_span) & (n_pos - pos > min_span) & distinct
    )
    return valid & (is_first | is_last | interior_ok)


def pair_mers_dense(x_hi, x_lo, y_lo, valid):
    """Consecutive canonical shimmer pairs from compacted (B, C) planes
    (reference: seq_db.rs:386-399 — index convention, `<=` tie -> 0).

    Returns (B, C) planes (entry i pairs mer i with mer i+1):
      k0_hi, k0_lo, k1_hi, k1_lo : canonical (min-hash-first) pair key
      bgn, end                   : fragment coordinates (pos+1)
      orientation                : 0/1
      pair_valid                 : both mers valid
    The key planes hold the 56-bit hashes (x >> 8).
    """
    B, C = x_hi.shape

    def nxt(v):
        return jnp.roll(v, -1, axis=1)

    # hash = x >> 8 as (hi, lo) pair
    h_hi = x_hi >> 8
    h_lo = (x_lo >> 8) | (x_hi << 24)
    nh_hi, nh_lo = nxt(h_hi), nxt(h_lo)
    swap = (h_hi > nh_hi) | ((h_hi == nh_hi) & (h_lo > nh_lo))
    k0_hi = jnp.where(swap, nh_hi, h_hi)
    k0_lo = jnp.where(swap, nh_lo, h_lo)
    k1_hi = jnp.where(swap, h_hi, nh_hi)
    k1_lo = jnp.where(swap, h_lo, nh_lo)
    pos = (y_lo >> 1).astype(U32)
    bgn = pos + 1
    end = nxt(pos) + 1
    pair_valid = valid & nxt(valid)
    pair_valid = pair_valid.at[:, -1].set(False)
    return dict(
        k0_hi=k0_hi,
        k0_lo=k0_lo,
        k1_hi=k1_hi,
        k1_lo=k1_lo,
        bgn=bgn,
        end=end,
        orientation=swap.astype(U32),
        pair_valid=pair_valid,
    )


def pair_mers_gapped(x_hi, x_lo, y_lo, kept, tie_orientation_one=False):
    """pair_mers_dense over a FILTERED (B, C) stream without recompacting:
    each kept mer pairs with the next kept mer, found by log2(C) jump-
    pointer propagation (shift+select) — cheaper than the payload sort
    recompact_mers would spend to close the gaps.

    Requires the stream to be position-ordered among kept entries (true
    for compact_mers output).  Returns the same dict as pair_mers_dense.

    tie_orientation_one selects the QUERY-side tie-break for equal
    hashes: the reference's builder uses `s0 <= s1` -> orientation 0
    (seq_db.rs:391, the default here) while the query path uses strict
    `s0 < s1` -> orientation 1 on ties (seq_db.rs:1213).
    """
    B, C = x_hi.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)

    def shift1(v, fill):
        return jnp.roll(v, -1, axis=1).at[:, -1].set(fill)

    # (has, nx_*) at i = first kept entry strictly after i, within the
    # examined window (i, i + 2^t]
    has = shift1(kept, False)
    nx_hi = shift1(x_hi, U32(0))
    nx_lo = shift1(x_lo, U32(0))
    nx_yl = shift1(y_lo, U32(0))
    d = 1
    while d < C:
        in_range = idx < C - d

        def pull(v):
            return jnp.roll(v, -d, axis=1)

        take = ~has & pull(has) & in_range
        nx_hi = jnp.where(take, pull(nx_hi), nx_hi)
        nx_lo = jnp.where(take, pull(nx_lo), nx_lo)
        nx_yl = jnp.where(take, pull(nx_yl), nx_yl)
        has = has | take
        d *= 2

    h_hi = x_hi >> 8
    h_lo = (x_lo >> 8) | (x_hi << 24)
    nh_hi = nx_hi >> 8
    nh_lo = (nx_lo >> 8) | (nx_hi << 24)
    swap = (h_hi > nh_hi) | ((h_hi == nh_hi) & (h_lo > nh_lo))
    if tie_orientation_one:
        swap = swap | ((h_hi == nh_hi) & (h_lo == nh_lo))
    return dict(
        k0_hi=jnp.where(swap, nh_hi, h_hi),
        k0_lo=jnp.where(swap, nh_lo, h_lo),
        k1_hi=jnp.where(swap, h_hi, nh_hi),
        k1_lo=jnp.where(swap, h_lo, nh_lo),
        bgn=(y_lo >> 1).astype(U32) + 1,
        end=(nx_yl >> 1).astype(U32) + 1,
        orientation=swap.astype(U32),
        pair_valid=kept & has,
    )


def sort_pairs(pairs, sid):
    """Sort all pairs of a batch by canonical key (invalid entries last).

    pairs: dict from pair_mers_dense, (B, C) planes; sid: (B,) uint32.
    Returns flat sorted arrays (N = B*C) of the same fields + sid, with a
    leading validity mask; equal keys keep (sid, bgn) order so postings
    lists match the reference's per-sequence insertion order.
    """
    B, C = pairs["k0_hi"].shape
    N = B * C
    flat = {k: v.reshape(N) for k, v in pairs.items()}
    sid_f = jnp.broadcast_to(sid[:, None].astype(U32), (B, C)).reshape(N)
    valid = flat["pair_valid"]
    # force invalid keys to all-ones: they sort last AND the whole table
    # stays key-sorted (real 56-bit hashes never reach 2^56), so binary
    # search needs no separate validity handling
    FF = jnp.uint32(0xFFFFFFFF)
    def mkey(v):
        return jnp.where(valid, v, FF)
    operands = (
        mkey(flat["k0_hi"]),
        mkey(flat["k0_lo"]),
        mkey(flat["k1_hi"]),
        mkey(flat["k1_lo"]),
        sid_f,
        flat["bgn"],
        flat["end"],
        flat["orientation"],
        valid.astype(U32),
    )
    sorted_ops = jax.lax.sort(operands, num_keys=6)
    (k0h, k0l, k1h, k1l, s, b, e, o, va) = sorted_ops
    return dict(
        valid=va == 1,
        k0_hi=k0h,
        k0_lo=k0l,
        k1_hi=k1h,
        k1_lo=k1l,
        sid=s,
        bgn=b,
        end=e,
        orientation=o,
    )


def pack_pair_planes(pairs, sid):
    """Pack a (B, C) pair-plane dict into SEVEN flat (N,) u32 planes:
    the 112-bit canonical key as four lexicographic words w0..w3, plus
    sid, (orientation<<31 | bgn), end.  Invalid entries force all four
    key words to 0xFFFFFFFF so they sort last and validity survives
    round-trip (`w3 & 1`).  Requires bgn < 2^31.

    Word layout of the 112-bit key (hash0 ∥ hash1, 56 bits each):
      w0 = bits[111..80]  w1 = bits[79..48]  w2 = bits[47..16]
      w3 = bits[15..0] << 16  (low 16 bits zero for valid entries).
    """
    B, C = pairs["k0_hi"].shape
    N = B * C
    flat = {k: v.reshape(N) for k, v in pairs.items()}
    sid_f = jnp.broadcast_to(sid[:, None].astype(U32), (B, C)).reshape(N)
    valid = flat["pair_valid"]
    FF = jnp.uint32(0xFFFFFFFF)
    k0h, k0l = flat["k0_hi"], flat["k0_lo"]
    k1h, k1l = flat["k1_hi"], flat["k1_lo"]
    return dict(
        w0=jnp.where(valid, (k0h << 8) | (k0l >> 24), FF),
        w1=jnp.where(valid, (k0l << 8) | (k1h >> 16), FF),
        w2=jnp.where(valid, (k1h << 16) | (k1l >> 16), FF),
        w3=jnp.where(valid, k1l << 16, FF),
        sid=sid_f,
        bgnori=(flat["orientation"] << 31) | flat["bgn"],
        end=flat["end"],
    )


def sort_packed_planes(packed):
    """STABLE 4-key sort of packed pair planes (pack_pair_planes layout).
    Stability makes the explicit (sid, bgn) tie-break keys unnecessary:
    every producer emits pairs in (sid, position) flat order, so equal
    keys keep reference postings order for free."""
    w0, w1, w2, w3, s, bo, e = jax.lax.sort(
        (
            packed["w0"], packed["w1"], packed["w2"], packed["w3"],
            packed["sid"], packed["bgnori"], packed["end"],
        ),
        num_keys=4,
        is_stable=True,
    )
    return dict(w0=w0, w1=w1, w2=w2, w3=w3, sid=s, bgnori=bo, end=e)


def unpack_pair_table(packed):
    """Packed planes -> the sort_pairs table dict (valid, key planes,
    sid, bgn, end, orientation).  Invalid rows keep 0xFFFFFFFF keys."""
    FF = jnp.uint32(0xFFFFFFFF)
    w0, w1 = packed["w0"], packed["w1"]
    w2, w3 = packed["w2"], packed["w3"]
    va = (w3 & jnp.uint32(1)) == 0
    return dict(
        valid=va,
        k0_hi=jnp.where(va, w0 >> 8, FF),
        k0_lo=jnp.where(va, (w0 << 24) | (w1 >> 8), FF),
        k1_hi=jnp.where(va, ((w1 & jnp.uint32(0xFF)) << 16) | (w2 >> 16), FF),
        k1_lo=jnp.where(va, (w2 << 16) | (w3 >> 16), FF),
        sid=packed["sid"],
        bgn=packed["bgnori"] & jnp.uint32(0x7FFFFFFF),
        end=packed["end"],
        orientation=packed["bgnori"] >> 31,
    )


def sort_pairs_packed(pairs, sid):
    """sort_pairs via the packed representation: 7 sort operands / 4 key
    words instead of 9 operands / 6 key words (measured equal-speed on
    one chip; the win is collective bytes — multi-chip steps gather the
    packed planes, 22% less ICI traffic, and sort once after).

    Reproduces sort_pairs' postings order provided the flat (row-major)
    input order is (sid, bgn)-ordered — true for every caller: batch
    rows carry ascending rids and mers are position-ordered in a row.
    """
    return unpack_pair_table(sort_packed_planes(pack_pair_planes(pairs, sid)))


def recompact_mers(x_hi, x_lo, y_lo, keep):
    """Re-compact already-compacted (B, C) planes after a filter pass:
    single payload sort by global position (invalid -> max)."""
    gpos = jnp.where(keep, y_lo >> 1, jnp.uint32(0xFFFFFFFF))
    gpos2, xh, xl, yl = jax.lax.sort((gpos, x_hi, x_lo, y_lo), num_keys=1)
    valid = gpos2 != jnp.uint32(0xFFFFFFFF)
    return xh, xl, yl, valid
