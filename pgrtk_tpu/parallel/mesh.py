"""Device mesh construction and sharded pipeline steps.

The reference is single-node rayon data parallelism (SURVEY §2.3); the
TPU-native scale-out axis is the same one — sequences/queries — sharded
over a 1-D ("data",) jax.sharding.Mesh.  The SHIMMER index is replicated
per device in v1 (HPRC-year-1 scale fits HBM; matches reference mmap
semantics); cross-device reductions ride ICI collectives:
  - psum for pair/coverage counts
  - all_gather for merged hit lists
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import pairs as pairs_ops
from ..ops import sketch as sketch_ops

U32 = jnp.uint32


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_sketch_index_step(
    mesh: Mesh,
    k: int = 56,
    r: int = 4,
    min_span: int = 64,
    chunk: int = 512,
):
    """Build the jitted multi-chip indexing step.

    The returned fn maps (seqs_u8 (B, L), lengths (B,), rids (B,)) — B
    sharded over the data axis — to a dict with the locally-sorted pair
    table (sharded) and globally psum-reduced statistics.  This is the
    flagship "one training step equivalent": sketch -> compact ->
    min_span filter -> pair -> sort -> global stats, all on device.
    """
    from jax import shard_map

    axis = mesh.axis_names[0]

    def local_step(seqs_u8, lengths, rids):
        out = sketch_ops.sketch_mode2_dense(
            seqs_u8, lengths, rids, k, r, min_span, chunk
        )
        xh, xl, yl, valid, ovf = pairs_ops.compact_mers_packed(
            out["x_hi"], out["x_lo"], out["y_lo"], out["selected"]
        )
        keep = pairs_ops.min_span_filter_gapped(xh, xl, yl, valid, min_span)
        # pair consecutive KEPT mers directly (jump-pointer next-kept
        # propagation) — the whole path to the key sort is sort-free
        pr = pairs_ops.pair_mers_gapped(xh, xl, yl, keep)
        local = pairs_ops.sort_pairs(pr, rids)
        n_pairs_local = pr["pair_valid"].sum()
        n_mers_local = keep.sum()
        n_pairs = jax.lax.psum(n_pairs_local, axis)
        n_mers = jax.lax.psum(n_mers_local, axis)
        # any-shard overflow: callers must rebuild via the exact host
        # path when set (block-local slot loss is not silent)
        overflow = jax.lax.psum(ovf.astype(jnp.int32), axis) > 0
        # replicated-index v1: gather every shard's pairs and sort the full
        # table on each device (the merged sorted table IS the index)
        gathered = {
            kk: jax.lax.all_gather(v, axis, tiled=True)
            for kk, v in local.items()
        }
        operands = (
            gathered["k0_hi"],
            gathered["k0_lo"],
            gathered["k1_hi"],
            gathered["k1_lo"],
            gathered["sid"],
            gathered["bgn"],
            gathered["end"],
            gathered["orientation"],
            gathered["valid"].astype(U32),
        )
        k0h, k0l, k1h, k1l, s, b, e, o, va = jax.lax.sort(
            operands, num_keys=6
        )
        table = dict(
            valid=va == 1,
            k0_hi=k0h, k0_lo=k0l, k1_hi=k1h, k1_lo=k1l,
            sid=s, bgn=b, end=e, orientation=o,
        )
        return dict(table=table, n_pairs=n_pairs, n_mers=n_mers,
                    overflow=overflow)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis)),
        out_specs=dict(
            table={
                kk: P()
                for kk in (
                    "valid", "k0_hi", "k0_lo", "k1_hi", "k1_lo", "sid",
                    "bgn", "end", "orientation",
                )
            },
            n_pairs=P(),
            n_mers=P(),
            overflow=P(),
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_query_count_step(mesh: Mesh, k: int = 56, r: int = 4,
                             min_span: int = 64, chunk: int = 512):
    """Multi-chip query step: sketch the (sharded) query batch against a
    replicated sorted key table; per-shard hit counts are merged with
    psum and the per-query hit mask all_gathered."""
    from jax import shard_map

    axis = mesh.axis_names[0]

    def local_step(seqs_u8, lengths, rids, key_hi0, key_lo0, key_hi1, key_lo1):
        out = sketch_ops.sketch_mode2_dense(
            seqs_u8, lengths, rids, k, r, min_span, chunk
        )
        xh, xl, yl, valid, _ovf = pairs_ops.compact_mers_packed(
            out["x_hi"], out["x_lo"], out["y_lo"], out["selected"]
        )
        keep = pairs_ops.min_span_filter_gapped(xh, xl, yl, valid, min_span)
        pr = pairs_ops.pair_mers_gapped(xh, xl, yl, keep)
        # vectorized binary search of each pair key in the replicated table
        hit = _searchsorted_pairkey(
            key_hi0, key_lo0, key_hi1, key_lo1,
            pr["k0_hi"], pr["k0_lo"], pr["k1_hi"], pr["k1_lo"],
        )
        hit = hit & pr["pair_valid"]
        n_hits = jax.lax.psum(hit.sum(), axis)
        all_hits = jax.lax.all_gather(hit, axis, tiled=True)
        return n_hits, all_hits

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(axis, None), P(axis), P(axis), P(), P(), P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_query_probe_step(mesh: Mesh, bits: int, k: int = 56,
                             r: int = 4, min_span: int = 64,
                             chunk: int = 512):
    """Multi-chip query step against a replicated bucketed PROBE table
    (ops/probe.py) — the production TPU path: one aligned row fetch +
    W-wide compare per pair key instead of a gather-bound binary search.

    The returned fn takes (seqs_u8, lengths, rids, p0, p1, p2, p3) with
    p* the (2^bits, W) probe planes (replicated)."""
    from jax import shard_map

    from ..ops import probe as probe_ops

    axis = mesh.axis_names[0]

    def local_step(seqs_u8, lengths, rids, p0, p1, p2, p3):
        out = sketch_ops.sketch_mode2_dense(
            seqs_u8, lengths, rids, k, r, min_span, chunk
        )
        xh, xl, yl, valid, _ovf = pairs_ops.compact_mers_packed(
            out["x_hi"], out["x_lo"], out["y_lo"], out["selected"]
        )
        keep = pairs_ops.min_span_filter_gapped(xh, xl, yl, valid, min_span)
        pr = pairs_ops.pair_mers_gapped(xh, xl, yl, keep)
        B, C = pr["k0_hi"].shape
        table = dict(bits=bits, planes=[p0, p1, p2, p3], row=None)
        found = probe_ops.probe_found(
            table,
            pr["k0_hi"].reshape(-1), pr["k0_lo"].reshape(-1),
            pr["k1_hi"].reshape(-1), pr["k1_lo"].reshape(-1),
        )
        hit = found.reshape(B, C) & pr["pair_valid"]
        n_hits = jax.lax.psum(hit.sum(), axis)
        all_hits = jax.lax.all_gather(hit, axis, tiled=True)
        return n_hits, all_hits

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(axis, None), P(axis), P(axis), P(), P(), P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def _searchsorted_pairkey(t_h0, t_l0, t_h1, t_l1, q_h0, q_l0, q_h1, q_l1):
    """Does each query pair key exist in the sorted table?  128-bit keys as
    4 u32 planes; lexicographic binary search, fully vectorized."""
    # 128-bit lexicographic lower_bound by explicit binary search over the
    # 4 u32 planes (jnp.searchsorted only handles single-plane keys).
    n = t_h0.shape[0]
    n_steps = max(1, int(np.ceil(np.log2(n + 1))))

    def t_less_q(idx):
        th0, tl0 = t_h0[idx], t_l0[idx]
        th1, tl1 = t_h1[idx], t_l1[idx]
        return (
            (th0 < q_h0)
            | ((th0 == q_h0) & (tl0 < q_l0))
            | ((th0 == q_h0) & (tl0 == q_l0) & (th1 < q_h1))
            | (
                (th0 == q_h0)
                & (tl0 == q_l0)
                & (th1 == q_h1)
                & (tl1 < q_l1)
            )
        )

    lo = jnp.zeros(q_h0.shape, dtype=jnp.int32)
    hi = jnp.full(q_h0.shape, n, dtype=jnp.int32)
    for _ in range(n_steps):
        active = lo < hi
        mid = jnp.clip((lo + hi) // 2, 0, n - 1)
        less = t_less_q(mid)
        lo = jnp.where(active & less, mid + 1, lo)
        hi = jnp.where(active & ~less, mid, hi)
    idx = jnp.clip(lo, 0, n - 1)
    found = (
        (lo < n)
        & (t_h0[idx] == q_h0)
        & (t_l0[idx] == q_l0)
        & (t_h1[idx] == q_h1)
        & (t_l1[idx] == q_l1)
    )
    return found


def sharded_index_v2_step(
    mesh: Mesh,
    shard_capacity: int,
    k: int = 56,
    r: int = 4,
    min_span: int = 64,
    chunk: int = 512,
):
    """Memory-scalable index build (sharding v2, docs/ROADMAP.md):
    each device keeps only ITS hash range of the global pair table.

    Every device sketches/pairs its local sequences, the per-shard
    tables are all_gathered and key-sorted once (transiently full-size,
    as in v1), and each device then dynamic-slices the contiguous run
    of keys whose hash0 falls in its 1/n_devices range — hashes are
    uniform, so ranges are balanced; `shard_capacity` (entries per
    device) needs only ~2x slack.  Steady-state index memory is
    shard_capacity per device instead of the full table.

    Returns dict(shard=<per-device table planes, sharded along axis>,
    n_pairs, shard_overflow).
    """
    from jax import shard_map

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def local_step(seqs_u8, lengths, rids):
        out = sketch_ops.sketch_mode2_dense(
            seqs_u8, lengths, rids, k, r, min_span, chunk
        )
        xh, xl, yl, valid, _ovf = pairs_ops.compact_mers_packed(
            out["x_hi"], out["x_lo"], out["y_lo"], out["selected"]
        )
        keep = pairs_ops.min_span_filter_gapped(xh, xl, yl, valid, min_span)
        pr = pairs_ops.pair_mers_gapped(xh, xl, yl, keep)
        local = pairs_ops.sort_pairs(pr, rids)
        gathered = {
            kk: jax.lax.all_gather(v, axis, tiled=True)
            for kk, v in local.items()
        }
        operands = (
            gathered["k0_hi"], gathered["k0_lo"],
            gathered["k1_hi"], gathered["k1_lo"],
            gathered["sid"], gathered["bgn"], gathered["end"],
            gathered["orientation"], gathered["valid"].astype(U32),
        )
        k0h, k0l, k1h, k1l, s, b, e, o, va = jax.lax.sort(
            operands, num_keys=6
        )
        # my contiguous hash range: hash0 in [i, i+1) * 2^56 / n_dev.
        # k0_hi holds hash0 >> 32 (24 significant bits) and the table is
        # key-sorted, so range bounds are single-plane searchsorted.
        i = jax.lax.axis_index(axis).astype(jnp.uint32)
        per = jnp.uint32((1 << 24) // n_dev)
        lo_key = i * per
        hi_key = jnp.where(
            i == n_dev - 1, jnp.uint32(0xFFFFFFFF), (i + 1) * per
        )
        lo = jnp.searchsorted(k0h, lo_key, side="left")
        hi = jnp.searchsorted(k0h, hi_key, side="left")
        n_mine = hi - lo
        shard_overflow = jax.lax.psum(
            (n_mine > shard_capacity).astype(jnp.int32), axis
        ) > 0
        start = jnp.clip(
            lo, 0, max(0, k0h.shape[0] - shard_capacity)
        ).astype(jnp.int32)

        def slc(v):
            return jax.lax.dynamic_slice(v, (start,), (shard_capacity,))

        # membership from the sliced keys themselves (the slice start is
        # clamped, so slot 0 is not necessarily the range start)
        sk0h = slc(k0h)
        in_range = (sk0h >= lo_key) & (
            (sk0h < hi_key) | (i == n_dev - 1)
        )
        shard = dict(
            valid=slc(va).astype(bool) & in_range,
            k0_hi=slc(k0h), k0_lo=slc(k0l),
            k1_hi=slc(k1h), k1_lo=slc(k1l),
            sid=slc(s), bgn=slc(b), end=slc(e), orientation=slc(o),
        )
        n_pairs = jax.lax.psum(shard["valid"].sum(), axis)
        return dict(
            shard=shard, n_pairs=n_pairs, shard_overflow=shard_overflow
        )

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis)),
        out_specs=dict(
            shard={kk: P(axis) for kk in (
                "valid", "k0_hi", "k0_lo", "k1_hi", "k1_lo", "sid",
                "bgn", "end", "orientation",
            )},
            n_pairs=P(),
            shard_overflow=P(),
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_query_v2_step(
    mesh: Mesh,
    shard_capacity: int,
    k: int = 56,
    r: int = 4,
    min_span: int = 64,
    chunk: int = 512,
):
    """Query fan-out against the hash-range-sharded v2 index: queries
    are sketched where they live, query KEYS are all_gathered (keys are
    tiny next to sequences), every device probes its own shard with the
    binary search, and per-device hit masks OR-combine with psum.

    Takes (seqs_u8, lengths, rids, <9 sharded shard planes>) and
    returns (n_hits, found mask over the gathered query pair slots).
    """
    from jax import shard_map

    axis = mesh.axis_names[0]

    def local_step(seqs_u8, lengths, rids, va, k0h, k0l, k1h, k1l):
        out = sketch_ops.sketch_mode2_dense(
            seqs_u8, lengths, rids, k, r, min_span, chunk
        )
        xh, xl, yl, valid, _ovf = pairs_ops.compact_mers_packed(
            out["x_hi"], out["x_lo"], out["y_lo"], out["selected"]
        )
        keep = pairs_ops.min_span_filter_gapped(xh, xl, yl, valid, min_span)
        pr = pairs_ops.pair_mers_gapped(xh, xl, yl, keep)
        B, C = pr["k0_hi"].shape

        def gq(v):
            return jax.lax.all_gather(v.reshape(-1), axis, tiled=True)

        q0h, q0l, q1h, q1l = (gq(pr[kk]) for kk in
                              ("k0_hi", "k0_lo", "k1_hi", "k1_lo"))
        q_valid = gq(pr["pair_valid"])
        # invalid shard slots carry 0xFFFFFFFF keys (sort_pairs upstream),
        # so the table stays sorted and the search needs no masking
        hit = _searchsorted_pairkey(
            k0h, k0l, k1h, k1l, q0h, q0l, q1h, q1l
        )
        found = jax.lax.psum(
            (hit & q_valid).astype(jnp.int32), axis
        ) > 0
        n_hits = found.sum()
        return n_hits, found

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(axis, None), P(axis), P(axis),
            P(axis), P(axis), P(axis), P(axis), P(axis),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
