"""Query engine: sketch a query fragment, look up shimmer-pair anchors in
the index, count-filter, and chain per target sequence.

Semantics of the reference (pgr-db/src/seq_db.rs:1198-1257 and
pgr-db/src/aln.rs:147-242).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from . import sketch as sketch_mod
from .spec import ShmmrSpec

FragmentSignature = Tuple[int, int, int, int, int]
FragmentHit = Tuple[Tuple[int, int], Tuple[int, int, int], List[FragmentSignature]]


def pair_shmmrs_canonical(mers) -> List[Tuple[int, int, int, int, int]]:
    """Consecutive shimmer pairs as (hash0, hash1, pos0, pos1, orientation)
    with canonical hash ordering (reference: seq_db.rs:1206-1218)."""
    out = []
    for i in range(len(mers) - 1):
        x0, y0 = mers[i]
        x1, y1 = mers[i + 1]
        s0, s1 = x0 >> 8, x1 >> 8
        p0 = ((y0 & 0xFFFFFFFF) >> 1) + 1
        p1 = ((y1 & 0xFFFFFFFF) >> 1) + 1
        if s0 < s1:
            out.append((s0, s1, p0, p1, 0))
        elif s0 > s1:
            out.append((s1, s0, p0, p1, 1))
        else:
            # equal hashes: reference's `if s0 <= s1` branch in queries uses
            # strict `<` (seq_db.rs:1213) => orientation 1 on ties there,
            # but `<=` (orientation 0) in the index builder (seq_db.rs:391).
            out.append((s0, s1, p0, p1, 1))
    return out


def raw_query_fragment(
    lookup, query_seq: bytes, spec: ShmmrSpec
) -> List[FragmentHit]:
    """lookup: callable (hash0, hash1) -> list of FragmentSignature,
    optionally carrying a vectorized `.many(s0_arr, s1_arr)` variant
    (api.py's columnar lookup does) — one batched searchsorted instead
    of a numpy call pair per query key.
    (reference: seq_db.rs:1200-1228)"""
    many = getattr(lookup, "many", None)
    if many is not None:
        # vectorized: mer arrays -> canonical pair key arrays -> ONE
        # batched lookup.  Query tie-break is strict `<` (ties ->
        # orientation 1, reference seq_db.rs:1213) vs the builder's `<=`
        mx, my = sketch_mod.sequence_to_shmmrs_arrays(0, query_seq, spec, False)
        if len(mx) < 2:
            return []
        h = mx >> np.uint64(8)
        p = ((my & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(np.int64) + 1
        s0, s1 = h[:-1], h[1:]
        swap = s0 >= s1
        k0 = np.where(swap, s1, s0)
        k1 = np.where(swap, s0, s1)
        sig_lists = many(k0, k1)
        return list(
            zip(
                zip(k0.tolist(), k1.tolist()),
                zip(p[:-1].tolist(), p[1:].tolist(),
                    swap.astype(np.int64).tolist()),
                sig_lists,
            )
        )
    mers = sketch_mod.sequence_to_shmmrs(0, query_seq, spec, False)
    out: List[FragmentHit] = []
    for s0, s1, p0, p1, ori in pair_shmmrs_canonical(mers):
        sigs = lookup(s0, s1)
        out.append(((s0, s1), (p0, p1, ori), sigs))
    return out


def get_match_positions_with_fragment(
    lookup, query_seq: bytes, spec: ShmmrSpec
) -> Dict[int, List[Tuple[int, int, int]]]:
    """(reference: seq_db.rs:1271-1289)"""
    res: Dict[int, List[Tuple[int, int, int]]] = {}
    for _pair, (_p0, _p1, q_dir), sigs in raw_query_fragment(
        lookup, query_seq, spec
    ):
        for _fid, sid, p0, p1, direction in sigs:
            d = 0 if direction == q_dir else 1
            res.setdefault(sid, []).append((p0, p1, d))
    for v in res.values():
        v.sort()
    return res


HitPair = Tuple[Tuple[int, int, int], Tuple[int, int, int]]


def collect_target_hits(
    raw_query_hits: List[FragmentHit],
    max_count: Optional[int] = None,
    max_count_query: Optional[int] = None,
    max_count_target: Optional[int] = None,
) -> Dict[int, List[HitPair]]:
    """Count-filter raw hits into per-target anchor lists (the stage of
    aln.rs:147-199 before chaining): drop shimmer pairs that occur too
    often in the query or on a given target."""
    pair_count: Dict[Tuple[int, int], int] = {}
    target_pair_count: Dict[Tuple[int, int, int], int] = {}
    for pair, _qpos, sigs in raw_query_hits:
        pair_count[pair] = pair_count.get(pair, 0) + 1
        for _fid, sid, _b, _e, _o in sigs:
            key = (pair[0], pair[1], sid)
            target_pair_count[key] = target_pair_count.get(key, 0) + 1

    max_count = 128 if max_count is None else max_count
    max_count_query = 128 if max_count_query is None else max_count_query
    max_count_target = 128 if max_count_target is None else max_count_target

    target_hits: Dict[int, List[HitPair]] = {}
    for pair, qpos, sigs in raw_query_hits:
        count = pair_count.get(pair, 0)
        if count > max_count or count > max_count_query:
            continue
        left = qpos
        for _fid, sid, p0, p1, orientation in sigs:
            if target_pair_count.get((pair[0], pair[1], sid), 0) > max_count_target:
                continue
            target_hits.setdefault(sid, []).append(
                (left, (p0, p1, orientation))
            )
    return target_hits


def query_fragment_to_hps(
    raw_query_hits: List[FragmentHit],
    penalty: float,
    max_count: Optional[int] = None,
    max_count_query: Optional[int] = None,
    max_count_target: Optional[int] = None,
    max_aln_span: Optional[int] = None,
    max_gap: Optional[int] = None,
    oriented: bool = False,
) -> List[Tuple[int, List[Tuple[float, List[HitPair]]]]]:
    """Count-filter raw hits and chain per target (reference: aln.rs:147-242).

    Returns [(target_sid, [(score, [HitPair])])] sorted by sid (the
    reference emits hash-map order; sid order is our canonical order).
    """
    target_hits = collect_target_hits(
        raw_query_hits, max_count, max_count_query, max_count_target
    )
    span = 8 if max_aln_span is None else max_aln_span
    out = []
    from ..native import api as native

    use_native = native.available()
    for sid in sorted(target_hits):
        hps = target_hits[sid]
        if len(hps) <= 1:
            continue
        if use_native:
            arr = np.asarray([[*a, *b] for a, b in hps], dtype=np.uint32)
            chains = native.sparse_aln(arr, span, penalty, max_gap, oriented)
            chains = [
                (
                    score,
                    [
                        ((int(r[0]), int(r[1]), int(r[2])),
                         (int(r[3]), int(r[4]), int(r[5])))
                        for r in track
                    ],
                )
                for score, track in chains
            ]
        else:
            from . import aln_ref

            chains = aln_ref.sparse_aln(list(hps), span, penalty, max_gap, oriented)
        out.append((sid, chains))
    return out
