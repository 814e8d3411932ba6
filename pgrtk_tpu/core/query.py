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


def _store_ckeys(store):
    """Cached combined lexicographic keys for a columnar store (the
    per-call rebuild in api._columnar_lookup costs O(n_keys) per
    query — measurable at pangenome scale)."""
    ck = getattr(store, "_pair_ckeys", None)
    if ck is None:
        from ..utils.u64pair import pair_ckeys

        ck = pair_ckeys(store.index_keys)
        store._pair_ckeys = ck
    return ck


def query_fragment_to_hps_columnar(
    store,
    query_seq: bytes,
    spec: ShmmrSpec,
    penalty: float,
    max_count: Optional[int] = None,
    max_count_query: Optional[int] = None,
    max_count_target: Optional[int] = None,
    max_aln_span: Optional[int] = None,
    max_gap: Optional[int] = None,
    oriented: bool = False,
    as_arrays: bool = False,
):
    """query_fragment_to_hps over a columnar FRG/PGA store with ZERO
    per-signature Python: sketch -> pair arrays -> one searchsorted ->
    vectorized postings expansion (repeat/cumsum block gather) ->
    vectorized count filters -> per-target anchor ARRAYS straight into
    the native chain DP.  Bit-identical output to the tuple path (same
    semantics as aln.rs:147-242); the tuple path's dict/list loops cost
    ~10 us/signature and dominated 50-Mbase CLI queries.

    Count-filter equivalences (exact): pair_count is per pair KEY over
    the whole query (np.unique on combined keys); target_pair_count for
    a surviving key equals its kept-hit count per sid because the
    max_count filter keeps or drops ALL occurrences of a key together.
    """
    from . import sketch as sketch_mod
    from ..native import api as native
    from ..utils.u64pair import cols_ckeys

    mx, my = sketch_mod.sequence_to_shmmrs_arrays(0, query_seq, spec, False)
    if len(mx) < 2:
        return []
    h = mx >> np.uint64(8)
    p = ((my & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(np.int64) + 1
    s0, s1 = h[:-1], h[1:]
    swap = s0 >= s1  # query tie-break: strict `<` (seq_db.rs:1213)
    k0 = np.where(swap, s1, s0)
    k1 = np.where(swap, s0, s1)
    q_bgn = p[:-1].astype(np.uint32)
    q_end = p[1:].astype(np.uint32)
    q_ori = swap.astype(np.uint32)

    cq = cols_ckeys(k0, k1)
    _u, inv, cnts = np.unique(cq, return_inverse=True, return_counts=True)
    pcount = cnts[inv]
    mc = 128 if max_count is None else max_count
    mcq = 128 if max_count_query is None else max_count_query
    mct = 128 if max_count_target is None else max_count_target
    keep = ~((pcount > mc) | (pcount > mcq))

    ckeys = _store_ckeys(store)
    n_keys = len(ckeys)
    if n_keys == 0:
        return []
    js = np.searchsorted(ckeys, cq, side="left")
    js_c = np.minimum(js, n_keys - 1)
    found = (js < n_keys) & (ckeys[js_c] == cq)
    sel = np.flatnonzero(keep & found)
    if sel.size == 0:
        return []
    js_s = js[sel].astype(np.int64)
    c_i = store.index_counts[js_s].astype(np.int64)
    s_i = store.index_starts[js_s].astype(np.int64)
    H = int(c_i.sum())
    if H == 0:
        return []
    reps = np.repeat(np.arange(len(js_s)), c_i)
    offs = np.zeros(len(js_s), dtype=np.int64)
    np.cumsum(c_i[:-1], out=offs[1:])
    sigs = store.index_sigs
    if isinstance(sigs, np.ndarray):
        rows = s_i[reps] + (np.arange(H, dtype=np.int64) - offs[reps])
        sg = sigs[rows]  # structured: frg_id,seq_id,bgn,end,orientation
    else:
        # lazy mmap store (core/mdb.py MdbLazy): postings page in as
        # contiguous per-key block slices
        sg = np.concatenate(
            [
                np.asarray(sigs[int(a): int(a) + int(c)])
                for a, c in zip(s_i, c_i)
            ]
        )
    sid = sg["seq_id"].astype(np.int64)

    # per-(key, sid) count over this query's hits (== the reference's
    # target_pair_count for every surviving key; see docstring)
    comb = js_s[reps] * (sid.max() + 1) + sid
    _u2, inv2, c2 = np.unique(comb, return_inverse=True, return_counts=True)
    tok = c2[inv2] <= mct
    anchors = np.empty((H, 6), dtype=np.uint32)
    anchors[:, 0] = q_bgn[sel][reps]
    anchors[:, 1] = q_end[sel][reps]
    anchors[:, 2] = q_ori[sel][reps]
    anchors[:, 3] = sg["bgn"]
    anchors[:, 4] = sg["end"]
    anchors[:, 5] = sg["orientation"]
    anchors = anchors[tok]
    sid = sid[tok]
    if anchors.shape[0] == 0:
        return []
    order = np.argsort(sid, kind="stable")  # keeps reference hit order
    anchors = anchors[order]
    sid = sid[order]
    u_sid, first = np.unique(sid, return_index=True)
    bounds = np.append(first, len(sid))

    span = 8 if max_aln_span is None else max_aln_span
    use_native = native.available()
    out = []
    for gi in range(len(u_sid)):
        a = anchors[bounds[gi]: bounds[gi + 1]]
        if a.shape[0] <= 1:
            continue
        if use_native:
            chains = native.sparse_aln(a, span, penalty, max_gap, oriented)
        else:
            from . import aln_ref

            hps = [
                ((int(r[0]), int(r[1]), int(r[2])),
                 (int(r[3]), int(r[4]), int(r[5])))
                for r in a
            ]
            chains = [
                (s, np.asarray(
                    [[*q, *t] for q, t in track], dtype=np.uint32
                ).reshape(-1, 6))
                for s, track in aln_ref.sparse_aln(
                    hps, span, penalty, max_gap, oriented
                )
            ]
        if as_arrays:
            chains = [(float(s), np.asarray(t, np.uint32)) for s, t in chains]
        else:
            chains = [
                (
                    s,
                    [
                        ((int(r[0]), int(r[1]), int(r[2])),
                         (int(r[3]), int(r[4]), int(r[5])))
                        for r in track
                    ],
                )
                for s, track in chains
            ]
        out.append((int(u_sid[gi]), chains))
    return out


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
