"""Device end-to-end query pipeline: sketch -> pair -> probe -> postings
expansion -> count filter -> batched chain DP, all inside one jit.

This is the full query path of the reference (seq_db.rs:1198-1257 raw
query + aln.rs:147-242 count filter and per-target sparse chain DP), not
just probe membership.  Shape strategy:

  * query pairs are rank-extracted to a dense (B, Pc) stream (the 24k
    gapped pair stream at mode-2 density is ~83% padding — compaction
    cuts the chain scan depth 5x);
  * each probed key's postings live in ONE row of a (n_keys+1, 2C) u32
    plane, slot c <-> target sid c, so expansion is a single aligned
    row gather per query pair (no per-signature scalar gathers) and the
    per-target anchor groups fall out as (b, c) lanes with anchors
    already in q_bgn order (pair emission order);
  * chaining is ops/chain.py's chain_scores_fast over G = B*C lanes
    (invalid slots do not consume window entries), with the dup/evict
    flags folded into the result for the caller's fallback contract.

The slot-aligned postings layout fixes the sid of slot c, so it requires
per-(key, sid) multiplicity <= 1; build_synth_index drops violating keys
(and reports how many).  The in-query duplicate-pair count filter
(aln.rs's max_count/max_count_query over occurrences of a pair within
one query) is NOT applied on device — synthetic uniform sequences have
no duplicate pairs; production batch queries go through
parallel/device_query.py which applies it on host.  The per-target
count filter (max_count_target) is enforced structurally: multiplicity
is <= 1 per (key, sid) by construction, far below the 128 default.
"""
from __future__ import annotations

import numpy as np

from .chain import chain_scores_fast
from .pairs import (
    _rank_extract_planes,
    min_span_filter_gapped,
    pair_mers_gapped,
)
from .probe import build_probe_table_dense, probe_keys_dense
from .sketch import sketch_compact_mode2


def build_synth_index(
    target_seqs: np.ndarray,
    k: int = 56,
    r: int = 4,
    min_span: int = 64,
    n_decoys: int = 0,
    seed: int = 7,
    build_lookup: bool = True,
):
    """Host-side index build over (T, L) uint8 2-bit target sequences.

    Sketches each target with the bit-exact host arbiter, forms builder-
    canonical pairs (tie -> orientation 0, seq_db.rs:391), keeps keys
    whose per-(key, sid) multiplicity is <= 1, pads the key set with
    `n_decoys` random never-hit keys (so probe cost matches a production
    index much larger than the batch), and returns:

      keys      (n_keys, 2) u64 key-sorted
      postings  (n_keys+1, 2C) u32 — [:, :C] = ori<<31|t_bgn,
                [:, C:] = valid<<31|t_end; slot c <-> sid c; the last
                row is the not-found sentinel
      lookup    dict (k0, k1) -> [(0, sid, bgn, end, ori), ...] for the
                host parity pipeline
      probe     dict from ops.probe.build_probe_table
      n_multi_dropped
    """
    from ..core import sketch as sketch_mod
    from ..core.spec import ShmmrSpec

    spec = ShmmrSpec(80, k, r, min_span, True)
    T, _L = target_seqs.shape
    C = T
    BASES = b"ACGT"
    per_key: dict = {}
    for sid in range(T):
        seq = bytes(bytearray(BASES[b] for b in target_seqs[sid]))
        mx, my = sketch_mod.sequence_to_shmmrs_arrays(sid, seq, spec, False)
        if len(mx) < 2:
            continue
        h = (mx >> np.uint64(8)).astype(np.uint64)
        p = ((my & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(
            np.int64
        ) + 1
        s0, s1 = h[:-1], h[1:]
        swap = s0 > s1  # builder tie-break: s0 <= s1 -> orientation 0
        k0 = np.where(swap, s1, s0)
        k1 = np.where(swap, s0, s1)
        for i in range(len(k0)):
            per_key.setdefault((int(k0[i]), int(k1[i])), []).append(
                (sid, int(p[i]), int(p[i + 1]), int(swap[i]))
            )

    keys_list = []
    postings_list = []
    lookup = {}
    n_multi = 0
    for key, sigs in per_key.items():
        sids = [s[0] for s in sigs]
        if len(sids) != len(set(sids)):
            n_multi += 1
            continue
        keys_list.append(key)
        postings_list.append(sigs)
        lookup[key] = [
            (0, sid, bgn, end, ori)
            for sid, bgn, end, ori in sorted(sigs)
        ]

    rng = np.random.default_rng(seed)
    n_real = len(keys_list)
    real_keys = np.asarray(keys_list, dtype=np.uint64).reshape(-1, 2)
    if n_decoys:
        # vectorized decoys, each with one random single-slot posting.
        # Collisions with real keys are ~n_real*n_decoys/2^112 — only the
        # parity-tested path (build_lookup) screens them.
        dk = rng.integers(0, 1 << 56, size=(n_decoys, 2), dtype=np.uint64)
        d_sid = rng.integers(0, C, size=n_decoys)
        d_bgn = rng.integers(1, 1 << 20, size=n_decoys).astype(np.uint32)
        d_end = d_bgn + rng.integers(64, 4096, size=n_decoys).astype(
            np.uint32
        )
        d_ori = rng.integers(0, 2, size=n_decoys).astype(np.uint32)
        if build_lookup:
            existing = set(map(tuple, real_keys.tolist()))
            keep = np.asarray(
                [tuple(kk) not in existing for kk in dk.tolist()]
            )
            dk, d_sid, d_bgn, d_end, d_ori = (
                dk[keep], d_sid[keep], d_bgn[keep], d_end[keep], d_ori[keep]
            )
            for i in range(len(dk)):
                lookup[(int(dk[i, 0]), int(dk[i, 1]))] = [
                    (0, int(d_sid[i]), int(d_bgn[i]), int(d_end[i]),
                     int(d_ori[i]))
                ]
        keys = np.concatenate([real_keys, dk], axis=0)
    else:
        keys = real_keys

    order = np.lexsort((keys[:, 1], keys[:, 0]))
    keys = keys[order]
    inv = np.empty(len(keys), dtype=np.int64)
    inv[order] = np.arange(len(keys))

    n = len(keys)
    postings = np.zeros((n + 1, 2 * C), dtype=np.uint32)
    for i, sigs in enumerate(postings_list):
        row = inv[i]
        for sid, bgn, end, ori in sigs:
            postings[row, sid] = (np.uint32(ori) << 31) | np.uint32(bgn)
            postings[row, C + sid] = np.uint32(1 << 31) | np.uint32(end)
    if n_decoys:
        drow = inv[n_real:]
        postings[drow, d_sid] = (d_ori << np.uint32(31)) | d_bgn
        postings[drow, C + d_sid] = np.uint32(1 << 31) | d_end

    probe = build_probe_table_dense(keys)
    return dict(
        keys=keys,
        postings=postings,
        lookup=lookup if build_lookup else None,
        probe=probe,
        C=C,
        n_multi_dropped=n_multi,
    )


def dup_pair_counts(k_planes, valid):
    """Per-QUERY duplicate-pair counts: for every (B, Pc) slot, how many
    times its 4-u32-plane pair key occurs among the same row's valid
    slots (aln.rs's pair_count over one query's pair list).  Sort each
    row by key with the slot index as payload, run lengths via log-shift
    segment propagation, unsort.  Invalid slots count in their own
    all-ones segment (masked by validity downstream).

    Used by both the single-chip (ops/query_e2e.py) and the sharded
    (parallel/mesh.py) end-to-end query steps — the count must be per
    query row, NOT across the local batch (a cross-query count merges
    duplicate runs from different queries and over-filters).
    """
    import jax
    import jax.numpy as jnp

    B, Pc = valid.shape
    FF = jnp.uint32(0xFFFFFFFF)
    mk = [jnp.where(valid, p, FF) for p in k_planes]
    slot_iota = jnp.broadcast_to(
        jnp.arange(Pc, dtype=jnp.int32)[None, :], (B, Pc)
    )
    s0, s1, s2, s3, sperm = jax.lax.sort(
        (mk[0], mk[1], mk[2], mk[3], slot_iota), num_keys=4
    )
    newseg = jnp.concatenate(
        [
            jnp.ones((B, 1), jnp.bool_),
            (s0[:, 1:] != s0[:, :-1]) | (s1[:, 1:] != s1[:, :-1])
            | (s2[:, 1:] != s2[:, :-1]) | (s3[:, 1:] != s3[:, :-1]),
        ],
        axis=1,
    )
    idxp = jnp.broadcast_to(
        jnp.arange(Pc, dtype=jnp.int32)[None, :], (B, Pc)
    )
    seg_start = jnp.where(newseg, idxp, 0)
    seg_end = jnp.where(
        jnp.concatenate(
            [newseg[:, 1:], jnp.ones((B, 1), jnp.bool_)], axis=1
        ),
        idxp, Pc - 1,
    )
    d = 1
    while d < Pc:
        seg_start = jnp.maximum(
            seg_start,
            jnp.concatenate(
                [jnp.zeros((B, d), jnp.int32), seg_start[:, :-d]], axis=1
            ),
        )
        seg_end = jnp.minimum(
            seg_end,
            jnp.concatenate(
                [seg_end[:, d:], jnp.full((B, d), Pc - 1, jnp.int32)],
                axis=1,
            ),
        )
        d *= 2
    rl_sorted = seg_end - seg_start + 1
    _, run_len = jax.lax.sort((sperm, rl_sorted), num_keys=1)
    return run_len


def query_e2e_step(
    seqs_u8,
    lens,
    probe_bits: int,
    probe_planes,
    probe_fence,
    postings,
    C: int,
    k: int = 56,
    r: int = 4,
    min_span: int = 64,
    chunk: int = 512,
    slots2: int = 384,
    penalty: float = 0.025,
    lookback: int = 32,
    max_span: int = 8,
    unroll: int = 8,
    max_count: int = 128,
    max_count_query: int = 128,
    max_count_target: int = 128,
):
    """One full device query step (traceable; callers jit it).

    Returns dict with anchors (G, N, 6) u32, gvalid (G, N) bool, scores
    (G, N) f32, prev (G, N) i32, dup (G,) bool, inexact (G,) bool,
    overflow () bool, where G = B*C lanes (query b, target sid c) and N
    is the compacted pair capacity.
    """
    import jax
    import jax.numpy as jnp

    B = seqs_u8.shape[0]
    xh, xl, yl, valid, ovf = sketch_compact_mode2(
        seqs_u8, lens, k, r, min_span, chunk
    )
    keep = min_span_filter_gapped(xh, xl, yl, valid, min_span)
    pr = pair_mers_gapped(xh, xl, yl, keep, tie_orientation_one=True)

    planes = (
        pr["k0_hi"], pr["k0_lo"], pr["k1_hi"], pr["k1_lo"],
        pr["bgn"], pr["end"], pr["orientation"],
    )
    cp, cvalid, ovf2 = _rank_extract_planes(
        planes, pr["pair_valid"], 512, slots2
    )
    q_h0, q_l0, q_h1, q_l1, q_bgn, q_end, q_ori = cp
    Pc = q_h0.shape[1]

    table = dict(bits=probe_bits, planes=probe_planes, fence=probe_fence)
    found, row = probe_keys_dense(
        table,
        q_h0.reshape(-1), q_l0.reshape(-1),
        q_h1.reshape(-1), q_l1.reshape(-1),
    )
    n_keys = postings.shape[0] - 1
    row_safe = jnp.where(found, row, n_keys)
    rows = jnp.take(postings, row_safe, axis=0)  # (B*Pc, 2C) one gather
    w_bgn = rows[:, :C].reshape(B, Pc, C)
    w_end = rows[:, C:].reshape(B, Pc, C)
    t_ori = w_bgn >> 31
    t_bgn = w_bgn & jnp.uint32(0x7FFFFFFF)
    slot_valid = (w_end >> 31) != 0
    t_end = w_end & jnp.uint32(0x7FFFFFFF)

    # in-query duplicate-pair count filter (aln.rs:159-228 semantics):
    # pair_count = occurrences of the pair key within THIS query's pair
    # list; the hits of a pair are dropped when it exceeds max_count or
    # max_count_query, and (with the slot-aligned table's per-(key,sid)
    # multiplicity of 1) the per-target filter reduces to the same count.
    count_cap = min(max_count, max_count_query, max_count_target)
    found2 = found.reshape(B, Pc)
    run_len = dup_pair_counts((q_h0, q_l0, q_h1, q_l1), cvalid)
    count_ok = run_len <= count_cap

    hit = (
        cvalid
        & found2
        & count_ok
    )[:, :, None] & slot_valid  # (B, Pc, C)

    def lane(v):  # (B, Pc, C) -> (G, N)
        return v.transpose(0, 2, 1).reshape(B * C, Pc)

    def lane_q(v):  # (B, Pc) -> (G, N)
        return jnp.broadcast_to(
            v[:, None, :], (B, C, Pc)
        ).reshape(B * C, Pc)

    anchors = jnp.stack(
        [
            lane_q(q_bgn), lane_q(q_end), lane_q(q_ori),
            lane(t_bgn), lane(t_end), lane(t_ori),
        ],
        axis=-1,
    )
    gvalid = lane(hit)
    scores, prev, dup, inexact = chain_scores_fast(
        anchors, gvalid, penalty, -1, False,
        lookback=lookback, max_span=max_span, unroll=unroll,
    )
    return dict(
        anchors=anchors,
        gvalid=gvalid,
        scores=scores,
        prev=prev,
        dup=dup,
        inexact=inexact,
        overflow=ovf | ovf2,
    )


def fold_e2e_scalar(res):
    """Fold a query_e2e_step result into one u32 scalar with a data
    dependency on every stage (chain scores, hit mask, flags) so chained
    benchmark iterations cannot overlap or dead-code a stage."""
    import jax
    import jax.numpy as jnp

    s = jnp.where(res["gvalid"], res["scores"], 0.0).sum()
    sbits = jax.lax.bitcast_convert_type(s, jnp.uint32)
    return (
        res["gvalid"].sum().astype(jnp.uint32)
        + (sbits & jnp.uint32(3))
        + res["dup"].sum().astype(jnp.uint32)
        + res["inexact"].sum().astype(jnp.uint32)
        + res["overflow"].astype(jnp.uint32)
    )
