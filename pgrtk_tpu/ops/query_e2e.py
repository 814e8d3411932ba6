"""Device end-to-end query pipeline: sketch -> pair -> probe -> postings
expansion -> count filters -> batched chain DP, all inside one jit.

This is the full query path of the reference (seq_db.rs:1198-1257 raw
query + aln.rs:147-242 count filters and per-target sparse chain DP),
not just probe membership.  Shape strategy:

  * query pairs are rank-extracted to a dense (B, Pc) stream (the 24k
    gapped pair stream at mode-2 density is ~83% padding — compaction
    cuts everything downstream 5x);
  * each probed key's postings live in ONE row of (n_keys+1, P) u32
    planes that carry the target sid AS DATA (ragged/CSR rows padded to
    P slots), so a key may hold ANY per-(key, sid) multiplicity and any
    number of target sids up to P — the meta word packs
    keyovf(1) | mult(7) | m(4) | sid(20) per slot, where m is the
    occurrence rank within the slot's (key, sid) group and mult the
    group size (both precomputed at build, so the device-side count
    filter run_len*mult needs no P^2 comparisons);
  * the reference's count filters run live on device
    (aln.rs:159-228): the per-query pair count (occurrences of the key
    among THIS query's pairs — found or not, matching
    raw_query_fragment's empty-signature entries) gates on
    min(max_count, max_count_query), and the per-(pair, sid) target
    count equals run_len * mult exactly (every occurrence of a key in
    the query expands the same postings list);
  * anchors are grouped into (query, target) chain lanes by a one-hot
    placement over (sid, m): lane (b, c) holds the anchor of pair p,
    occurrence m at position p*M + m — per-lane anchors stay in the
    reference's q_bgn-sorted order with same-left runs consecutive
    (exactly the invariant ops/chain.py's fast kernel exploits);
  * chaining is ops/chain.py's chain_scores_fast over G = B*C lanes,
    with dup/inexact flags folded into the result for the caller's
    per-group fallback contract.

Static capacities and their flags (all per-row or per-group, so a
violating query/group falls back to the host path individually):

  * P     — postings slots per key; keys with more postings (or m > 15 /
            mult > 127) carry the keyovf bit -> per-QUERY `row_ovf`.
  * M     — per-(key, sid) occurrences placed per pair (mult_cap);
            hits with m >= M -> per-GROUP `mult_ovf`.
  * C     — target sids addressable by the lane layout (n_targets);
            the postings rows themselves are C-independent.
"""
from __future__ import annotations

import numpy as np

from .chain import chain_scores_fast
from .pairs import (
    _rank_extract_planes,
    min_span_filter_gapped,
    pair_mers_gapped,
)
from .probe import (
    build_probe_table_aligned,
    probe_keys_aligned,
    probe_keys_dense,
)
from .sketch import sketch_compact_mode2

META_EMPTY = 0xFFFFFFFF
SID_BITS = 20
M_BITS = 4
MULT_BITS = 7


def pack_meta(sid, m, mult, keyovf):
    """keyovf(1) | mult(7) | m(4) | sid(20) as uint32 (numpy arrays)."""
    return (
        (keyovf.astype(np.uint32) << np.uint32(31))
        | (np.minimum(mult, 127).astype(np.uint32) << np.uint32(24))
        | (np.minimum(m, 15).astype(np.uint32) << np.uint32(20))
        | sid.astype(np.uint32)
    )


def build_index(
    target_seqs=None,
    pair_arrays=None,
    k: int = 56,
    r: int = 4,
    min_span: int = 64,
    n_decoys: int = 0,
    seed: int = 7,
    build_lookup: bool = True,
    P: int = 16,
    target_lens=None,
):
    """Vectorized host-side index build producing the device postings
    planes (general layout: sid as data, arbitrary multiplicity).

    Input: either `target_seqs` — (T, L) uint8 2-bit sequences sketched
    with the bit-exact host arbiter — or `pair_arrays` — a dict of flat
    numpy arrays (k0, k1 uint64; sid, bgn, end, ori uint32) already in
    (sid, position) order (the reference's postings insertion order,
    seq_db.rs:386-418).

    Builder-canonical pairs (tie -> orientation 0, seq_db.rs:391).  The
    key set is padded with `n_decoys` random never-hit single-posting
    keys (so probe cost matches a production index much larger than the
    batch).  Returns dict:

      keys      (n_keys, 2) u64 key-sorted
      p_rows    (n_keys+1, W) u32, W = 128*ceil(3P/128) — ONE aligned
                row fetch per key carries the whole postings list
                [meta(P) | bgnori(P) | end(P) | pad]: meta packs
                keyovf|mult|m|sid per slot (0xFFFFFFFF = empty), bgnori
                is ori<<31 | t_bgn, end is t_end; last row = not-found
                sentinel.  128-wide u32 rows are (8,128)-tile rows
                (512 B), so the fetch is an aligned row gather — three
                narrow (P,) plane gathers straddle tiles and lower to
                element gathers (measured 1.2 GB/s vs ~50 GB/s for
                aligned rows on the v5e; the row fetch replaced a
                15.5 ms stage with a sub-ms one at P=32).
      lookup    dict (k0, k1) -> [(0, sid, bgn, end, ori), ...] in
                reference postings order, for the host parity pipeline
      probe     dict from ops.probe.build_probe_table_aligned (postings
                rows live at the probe's padded positions; "aligned"
                marker True).  On bucket overflow the aligned build is
                RETRIED at smaller lambda (32 -> 8 -> 2: more bucket
                bits splits skew) and raises ValueError if every lambda
                overflows — there is no dense fallback here (the dense
                layout has the same 128-slot bucket cap;
                probe_aligned=False in query_e2e_step exists for
                externally built dense tables)
      n_targets, n_multi (keys with any per-sid multiplicity > 1),
      n_truncated (keys with keyovf set), max_postings, max_mult
    """
    if pair_arrays is None:
        from ..core import sketch as sketch_mod
        from ..core.spec import ShmmrSpec

        spec = ShmmrSpec(80, k, r, min_span, True)
        T, _L = target_seqs.shape
        BASES = b"ACGT"
        cols = {kk: [] for kk in ("k0", "k1", "sid", "bgn", "end", "ori")}
        for sid in range(T):
            row = target_seqs[sid]
            if target_lens is not None:
                row = row[: int(target_lens[sid])]  # ragged true length
            # codes >= 4 are ambiguous (device encode_bases semantics):
            # map to 'N' so the host sketch skips them identically
            seq = bytes(bytearray(BASES[b] if b < 4 else 78 for b in row))
            mx, my = sketch_mod.sequence_to_shmmrs_arrays(
                sid, seq, spec, False
            )
            if len(mx) < 2:
                continue
            h = (mx >> np.uint64(8)).astype(np.uint64)
            p = ((my & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(
                np.uint32
            ) + np.uint32(1)
            s0, s1 = h[:-1], h[1:]
            swap = s0 > s1  # builder tie-break: s0 <= s1 -> orientation 0
            cols["k0"].append(np.where(swap, s1, s0))
            cols["k1"].append(np.where(swap, s0, s1))
            cols["sid"].append(np.full(len(s0), sid, dtype=np.uint32))
            cols["bgn"].append(p[:-1])
            cols["end"].append(p[1:])
            cols["ori"].append(swap.astype(np.uint32))
        pair_arrays = {
            kk: (
                np.concatenate(v)
                if v
                else np.zeros(
                    0, np.uint64 if kk in ("k0", "k1") else np.uint32
                )
            )
            for kk, v in cols.items()
        }
        n_targets = T
    else:
        n_targets = (
            int(pair_arrays["sid"].max()) + 1
            if len(pair_arrays["sid"])
            else 0
        )

    k0 = pair_arrays["k0"]
    k1 = pair_arrays["k1"]
    sid = pair_arrays["sid"].astype(np.uint32)
    bgn = pair_arrays["bgn"].astype(np.uint32)
    end = pair_arrays["end"].astype(np.uint32)
    ori = pair_arrays["ori"].astype(np.uint32)
    assert sid.size == 0 or int(sid.max()) < (1 << SID_BITS) - 1, (
        "sid exceeds the 20-bit meta field"
    )

    # stable sort by key; input is (sid, position) ordered, so equal keys
    # keep the reference's postings insertion order
    order = np.lexsort((k1, k0))
    k0s, k1s = k0[order], k1[order]
    n_post = len(k0s)
    newkey = np.ones(n_post, dtype=bool)
    if n_post > 1:
        newkey[1:] = (k0s[1:] != k0s[:-1]) | (k1s[1:] != k1s[:-1])
    key_id = np.cumsum(newkey) - 1  # 0..n_real-1 per posting
    n_real = int(key_id[-1]) + 1 if n_post else 0
    key_start = np.flatnonzero(newkey)
    j = np.arange(n_post) - key_start[key_id]  # slot within key

    # per-(key, sid) runs (contiguous within a key group by construction)
    sid_s = sid[order]
    newrun = newkey.copy()
    if n_post > 1:
        newrun[1:] |= sid_s[1:] != sid_s[:-1]
    run_id = np.cumsum(newrun) - 1
    run_start = np.flatnonzero(newrun)
    m = (np.arange(n_post) - run_start[run_id]).astype(np.int64)
    run_len = np.diff(np.append(run_start, n_post))
    mult = run_len[run_id].astype(np.int64)

    counts = np.diff(np.append(key_start, n_post)) if n_post else (
        np.zeros(0, np.int64)
    )
    key_ovf = np.zeros(n_real, dtype=bool)
    if n_post:
        np.logical_or.at(key_ovf, key_id, (m > 15) | (mult > 127))
        key_ovf |= counts > P
    n_truncated = int(key_ovf.sum())
    key_multi = np.zeros(n_real, dtype=bool)
    if n_post:
        np.logical_or.at(key_multi, key_id, mult > 1)
    n_multi = int(key_multi.sum())
    max_postings = int(counts.max()) if n_post else 0
    max_mult = int(mult.max()) if n_post else 0

    real_keys = np.stack(
        [k0s[newkey], k1s[newkey]], axis=1
    ).astype(np.uint64)

    rng = np.random.default_rng(seed)
    if n_decoys:
        C = max(1, n_targets)
        dk = rng.integers(0, 1 << 56, size=(n_decoys, 2), dtype=np.uint64)
        d_sid = rng.integers(0, C, size=n_decoys).astype(np.uint32)
        d_bgn = rng.integers(1, 1 << 20, size=n_decoys).astype(np.uint32)
        d_end = d_bgn + rng.integers(64, 4096, size=n_decoys).astype(
            np.uint32
        )
        d_ori = rng.integers(0, 2, size=n_decoys).astype(np.uint32)
        if build_lookup:
            # collisions with real keys are ~n_real*n_decoys/2^112 — only
            # the parity-tested path screens them
            existing = set(map(tuple, real_keys.tolist()))
            keep = np.asarray(
                [tuple(kk) not in existing for kk in dk.tolist()]
            )
            dk, d_sid, d_bgn, d_end, d_ori = (
                dk[keep], d_sid[keep], d_bgn[keep], d_end[keep], d_ori[keep]
            )
        keys = np.concatenate([real_keys, dk], axis=0)
    else:
        keys = real_keys

    korder = np.lexsort((keys[:, 1], keys[:, 0]))
    keys = keys[korder]
    inv = np.empty(len(keys), dtype=np.int64)
    inv[korder] = np.arange(len(keys))

    # probe table FIRST: the aligned layout (one row fetch per plane,
    # 28.8 vs 43.1 ns/key measured) assigns each key a PADDED position,
    # and the postings rows must live at those positions so the probe's
    # matched row indexes p_rows directly.  A skewed key set whose
    # hottest bucket exceeds the 128-slot window at lambda=32 is retried
    # at smaller lambda (more bucket bits splits skew); only keys
    # sharing their ENTIRE top-24-bit h0 prefix beyond 128 deep cannot
    # be bucketed at all — canonical Wang-hash pairs cannot do that
    # without adversarial construction, so that raises.  (The dense
    # two-row layout has the SAME 128-slot cap, so it is not a fallback
    # — probe_aligned=False support in the step exists for externally
    # built dense tables.)
    probe = None
    for lam in (32, 8, 2):
        try:
            probe = build_probe_table_aligned(keys, avg_per_bucket=lam)
            break
        except ValueError:
            continue
    if probe is None:
        raise ValueError(
            "probe bucket overflow at every lambda: >128 keys share one "
            "top-24-bit h0 prefix (adversarial key set)"
        )
    inv = probe["pos"][inv]  # original order -> padded row
    n_tab_rows = probe["n_padded"]

    n = n_tab_rows
    W = 128 * (-(-3 * P // 128))
    p_rows = np.zeros((n + 1, W), dtype=np.uint32)
    p_meta = p_rows[:, :P]
    p_bgnori = p_rows[:, P:2 * P]
    p_end = p_rows[:, 2 * P:3 * P]
    p_meta[:] = META_EMPTY
    if n_post:
        keep_slot = j < P
        rows = inv[key_id[keep_slot]]
        js = j[keep_slot]
        p_meta[rows, js] = pack_meta(
            sid_s[keep_slot],
            m[keep_slot],
            mult[keep_slot],
            key_ovf[key_id[keep_slot]],
        )
        p_bgnori[rows, js] = (
            (ori[order][keep_slot] << np.uint32(31)) | bgn[order][keep_slot]
        )
        p_end[rows, js] = end[order][keep_slot]
    if n_decoys and len(dk):
        drow = inv[n_real:]
        p_meta[drow, 0] = pack_meta(
            d_sid,
            np.zeros(len(dk), np.int64),
            np.ones(len(dk), np.int64),
            np.zeros(len(dk), bool),
        )
        p_bgnori[drow, 0] = (d_ori << np.uint32(31)) | d_bgn
        p_end[drow, 0] = d_end

    lookup = None
    if build_lookup:
        lookup = {}
        if n_post:
            bounds = np.append(key_start, n_post)
            b_s = bgn[order]
            e_s = end[order]
            o_s = ori[order]
            for ki in range(n_real):
                s, e = int(bounds[ki]), int(bounds[ki + 1])
                lookup[(int(k0s[s]), int(k1s[s]))] = [
                    (0, int(sid_s[t]), int(b_s[t]), int(e_s[t]), int(o_s[t]))
                    for t in range(s, e)
                ]
        if n_decoys:
            for i in range(len(dk)):
                lookup[(int(dk[i, 0]), int(dk[i, 1]))] = [
                    (0, int(d_sid[i]), int(d_bgn[i]), int(d_end[i]),
                     int(d_ori[i]))
                ]

    return dict(
        keys=keys,
        p_rows=p_rows,
        lookup=lookup,
        probe=probe,
        C=n_targets,
        P=P,
        n_multi=n_multi,
        n_truncated=n_truncated,
        max_postings=max_postings,
        max_mult=max_mult,
    )


def build_synth_index(*args, **kwargs):
    """Back-compat alias for build_index (round-3 name).  The general
    layout no longer drops multi-signature keys; n_multi_dropped is
    always 0 and n_multi reports how many keys carry multiplicity."""
    idx = build_index(*args, **kwargs)
    idx["n_multi_dropped"] = 0
    return idx


def dup_pair_counts(k_planes, valid):
    """Per-QUERY duplicate-pair counts: for every (B, Pc) slot, how many
    times its 4-u32-plane pair key occurs among the same row's valid
    slots (aln.rs's pair_count over one query's pair list — found or
    not: raw_query_fragment emits an entry per pair either way).  Sort
    each row by key with the slot index as payload, run lengths via
    log-shift segment propagation, unsort.  Invalid slots count in their
    own all-ones segment (masked by validity downstream).

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


def expand_postings(
    meta_rows,
    bgnori_rows,
    end_rows,
    base_hit,
    run_len,
    C: int,
    M: int,
    max_count_target: int,
):
    """Postings rows -> (query, target) lane planes.

    Args (all traced):
      meta_rows/bgnori_rows/end_rows: (B, Pc, P) u32 fetched postings
      base_hit: (B, Pc) bool — pair valid & key found & query-count ok
      run_len:  (B, Pc) i32 — per-query occurrences of the pair key
      C, M: static lane geometry (n_targets, mult cap)
      max_count_target: the reference's per-(pair, sid) cap

    Returns dict with lane planes (B, C, Pc, M): t_bgnori, t_end, hv
    (valid), plus row_ovf (B,) bool (truncated-key hit -> host fallback
    for the whole query) and grp_ovf (B, C) bool (an m >= M hit dropped
    from that lane).
    """
    import jax.numpy as jnp

    B, Pc, P = meta_rows.shape
    U32 = jnp.uint32
    slot_valid = meta_rows != U32(META_EMPTY)
    sid = meta_rows & U32((1 << SID_BITS) - 1)
    m = (meta_rows >> SID_BITS) & U32((1 << M_BITS) - 1)
    mult = (meta_rows >> (SID_BITS + M_BITS)) & U32((1 << MULT_BITS) - 1)
    kovf = (meta_rows[:, :, 0] >> 31) == U32(1)  # slot 0 carries the bit

    row_ovf = (base_hit & kovf & slot_valid[:, :, 0]).any(axis=1)

    # per-(pair, sid) target count = run_len * mult (aln.rs:213-221):
    # every query occurrence of the key contributes the same signatures
    t_cnt = run_len[:, :, None].astype(jnp.uint32) * mult
    t_ok = t_cnt <= U32(max_count_target)
    hit = base_hit[:, :, None] & slot_valid & t_ok & (sid < U32(C))

    grp_drop = hit & (m >= U32(M))
    # (B, Pc, P, C) one-hot over sid just for the overflow reduce
    c_iota = jnp.arange(C, dtype=jnp.uint32)
    grp_ovf = (
        (grp_drop[..., None] & (sid[..., None] == c_iota))
        .any(axis=(1, 2))
    )  # (B, C)

    sel = hit & (m < U32(M))
    CM = C * M
    cm_key = jnp.where(sel, sid * U32(M) + m, U32(CM))
    onehot = (
        cm_key[..., None] == jnp.arange(CM, dtype=jnp.uint32)
    )  # (B, Pc, P, CM)
    oh = onehot.astype(jnp.uint32)

    def place(v):  # (B, Pc, P) -> (B, C, Pc, M)
        out = (oh * v[..., None]).sum(axis=2)  # (B, Pc, CM): <=1 match
        return out.reshape(B, Pc, C, M).transpose(0, 2, 1, 3)

    hv = onehot.any(axis=2).reshape(B, Pc, C, M).transpose(0, 2, 1, 3)
    # live-filter statistic: postings hits dropped by the per-(pair, sid)
    # target count filter (aln.rs:213-221) — lets benchmarks certify that
    # the count-filter machinery actually fires on their corpus
    n_t_filtered = (
        (base_hit[:, :, None] & slot_valid & ~t_ok & (sid < U32(C)))
        .sum()
        .astype(jnp.uint32)
    )
    return dict(
        t_bgnori=place(bgnori_rows),
        t_end=place(end_rows),
        hv=hv,
        row_ovf=row_ovf,
        grp_ovf=grp_ovf,
        n_t_filtered=n_t_filtered,
    )


def query_e2e_step(
    seqs_u8,
    lens,
    probe_bits: int,
    probe_planes,
    probe_fence,
    p_rows,
    C: int,
    P: int,
    M: int = 4,
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
    slots3: int | None = None,
    sketch_compact: tuple = (12, 512, 144),
    pair_block: int | None = 512,
    probe_aligned: bool = True,
):
    """One full device query step (traceable; callers jit it).

    Returns dict with anchors (G, N, 6) u32, gvalid (G, N) bool, scores
    (G, N) f32, prev (G, N) i32, dup (G,) bool, inexact (G,) bool,
    mult_ovf (G,) bool, row_ovf (B,) bool, overflow () bool, where
    G = B*C lanes (query b, target sid c) and N = Pc*M.

    slots3: optional per-lane anchor compaction width.  The expanded
    (Pc, M) lane plane is mostly padding (multiplicity is 1 for most
    pairs, and only ~40% of pair slots hit this target), yet the chain
    scan walks every position — a rank-extract down to slots3 anchors
    per lane cuts the scan depth ~N/slots3 x.  Order-preserving, so
    chain semantics are unchanged; lanes with more than slots3 valid
    anchors raise lane_ovf (G,) (host-fallback contract, like mult_ovf)
    and N becomes slots3 in every returned plane.

    sketch_compact: (slots, block2, slots2) sizing for the fused sketch
    compaction.  The (12, 512, 144) default holds mode-2 density on
    typical content; repeat-dense regions (tandem arrays keep up to ~6
    raw mers per 512-base chunk SUSTAINED over the whole block) can
    exceed the level-2 capacity — widen slots2 to ~192, or rely on the
    overflow flag + exact-path rerun contract.

    pair_block: block size of the pair-stream rank extract.  Pc (the
    width every downstream stage scales with) = ceil(stream/block) *
    slots2.  For SHORT query rows (ROI chunks, <= ~128 kb) pass None to
    compact the whole row in one block: Pc == slots2 regardless of the
    sketch-compaction width (with a wider sketch level-2, the default
    512 doubles Pc and with it probe keys, postings fetches, and lane
    width).  Long rows (Mb-scale) need blocking — slots2 then caps
    pairs PER BLOCK, not per row.
    """
    import jax.numpy as jnp

    # P MUST equal build_index's P (pass idx["P"]): p_rows packs
    # [meta(P) | bgnori(P) | end(P) | pad] and the row width
    # 128*ceil(3P/128) is the SAME for P=16 and P=32, so a wrong P
    # would silently slice bgnori data as meta.  The shape check below
    # catches gross mismatches; exact equality cannot be derived from
    # the traced array, hence the caller contract.
    if 3 * P > p_rows.shape[1]:
        raise ValueError(
            f"P={P} inconsistent with p_rows width {p_rows.shape[1]} "
            f"(need 3*P <= width; pass build_index's idx['P'])"
        )
    B = seqs_u8.shape[0]
    sk_slots, sk_block2, sk_slots2 = sketch_compact
    xh, xl, yl, valid, ovf = sketch_compact_mode2(
        seqs_u8, lens, k, r, min_span, chunk,
        sk_slots, sk_block2, sk_slots2,
    )
    keep = min_span_filter_gapped(xh, xl, yl, valid, min_span)
    pr = pair_mers_gapped(xh, xl, yl, keep, tie_orientation_one=True)

    planes = (
        pr["k0_hi"], pr["k0_lo"], pr["k1_hi"], pr["k1_lo"],
        pr["bgn"], pr["end"], pr["orientation"],
    )
    block = pair_block if pair_block is not None else pr["k0_hi"].shape[1]
    cp, cvalid, ovf2 = _rank_extract_planes(
        planes, pr["pair_valid"], block, slots2
    )
    q_h0, q_l0, q_h1, q_l1, q_bgn, q_end, q_ori = cp
    Pc = q_h0.shape[1]

    table = dict(bits=probe_bits, planes=probe_planes, fence=probe_fence)
    # probe_aligned matches build_index's probe layout (aligned: one row
    # fetch per plane, row = padded position; dense fallback: two rows)
    probe_fn = probe_keys_aligned if probe_aligned else probe_keys_dense
    found, row = probe_fn(
        table,
        q_h0.reshape(-1), q_l0.reshape(-1),
        q_h1.reshape(-1), q_l1.reshape(-1),
    )
    n_keys = p_rows.shape[0] - 1
    row_safe = jnp.where(found, row, n_keys)
    # ONE aligned row fetch per key carries the whole postings list
    # (meta | bgnori | end slices) — see build_index p_rows
    W = p_rows.shape[1]
    rows = jnp.take(p_rows, row_safe, axis=0).reshape(B, Pc, W)
    meta_rows = rows[:, :, :P]
    bgnori_rows = rows[:, :, P:2 * P]
    end_rows = rows[:, :, 2 * P:3 * P]

    # in-query duplicate-pair count filter (aln.rs:203-211)
    run_len = dup_pair_counts((q_h0, q_l0, q_h1, q_l1), cvalid)
    count_ok = run_len <= min(max_count, max_count_query)
    base_hit = cvalid & found.reshape(B, Pc) & count_ok
    n_q_filtered = (
        (cvalid & found.reshape(B, Pc) & ~count_ok).sum().astype(jnp.uint32)
    )

    ex = expand_postings(
        meta_rows, bgnori_rows, end_rows, base_hit, run_len,
        C, M, max_count_target,
    )

    N = Pc * M

    def lane(v):  # (B, C, Pc, M) -> (G, N)
        return v.reshape(B * C, N)

    def lane_q(v):  # (B, Pc) -> (G, N)
        return jnp.broadcast_to(
            v[:, None, :, None], (B, C, Pc, M)
        ).reshape(B * C, N)

    # pack q_ori into q_bgn's top bit (q_bgn = position+1 < 2^31 always:
    # sequence offsets are int32) — the lane planes travel 4-wide
    # (qbo, q_end, t_bgnori, t_end) instead of 6, cutting the rank-
    # extract arithmetic, and unpack right before the chain kernel
    qbo = q_bgn | (q_ori << 31)
    planes4 = (
        lane_q(qbo), lane_q(q_end),
        lane(ex["t_bgnori"]), lane(ex["t_end"]),
    )
    gvalid = lane(ex["hv"])
    G = B * C
    lane_ovf = jnp.zeros((G,), dtype=jnp.bool_)
    if slots3 is not None and slots3 < N:
        # order-preserving per-lane anchor compaction: the (Pc, M) plane
        # is mostly padding but the chain scan walks every position
        lane_ovf = gvalid.sum(axis=1) > slots3
        planes4, gvalid, _ovf3 = _rank_extract_planes(
            planes4, gvalid, N, slots3
        )
    MASK31 = jnp.uint32(0x7FFFFFFF)
    anchors = jnp.stack(
        [
            planes4[0] & MASK31, planes4[1], planes4[0] >> 31,
            planes4[2] & MASK31, planes4[3], planes4[2] >> 31,
        ],
        axis=-1,
    )
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
        mult_ovf=ex["grp_ovf"].reshape(B * C),
        lane_ovf=lane_ovf,
        row_ovf=ex["row_ovf"],
        overflow=ovf | ovf2,
        # live-filter statistics (not folded by fold_e2e_scalar, so the
        # timed path DCEs them; certify passes return them explicitly)
        n_q_filtered=n_q_filtered,
        n_t_filtered=ex["n_t_filtered"],
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
        + res["mult_ovf"].sum().astype(jnp.uint32)
        + res["lane_ovf"].sum().astype(jnp.uint32)
        + res["row_ovf"].sum().astype(jnp.uint32)
        + res["overflow"].astype(jnp.uint32)
    )
