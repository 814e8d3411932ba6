"""Batched sparse anchor-chain DP scoring on device.

The reference chains anchors per (query, target) group with an O(n·span)
serial DP (pgr-db/src/aln.rs:12-142).  Here G groups are scored
simultaneously: one `lax.scan` walks the anchor index while every group
occupies a VPU lane row, and each step scores the current anchor against a
rolling window of the previous W anchors (vectorized compare + max).

Semantics note: the reference bounds the backward scan by the number of
DISTINCT predecessor left-coordinates (max_span), which can reach further
back than any fixed window when anchors repeat.  This kernel uses a plain
W-anchor lookback — identical to the reference whenever each anchor's
max_span distinct predecessors fit in W (always true when left
coordinates are unique and W >= the group size or no better predecessor
lies further back).  The host C++ path (native/src/chain.cc) remains the
bit-exact arbiter; this kernel is the high-throughput batch scorer.
Traceback (iterated best-first chain extraction) runs on host from the
returned score/predecessor planes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.float32(-3.0e38)


@functools.partial(
    jax.jit, static_argnames=("lookback", "oriented", "max_gap", "penalty")
)
def chain_scores_dense(
    anchors: jnp.ndarray,
    valid: jnp.ndarray,
    penalty: float,
    max_gap: int = -1,
    oriented: bool = False,
    lookback: int = 64,
):
    """Score anchors against their predecessors.

    Args:
      anchors: (G, N, 6) uint32 — q_bgn, q_end, q_ori, t_bgn, t_end, t_ori,
               sorted by q_bgn within each group (stable), padded rows
               marked invalid.
      valid:   (G, N) bool
      penalty: gap penalty factor (f32)
      max_gap: max allowed gap (<0 = unbounded)
      oriented: require consistent relative orientation
      lookback: W, number of previous anchors considered

    Returns (scores (G, N) f32, best_prev (G, N) i32 — index of the best
    predecessor or -1).
    """
    G, N, _ = anchors.shape
    a = anchors.astype(jnp.float32)
    q_bgn, q_end, q_ori, t_bgn, t_end, t_ori = (a[..., i] for i in range(6))
    self_score = q_end - q_bgn
    rel_ori = (anchors[..., 2] ^ anchors[..., 5]).astype(jnp.int32)
    same_ori = anchors[..., 2] == anchors[..., 5]

    W = lookback

    def zero_w(dtype=jnp.float32):
        return jnp.zeros((G, W), dtype=dtype)

    init = dict(
        w_qb=zero_w(), w_qe=zero_w(), w_tb=zero_w(), w_te=zero_w(),
        w_rel=zero_w(jnp.int32),
        w_score=jnp.full((G, W), NEG),
        w_idx=jnp.full((G, W), -1, dtype=jnp.int32),
        w_qo=zero_w(jnp.int32),
    )

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (G, W), 1)

    xs = dict(
        i=jnp.arange(N, dtype=jnp.int32),
        qb=q_bgn.T, qe=q_end.T, tb=t_bgn.T, te=t_end.T,
        rel=rel_ori.T, so=same_ori.T,
        qo=anchors[..., 2].astype(jnp.int32).T,
        self_score=self_score.T,
        is_valid=valid.T,
    )

    def step(carry, x):
        i = x["i"]
        cqb = x["qb"][:, None]
        cqe = x["qe"][:, None]
        ctb = x["tb"][:, None]
        cte = x["te"][:, None]
        crel = x["rel"][:, None]
        cso = x["so"][:, None]
        cqo = x["qo"][:, None]

        gap_q = jnp.abs(cqb - carry["w_qe"])
        gap_t_same = jnp.abs(ctb - carry["w_te"])
        gap_t_diff = jnp.abs(cte - carry["w_tb"])
        gap_t = jnp.where(cso, gap_t_same, gap_t_diff)

        ok = carry["w_score"] > NEG
        if oriented:
            ok = ok & (carry["w_rel"] == crel)
        if max_gap >= 0:
            mg = jnp.float32(max_gap)
            ok = ok & (gap_q <= mg) & (gap_t <= mg)
        # don't connect to an anchor with the same left coordinate
        same_left = (
            (carry["w_qb"] == cqb)
            & (carry["w_qe"] == cqe)
            & (carry["w_qo"] == cqo)
        )
        ok = ok & ~same_left

        cand = (
            carry["w_score"]
            + (cqe - cqb)
            - jnp.float32(penalty) * (gap_q + gap_t)
        )
        cand = jnp.where(ok, cand, NEG)
        best = cand.max(axis=1)
        best_slot = cand.argmax(axis=1)
        best_prev_idx = jnp.take_along_axis(
            carry["w_idx"], best_slot[:, None], axis=1
        )[:, 0]

        use_prev = best > 0.0
        score_i = jnp.where(use_prev, best, x["self_score"])
        prev_i = jnp.where(use_prev, best_prev_idx, -1)
        is_valid = x["is_valid"]
        score_i = jnp.where(is_valid, score_i, NEG)

        # insert current anchor into slot i % W
        slot = i % W
        at = slot_iota == slot

        def put(w, v):
            return jnp.where(at, v[:, None], w)

        carry = dict(
            w_qb=put(carry["w_qb"], x["qb"]),
            w_qe=put(carry["w_qe"], x["qe"]),
            w_tb=put(carry["w_tb"], x["tb"]),
            w_te=put(carry["w_te"], x["te"]),
            w_rel=put(carry["w_rel"], x["rel"]),
            w_score=put(carry["w_score"], score_i),
            w_idx=put(
                carry["w_idx"],
                jnp.where(is_valid, jnp.full((G,), i, jnp.int32), -1),
            ),
            w_qo=put(carry["w_qo"], x["qo"]),
        )
        return carry, (score_i, prev_i)

    _, (scores_t, prev_t) = jax.lax.scan(step, init, xs)
    return scores_t.T, prev_t.T


def traceback(scores: np.ndarray, prev: np.ndarray, valid: np.ndarray):
    """Host traceback mirroring the reference's iterated best-first chain
    extraction (aln.rs:105-141).  Returns per-group [(score, [indices])]."""
    G, N = scores.shape
    out = []
    for g in range(G):
        unvisited = set(np.flatnonzero(valid[g]).tolist())
        s = scores[g]
        p = prev[g]
        chains = []
        order = np.argsort(-s)
        while unvisited:
            best_v = None
            for i in order:
                if i in unvisited and s[i] > 0:
                    best_v = int(i)
                    break
            if best_v is None:
                break
            track = []
            v = best_v
            while v >= 0 and v in unvisited:
                track.append(v)
                v = int(p[v])
            if not track:
                break
            track.reverse()
            unvisited.difference_update(track)
            chains.append((float(s[best_v] - s[track[0]]), track))
        out.append(chains)
    return out


def pad_groups(groups, lookback: int = 64):
    """Host helper: list of (n_i, 6) uint32 anchor arrays (pre-sorted by
    q_bgn) -> (G, N, 6) padded batch + valid mask."""
    G = len(groups)
    N = max((g.shape[0] for g in groups), default=1)
    N = max(N, 1)
    anchors = np.zeros((G, N, 6), dtype=np.uint32)
    valid = np.zeros((G, N), dtype=bool)
    for i, g in enumerate(groups):
        n = g.shape[0]
        anchors[i, :n] = g
        valid[i, :n] = True
    return anchors, valid
