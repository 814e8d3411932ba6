"""Hand-derived adversarial vectors for reference tie-break behavior.

No Rust toolchain can be installed in this environment (offline; see
docs/ROADMAP.md "reference goldens" note), so these vectors were derived
by hand-simulating the reference code paths:

  - chain DP + traceback: pgr-db/src/aln.rs:12-142
  - principal-bundle peeling: pgr-db/src/seq_db.rs:1063-1186

Each test documents the exact reference semantics it pins down.
"""
import numpy as np
import pytest

from pgrtk_tpu.core import aln_ref
from pgrtk_tpu.native import api as native


def both_impls(hits, max_span, penalty, max_gap=None, oriented=False):
    a = aln_ref.sparse_aln(list(hits), max_span, penalty, max_gap, oriented)
    flat = np.array([[*h[0], *h[1]] for h in hits], dtype=np.uint32)
    b = native.sparse_aln(flat, max_span, penalty, max_gap, oriented)
    # native must agree with the arbiter bit-for-bit
    assert len(a) == len(b)
    for (sa, ta), (sb, tb) in zip(a, b):
        assert sa == pytest.approx(sb, abs=0.0), (sa, sb)
        tb_pairs = [
            ((int(r[0]), int(r[1]), int(r[2])), (int(r[3]), int(r[4]), int(r[5])))
            for r in tb
        ]
        assert ta == tb_pairs
    return a


def test_equal_score_predecessor_tie_picks_nearest_in_scan():
    """aln.rs:87 uses strict `s > best_s` while scanning j downward from
    i-1, so among equal-score predecessors the LAST one in sorted order
    (scanned first) wins."""
    pre1 = ((0, 10, 0), (0, 10, 0))
    pre2 = ((0, 10, 0), (50, 60, 0))   # same query interval as pre1
    hp = ((20, 30, 0), (35, 45, 0))    # gap to pre1 == gap to pre2 == 35
    out = both_impls([pre1, pre2, hp], 8, 0.01)
    # pre1/pre2 cannot chain to each other (same left coordinate,
    # aln.rs:68); hp must pick pre2 (scanned first, tie not replaced)
    assert out[0][1] == [pre2, hp]
    assert out[0][0] == pytest.approx(19.65 - 10.0, abs=1e-4)
    assert out[1][1] == [pre1]
    assert out[1][0] == 0.0


def test_span_clip_counts_distinct_left_coordinates():
    """aln.rs:69-70,89-91: the lookback window counts DISTINCT pre.0
    triples and breaks AFTER evaluating the hit that fills the window —
    with max_span=1 only the nearest distinct-left predecessor is ever
    scored, even when a farther one scores higher."""
    preA = ((0, 10, 0), (0, 10, 0))
    preB = ((0, 10, 0), (200, 210, 0))
    preC = ((5, 15, 0), (5, 15, 0))
    hp = ((20, 30, 0), (20, 30, 0))
    out = both_impls([preA, preB, preC, hp], 1, 0.01)
    # preC connects to preB (nearest; scores 17.9) and the span clip
    # prevents it from ever seeing preA, which would score 19.9
    assert out[0][1] == [preB, preC, hp]
    assert out[0][0] == pytest.approx(27.8 - 10.0, abs=1e-4)
    assert out[1][1] == [preA]


def test_second_chain_cut_by_first_extraction_scores_zero():
    """aln.rs:120-140: traceback stops at already-extracted nodes, and
    the emitted score is best_s - score(track[0]), so a chain whose
    predecessor was claimed by an earlier chain reports 0.0."""
    p1 = ((0, 10, 0), (0, 10, 0))
    p2 = ((15, 25, 0), (15, 25, 0))
    t1 = ((30, 40, 0), (30, 40, 0))
    t2 = ((30, 40, 0), (100, 110, 0))  # same left coordinate as t1
    out = both_impls([p1, p2, t1, t2], 8, 0.01)
    assert out[0][1] == [p1, p2, t1]
    assert out[0][0] == pytest.approx(29.8 - 10.0, abs=1e-4)
    # t2's best predecessor is p2 (t1 skipped: same left coordinate);
    # p2 is already visited, so the track is just [t2] with score 0
    assert out[1][1] == [t2]
    assert out[1][0] == 0.0


def test_opposite_orientation_gap_uses_target_end_vs_pre_bgn():
    """aln.rs:55-57,79-83: when hp's query/target orientations differ the
    target-side gap is |hp.1.1 - pre.1.0| (end vs begin), not
    |hp.1.0 - pre.1.1|."""
    pre = ((0, 10, 0), (0, 10, 0))
    hp = ((20, 30, 0), (50, 60, 1))
    out = both_impls([pre, hp], 8, 0.01)
    # gap = |20-10| + |60-0| = 70 -> score 19.3, chain start at 10
    assert out[0][1] == [pre, hp]
    assert out[0][0] == pytest.approx(19.3 - 10.0, abs=1e-4)

    # with orientated=true the mixed-orientation link is skipped entirely
    out = both_impls([pre, hp], 8, 0.01, None, True)
    assert sorted(t for _, t in out) == sorted([[pre], [hp]])
    assert all(s == 0.0 for s, _ in out)


def test_max_gap_filter_applies_before_same_left_skip():
    """aln.rs:53-66: the max_gap filter runs before scoring; a predecessor
    just past the gap bound must not chain."""
    pre = ((0, 10, 0), (0, 10, 0))
    hp = ((120, 130, 0), (120, 130, 0))  # gaps of 110 on both sides
    out = both_impls([pre, hp], 8, 0.01, 100)
    assert sorted(t for _, t in out) == sorted([[pre], [hp]])
    out = both_impls([pre, hp], 8, 0.01, 120)
    assert out[0][1] == [pre, hp]


# ---------------------------------------------------------------------------
# principal-bundle peeling (seq_db.rs:1063-1186)
# ---------------------------------------------------------------------------

def _node(h, o):
    return (h, h, o)


def test_peeling_terminal_quirk_marks_edge_source_not_join():
    """seq_db.rs:1116-1123 inserts *v* (the edge source) into
    terminal_vertices when the edge TARGET w has in-degree > 1 — the join
    vertex itself is NOT terminal.  Graph: A->B->C->D plus X->C (C has
    in-degree 2), with skew-symmetric reverse edges.

    Hand simulation of the reference (petgraph node order = first-touch
    order; starts popped from the back; DFS breaks AT terminals;
    removing a node removes its reverse):
      terminals = {rC (out-degree 2), B, X (the quirk)}
      peel 1: start X -> [X]            (X is terminal immediately)
      peel 2: start rD -> [rD, rC]      (breaks at rC; removes D, C too)
      peel 3: start rB -> [rB, rA]
      sorted by length desc (stable): [[rD,rC], [rB,rA], [X]]
    """
    from pgrtk_tpu.graph.bundles import get_principal_bundles_from_adj_list

    A, B, C, D, X = (_node(h, 0) for h in (1, 2, 3, 4, 9))
    rA, rB, rC, rD, rX = (_node(h, 1) for h in (1, 2, 3, 4, 9))
    adj = [
        (0, A, B), (0, rB, rA),
        (0, B, C), (0, rC, rB),
        (0, C, D), (0, rD, rC),
        (1, X, C), (1, rC, rX),
    ]
    # one signature per pair-key (coverage scores for the weighted DFS)
    frag_map = {
        (h, h): [(0, 0, 0, 10, 0)] for h in (1, 2, 3, 4, 9)
    }
    bundles, filtered = get_principal_bundles_from_adj_list(frag_map, adj, 0)
    assert bundles == [[rD, rC], [rB, rA], [X]]
    assert filtered == adj


def test_peeling_pure_cycle_starts_anywhere_and_unrolls():
    """seq_db.rs:1131-1137,1177-1182: a graph with no in-degree-0 vertex
    seeds the peel from the first remaining node (insertion order)."""
    from pgrtk_tpu.graph.bundles import get_principal_bundles_from_adj_list

    A, B, C = (_node(h, 0) for h in (1, 2, 3))
    rA, rB, rC = (_node(h, 1) for h in (1, 2, 3))
    adj = [
        (0, A, B), (0, rB, rA),
        (0, B, C), (0, rC, rB),
        (0, C, A), (0, rA, rC),
    ]
    frag_map = {(h, h): [(0, 0, 0, 10, 0)] for h in (1, 2, 3)}
    bundles, _ = get_principal_bundles_from_adj_list(frag_map, adj, 0)
    # no terminals (every vertex has out/in degree 1 in each direction);
    # the forward cycle unrolls from A, which removes the reverse cycle
    assert bundles == [[A, B, C]]
