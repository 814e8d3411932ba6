"""Device chain-DP scorer vs the exact reference DP (unbounded span)."""
import os

import numpy as np

from pgrtk_tpu.core import aln_ref


def _load_hits(test_data_dir, n=400):
    hits = []
    with open(os.path.join(test_data_dir, "test_hits")) as f:
        for line in f:
            v = [int(t) for t in line.split()]
            hits.append(((v[0], v[1], v[2]), (v[3], v[4], v[5])))
            if len(hits) >= n:
                break
    return hits


def test_chain_scores_match_reference_full_lookback(test_data_dir):
    import jax.numpy as jnp

    from pgrtk_tpu.ops import chain as dchain

    hits = _load_hits(test_data_dir, 256)
    hits_sorted = sorted(hits, key=lambda h: h[0][0])
    ref = aln_ref.sparse_aln(list(hits), 10**9, 0.5, None, False)
    # reference chain scores: reconstruct per-anchor DP score from v_s is
    # not exposed; compare chain partitions + total scores instead
    arr = np.asarray([[*a, *b] for a, b in hits_sorted], dtype=np.uint32)
    anchors, valid = dchain.pad_groups([arr])
    scores, prev = dchain.chain_scores_dense(
        jnp.asarray(anchors), jnp.asarray(valid), 0.5, -1, False,
        lookback=256,
    )
    chains = dchain.traceback(
        np.asarray(scores), np.asarray(prev), valid
    )[0]
    assert len(chains) == len(ref)
    for (ds, dtrack), (rs, rtrack) in zip(chains, ref):
        assert abs(ds - rs) < 1e-3 * max(1.0, abs(rs))
        got = [
            (
                tuple(int(x) for x in anchors[0, i, :3]),
                tuple(int(x) for x in anchors[0, i, 3:]),
            )
            for i in dtrack
        ]
        assert got == rtrack


def test_chain_scores_oriented_and_gap(test_data_dir):
    import jax.numpy as jnp

    from pgrtk_tpu.ops import chain as dchain

    hits = _load_hits(test_data_dir, 256)
    hits_sorted = sorted(hits, key=lambda h: h[0][0])
    arr = np.asarray([[*a, *b] for a, b in hits_sorted], dtype=np.uint32)
    anchors, valid = dchain.pad_groups([arr])
    for oriented, max_gap in ((True, -1), (False, 1000), (True, 1000)):
        ref = aln_ref.sparse_aln(
            list(hits), 10**9, 0.5, None if max_gap < 0 else max_gap, oriented
        )
        scores, prev = dchain.chain_scores_dense(
            jnp.asarray(anchors), jnp.asarray(valid), 0.5, max_gap, oriented,
            lookback=256,
        )
        chains = dchain.traceback(np.asarray(scores), np.asarray(prev), valid)[0]
        assert len(chains) == len(ref), (oriented, max_gap)
        assert all(
            abs(a[0] - b[0]) < 1e-3 * max(1.0, abs(b[0]))
            for a, b in zip(chains, ref)
        )
