"""Device end-to-end query pipeline (ops/query_e2e.py) vs the host
pipeline (core/query.py) on a synthetic mini-pangenome.

The device path runs sketch -> pair -> probe -> postings row expansion
-> chain DP inside one traceable function; the host path is the parity-
tested reference implementation of seq_db.rs:1198-1257 +
aln.rs:147-242.  Chains must match exactly (scores bit-equal, tracks
tuple-equal) for every (query, target) group.
"""
import numpy as np
import pytest

BASES = b"ACGT"


def _to_bytes(arr2bit):
    return bytes(bytearray(BASES[b] for b in arr2bit))


def _mutate(base, rate, rng):
    out = base.copy()
    n = rng.binomial(len(base), rate)
    pos = rng.choice(len(base), size=n, replace=False)
    out[pos] = (out[pos] + rng.integers(1, 4, size=n)) % 4
    return out


@pytest.fixture(scope="module")
def synth():
    from pgrtk_tpu.ops import query_e2e

    rng = np.random.default_rng(3)
    L, T, B = 16384, 4, 2
    base = rng.integers(0, 4, size=L, dtype=np.uint8)
    targets = np.stack([_mutate(base, 2e-4, rng) for _ in range(T)])
    queries = np.stack([_mutate(base, 2e-4, rng) for _ in range(B)])
    idx = query_e2e.build_synth_index(targets, n_decoys=2000, seed=11)
    return dict(idx=idx, targets=targets, queries=queries, L=L, T=T, B=B)


def test_device_e2e_query_matches_host_pipeline(synth):
    import jax
    import jax.numpy as jnp

    from pgrtk_tpu.core import query as query_mod
    from pgrtk_tpu.core.spec import ShmmrSpec
    from pgrtk_tpu.ops import chain as chain_ops
    from pgrtk_tpu.ops import query_e2e

    idx = synth["idx"]
    queries = synth["queries"]
    B, L, C = synth["B"], synth["L"], synth["T"]
    assert idx["n_multi_dropped"] < 20  # synthetic data is near-unique

    probe = idx["probe"]
    res = jax.jit(
        query_e2e.query_e2e_step,
        static_argnames=("probe_bits", "C"),
    )(
        jnp.asarray(queries),
        jnp.full((B,), L, jnp.int32),
        probe["bits"],
        [jnp.asarray(probe["planes"][i]) for i in range(4)],
        jnp.asarray(probe["fence"]),
        jnp.asarray(idx["postings"]),
        C,
    )
    assert not bool(res["overflow"])
    anchors = np.asarray(res["anchors"])
    gvalid = np.asarray(res["gvalid"])
    scores = np.asarray(res["scores"])
    prev = np.asarray(res["prev"])
    dup = np.asarray(res["dup"])
    inexact = np.asarray(res["inexact"])
    assert not dup.any() and not inexact.any()

    dev_chains = chain_ops.traceback(scores, prev, gvalid, anchors)

    # host pipeline per query
    spec = ShmmrSpec(80, 56, 4, 64, True)
    lookup = idx["lookup"]
    n_groups_checked = 0
    for b in range(B):
        raw = query_mod.raw_query_fragment(
            lambda s0, s1: lookup.get((s0, s1), []),
            _to_bytes(queries[b]),
            spec,
        )
        host = dict(query_mod.query_fragment_to_hps(raw, 0.025))
        for c in range(C):
            g = b * C + c
            n_anchors = int(gvalid[g].sum())
            if n_anchors <= 1:
                # the host path skips <=1-anchor groups entirely, so it
                # must not have chains the device lost
                assert c not in host, f"device lost anchors b={b} sid={c}"
                continue
            assert c in host, f"host missing group b={b} sid={c}"
            hchains = host[c]
            dchains = dev_chains[g]
            assert len(hchains) == len(dchains)
            for (hs, htrack), (ds, dtrack) in zip(hchains, dchains):
                assert np.float32(hs) == np.float32(ds)
                assert htrack == dtrack
            n_groups_checked += 1
    assert n_groups_checked == B * C  # every group had real chains


def test_anchor_sets_match_host_collect(synth):
    """The device (query, target) anchor lanes must equal the host
    count-filtered per-target hit lists (collect_target_hits)."""
    import jax
    import jax.numpy as jnp

    from pgrtk_tpu.core import query as query_mod
    from pgrtk_tpu.core.spec import ShmmrSpec
    from pgrtk_tpu.ops import query_e2e

    idx = synth["idx"]
    queries = synth["queries"]
    B, L, C = synth["B"], synth["L"], synth["T"]
    probe = idx["probe"]
    res = jax.jit(
        query_e2e.query_e2e_step,
        static_argnames=("probe_bits", "C"),
    )(
        jnp.asarray(queries),
        jnp.full((B,), L, jnp.int32),
        probe["bits"],
        [jnp.asarray(probe["planes"][i]) for i in range(4)],
        jnp.asarray(probe["fence"]),
        jnp.asarray(idx["postings"]),
        C,
    )
    anchors = np.asarray(res["anchors"])
    gvalid = np.asarray(res["gvalid"])
    spec = ShmmrSpec(80, 56, 4, 64, True)
    lookup = idx["lookup"]
    for b in range(B):
        raw = query_mod.raw_query_fragment(
            lambda s0, s1: lookup.get((s0, s1), []),
            _to_bytes(queries[b]),
            spec,
        )
        th = query_mod.collect_target_hits(raw)
        for c in range(C):
            g = b * C + c
            dev = [
                tuple(int(v) for v in row)
                for row in anchors[g][gvalid[g]]
            ]
            host = [(*l, *t) for l, t in th.get(c, [])]
            assert dev == host, f"anchor mismatch b={b} sid={c}"


def test_in_query_duplicate_pair_count_filter():
    """A query with a tandem-duplicated block carries duplicate pair
    keys; with max_count=1 the host pipeline drops their hits and the
    device path must match exactly (and still match at the default 128
    where the filter does not bind)."""
    import jax
    import jax.numpy as jnp

    from pgrtk_tpu.core import query as query_mod
    from pgrtk_tpu.core.spec import ShmmrSpec
    from pgrtk_tpu.ops import query_e2e

    rng = np.random.default_rng(9)
    L, T = 16384, 3
    base = rng.integers(0, 4, size=L, dtype=np.uint8)
    targets = np.stack([_mutate(base, 2e-4, rng) for _ in range(T)])
    # query: mutated copy with the middle 4 kb tandem-duplicated
    q = _mutate(base, 2e-4, rng)
    q = np.concatenate([q[:8192], q[4096:8192], q[8192:12288]])
    queries = q[None, :]
    B, LQ = queries.shape

    idx = query_e2e.build_synth_index(targets, n_decoys=500, seed=4)
    probe = idx["probe"]
    spec = ShmmrSpec(80, 56, 4, 64, True)
    lookup = idx["lookup"]

    raw = query_mod.raw_query_fragment(
        lambda s0, s1: lookup.get((s0, s1), []), _to_bytes(q), spec
    )
    # the duplicated block must actually produce duplicate pairs
    from collections import Counter

    counts = Counter(pair for pair, _p, sigs in raw if sigs)
    assert max(counts.values()) >= 2

    for mc in (1, 128):
        res = jax.jit(
            query_e2e.query_e2e_step,
            static_argnames=(
                "probe_bits", "C", "max_count", "max_count_query",
                "max_count_target",
            ),
        )(
            queries,
            jnp.full((B,), LQ, jnp.int32),
            probe["bits"],
            [jnp.asarray(probe["planes"][i]) for i in range(4)],
            jnp.asarray(probe["fence"]),
            jnp.asarray(idx["postings"]),
            T,
            max_count=mc,
        )
        anchors = np.asarray(res["anchors"])
        gvalid = np.asarray(res["gvalid"])
        th = query_mod.collect_target_hits(raw, max_count=mc)
        for c in range(T):
            dev = [
                tuple(int(v) for v in rrow)
                for rrow in anchors[c][gvalid[c]]
            ]
            host = [(*lft, *t) for lft, t in th.get(c, [])]
            assert dev == host, f"sid={c} max_count={mc}"
        if mc == 1:
            n_all = sum(len(v) for v in query_mod.collect_target_hits(
                raw
            ).values())
            n_f = sum(len(v) for v in th.values())
            assert n_f < n_all  # the filter actually bound
