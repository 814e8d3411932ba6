"""Bucketed probe-table tests (ops/probe.py)."""
import numpy as np


def _planes(q):
    import jax.numpy as jnp

    return (
        jnp.asarray((q[:, 0] >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((q[:, 0] & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((q[:, 1] >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((q[:, 1] & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )


def test_probe_membership_and_rows():
    import jax.numpy as jnp

    from pgrtk_tpu.ops import probe as PR

    rng = np.random.default_rng(0)
    N, Q = 1 << 14, 1 << 11
    keys = np.unique(
        rng.integers(0, 1 << 56, (N, 2)).astype(np.uint64), axis=0
    )
    keys = keys[np.lexsort((keys[:, 1], keys[:, 0]))]
    t = PR.build_probe_table(keys)
    tbl = dict(
        bits=t["bits"],
        planes=[jnp.asarray(t["planes"][i]) for i in range(4)],
        row=jnp.asarray(t["row"]),
    )
    present_rows = rng.integers(0, len(keys), Q // 2)
    absent = rng.integers(0, 1 << 56, (Q - Q // 2, 2)).astype(np.uint64)
    q = np.concatenate([keys[present_rows], absent])
    found, row = PR.probe_keys(tbl, *_planes(q))
    found, row = np.asarray(found), np.asarray(row)

    key_set = {tuple(k) for k in keys.tolist()}
    exp_found = np.array([tuple(k) in key_set for k in q.tolist()])
    assert (found == exp_found).all()
    assert (row[: Q // 2][found[: Q // 2]] ==
            present_rows[found[: Q // 2]]).all()
    f2 = np.asarray(PR.probe_found(tbl, *_planes(q)))
    assert (f2 == exp_found).all()


def test_probe_handles_duplicate_keys():
    import jax.numpy as jnp

    from pgrtk_tpu.ops import probe as PR

    rng = np.random.default_rng(1)
    base = rng.integers(0, 1 << 56, (256, 2)).astype(np.uint64)
    keys = np.repeat(base, 3, axis=0)
    keys = keys[np.lexsort((keys[:, 1], keys[:, 0]))]
    t = PR.build_probe_table(keys, avg_per_bucket=16)
    tbl = dict(
        bits=t["bits"],
        planes=[jnp.asarray(t["planes"][i]) for i in range(4)],
        row=jnp.asarray(t["row"]),
    )
    found, row = PR.probe_keys(tbl, *_planes(base))
    assert bool(np.asarray(found).all())
    # first-occurrence row: the key at that row matches the query
    r = np.asarray(row)
    assert (keys[r] == base).all()
