"""pgrtk_tpu — TPU-native PanGenomics Research Tool Kit.

A ground-up re-design of the capabilities of PGR-tk (SHIMMER indexing,
anchor query, sparse chaining, WFA alignment, MAP-graph / principal-bundle
decomposition) for TPU hardware: JAX/XLA/Pallas device kernels for the
batched compute paths, a native C++ runtime for host-side scalar kernels
and IO, and jax.sharding meshes for multi-chip scale-out.
"""
from .api import SeqIndexDB, get_principal_bundle_decomposition  # noqa: F401
from .core.ec import (  # noqa: F401
    guided_shmmr_dbg_consensus,
    naive_dbg_consensus,
    shmmr_dbg_consensus,
    shmmr_sparse_aln_consensus,
)
from .core.wfa import (  # noqa: F401
    get_variant_segments,
    get_variants_from_aln_pair_map,
    wfa_align_bases,
    wfa_aln_pair_map,
)
from .core.fasta import reverse_complement  # noqa: F401
from .core.pga import AGCFile, PgaFile  # noqa: F401
from .core.agc import AgcFile, open_archive  # noqa: F401
from .core.spec import ShmmrSpec  # noqa: F401


def sparse_aln(sp_hits, max_span, penalty, max_gap=None, orientated=False):
    """Sparse anchor chaining DP (reference: pgr-tk/src/lib.rs:1539-1549)."""
    from .core import aln_ref
    from .native import api as native

    if native.available():
        import numpy as np

        arr = np.asarray([[*a, *b] for a, b in sp_hits], dtype=np.uint32)
        chains = native.sparse_aln(arr, max_span, penalty, max_gap, orientated)
        return [
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
    return aln_ref.sparse_aln(list(sp_hits), max_span, penalty, max_gap, orientated)


def get_shmmr_pairs_from_seq(seq, w=80, k=56, r=4, min_span=16, padding=False):
    """Canonical shimmer pairs of a sequence
    (reference: pgr-tk/src/lib.rs:1582-1613)."""
    from .core import query as query_mod
    from .core import sketch as sketch_mod

    spec = ShmmrSpec(w=w, k=k, r=r, min_span=min_span, sketch=False)
    mers = sketch_mod.sequence_to_shmmrs(0, bytes(seq), spec, padding)
    return query_mod.pair_shmmrs_canonical(mers)


def get_shmmr_dots(seq0, seq1, w=80, k=56, r=4, min_span=16):
    """Matched shimmer positions for a dot plot
    (reference: pgr-tk/src/lib.rs:1650-1692)."""
    from .core import sketch as sketch_mod

    spec = ShmmrSpec(w=w, k=k, r=r, min_span=min_span, sketch=False)
    m0 = sketch_mod.sequence_to_shmmrs(0, bytes(seq0), spec, False)
    m1 = sketch_mod.sequence_to_shmmrs(1, bytes(seq1), spec, False)
    base = {}
    for x_, y_ in m0:
        base.setdefault(x_ >> 8, []).append((y_ & 0xFFFFFFFF) >> 1)
    xs, ys = [], []
    for x_, y_ in m1:
        py = (y_ & 0xFFFFFFFF) >> 1
        for px in base.get(x_ >> 8, []):
            xs.append(px)
            ys.append(py)
    return xs, ys


def get_wfa_aln_pair_map(
    target_str,
    query_str,
    max_wf_length,
    mismatch_penalty,
    open_penalty,
    extension_penalty,
    max_diff_percent,
):
    """WFA + pair map with a length-difference guard
    (reference: pgr-tk/src/lib.rs:1737-1772)."""
    from .core import wfa as wfa_mod

    diff = abs(len(query_str) - len(target_str))
    if max_wf_length is None:
        max_wf_length = max(2 * diff, 128)
    if (
        max_wf_length > 128
        and max_wf_length / min(len(target_str), len(query_str))
        > max_diff_percent
    ):
        return None
    res = wfa_mod.wfa_align_bases(
        target_str,
        query_str,
        max_wf_length,
        mismatch_penalty,
        open_penalty,
        extension_penalty,
    )
    if res is None:
        return None
    return wfa_mod.wfa_aln_pair_map(res[0], res[1])

__version__ = "0.1.0"


def pgr_lib_version() -> str:
    return f"pgrtk_tpu {__version__}"


def rc_byte_seq(seq: bytes) -> bytes:
    """Reverse complement of a byte sequence
    (reference: pgr-tk/pgrtk/__init__.py)."""
    return reverse_complement(seq)


def rc_u8_seq(seq: bytes) -> bytes:
    """Alias of rc_byte_seq (reference keeps both names:
    pgr-tk/pgrtk/__init__.py:57)."""
    return reverse_complement(seq)


def rc(seq: str) -> str:
    return reverse_complement(seq.encode()).decode()


def string_to_u8(s: str) -> bytes:
    return s.encode()


def u8_to_string(b: bytes) -> str:
    return bytes(b).decode()


def query_sdb(
    seq_index_db,
    query_seq,
    gap_penalty_factor=0.25,
    merge_range_tol=12,
    max_count=128,
    max_query_count=128,
    max_target_count=128,
    max_aln_span=8,
):
    """Query a sequence index database; returns {sid: [(bgn, end, len,
    orientation, aln)]} (reference: pgr-tk/pgrtk/__init__.py:130-221)."""
    r = seq_index_db.query_fragment_to_hps(
        query_seq,
        gap_penalty_factor,
        max_count,
        max_query_count,
        max_target_count,
        max_aln_span,
    )
    sid_to_alns = {}
    for sid, alns in r:
        f_count = 0
        r_count = 0
        for _s, aln in alns:
            if len(aln) > 2:
                sid_to_alns.setdefault(sid, [])
                for hp in aln:
                    if hp[0][2] == hp[1][2]:
                        f_count += 1
                    else:
                        r_count += 1
                orientation = 0 if f_count > r_count else 1
                sid_to_alns[sid].append((aln, orientation))

    aln_range = {}
    for sid, alns in sid_to_alns.items():
        for aln, orientation in alns:
            target_coor = sorted((hp[1][0], hp[1][1]) for hp in aln)
            bgn = min(target_coor[0])
            end = max(target_coor[-1])
            aln_range.setdefault(sid, []).append(
                (bgn, end, end - bgn, orientation, aln)
            )
    if merge_range_tol > 0:
        for sid, rgns in aln_range.items():
            aln_range[sid] = merge_regions(rgns, tol=merge_range_tol)
    return aln_range


def merge_regions(rgns, tol=1000):
    """Merge regions within tol, forward/reverse separately
    (reference: pgrtk/__init__.py:270-328)."""
    rgns = sorted(rgns)
    frgns = [r for r in rgns if r[3] == 0]
    rrgns = [r for r in rgns if r[3] == 1]
    out = []
    for sub in (frgns, rrgns):
        merged = []
        last = None
        for r in sub:
            r = list(r)
            if last is None:
                last = r[1]
                merged.append(r)
                continue
            if r[1] < merged[-1][1]:
                continue
            if r[0] - last < tol:
                merged[-1][1] = r[1]
                merged[-1][2] += r[2]
                merged[-1][4] = merged[-1][4] + r[4]
            else:
                merged.append(r)
            last = merged[-1][1]
        out.extend(merged)
    return out


def map_intervals_in_sdb(
    seq_index_db,
    interval,
    query_seq,
    gap_penalty_factor=0.001,
    max_count=32,
    max_query_count=32,
    max_target_count=32,
    max_aln_span=8,
):
    """Map a (start, end) interval onto database sequences
    (reference: pgrtk/__init__.py:224-268)."""
    assert len(interval) == 2
    pos_map = seq_index_db.map_positions_in_seq(
        list(interval),
        query_seq,
        gap_penalty_factor,
        max_count,
        max_query_count,
        max_target_count,
        max_aln_span,
    )
    seqid_to_positions = {}
    for res in pos_map:
        pos = res[0]
        sid, tpos, orientation = res[1]
        seqid_to_positions.setdefault(sid, {}).setdefault(pos, []).append(
            (tpos, orientation)
        )
    rtn = {}
    for sid, positions in seqid_to_positions.items():
        if interval[0] in positions and interval[1] in positions:
            left_p = positions[interval[0]]
            right_p = positions[interval[1]]
            if len(left_p) != 1 or len(right_p) != 1:
                continue
            (left_p, left_o) = left_p[0]
            (right_p, right_o) = right_p[0]
            if left_o != right_o:
                continue
            rtn[sid] = (left_o, left_p, right_p)
    return rtn


def compute_graph_diffusion_entropy(gfa_fn, max_nodes=6000):
    """Diffusion entropy of a GFA graph
    (reference: pgrtk/__init__.py:330-388)."""
    import numpy as np

    adj_list = {}
    with open(gfa_fn) as f:
        for r in f:
            r = r.strip().split("\t")
            if r[0] != "L":
                continue
            n1 = int(r[1])
            n2 = int(r[3])
            weight = None
            for field in r[6:]:
                field = field.split(":")
                if field[0] == "SC":
                    weight = int(field[2])
            if weight is None:
                weight = 1
            adj_list.setdefault(n1, []).append((n2, weight))
            adj_list.setdefault(n2, []).append((n1, weight))
    n_node = len(adj_list)
    if n_node > max_nodes:
        return None
    adj_matrix = np.zeros((n_node, n_node), dtype=np.float32)
    for v, ws in adj_list.items():
        for w, weight in ws:
            adj_matrix[v][w] = weight
    n_adj_matrix = adj_matrix / np.sum(adj_matrix, axis=1)
    yy = np.ones(n_node, dtype=np.float32) / n_node
    for _ in range(n_node):
        yy = np.inner(n_adj_matrix, yy)
    entropy = -np.sum(yy * np.log2(yy))
    return (entropy, list(enumerate(yy * n_node)))


def group_smps_by_principle_bundle_id(smps, len_cutoff=2500, merge_length=5000):
    """Group decomposition output by bundle id
    (reference: pgrtk/__init__.py:391-467)."""
    pbid, pdirection = None, None
    all_partitions = []
    new_partition = []
    for smp, bundle_info in smps:
        if bundle_info is None:
            continue
        d = 0 if smp[4] == bundle_info[1] else 1
        bid = bundle_info[0]
        bpos = bundle_info[2]
        if pbid is None and pdirection is None:
            new_partition = [(smp, bid, d, bpos)]
            pbid = bid
            pdirection = d
            continue
        if bid != pbid or d != pdirection:
            if (
                new_partition
                and new_partition[-1][0][3] - new_partition[0][0][2] > len_cutoff
            ):
                all_partitions.append(new_partition)
            new_partition = []
            pbid = bid
            pdirection = d
        new_partition.append((smp, bid, d, bpos))
    if (
        new_partition
        and new_partition[-1][0][3] - new_partition[0][0][2] > len_cutoff
    ):
        all_partitions.append(new_partition)

    rtn_partitions = []
    if not all_partitions:
        return rtn_partitions
    partition = all_partitions[0]
    for p in all_partitions[1:]:
        p_end = partition[-1][0][3]
        p_bid = partition[-1][1]
        p_d = partition[-1][2]
        np_bgn = p[0][0][2]
        np_bid = p[0][1]
        np_d = p[0][2]
        if p_bid == np_bid and p_d == np_d and abs(np_bgn - p_end) < merge_length:
            partition.extend(p)
        else:
            rtn_partitions.append(partition)
            partition = p
    rtn_partitions.append(partition)
    return rtn_partitions


def get_principle_bundle_bed_file_for_query(
    seqs, w=64, k=56, r=4, min_span=32, min_cov=2, min_branch_length=8
):
    """(reference: pgrtk/__init__.py:470-506)"""
    sdb = SeqIndexDB()
    sdb.load_from_seq_list(seqs, "memory", w, k, r, min_span)
    principal_bundles, sid_smps = sdb.get_principal_bundle_decomposition(
        min_cov, min_branch_length
    )
    sid_smps = dict(sid_smps)
    sinfo = sorted(sdb.seq_info.items(), key=lambda x: x[1][0])
    bundle_layout = []
    for sid, data in sinfo:
        ctg, _, _ = data
        ctg_items = ctg.split("_")
        ctg_bgn = int(ctg_items[-3])
        smps = sid_smps[sid]
        smp_partitions = group_smps_by_principle_bundle_id(smps, 50, 100000)
        smp_partitions.reverse()
        for p in smp_partitions:
            b = p[0][0][2]
            e = p[-1][0][3] + k
            bid = p[0][1]
            direction = p[0][2]
            bundle_layout.append(
                (
                    ctg,
                    ctg_bgn + b,
                    ctg_bgn + e,
                    f"{bid}:{direction}:{p[0][3]}:{p[-1][3]}",
                )
            )
    return bundle_layout
