"""Consensus / error correction.

Four algorithms re-deriving the reference `ec` module
(pgr-db/src/ec.rs:21-684):
  - naive_dbg_consensus        : base-kmer de Bruijn + toposort max-weight path
  - shmmr_dbg_consensus        : shimmer-pair DBG + weighted DFS per branch
  - guided_shmmr_dbg_consensus : guide-read-constrained walk
  - shmmr_sparse_aln_consensus : chain all reads onto the guide, keep
    regions with >= min_cov support, patch gaps with majority sequence
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from . import query as query_mod
from .fasta import reverse_complement
from .seqdb import CompactSeqDB
from .spec import ShmmrSpec


def naive_dbg_consensus(seqs: List[bytes], kmer_size: int, min_cov: int) -> bytes:
    """(reference: ec.rs:21-149)"""
    succ: Dict[int, dict] = {}
    pred: Dict[int, dict] = {}
    kmer_idx: Dict[bytes, int] = {}
    idx_kmer: List[bytes] = []
    kmer_count: Dict[int, int] = {}

    def intern(km: bytes) -> int:
        i = kmer_idx.get(km)
        if i is None:
            i = len(idx_kmer)
            kmer_idx[km] = i
            idx_kmer.append(km)
        return i

    tgt_seq = bytes(seqs[0])
    for seq in seqs:
        seq = bytes(seq)
        if len(seq) < kmer_size:
            raise ValueError("sequence needs to be longer than the k-mer size")
        k0 = intern(seq[0:kmer_size])
        kmer_count[k0] = kmer_count.get(k0, 0) + 1
        for p in range(1, len(seq) - kmer_size + 1):
            k1 = intern(seq[p : p + kmer_size])
            kmer_count[k1] = kmer_count.get(k1, 0) + 1
            succ.setdefault(k0, {})[k1] = None
            succ.setdefault(k1, {})
            pred.setdefault(k1, {})[k0] = None
            pred.setdefault(k0, {})
            k0 = k1

    # Kahn toposort
    indeg = {v: len(pred.get(v, {})) for v in succ}
    stack = [v for v in succ if indeg[v] == 0]
    order = []
    while stack:
        v = stack.pop()
        order.append(v)
        for w in succ.get(v, {}):
            indeg[w] -= 1
            if indeg[w] == 0:
                stack.append(w)
    if len(order) != len(succ):
        raise ValueError("circle found")

    node_score: Dict[int, int] = {}
    track_back: Dict[int, Optional[int]] = {}
    best_score = 0
    best_node = 0
    for m in order:
        bs = 0
        bn = None
        for v in pred.get(m, {}):
            s = node_score[v]
            if bn is None or s > bs:
                bs = s
                bn = v
        ns = bs + kmer_count[m]
        node_score[m] = ns
        track_back[m] = bn
        if ns > best_score:
            best_score = ns
            best_node = m

    tgt_rev_path: Dict[int, Optional[int]] = {}
    for p in range(len(tgt_seq) - kmer_size + 1):
        idx0 = kmer_idx[tgt_seq[p : p + kmer_size]]
        if p == 0:
            tgt_rev_path[idx0] = None
        else:
            tgt_rev_path[idx0] = kmer_idx[tgt_seq[p - 1 : p + kmer_size - 1]]

    cur = kmer_idx[tgt_seq[len(tgt_seq) - kmer_size :]]
    rev_path = [cur]
    while True:
        p_idx = tgt_rev_path.get(cur)
        if p_idx is not None and kmer_count[p_idx] >= min_cov:
            cur = p_idx
            rev_path.append(cur)
            continue
        p_idx = track_back.get(cur)
        if p_idx is not None:
            cur = p_idx
            rev_path.append(cur)
        else:
            break
    rev_path.reverse()
    bases = bytearray(idx_kmer[rev_path[0]])
    for p in rev_path[1:]:
        bases.append(idx_kmer[p][kmer_size - 1])
    return bytes(bases)


def _build_index_db(seqs: List[bytes], spec: ShmmrSpec) -> CompactSeqDB:
    db = CompactSeqDB(spec)
    db.load_seqs(
        [("Memory", str(i), bytes(s)) for i, s in enumerate(seqs)],
        store_frags=True,
    )
    return db


def _frag_graph(seqs: List[bytes], spec: ShmmrSpec):
    """Shared setup for the shimmer DBG methods (reference: ec.rs:169-217):
    build an index, collect per-node fragment sequences (both strands) and
    scores, and the adjacency graph."""
    from ..graph import bundles as gb

    sdb = _build_index_db(seqs, spec)
    frg_seqs: Dict[tuple, bytes] = {}
    score: Dict[tuple, int] = {}
    k = spec.k
    for key, sigs in sdb.frag_map.items():
        _fid, sid, b, e, strand = sigs[0]
        seq = bytes(seqs[sid][b - k : e])
        node = (key[0], key[1], strand)
        score[node] = len(sigs)
        frg_seqs.setdefault(node, seq)
        rnode = (key[0], key[1], 1 - strand)
        score[rnode] = len(sigs)
        frg_seqs.setdefault(rnode, reverse_complement(seq))
    adj_list = gb.frag_map_to_adj_list(sdb.frag_map, 0, None)
    return sdb, frg_seqs, score, adj_list


def shmmr_dbg_consensus(
    seqs: List[bytes], shmmr_spec: Optional[ShmmrSpec] = None
) -> List[Tuple[bytes, List[int]]]:
    """(reference: ec.rs:156-267)"""
    spec = shmmr_spec or ShmmrSpec(w=31, k=31, r=1, min_span=0, sketch=False)
    assert spec.k % 2 == 1 and spec.min_span == 0
    from ..graph import bundles as gb

    _sdb, frg_seqs, score, adj_list = _frag_graph(seqs, spec)
    start = adj_list[0][1]
    g = gb.build_digraph(adj_list)
    walk = gb.weighted_dfs_walk(g, score, start)

    out_seqs = []
    out_seq = bytearray()
    out_cov: List[int] = []
    k = spec.k
    for node, _p, node_count, is_leaf, _rank, _bid, _brank in walk:
        seq = frg_seqs[node]
        if not out_seq:
            out_seq.extend(seq)
            out_cov.extend([node_count] * len(seq))
        else:
            assert bytes(out_seq[-k:]) == seq[:k]
            out_seq.extend(seq[k:])
            out_cov.extend([node_count] * (len(seq) - k))
        if is_leaf:
            out_seqs.append((bytes(out_seq), list(out_cov)))
            out_seq.clear()
            out_cov.clear()
    return out_seqs


def guided_shmmr_dbg_consensus(
    seqs: List[bytes],
    shmmr_spec: Optional[ShmmrSpec] = None,
    min_cov: int = 2,
) -> Tuple[bytes, List[int]]:
    """(reference: ec.rs:274-470)"""
    spec = shmmr_spec or ShmmrSpec(w=31, k=31, r=1, min_span=0, sketch=False)
    assert spec.k % 2 == 1 and spec.min_span == 0
    from ..graph import bundles as gb
    from . import sketch as sketch_mod

    _sdb, frg_seqs, score, adj_list = _frag_graph(seqs, spec)
    g = gb.build_digraph(adj_list)
    start = adj_list[0][1]

    mers = sketch_mod.sequence_to_shmmrs(0, bytes(seqs[0]), spec, False)
    guide_nodes: Dict[tuple, int] = {}
    for s0, s1, p0, _p1, ori in query_mod.pair_shmmrs_canonical(mers):
        node = (s0, s1, ori)
        if score.get(node, 0) >= min_cov:
            guide_nodes[node] = p0

    visited = set()
    out = []
    node = (score[start], start)
    last_guide = None
    while True:
        if node[1] in visited:
            break
        visited.add(node[1])
        out_count = 0
        succ_list = []
        next_guide = None
        min_dist = None
        cur_pos = guide_nodes.get(node[1])
        for succ in g.out_neighbors(node[1]):
            if succ in visited:
                continue
            out_count += 1
            s = score[succ]
            if succ in guide_nodes:
                if cur_pos is not None:
                    pos2 = guide_nodes[succ]
                    if pos2 > cur_pos:
                        dist = pos2 - cur_pos
                        if min_dist is None:
                            min_dist = dist
                            next_guide = (s, succ)
                        elif dist < min_dist:
                            next_guide = (s, succ)
                else:
                    next_guide = (s, succ)
            else:
                succ_list.append((s, succ))
        if out_count == 0:
            break
        emitted = node
        if next_guide is not None:
            node = next_guide
            last_guide = node[1]
        elif succ_list:
            succ_list.sort(key=lambda t: t[0])
            node = succ_list.pop()
        else:
            break
        out.append((emitted[1], score[emitted[1]]))

    out_seq = bytearray()
    out_cov: List[int] = []
    k = spec.k
    for node_, node_count in out:
        seq = frg_seqs[node_]
        if not out_seq:
            out_seq.extend(seq)
            out_cov.extend([node_count] * len(seq))
        else:
            assert bytes(out_seq[-k:]) == seq[:k]
            out_seq.extend(seq[k:])
            out_cov.extend([node_count] * (len(seq) - k))
        if last_guide is not None and node_ == last_guide:
            break
    return bytes(out_seq), out_cov


def shmmr_sparse_aln_consensus(
    seqs: List[bytes],
    shmmr_spec: Optional[ShmmrSpec] = None,
    min_cov: int = 2,
) -> List[Tuple[bytes, List[int]]]:
    """(reference: ec.rs:479-508)"""
    spec = shmmr_spec or ShmmrSpec(w=33, k=33, r=1, min_span=0, sketch=False)
    assert spec.k % 2 == 1 and spec.min_span == 0
    sdb = _build_index_db(seqs, spec)
    out = shmmr_sparse_aln_consensus_with_sdb([0], sdb, min_cov)
    return out[0][1]


def shmmr_sparse_aln_consensus_with_sdb(
    sids: List[int], sdb: CompactSeqDB, min_cov: int
) -> List[Tuple[int, List[Tuple[bytes, List[int]]]]]:
    """(reference: ec.rs:517-684)"""
    spec = sdb.spec
    assert spec.k % 2 == 1 and spec.min_span == 0

    def one(sid0: int):
        seq0 = sdb.get_seq_by_id(sid0)
        raw = query_mod.raw_query_fragment(
            lambda a, b: sdb.frag_map.get((a, b), []), seq0, spec
        )
        hit_pairs = query_mod.query_fragment_to_hps(
            raw, 0.1, 32, 32, 32, 33, None, True
        )
        hit_map: Dict[tuple, List[tuple]] = {}
        for sid, hits in hit_pairs:
            if hits:
                for v, w in hits[0][1]:  # only the main chain
                    hit_map.setdefault(v, []).append((sid, w))

        reliable = []
        for key in sorted(hit_map):
            m = hit_map[key]
            if len({sid for sid, _ in m}) >= min_cov:
                reliable.append((key, len(m)))

        out_seqs = []
        seq = bytearray()
        cov: List[int] = []
        p_region = None
        k = spec.k
        for r, c in reliable:
            if p_region is None:
                p_region = (r, c)
                seq.extend(seq0[r[0] : r[1]])
                cov.extend([c] * (r[1] - r[0]))
                continue
            if r[0] == p_region[0][1]:
                seq.extend(seq0[r[0] : r[1]])
                cov.extend([c] * (r[1] - r[0]))
            else:
                p_hit = dict(hit_map[p_region[0]])
                c_hit = dict(hit_map[r])
                seq_count: Dict[bytes, int] = {}
                for sid, v in p_hit.items():
                    if sid == sid0 or sid not in c_hit:
                        continue
                    w = c_hit[sid]
                    if v[0] < w[0] and v[1] < w[1] and v[1] < w[0]:
                        s0 = sdb.get_seq_by_id(sid)
                        s = bytes(s0[v[1] : w[0]])
                        seq_count[s] = seq_count.get(s, 0) + 1
                    elif w[0] < v[0] and w[1] < v[1] and w[1] < v[0]:
                        s0 = sdb.get_seq_by_id(sid)
                        s = reverse_complement(bytes(s0[w[1] - k : v[0] - k]))
                        seq_count[s] = seq_count.get(s, 0) + 1
                patch_cov = 0
                patch_seq = b""
                if seq_count:
                    ranked = sorted((v, k_) for k_, v in seq_count.items())
                    patch_cov, patch_seq = ranked[-1]
                if patch_cov >= min_cov:
                    cov.extend([patch_cov] * len(patch_seq))
                    seq.extend(patch_seq)
                    seq.extend(seq0[r[0] : r[1]])
                    cov.extend([c] * (r[1] - r[0]))
                else:
                    out_seqs.append((bytes(seq), list(cov)))
                    seq.clear()
                    cov.clear()
                    seq.extend(seq0[r[0] : r[1]])
                    cov.extend([c] * (r[1] - r[0]))
            p_region = (r, c)
        out_seqs.append((bytes(seq), cov))
        return out_seqs

    return [(sid, one(sid)) for sid in sids]
