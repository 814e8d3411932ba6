"""pgr-pbundle-bed2dist equivalent: bundle-level distances between every
contig pair + average-linkage dendrogram.

Mirrors the reference CLI (pgr-bin/src/bin/pgr-pbundle-bed2dist.rs):
bundle alignment DP with score 2*min_len match / -2*len indel; distance =
diff_len/max_len (the larger of the two asymmetric runs); outputs .dist,
.nwk (newick) and .ddg (dendrogram layout).
"""
from __future__ import annotations

import argparse
import sys
from typing import Dict, List, NamedTuple


class BundleSegment(NamedTuple):
    bgn: int
    end: int
    bundle_id: int
    bundle_v_count: int
    bundle_dir: int
    bundle_v_bgn: int
    bundle_v_end: int


MATCH, INSERTION, DELETION = 0, 1, 2


def align_bundles(q_bundles, t_bundles):
    """(reference: pgr-pbundle-bed2dist.rs:39-149)"""
    q_count = len(q_bundles)
    t_count = len(t_bundles)
    NEG = -(1 << 62)
    s_map: Dict[tuple, int] = {}
    t_map: Dict[tuple, int] = {}

    for t_idx in range(t_count):
        for q_idx in range(q_count):
            q_seg = q_bundles[q_idx]
            t_seg = t_bundles[t_idx]
            q_len = abs(q_seg.end - q_seg.bgn)
            t_len = abs(t_seg.end - t_seg.bgn)
            min_len = min(q_len, t_len)
            best = (MATCH, NEG)
            if (
                q_idx == 0
                and t_idx == 0
                and q_seg.bundle_id == t_seg.bundle_id
                and q_seg.bundle_dir == t_seg.bundle_dir
            ):
                best = (MATCH, 2 * min_len)
            if (
                q_idx > 0
                and t_idx > 0
                and q_seg.bundle_id == t_seg.bundle_id
                and q_seg.bundle_dir == t_seg.bundle_dir
            ):
                best = (MATCH, 2 * min_len + s_map[(q_idx - 1, t_idx - 1)])
            if t_idx > 0:
                score = -2 * q_len + s_map[(q_idx, t_idx - 1)]
                if score > best[1]:
                    best = (DELETION, score)
            if q_idx > 0:
                score = -2 * t_len + s_map[(q_idx - 1, t_idx)]
                if score > best[1]:
                    best = (INSERTION, score)
            t_map[(q_idx, t_idx)] = best[0]
            s_map[(q_idx, t_idx)] = best[1]

    q_idx = q_count - 1
    t_idx = t_count - 1
    diff_len = 0
    max_len = 1
    while (q_idx, t_idx) in t_map:
        aln_type = t_map[(q_idx, t_idx)]
        if aln_type == MATCH:
            q_len = abs(q_bundles[q_idx].end - q_bundles[q_idx].bgn)
            t_len = abs(t_bundles[t_idx].end - t_bundles[t_idx].bgn)
            diff_len += abs(q_len - t_len)
            max_len += max(q_len, t_len)
            q_idx -= 1
            t_idx -= 1
        elif aln_type == INSERTION:
            q_len = abs(q_bundles[q_idx].end - q_bundles[q_idx].bgn)
            diff_len += q_len
            max_len += q_len
            q_idx -= 1
        else:
            t_len = abs(t_bundles[t_idx].end - t_bundles[t_idx].bgn)
            diff_len += t_len
            max_len += t_len
            t_idx -= 1
        if q_idx < 0 or t_idx < 0:
            break
    return diff_len / max_len, diff_len, max_len


def read_bed(bed_file_path: str) -> List[tuple]:
    ctg_data: Dict[str, List[BundleSegment]] = {}
    with open(bed_file_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            fields = line.split("\t")
            ctg = fields[0]
            bgn = int(fields[1])
            end = int(fields[2])
            pb = fields[3].split(":")
            ctg_data.setdefault(ctg, []).append(
                BundleSegment(
                    bgn, end, int(pb[0]), int(pb[1]), int(pb[2]),
                    int(pb[3]), int(pb[4]),
                )
            )
    out = [(ctg, sorted(v)) for ctg, v in ctg_data.items()]
    out.sort()
    return out


def _fmt_f32(v: float) -> str:
    import numpy as np

    return np.format_float_positional(np.float32(v), unique=True, trim="-")


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="pgr-pbundle-bed2dist",
        description="Generate alignment scores between sequences using "
        "bundle decomposition from a principal bundle bed file",
    )
    p.add_argument("bed_file_path")
    p.add_argument("output_prefix")
    from ..utils.version import add_version_arg

    add_version_arg(p)
    args = p.parse_args(argv)

    ctg_data = read_bed(args.bed_file_path)
    n_ctg = len(ctg_data)

    dist_map = {}
    with open(args.output_prefix + ".dist", "w") as out:
        for i in range(n_ctg):
            for j in range(i, n_ctg):
                ctg0, b0 = ctg_data[i]
                ctg1, b1 = ctg_data[j]
                d0 = align_bundles(b0, b1)
                d1 = align_bundles(b1, b0)
                dist, diff_len, max_len = d0 if d0[0] > d1[0] else d1
                out.write(
                    f"{ctg0} {ctg1} {_fmt_f32(dist)} {diff_len} {max_len}\n"
                )
                if i != j:
                    out.write(
                        f"{ctg1} {ctg0} {_fmt_f32(dist)} {diff_len} {max_len}\n"
                    )
                    dist_map[(i, j)] = dist

    if n_ctg < 2:
        open(args.output_prefix + ".nwk", "w").write(";\n")
        open(args.output_prefix + ".ddg", "w").close()
        return 0

    import numpy as np
    from scipy.cluster.hierarchy import linkage

    condensed = np.asarray(
        [
            dist_map[(i, j)]
            for i in range(n_ctg - 1)
            for j in range(i + 1, n_ctg)
        ],
        dtype=np.float64,
    )
    Z = linkage(condensed, method="average")

    # newick + dendrogram layout (reference: bed2dist.rs:244-333)
    node_data = {
        i: (str(i), [i], 0.0) for i in range(n_ctg)
    }
    steps = [
        (int(row[0]), int(row[1]), float(row[2]), int(row[3])) for row in Z
    ]
    last_node_id = 0
    for c, (c1, c2, diss, _size) in enumerate(steps):
        s1, n1, h1 = node_data.pop(c1)
        s2, n2, h2 = node_data.pop(c2)
        new_id = c + n_ctg
        if len(n1) > len(n2):
            nodes = n1 + n2
            new_s = f"({s1}:{_fmt_f32(diss - h1)}, {s2}:{_fmt_f32(diss - h2)})"
        else:
            nodes = n2 + n1
            new_s = f"({s2}:{_fmt_f32(diss - h2)}, {s1}:{_fmt_f32(diss - h1)})"
        node_data[new_id] = (new_s, nodes, diss)
        last_node_id = new_id

    tree_string, nodes, _ = node_data.get(last_node_id, ("", [], 0.0))
    with open(args.output_prefix + ".nwk", "w") as f:
        f.write(f"{tree_string};\n")

    with open(args.output_prefix + ".ddg", "w") as f:
        node_position_size = {}
        position = 0.0
        for ctg_idx in nodes:
            node_position_size[ctg_idx] = ((position, 0.0), 1)
            f.write(f"L\t{ctg_idx}\t{ctg_data[ctg_idx][0]}\n")
            position += 1.0
        for c, (c1, c2, diss, size) in enumerate(steps):
            (pos0, _), size0 = node_position_size[c1]
            (pos1, _), size1 = node_position_size[c2]
            pos = (size0 * pos0 + size1 * pos1) / (size0 + size1)
            f.write(f"I\t{c + n_ctg}\t{c1}\t{c2}\t{size}\t{_fmt_f32(diss)}\n")
            node_position_size[c + n_ctg] = ((pos, diss), size)
        for vid in sorted(node_position_size):
            (pos, h), size = node_position_size[vid]
            f.write(f"P\t{vid}\t{_fmt_f32(pos)}\t{_fmt_f32(h)}\t{size}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
