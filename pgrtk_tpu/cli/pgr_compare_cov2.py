"""pgr-compare-cov2 equivalent: compare shimmer-pair coverage between two
sample sets in an indexed database, emitting per-pair bedgraph rows and
high/low coverage-ratio region BED files
(reference: pgr-bin/src/bin/pgr-compare-cov2.rs).

Input file rows: prefix \t reference_source \t sample_source...
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

from ..api import SeqIndexDB


def _fmt_f32(v) -> str:
    if np.isnan(v):
        return "NaN"
    if np.isinf(v):
        return "inf"
    return np.format_float_positional(np.float32(v), unique=True, trim="-")


def filter_and_group_regions(regions, max_dist, min_range):
    """(reference: compare-cov2.rs:35-82)"""
    if not regions:
        return []
    chunk = []
    chunks = []
    for v in regions:
        if not chunk:
            chunk.append(v)
            continue
        if v[0] - chunk[-1][1] < max_dist:
            chunk.append(v)
        else:
            if chunk[-1][1] - chunk[0][0] > min_range:
                chunks.append(chunk)
            chunk = []
    if chunk and chunk[-1][1] - chunk[0][0] > min_range:
        chunks.append(chunk)
    out = []
    for v in chunks:
        n = len(v)
        out.append(
            (
                v[0][0],
                v[-1][1],
                sum(x[2] for x in v) / n,
                sum(x[3] for x in v) / n,
                sum(x[4] for x in v) / n,
            )
        )
    return out


def output_cov_bed(out_data, ctg, prefix, threshold, f):
    cov_high = filter_and_group_regions(
        [v for v in out_data if v[2] > threshold + 0.0001], 10000, 10000
    )
    cov_low = filter_and_group_regions(
        [v for v in out_data if v[2] < threshold - 0.0001], 100, 20000
    )
    for v in sorted(cov_high + cov_low, key=lambda x: x[0]):
        f.write(
            f"{ctg}\t{v[0]}\t{v[1]}\t{prefix}:{_fmt_f32(v[2])}\t"
            f"{_fmt_f32(v[3])}\t{_fmt_f32(v[4])}\n"
        )


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="pgr-compare-cov2",
        description="compare shimmer-pair coverage between two datasets",
    )
    p.add_argument("input")
    p.add_argument("-a", "--agc-idx-prefix", default=None)
    p.add_argument("-f", "--frg-idx-prefix", default=None)
    p.add_argument("-t", "--threshold", type=float, default=2.0)
    from ..utils.version import add_version_arg

    add_version_arg(p)
    args = p.parse_args(argv)

    db = SeqIndexDB()
    if args.agc_idx_prefix:
        db.load_from_agc_index(args.agc_idx_prefix)
    elif args.frg_idx_prefix:
        db.load_from_frg_index(args.frg_idx_prefix)
    else:
        raise SystemExit("need an AGC/FRG backed seq index and db")

    lookup = db._lookup_fn()

    with open(args.input) as f:
        jobs = [line.strip().split("\t") for line in f if line.strip()]

    for fields in jobs:
        prefix = fields[0]
        sample_set0 = {fields[1]}
        sample_set1 = set(fields[2:])
        sid_set0 = set()
        sid_set1 = set()
        for sid, (_ctg, src, _l) in db.seq_info.items():
            src = src or ""
            if src in sample_set0:
                sid_set0.add(sid)
            if src in sample_set1:
                sid_set1.add(sid)

        def coverage_rows(sid, num_set, den_set):
            seq = db.get_seq_by_id(sid)
            out = []
            for s0, s1, p0, p1, _ori in db.get_smps(seq):
                hits = lookup(s0, s1)
                c_den = sum(1 for h in hits if h[1] in den_set)
                c_num = sum(1 for h in hits if h[1] in num_set)
                r = c_num / c_den if c_den else float("inf")
                out.append((p0, p1, r, c_den, c_num))
            return out

        with open(prefix + ".0.bedgraph", "w") as bg0, open(
            prefix + ".0.bed", "w"
        ) as bed0:
            for sid in sorted(sid_set0):
                ctg = db.seq_info[sid][0]
                rows = coverage_rows(sid, sid_set1, sid_set0)
                output_cov_bed(rows, ctg, prefix, args.threshold, bed0)
                for v in rows:
                    bg0.write(
                        f"{ctg}\t{v[0]}\t{v[1]}\t{_fmt_f32(v[2])}\t{v[3]}\t{v[4]}\n"
                    )
        with open(prefix + ".1.bedgraph", "w") as bg1, open(
            prefix + ".1.bed", "w"
        ) as bed1:
            for sid in sorted(sid_set1):
                ctg = db.seq_info[sid][0]
                rows = coverage_rows(sid, sid_set0, sid_set1)
                output_cov_bed(rows, ctg, prefix, 1.0 / args.threshold, bed1)
                for v in rows:
                    bg1.write(
                        f"{ctg}\t{v[0]}\t{v[1]}\t{_fmt_f32(v[2])}\t{v[3]}\t{v[4]}\n"
                    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
