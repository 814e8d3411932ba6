"""pgr-compare-cov equivalent: compare SHIMMER-pair coverage between two
sets of fastx files (reference: pgr-bin/src/bin/pgr-compare-cov.rs).

Builds one index per set; for every pair along each contig of set 0
reports count1/count0 (and symmetrically for set 1), with high/low-ratio
region grouping like pgr-compare-cov2.
"""
from __future__ import annotations

import argparse
import sys

from ..api import SeqIndexDB
from .pgr_compare_cov2 import _fmt_f32, output_cov_bed


def _load_set(filepath, w, k, r, min_span):
    db = SeqIndexDB()
    with open(filepath) as f:
        paths = [line.strip() for line in f if line.strip()]
    for i, path in enumerate(paths):
        if i == 0:
            db.load_from_fastx(path, w, k, r, min_span)
        else:
            db.append_from_fastx(path)
    return db


def _run_from_sdb(args, backend):
    """Pre-built index mode (reference: pgr-compare-cov.rs:305-497):
    ONE db loaded from the AGC/FRG prefix; filepath0/1 list SOURCE
    paths partitioning its sequences into the two sample sets; per-pair
    coverage counted inside the shared fragment map."""
    db = SeqIndexDB()
    if backend == "AGC":
        db.load_from_agc_index(args.agc_idx_prefix)
    else:
        db.load_from_frg_index(args.frg_idx_prefix)

    def read_set(path):
        with open(path) as f:
            return {line.strip() for line in f if line.strip()}

    set0, set1 = read_set(args.filepath0), read_set(args.filepath1)
    sids0, sids1 = set(), set()
    for sid, (_ctg, src, _l) in db.seq_info.items():
        src = src or ""
        if src in set0:
            sids0.add(sid)
        if src in set1:
            sids1.add(sid)

    frag_map = db.get_shmmr_map()

    def counts(key):
        c0 = c1 = 0
        for _fid, sid, _b, _e, _o in frag_map.get(key, ()):
            if sid in sids0:
                c0 += 1
            if sid in sids1:
                c1 += 1
        return c0, c1

    def run_side(sids, denom_first, bed_path, bg_path, threshold):
        # reference iterates an FxHashSet (unordered); sorted sids give
        # deterministic row order with identical BED region content
        with open(bg_path, "w") as bg, open(bed_path, "w") as bed:
            for sid in sorted(sids):
                ctg, _src, length = db.seq_info[sid]
                seq = db.get_sub_seq_by_id(sid, 0, length)
                out_data = []
                for s0, s1, p0, p1, _ori in db.get_smps(seq):
                    c0, c1 = counts((s0, s1))
                    if denom_first:  # set0 rows: r = c1/c0
                        assert c0 > 0
                        out_data.append((p0, p1, c1 / c0, c0, c1))
                    else:  # set1 rows: r = c0/c1
                        assert c1 > 0
                        out_data.append((p0, p1, c0 / c1, c1, c0))
                output_cov_bed(out_data, ctg, args.prefix, threshold, bed)
                for v in out_data:
                    bg.write(
                        f"{ctg}\t{v[0]}\t{v[1]}\t{_fmt_f32(v[2])}\t"
                        f"{v[3]}\t{v[4]}\n"
                    )

    run_side(
        sids0, True, args.prefix + ".0.bed", args.prefix + ".0.bedgraph",
        args.threshold,
    )
    run_side(
        sids1, False, args.prefix + ".1.bed", args.prefix + ".1.bedgraph",
        1.0 / args.threshold,
    )
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="pgr-compare-cov",
        description="Compare SHIMMER pair count in two input sequence files",
    )
    p.add_argument("filepath0")
    p.add_argument("filepath1")
    p.add_argument("prefix")
    p.add_argument(
        "-a", "--agc-idx-prefix", default=None,
        help="process data from a pre-built AGC/PGA backed index",
    )
    p.add_argument(
        "-f", "--frg-idx-prefix", default=None,
        help="process data from a pre-built frg backed index",
    )
    p.add_argument("-w", type=int, default=80)
    p.add_argument("-k", type=int, default=56)
    p.add_argument("-r", type=int, default=4)
    p.add_argument("-m", "--min-span", type=int, default=64)
    p.add_argument("-t", "--threshold", type=float, default=2.0)
    from ..utils.version import add_version_arg

    add_version_arg(p)
    args = p.parse_args(argv)

    # pre-built index modes (reference main dispatch, :499-509)
    if args.agc_idx_prefix:
        return _run_from_sdb(args, "AGC")
    if args.frg_idx_prefix:
        return _run_from_sdb(args, "FRG")

    sdb0 = _load_set(args.filepath0, args.w, args.k, args.r, args.min_span)
    sdb1 = _load_set(args.filepath1, args.w, args.k, args.r, args.min_span)
    fm0 = sdb0.seq_db.frag_map
    fm1 = sdb1.seq_db.frag_map

    def run_side(db, fm_self, fm_other, bed_path, bg_path, threshold):
        with open(bg_path, "w") as bg, open(bed_path, "w") as bed:
            for sid in sorted(db.seq_info):
                ctg, _src, length = db.seq_info[sid]
                seq = db.get_sub_seq_by_id(sid, 0, length)
                out_data = []
                for s0, s1, p0, p1, _ori in db.get_smps(seq):
                    c_self = len(fm_self.get((s0, s1), []))
                    c_other = len(fm_other.get((s0, s1), []))
                    r = c_other / c_self if c_self else float("inf")
                    out_data.append((p0, p1, r, c_self, c_other))
                output_cov_bed(out_data, ctg, args.prefix, threshold, bed)
                for v in out_data:
                    bg.write(
                        f"{ctg}\t{v[0]}\t{v[1]}\t{_fmt_f32(v[2])}\t{v[3]}\t{v[4]}\n"
                    )

    run_side(
        sdb0, fm0, fm1, args.prefix + ".0.bed", args.prefix + ".0.bedgraph",
        args.threshold,
    )
    run_side(
        sdb1, fm1, fm0, args.prefix + ".1.bed", args.prefix + ".1.bedgraph",
        1.0 / args.threshold,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
