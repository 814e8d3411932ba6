"""pgr-shmmr-count equivalent: shimmer coverage of reads vs a target set,
reported on reference coordinates
(reference: pgr-bin/src/bin/pgr-shmmr-count.rs).

Always uses the mode-1 windowed sketcher (sequence_to_shmmrs1), defaults
w=80 k=56 r=1 min_span=8.  Output rows:
ctg  pos-k  pos  read_count/ref_count  read_count  ref_count.
"""
from __future__ import annotations

import argparse
import sys

from ..core.fasta import read_fastx
from ..core.spec import ShmmrSpec
from ..core.sketch import batch_sequence_to_shmmrs


def _sketch_hashes(seqs, spec):
    res = batch_sequence_to_shmmrs(seqs, spec)
    return [[(m[0] >> 8, (m[1] & 0xFFFFFFFF) >> 1) for m in mers] for mers in res]


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="pgr-shmmr-count",
        description="shimmer-pair coverage of reads vs target/ref",
    )
    p.add_argument("shmmr_target_fastx")
    p.add_argument("ref_fastx")
    p.add_argument("read_fastx")
    p.add_argument("-o", "--output-file", default=None)
    p.add_argument("-w", type=int, default=80)
    p.add_argument("-k", type=int, default=56)
    p.add_argument("-r", type=int, default=1)
    p.add_argument("-m", "--min-span", type=int, default=8)
    from ..utils.version import add_version_arg

    add_version_arg(p)
    args = p.parse_args(argv)
    spec = ShmmrSpec(
        w=args.w, k=args.k, r=args.r, min_span=args.min_span, sketch=False
    )

    # target: defines the shimmer universe
    shmmr_count = {}
    target = [(0, r.seq) for r in read_fastx(args.shmmr_target_fastx)]
    for hashes in _sketch_hashes(target, spec):
        for h, _pos in hashes:
            shmmr_count[h] = [0, 0]

    # reference: counts + locations
    ref_recs = list(read_fastx(args.ref_fastx))
    ref_location = []
    for sid, hashes in enumerate(
        _sketch_hashes([(i, r.seq) for i, r in enumerate(ref_recs)], spec)
    ):
        for h, pos in hashes:
            if h in shmmr_count:
                shmmr_count[h][0] += 1
                ref_location.append((sid, pos, h))

    # reads: counts
    reads = [(0, r.seq) for r in read_fastx(args.read_fastx)]
    for hashes in _sketch_hashes(reads, spec):
        for h, _pos in hashes:
            if h in shmmr_count:
                shmmr_count[h][1] += 1

    ref_location.sort()
    out = open(args.output_file, "w") if args.output_file else sys.stdout
    try:
        for sid, pos, h in ref_location:
            ctg = ref_recs[sid].id.decode()
            c0, c1 = shmmr_count[h]
            ratio = c1 / c0 if c0 else float("nan")
            out.write(
                f"{ctg}\t{pos - args.k}\t{pos}\t{_fmt(ratio)}\t{c1}\t{c0}\n"
            )
    finally:
        if args.output_file:
            out.close()
    return 0


def _fmt(v: float) -> str:
    import numpy as np

    if np.isnan(v):
        return "NaN"
    return np.format_float_positional(np.float32(v), unique=True, trim="-")


if __name__ == "__main__":
    sys.exit(main())
