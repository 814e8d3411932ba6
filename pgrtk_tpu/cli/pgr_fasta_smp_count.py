"""pgr-fasta-smp-count equivalent (legacy tool): count shimmer pairs
from a fasta file (reference: pgr-bin/src/_bin/pgr-fasta-smp-count.rs —
not compiled by the reference build; provided for completeness).

Emits `%016x %016x count` per pair key with count >= min_count.  The
reference iterates its FxHashMap in hash order; we emit canonical
sorted-key order.
"""
from __future__ import annotations

import argparse
import sys

from ..core.seqdb import CompactSeqDB
from ..core.spec import ShmmrSpec


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="pgr-fasta-smp-count",
        description="count shimmer pairs from fasta files",
    )
    p.add_argument("-i", "--in-fasta", required=True)
    p.add_argument("-o", "--output-path", required=True)
    p.add_argument("-m", "--min-count", type=int, default=4)
    p.add_argument("-w", type=int, default=31)
    p.add_argument("-k", type=int, default=31)
    p.add_argument("-r", type=int, default=1)
    p.add_argument("--min-span", type=int, default=0)
    from ..utils.version import add_version_arg

    add_version_arg(p)
    args = p.parse_args(argv)

    spec = ShmmrSpec(args.w, args.k, args.r, args.min_span, False)
    sdb = CompactSeqDB(spec)
    sdb.load_from_fastx(args.in_fasta)
    with open(args.output_path, "w") as out:
        for (k0, k1) in sorted(sdb.frag_map):
            c = len(sdb.frag_map[(k0, k1)])
            if c >= args.min_count:
                out.write(f"{k0:016x} {k1:016x} {c}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
