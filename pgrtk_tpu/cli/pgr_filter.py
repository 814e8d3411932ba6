"""pgr-filter equivalent (legacy tool): emit reads whose minimizer overlap
with a reference set exceeds a threshold
(reference: pgr-bin/src/_bin/pgr-filter.rs — not compiled by the
reference build; provided for completeness).
"""
from __future__ import annotations

import argparse
import sys

from ..core.fasta import read_fastx
from ..core.kmer_filter import MinimizerFilter


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="pgr-filter",
        description="Match reads to a reference set of sequences via a "
        "minimizer filter",
    )
    p.add_argument("ref_fasta_path")
    p.add_argument("-q", "--query-fastx-path", default=None)
    p.add_argument("-k", type=int, default=32)
    p.add_argument("-t", "--threshold", type=float, default=0.8)
    from ..utils.version import add_version_arg

    add_version_arg(p)
    args = p.parse_args(argv)

    f = MinimizerFilter(args.k)
    for rec in read_fastx(args.ref_fasta_path):
        f.add_seq_mmers(rec.seq)

    assert args.query_fastx_path, "query fastx path required"
    for rec in read_fastx(args.query_fastx_path):
        total, hit = f.check_seq_mmers(rec.seq)
        if total and hit / total >= args.threshold:
            sys.stdout.write(f">{rec.id.decode()}\n{rec.seq.decode()}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
