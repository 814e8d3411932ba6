"""pgr-shmmr-pair-count equivalent (legacy tool): for every shimmer-pair
key of a .mdb index, count the number of SOURCES whose per-source hit
count is <= max_unique_count
(reference: pgr-bin/src/_bin/pgr-shmmr-pair-count.rs — not compiled by
the reference build; provided for completeness).

Emits `k0 k1 n_sources` (decimal) per key.  The reference par_iters its
FxHashMap (nondeterministic order); we emit canonical sorted-key order.
"""
from __future__ import annotations

import argparse
import sys

from ..core import mdb


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="pgr-shmmr-pair-count",
        description="count shimmer pair hits per source from a .mdb index",
    )
    p.add_argument("prefix")
    p.add_argument("-o", "--output-path", required=True)
    p.add_argument("-m", "--max-unique-count", type=int, default=1)
    from ..utils.version import add_version_arg

    add_version_arg(p)
    args = p.parse_args(argv)

    _spec, frag_map = mdb.read_mdb(args.prefix + ".mdb")
    sid_to_source = {}
    sources = {}
    with open(args.prefix + ".midx") as f:
        for line in f:
            sid_s, _len, _ctg, source = line.rstrip("\n").split("\t")
            if source not in sources:
                sources[source] = len(sources)
            sid_to_source[int(sid_s)] = sources[source]

    with open(args.output_path, "w") as out:
        for key in sorted(frag_map):
            count = {}
            for _fid, sid, _b, _e, _o in frag_map[key]:
                src = sid_to_source[sid]
                count[src] = count.get(src, 0) + 1
            n = sum(
                1 for v in count.values() if v <= args.max_unique_count
            )
            out.write(f"{key[0]} {key[1]} {n}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
