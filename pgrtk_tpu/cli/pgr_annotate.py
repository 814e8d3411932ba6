"""pgr-annotate-bed-file / pgr-annotate-vcf-file equivalents: annotate BED
rows / VCF records with gene names from a gzipped GTF
(reference: pgr-bin/src/bin/pgr-annotate-bed-file.rs and
pgr-annotate-vcf-file.rs).  Gene name = last attribute value of
"transcript" features overlapping the interval/position.
"""
from __future__ import annotations

import argparse
import gzip
import sys
from typing import Dict, List, Tuple


def load_annotation_intervals(path: str) -> Dict[str, List[Tuple[int, int, str]]]:
    """chr -> sorted [(start, end, attribute)] of transcript features."""
    out: Dict[str, List[Tuple[int, int, str]]] = {}
    with gzip.open(path, "rt") as f:
        for line in f:
            if not line.strip() or line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            if fields[2] != "transcript":
                continue
            out.setdefault(fields[0], []).append(
                (int(fields[3]), int(fields[4]), fields[8])
            )
    for v in out.values():
        v.sort()
    return out


def gene_names(intervals, bgn: int, end: int) -> str:
    """Distinct gene names of transcripts overlapping [bgn, end), joined
    by '/' (the reference pulls the LAST attribute's value)."""
    names = set()
    for fs, fe, attributes in intervals:
        if fs >= end:
            break
        if fe <= bgn:
            continue
        attributes = attributes.rstrip(";")
        gn = attributes.split(";")[-1].split(" ")[-1].strip('"')
        names.add(gn)
    return "/".join(names)


def annotate_bed(bed_path, annotation_path, output_path):
    ann = load_annotation_intervals(annotation_path)
    with open(bed_path) as fin, open(output_path, "w") as fout:
        for line in fin:
            if line.startswith("#") or not line.strip():
                continue
            fields = line.rstrip("\n").split("\t")
            chrom, bgn, end = fields[0], int(fields[1]), int(fields[2])
            iv = ann.get(chrom)
            if iv is None:
                continue
            gn = gene_names(iv, bgn, end)
            if not gn:
                continue
            fout.write(f"{chrom}\t{bgn}\t{end}\t{fields[3]}>{gn}\n")


def annotate_vcf(vcf_path, annotation_path, output_path):
    ann = load_annotation_intervals(annotation_path)
    with open(vcf_path) as fin, open(output_path, "w") as fout:
        fout.write("##fileformat=VCFv4.2\n")
        fout.write(
            '##INFO=<ID=GN,Number=1,Type=String,Description="GeneName">\n'
        )
        fout.write(
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        )
        fout.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE\n")
        for line in fin:
            if line.startswith("#") or not line.strip():
                continue
            fields = line.rstrip("\n").split("\t")
            chrom, pos = fields[0], int(fields[1])
            iv = ann.get(chrom)
            if iv is None:
                continue
            gn = gene_names(iv, pos, pos + 1)
            if not gn:
                continue
            gt = fields[9] if len(fields) > 9 else "."
            fout.write(
                f"{chrom}\t{pos}\t.\t{fields[3]}\t{fields[4]}\t60\tPASS\t"
                f"GN={gn}\tGT\t{gt}\n"
            )


def main_bed(argv=None):
    p = argparse.ArgumentParser(prog="pgr-annotate-bed-file")
    p.add_argument("bed_path")
    p.add_argument("annotation_path")
    p.add_argument("output_path")
    p.add_argument("--number-of-thread", type=int, default=0)
    from ..utils.version import add_version_arg

    add_version_arg(p)
    args = p.parse_args(argv)
    annotate_bed(args.bed_path, args.annotation_path, args.output_path)
    return 0


def main_vcf(argv=None):
    p = argparse.ArgumentParser(prog="pgr-annotate-vcf-file")
    p.add_argument("vcf_path")
    p.add_argument("annotation_path")
    p.add_argument("output_path")
    p.add_argument("--number-of-thread", type=int, default=0)
    args = p.parse_args(argv)
    annotate_vcf(args.vcf_path, args.annotation_path, args.output_path)
    return 0


if __name__ == "__main__":
    name = sys.argv[0]
    if "vcf" in name:
        sys.exit(main_vcf())
    sys.exit(main_bed())
