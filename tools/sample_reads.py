#!/usr/bin/env python3
"""Sample SE/PE reads from an EXISTING FASTA (tools/make_biggenome.py
generates its own genome; this one streams a pre-built reference, e.g.
the 3 Gbp set from tools/make_gbp_fasta.py):

    python tools/sample_reads.py /tmp/ref3g/genome.fa --n-se 4000 \
        --n-pe 2000 --out /tmp/ref3g

Writes reads_se.fq (+ reads_1.fq/reads_2.fq with --n-pe) next to the
genome, in the make_testdata.py format (mutated, both strands).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_testdata import mutate, revcomp, sample_read, write_fastq  # noqa: E402


def read_fasta(path):
    contigs = []
    name = None
    parts = []
    with open(path, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                if name is not None:
                    contigs.append((name, np.frombuffer(
                        b"".join(parts), dtype=np.uint8)))
                name = line[1:].split()[0].decode()
                parts = []
            else:
                parts.append(line.rstrip(b"\n"))
    if name is not None:
        contigs.append((name, np.frombuffer(b"".join(parts),
                                            dtype=np.uint8)))
    return contigs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("fasta")
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-se", type=int, default=4000)
    ap.add_argument("--n-pe", type=int, default=0)
    ap.add_argument("--read-len", type=int, default=101)
    ap.add_argument("--seed", type=int, default=20260820)
    args = ap.parse_args()
    outdir = args.out or os.path.dirname(os.path.abspath(args.fasta))

    rng = np.random.default_rng(args.seed)
    contigs = read_fasta(args.fasta)
    print("contigs:", [(n, len(s)) for n, s in contigs])
    L = args.read_len

    se = []
    for i in range(args.n_se):
        name, pos, frag = sample_read(rng, contigs, L)
        seq = mutate(rng, frag)
        if rng.random() < 0.5:
            seq = revcomp(seq)
        se.append((f"se{i}_{name}_{pos}", seq))
    write_fastq(os.path.join(outdir, "reads_se.fq"), se)

    if args.n_pe:
        r1, r2 = [], []
        for i in range(args.n_pe):
            while True:
                name, seq = contigs[int(rng.integers(0, len(contigs)))]
                ins = int(rng.normal(300, 40))
                ins = max(ins, 2 * L + 10)
                pos = int(rng.integers(0, len(seq) - ins))
                frag = seq[pos:pos + ins].tobytes().decode()
                if "N" in frag:
                    continue
                break
            r1.append((f"pe{i}_{name}_{pos}", mutate(rng, frag[:L])))
            r2.append((f"pe{i}_{name}_{pos}",
                       revcomp(mutate(rng, frag[-L:]))))
        write_fastq(os.path.join(outdir, "reads_1.fq"), r1)
        write_fastq(os.path.join(outdir, "reads_2.fq"), r2)
    print("wrote", args.n_se, "SE +", args.n_pe, "PE reads to", outdir)


if __name__ == "__main__":
    main()
