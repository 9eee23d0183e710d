#!/usr/bin/env python3
"""Deterministic test-data generator: small reference genome + simulated reads.

Produces the golden-parity dataset used by tests/ and bench.py:
  - genome.fa   : 2 contigs (~100 kbp total) of random ACGT with a few N runs
  - reads_se.fq : single-end 101 bp reads with mismatches/indels, both strands
  - reads_1.fq / reads_2.fq : paired-end reads, FR orientation, insert ~300+-30

Everything is seeded, so the driver can regenerate identical data anywhere.
Golden SAM files are produced separately by running the reference aligner
(bwa-mem 0.7.8 semantics; see /root/reference/software) on these inputs.
"""
import argparse
import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = {ord('A'): 'T', ord('C'): 'G', ord('G'): 'C', ord('T'): 'A', ord('N'): 'N'}


def make_genome(rng, contig_lens=(70000, 35000)):
    contigs = []
    for n, L in enumerate(contig_lens):
        seq = BASES[rng.integers(0, 4, size=L)].copy()
        # insert a couple of N runs (ambiguity holes)
        for _ in range(2):
            start = int(rng.integers(100, L - 600))
            runlen = int(rng.integers(5, 40))
            seq[start:start + runlen] = ord('N')
        # embed one exact repeat to exercise repetitive seeding
        src = int(rng.integers(0, L - 4000))
        dst = int(rng.integers(0, L - 4000))
        seq[dst:dst + 1500] = seq[src:src + 1500]
        contigs.append((f"ctg{n+1}", seq))
    return contigs


def revcomp(s: str) -> str:
    return ''.join(COMP[ord(c)] for c in reversed(s))


def mutate(rng, read: str, sub_rate=0.01, indel_rate=0.001) -> str:
    out = []
    i = 0
    while i < len(read):
        r = rng.random()
        if r < indel_rate:  # deletion
            i += 1
            continue
        if r < 2 * indel_rate:  # insertion
            out.append('ACGT'[int(rng.integers(0, 4))])
        c = read[i]
        if c != 'N' and rng.random() < sub_rate:
            c = 'ACGT'[(('ACGT'.index(c)) + 1 + int(rng.integers(0, 3))) % 4]
        out.append(c)
        i += 1
    return ''.join(out)


def sample_read(rng, contigs, length=101):
    while True:
        name, seq = contigs[int(rng.integers(0, len(contigs)))]
        pos = int(rng.integers(0, len(seq) - length))
        frag = seq[pos:pos + length].tobytes().decode()
        if 'N' in frag:
            continue
        return name, pos, frag


def write_fastq(path, reads):
    with open(path, 'w') as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('outdir')
    ap.add_argument('--n-se', type=int, default=500)
    ap.add_argument('--n-pe', type=int, default=300)
    ap.add_argument('--seed', type=int, default=20260816)
    ap.add_argument('--read-len', type=int, default=101)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    contigs = make_genome(rng)

    with open(f"{args.outdir}/genome.fa", 'w') as f:
        for name, seq in contigs:
            f.write(f">{name} test contig\n")
            s = seq.tobytes().decode()
            for i in range(0, len(s), 70):
                f.write(s[i:i + 70] + "\n")

    L = args.read_len
    se = []
    for i in range(args.n_se):
        name, pos, frag = sample_read(rng, contigs, L)
        read = mutate(rng, frag)
        if rng.random() < 0.5:
            read = revcomp(read)
        se.append((f"se{i}_{name}_{pos}", read))
    write_fastq(f"{args.outdir}/reads_se.fq", se)

    r1, r2 = [], []
    for i in range(args.n_pe):
        while True:
            name, seq = contigs[int(rng.integers(0, len(contigs)))]
            insert = int(rng.normal(300, 30))
            insert = max(L + 10, insert)
            if len(seq) <= insert + 10:
                continue
            pos = int(rng.integers(0, len(seq) - insert))
            frag = seq[pos:pos + insert].tobytes().decode()
            if 'N' in frag:
                continue
            break
        fwd = mutate(rng, frag[:L])
        rev = mutate(rng, revcomp(frag[-L:]))
        qname = f"pe{i}_{name}_{pos}"
        r1.append((qname + "/1", fwd))
        r2.append((qname + "/2", rev))
    write_fastq(f"{args.outdir}/reads_1.fq", r1)
    write_fastq(f"{args.outdir}/reads_2.fq", r2)
    print("wrote", args.outdir)


if __name__ == '__main__':
    main()
