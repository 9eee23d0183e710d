#!/usr/bin/env python3
"""Gbp-scale synthetic FASTA writer (genome only, no reads/index) for
exercising the bounded-memory index construction path:

    python tools/make_gbp_fasta.py /tmp/ref1g --mbp 1000
    /usr/bin/time -v python -m bwamem_tpu.cli index /tmp/ref1g/genome.fa

Chunked binary writes (newlines inserted by reshape) keep generation
to a couple of minutes; a few N runs exercise the ambiguity holes.
"""
import argparse
import os

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
WIDTH = 70


def write_contig(f, name, length, rng, n_holes=4):
    f.write(f">{name} synthetic\n".encode())
    hole_at = sorted(int(rng.integers(1000, length - 1000))
                     for _ in range(n_holes))
    pos = 0
    chunk = 10_000_000 - 10_000_000 % WIDTH
    carry = np.empty(0, dtype=np.uint8)
    while pos < length:
        n = min(chunk, length - pos)
        seq = BASES[rng.integers(0, 4, size=n, dtype=np.int8)].copy()
        for h in hole_at:
            if pos <= h < pos + n:
                seq[h - pos:h - pos + int(rng.integers(5, 40))] = ord('N')
        seq = np.concatenate([carry, seq]) if len(carry) else seq
        rows = len(seq) // WIDTH
        body = seq[:rows * WIDTH].reshape(rows, WIDTH)
        out = np.empty((rows, WIDTH + 1), dtype=np.uint8)
        out[:, :WIDTH] = body
        out[:, WIDTH] = ord('\n')
        f.write(out.tobytes())
        carry = seq[rows * WIDTH:].copy()
        pos += n
    if len(carry):
        f.write(carry.tobytes() + b"\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('outdir')
    ap.add_argument('--mbp', type=float, default=1000.0)
    ap.add_argument('--seed', type=int, default=20260820)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    total = int(args.mbp * 1e6)
    lens = [total * 2 // 3, total - total * 2 // 3]
    with open(os.path.join(args.outdir, "genome.fa"), "wb") as f:
        for i, L in enumerate(lens):
            write_contig(f, f"g{i+1}", L, rng)
    print("wrote", total, "bp")


if __name__ == '__main__':
    main()
