#!/usr/bin/env python3
"""Gbp-scale synthetic FASTA writer (genome only, no reads/index) for
exercising the bounded-memory index construction path:

    python tools/make_gbp_fasta.py /tmp/ref1g --mbp 1000
    /usr/bin/time -v python -m bwamem_tpu.cli index /tmp/ref1g/genome.fa

Chunked binary writes (newlines inserted by reshape) keep generation
to a couple of minutes; a few N runs exercise the ambiguity holes.

--repeats writes a REPEAT-REALISTIC genome instead of i.i.d. bases:
~45% of bases belong to repeat structure like the reference's real
workload (human_g1k_v37, /root/reference/README.md:13-17) —
  * dispersed families: a 300 bp SINE-like family at very high copy
    number (5'-truncated copies, 5-20% divergence), a 6 kb LINE-like
    family (mostly truncated), and a 1.5 kb mid-frequency family;
  * tandem arrays: 2-100 bp motifs repeated to 0.2-20 kb;
  * segmental duplications: Mb-scale windows re-copied at ~1%
    divergence.
These populate the paths i.i.d. sequence leaves near-idle: max_occ
seed filtering (software/bwamem.c:63,407-420), the re-seeding split
pass (bwamem.c:196-204), interval-buffer overflow -> host fallback,
and long SA expansions.
"""
import argparse
import os

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
WIDTH = 70


def _diverge(seq, rate, rng):
    """Substitute a `rate` fraction of bases with uniform random."""
    n = len(seq)
    k = int(n * rate)
    if k:
        idx = rng.integers(0, n, k)
        seq = seq.copy()
        seq[idx] = rng.integers(0, 4, k, dtype=np.int8).astype(np.uint8)
    return seq


def make_repeat_contig(length, rng, repeat_frac=0.45):
    """Base values 0..3 with human-like repeat structure."""
    # family consensi (SINE-like, LINE-like, mid-frequency)
    fams = [
        (rng.integers(0, 4, 300, dtype=np.int8).astype(np.uint8), 0.55),
        (rng.integers(0, 4, 6000, dtype=np.int8).astype(np.uint8), 0.25),
        (rng.integers(0, 4, 1500, dtype=np.int8).astype(np.uint8), 0.20),
    ]
    fam_seqs = [f for f, _ in fams]
    fam_p = np.array([p for _, p in fams])
    fam_p /= fam_p.sum()

    # segment mix targets ~45% repeat bases pre-segdup
    p_disp, p_tand = 0.62, 0.08     # of segment COUNT; unique runs are
    out = np.empty(length, np.uint8)  # longer, so base fraction ~40%
    pos = 0
    while pos < length:
        r = rng.random()
        room = length - pos
        if r < p_disp:
            fi = int(rng.choice(len(fams), p=fam_p))
            fam = fam_seqs[fi]
            # 5'-truncation: LINEs are mostly fragments
            start = int(rng.integers(0, len(fam) * 3 // 4)) \
                if len(fam) > 600 or rng.random() < 0.3 else 0
            seg = _diverge(fam[start:], float(rng.uniform(0.05, 0.20)),
                           rng)
        elif r < p_disp + p_tand:
            motif = rng.integers(0, 4, int(rng.integers(2, 100)),
                                 dtype=np.int8).astype(np.uint8)
            total = int(rng.integers(200, 20000))
            seg = np.tile(motif, total // len(motif) + 1)[:total]
            seg = _diverge(seg, 0.02, rng)
        else:
            seg = rng.integers(0, 4, int(rng.integers(300, 4000)),
                               dtype=np.int8).astype(np.uint8)
        seg = seg[:room]
        out[pos:pos + len(seg)] = seg
        pos += len(seg)

    # segmental duplications: Mb-scale windows re-copied at ~1%
    n_dup = max(1, length // 200_000_000)
    for _ in range(n_dup):
        w = int(min(rng.integers(1_000_000, 8_000_000), length // 4))
        if w < 1000:
            break
        src = int(rng.integers(0, length - w))
        dst = int(rng.integers(0, length - w))
        out[dst:dst + w] = _diverge(out[src:src + w], 0.01, rng)
    return out


def write_repeat_contig(f, name, length, rng, n_holes=4):
    f.write(f">{name} synthetic-repeats\n".encode())
    seq = BASES[make_repeat_contig(length, rng)].copy()
    for _ in range(n_holes):
        h = int(rng.integers(1000, length - 1000))
        seq[h:h + int(rng.integers(5, 40))] = ord('N')
    rows = length // WIDTH
    body = seq[:rows * WIDTH].reshape(rows, WIDTH)
    outb = np.empty((rows, WIDTH + 1), dtype=np.uint8)
    outb[:, :WIDTH] = body
    outb[:, WIDTH] = ord('\n')
    f.write(outb.tobytes())
    tail = seq[rows * WIDTH:]
    if len(tail):
        f.write(tail.tobytes() + b"\n")


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
    ap.add_argument('--repeats', action='store_true',
                    help='human-like repeat structure (~45%% repeat '
                         'bases) instead of i.i.d. sequence')
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    total = int(args.mbp * 1e6)
    lens = [total * 2 // 3, total - total * 2 // 3]
    with open(os.path.join(args.outdir, "genome.fa"), "wb") as f:
        for i, L in enumerate(lens):
            if args.repeats:
                write_repeat_contig(f, f"g{i+1}", L, rng)
            else:
                write_contig(f, f"g{i+1}", L, rng)
    print("wrote", total, "bp", "with repeats" if args.repeats else "")


if __name__ == '__main__':
    main()
