"""`index` command driver: FASTA -> .pac/.ann/.amb/.bwt/.sa artifacts,
byte-identical to bwa 0.7.8's `bwa index`
(reference: software/bwtindex.c:187-287).

The reference writes a doubled (forward+reverse-complement) .pac first,
builds the BWT from it, then overwrites .pac/.ann/.amb with forward-only
versions; the surviving artifacts are forward-only, so we produce those
directly and feed the doubled base string straight to the FM-index
builder.
"""

import sys
import numpy as np

from .bntseq import (BntSeq, fasta2bntseq, dump_ann_amb, dump_pac,
                     unpack_bases, bns_restore)
from .fmindex import FmIndex


def build_index(fasta_path: str, prefix: str = None, sa_intv: int = 32,
                verbose: bool = True) -> None:
    if prefix is None:
        prefix = fasta_path

    def log(msg):
        if verbose:
            print(msg, file=sys.stderr)

    log("[bwa_index] Pack FASTA... ")
    bns, pac_fwd = fasta2bntseq(fasta_path, for_only=True)
    dump_pac(pac_fwd, bns.l_pac, prefix + ".pac")
    dump_ann_amb(bns, prefix)

    # doubled sequence for BWT: forward bases + reverse complement
    fwd = unpack_bases(pac_fwd, bns.l_pac)
    doubled = np.concatenate([fwd, (3 - fwd)[::-1]])
    del fwd  # at Gbp scale every live n-sized temporary counts

    log("[bwa_index] Construct BWT + occ + sampled SA...")
    fm = FmIndex.build(doubled, sa_intv=sa_intv)
    del doubled
    fm.dump_bwt(prefix + ".bwt")
    fm.dump_sa(prefix + ".sa")
    if fm.sa8 is not None:
        fm.dump_sa8(prefix + ".sa8")   # device-speed sidecar (ours)
    log("[bwa_index] done")


def load_index(prefix: str, load_sa8: bool = True):
    """bwa_idx_load(BWA_IDX_ALL) equivalent: returns (FmIndex, BntSeq with
    pac loaded) (reference: software/bwa.c:312-334).  load_sa8=False
    skips the dense-SA device sidecar (used only by ops.fm device
    upload) — host-only consumers like spawn workers save its ~1 GB/Gbp
    of RSS and disk I/O."""
    fm = FmIndex.restore(prefix + ".bwt", prefix + ".sa")
    if load_sa8:
        fm.restore_sa8(prefix + ".sa8")
    bns = bns_restore(prefix, load_pac_file=True)
    return fm, bns
