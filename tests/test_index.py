"""Index-layer parity: our builder must reproduce bwa 0.7.8's on-disk
artifacts byte-for-byte, and the loader must round-trip them."""
import filecmp
import os

import numpy as np
import pytest

from bwamem_tpu.index import (build_index, load_index, bns_restore,
                              fasta2bntseq, unpack_bases, FmIndex)

EXTS = ["pac", "ann", "amb", "bwt", "sa"]


@pytest.fixture(scope="module")
def built(tmp_path_factory, data_dir):
    out = tmp_path_factory.mktemp("idx")
    prefix = str(out / "genome.fa")
    build_index(os.path.join(data_dir, "genome.fa"), prefix, verbose=False)
    return prefix


def test_artifacts_byte_identical(built, data_dir):
    for ext in EXTS:
        ref = os.path.join(data_dir, f"genome.fa.{ext}")
        assert filecmp.cmp(built + "." + ext, ref, shallow=False), ext


def test_loader_roundtrip(data_dir):
    fm, bns = load_index(os.path.join(data_dir, "genome.fa"))
    assert fm.seq_len == 2 * bns.l_pac
    assert fm.sa_intv == 32
    assert fm.sa[0] == -1
    assert len(bns.anns) == 2
    assert bns.anns[0].name == "ctg1"
    assert bns.anns[1].offset == bns.anns[0].length


def test_sa_lookup_against_full_sa(data_dir):
    """bwt_sa must recover the exact suffix positions."""
    from bwamem_tpu.index.suffix_array import suffix_array
    fm, bns = load_index(os.path.join(data_dir, "genome.fa"))
    bns_f, pac = fasta2bntseq(os.path.join(data_dir, "genome.fa"), for_only=True)
    fwd = unpack_bases(pac, bns_f.l_pac)
    doubled = np.concatenate([fwd, (3 - fwd)[::-1]])
    sa_full = suffix_array(doubled)
    rng = np.random.default_rng(0)
    for k in rng.integers(1, fm.seq_len, size=50):
        assert fm.sa_lookup(int(k)) == int(sa_full[int(k)])


def test_occ_consistency(ref_index):
    """occ4(k) must equal brute-force counts over the BWT prefix."""
    fm, _ = ref_index
    n = fm.seq_len
    ks = [int(k) for k in np.random.default_rng(1).integers(0, n, size=30)]
    # occ(k,c) must agree with the c-th lane of occ4(k)
    for k in ks:
        c4 = fm.occ4(k)
        for c in range(4):
            assert fm.occ(k, c) == int(c4[c]), (k, c)
    # incremental check: each step adds exactly one base, except at the
    # primary row (the $ position, which occ skips)
    k0 = 1000
    prev = fm.occ4(k0)
    for k in range(k0 + 1, k0 + 200):
        cur = fm.occ4(k)
        diff = cur - prev
        expect = 0 if k == fm.primary else 1
        assert diff.sum() == expect and (diff >= 0).all(), k
        prev = cur


def test_staged_index_subcommands(tmp_path, data_dir):
    """fa2pac -> pac2bwt -> bwtupdate -> bwt2sa must reproduce the
    monolithic `index` artifacts byte-for-byte
    (software/bwtindex.c:62-185, software/bntseq.c:297-314)."""
    import os
    import shutil
    from bwamem_tpu import cli
    fa = os.path.join(str(tmp_path), "genome.fa")
    shutil.copy(os.path.join(data_dir, "genome.fa"), fa)
    pre = os.path.join(str(tmp_path), "staged")
    assert cli.main(["fa2pac", fa, pre]) == 0
    assert cli.main(["pac2bwt", pre + ".pac", pre + ".bwt"]) == 0
    assert cli.main(["bwtupdate", pre + ".bwt"]) == 0
    assert cli.main(["bwt2sa", "-i", "32", pre + ".bwt", pre + ".sa"]) == 0
    ref = os.path.join(data_dir, "genome.fa")
    for ext in (".bwt", ".sa"):
        with open(pre + ext, "rb") as f1, open(ref + ext, "rb") as f2:
            assert f1.read() == f2.read(), ext
    assert cli.main(["fa2pac", "-f", fa, pre + "_fwd"]) == 0
    for ext in (".pac", ".ann", ".amb"):
        with open(pre + "_fwd" + ext, "rb") as f1, \
                open(ref + ext, "rb") as f2:
            assert f1.read() == f2.read(), ext
