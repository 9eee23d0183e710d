"""Byte-identity of the streaming bounded-memory BWT builder
(native/bwtinc.cpp — the software/bwt_gen.c role, selected at
software/bwtindex.c:239) against the whole-text SA-IS path: same
interleaved .bwt words, primary, and SA samples for every text, at
every block size, including blocks smaller than the text, size-1
blocks, and repeat-heavy texts that stress the key-tie recursion."""

import numpy as np
import pytest

from bwamem_tpu.index import nsa
from bwamem_tpu.index.fmindex import FmIndex

pytestmark = pytest.mark.skipif(not nsa.streaming_available(),
                                reason="native streaming builder "
                                       "unavailable")


def _pack(fwd: np.ndarray) -> np.ndarray:
    """Forward bases -> bwa pac bytes (base i at shift (~i&3)*2)."""
    l = len(fwd)
    pac = np.zeros((l + 3) // 4, dtype=np.uint8)
    for i, b in enumerate(fwd):
        pac[i >> 2] |= np.uint8(b) << ((~i & 3) << 1)
    return pac


def _stream_fm(fwd: np.ndarray, block: int, sa_intv: int = 32):
    from bwamem_tpu.index.build import _build_streaming
    pac = _pack(fwd)
    return _build_streaming(pac, len(fwd), sa_intv, lambda *_: None)


def _ref_fm(fwd: np.ndarray, sa_intv: int = 32):
    doubled = np.concatenate([fwd, (3 - fwd)[::-1]]).astype(np.uint8)
    return FmIndex.build(doubled, sa_intv=sa_intv)


@pytest.mark.parametrize("n,block", [
    (1, 4), (2, 1), (3, 2), (7, 3), (16, 5), (33, 8),
    (100, 17), (100, 1000), (257, 64), (1000, 128), (1000, 999),
])
def test_stream_matches_inmemory_random(n, block):
    rng = np.random.default_rng(n * 1000 + block)
    fwd = rng.integers(0, 4, n).astype(np.uint8)
    ref = _ref_fm(fwd)
    got = _stream_fm(fwd, block)
    assert got.primary == ref.primary
    np.testing.assert_array_equal(got.bwt, ref.bwt)
    np.testing.assert_array_equal(np.asarray(got.sa, np.int64),
                                  np.asarray(ref.sa, np.int64))
    if ref.sa8 is not None:
        np.testing.assert_array_equal(np.asarray(got.sa8, np.int64),
                                      np.asarray(ref.sa8, np.int64))
    np.testing.assert_array_equal(got.L2, ref.L2)


@pytest.mark.parametrize("pat", [b"\x00", b"\x00\x01", b"\x03\x03\x00",
                                 b"\x00\x01\x02\x03"])
def test_stream_repeat_texts(pat):
    """Periodic texts maximize key ties (equal a-ranks recurse into
    successor keys) — the hard path of the block ordering."""
    fwd = np.frombuffer(pat * 200, dtype=np.uint8).copy()
    ref = _ref_fm(fwd)
    for block in (7, 64, 10**6):
        got = _stream_fm(fwd, block)
        assert got.primary == ref.primary, block
        np.testing.assert_array_equal(got.bwt, ref.bwt)
        np.testing.assert_array_equal(np.asarray(got.sa, np.int64),
                                      np.asarray(ref.sa, np.int64))


def test_stream_fuzz_small():
    rng = np.random.default_rng(7)
    for _ in range(40):
        n = int(rng.integers(1, 200))
        block = int(rng.integers(1, 300))
        # low-entropy alphabet skew stresses runs of equal chars
        p = rng.dirichlet(np.ones(4) * 0.3)
        fwd = rng.choice(4, n, p=p).astype(np.uint8)
        ref = _ref_fm(fwd)
        got = _stream_fm(fwd, block)
        assert got.primary == ref.primary, (n, block)
        np.testing.assert_array_equal(got.bwt, ref.bwt,
                                      err_msg=str((n, block)))
        np.testing.assert_array_equal(np.asarray(got.sa, np.int64),
                                      np.asarray(ref.sa, np.int64),
                                      err_msg=str((n, block)))


def test_build_index_streaming_end_to_end(tmp_path):
    """CLI-level: build_index(streaming=True) artifacts byte-identical
    to the default path on a small FASTA."""
    from bwamem_tpu.index.build import build_index
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 5000))
    fa = tmp_path / "g.fa"
    fa.write_text(">ctg1\n" + "\n".join(
        seq[i:i + 70] for i in range(0, len(seq), 70)) + "\n")
    pa = str(tmp_path / "a")
    pb = str(tmp_path / "b")
    build_index(str(fa), pa, verbose=False, streaming=False)
    build_index(str(fa), pb, verbose=False, streaming=True)
    for ext in (".bwt", ".sa", ".sa8", ".pac", ".ann", ".amb"):
        a = open(pa + ext, "rb").read()
        b = open(pb + ext, "rb").read()
        assert a == b, f"{ext} differs"
