"""SMEM seeding parity: full `fastmap` output must be byte-identical."""
import io
import os


def test_fastmap_golden(ref_index, data_dir):
    from bwamem_tpu.core.fastmap import run_fastmap
    from bwamem_tpu.io.fastq import parse_fastx
    fm, bns = ref_index
    buf = io.StringIO()
    reads = ((r.name, r.seq, r.qual)
             for r in parse_fastx(os.path.join(data_dir, "reads_se.fq")))
    run_fastmap(fm, bns, reads, buf)
    golden = open(os.path.join(data_dir, "golden_fastmap.txt")).read()
    assert buf.getvalue() == golden


def test_native_chunk_reader_parity(data_dir):
    """The C++ kseq/bseq_read equivalent must return byte-identical
    records and chunk boundaries to the Python reader."""
    import os
    import pytest
    from bwamem_tpu.io.native import NativeChunkReader, native_available
    from bwamem_tpu.io.fastq import ChunkReader
    if not native_available():
        pytest.skip("native runtime not built")
    for args in [(os.path.join(data_dir, "reads_se.fq"), None),
                 (os.path.join(data_dir, "reads_1.fq"),
                  os.path.join(data_dir, "reads_2.fq"))]:
        a, b = NativeChunkReader(*args), ChunkReader(*args)
        while True:
            ca, cb = a.read_chunk(7000), b.read_chunk(7000)
            assert [(r.name, r.comment, r.seq, r.qual) for r in ca] \
                == [(r.name, r.comment, r.seq, r.qual) for r in cb]
            if not ca:
                break
