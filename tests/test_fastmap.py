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
