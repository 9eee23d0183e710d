"""-v>=4 per-read tracing parity (SURVEY.md §5 observability).

The goldens were produced by the reference binary (stock build of
software/ with the HARP handshake stubbed) at -t1:
  bwa_ref mem -v 4 genome.fa reads_se.fq          > golden_se_v4.txt
  bwa_ref mem -v 4 genome.fa reads_1.fq reads_2.fq> golden_pe_v4.txt
  bwa_ref mem -v 5 genome.fa reads_se1.fq         > golden_se1_v5.txt
Every trace line (printf AND err_printf — both stdout in the
reference, software/utils.c:176-185) interleaves with the SAM stream,
so the whole stdout stream is compared byte-for-byte except @PG.
"""
import os

from .test_mem_golden import run_mem, load_golden


def test_mem_se_v4(data_dir):
    ours = run_mem(["-v", "4", os.path.join(data_dir, "genome.fa"),
                    os.path.join(data_dir, "reads_se.fq")])
    assert ours == load_golden(os.path.join(data_dir, "golden_se_v4.txt"))


def test_mem_pe_v4(data_dir):
    ours = run_mem(["-v", "4", os.path.join(data_dir, "genome.fa"),
                    os.path.join(data_dir, "reads_1.fq"),
                    os.path.join(data_dir, "reads_2.fq")])
    assert ours == load_golden(os.path.join(data_dir, "golden_pe_v4.txt"))


def test_mem_se_v5_seed_dump(data_dir):
    ours = run_mem(["-v", "5", os.path.join(data_dir, "genome.fa"),
                    os.path.join(data_dir, "reads_se1.fq")])
    assert ours == load_golden(os.path.join(data_dir, "golden_se1_v5.txt"))


def test_mem_se_v4_batched_headers(data_dir):
    """-b groups the '=====> Processing read' headers after each batch
    of b reads (worker1_batched, software/bwamem.c:1589-1594)."""
    ours = run_mem(["-v", "4", "-b", "7",
                    os.path.join(data_dir, "genome.fa"),
                    os.path.join(data_dir, "reads_se.fq")])
    headers = [l for l in ours
               if l.startswith("=====> Processing read")]
    assert len(headers) == 500
    # same line multiset as -b 1, different interleaving
    base = load_golden(os.path.join(data_dir, "golden_se_v4.txt"))
    assert sorted(ours) == sorted(base)
