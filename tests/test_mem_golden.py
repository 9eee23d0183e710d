"""End-to-end `mem` parity: SAM output must be byte-identical to the
reference aligner's golden files (all lines except the @PG command line,
whose argv[0] differs by construction)."""
import io
import os
import sys

import pytest

from bwamem_tpu import cli


def run_mem(args):
    out = io.StringIO()
    old = sys.stdout
    sys.stdout = out
    try:
        ret = cli.main_mem(args)
    finally:
        sys.stdout = old
    assert ret == 0
    return [l for l in out.getvalue().split("\n") if not l.startswith("@PG")]


def load_golden(path):
    with open(path) as f:
        return [l for l in f.read().split("\n") if not l.startswith("@PG")]


def test_mem_se(data_dir):
    ours = run_mem([os.path.join(data_dir, "genome.fa"),
                    os.path.join(data_dir, "reads_se.fq")])
    assert ours == load_golden(os.path.join(data_dir, "golden_se.sam"))


def test_mem_se_all_marksecondary(data_dir):
    ours = run_mem(["-a", "-M", os.path.join(data_dir, "genome.fa"),
                    os.path.join(data_dir, "reads_se.fq")])
    assert ours == load_golden(os.path.join(data_dir, "golden_se_aM.sam"))


def test_mem_pe(data_dir):
    ours = run_mem([os.path.join(data_dir, "genome.fa"),
                    os.path.join(data_dir, "reads_1.fq"),
                    os.path.join(data_dir, "reads_2.fq")])
    assert ours == load_golden(os.path.join(data_dir, "golden_pe.sam"))
