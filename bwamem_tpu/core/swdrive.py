"""Generator request protocol for the Smith-Waterman stages.

Pipeline stages that need SW are written as generators yielding typed
requests; a driver serves each request and sends the result back.  The
host driver (here) serves them with the scalar oracles — the
CPU-fallback role.  The device driver
(bwamem_tpu.ops.engine.JaxSeedingEngine.drive_waves) advances many
reads' generators in lock-step and serves each wave of same-typed
requests with ONE batched device dispatch — the reference's
batch-dispatch structure (software/bwt.c:558-757) applied to every SW
call site.

Request forms:
  ("extend2", q, rseq, w, end_bonus, h0) -> (score, qle, tle, gtle,
                                             gscore, max_off)
  ("global2", q, rseq, w)                -> (score, cigar)
"""

import numpy as np

from ..oracle import ksw as oksw


def serve_host(req, opt):
    """Serve one SW request with the scalar host oracle."""
    tag = req[0]
    mat = np.asarray(opt.mat, dtype=np.int64)
    if tag == "extend2":
        _, qs, rs, w, pen, h0 = req
        return oksw.ksw_extend2(qs, rs, mat, opt.o_del, opt.e_del,
                                opt.o_ins, opt.e_ins, w, pen,
                                opt.zdrop, h0)
    if tag == "global2":
        _, qs, rs, w = req
        return oksw.ksw_global2(qs, rs, mat, opt.o_del, opt.e_del,
                                opt.o_ins, opt.e_ins, w)
    if tag == "align2":
        _, qs, rs, xtra = req
        return oksw.ksw_align2(qs, rs, mat, opt.o_del, opt.e_del,
                               opt.o_ins, opt.e_ins, xtra)
    raise ValueError(f"unknown SW request tag {tag!r}")


def drive_host(gen, opt):
    """Run a generator to completion serving every request on the host;
    returns the generator's return value."""
    try:
        req = next(gen)
        while True:
            req = gen.send(serve_host(req, opt))
    except StopIteration as e:
        return e.value
