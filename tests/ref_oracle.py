"""Build a ctypes-callable shared library from the *reference* C sources
(mounted read-only at /root/reference) for randomized kernel-parity tests.

The library is compiled out-of-tree into a temp dir; nothing from the
reference is vendored into this repository.  Tests that use it are
skipped automatically when the reference checkout is unavailable.
"""

import ctypes
import os
import subprocess
import tempfile

REF = "/root/reference/software"
_cache = {}


def have_reference() -> bool:
    return os.path.isdir(REF)


SHIM = r"""
#include <stdint.h>
#include "ksw.h"
/* pointer-output wrapper to sidestep struct-by-value FFI pitfalls */
void shim_align2(int qlen, uint8_t *query, int tlen, uint8_t *target,
                 int m, const int8_t *mat, int o_del, int e_del,
                 int o_ins, int e_ins, int xtra, int *out)
{
    kswr_t r = ksw_align2(qlen, query, tlen, target, m, mat,
                          o_del, e_del, o_ins, e_ins, xtra, 0);
    out[0] = r.score; out[1] = r.te; out[2] = r.qe; out[3] = r.score2;
    out[4] = r.te2; out[5] = r.tb; out[6] = r.qb;
}
"""


def _build() -> str:
    if "lib" in _cache:
        return _cache["lib"]
    d = tempfile.mkdtemp(prefix="refksw")
    lib = os.path.join(d, "libref.so")
    shim = os.path.join(d, "shim.c")
    with open(shim, "w") as f:
        f.write(SHIM)
    srcs = [os.path.join(REF, f) for f in
            ("ksw.c", "malloc_wrap.c")] + [shim]
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-O2", "-DUSE_MALLOC_WRAPPERS",
         "-I", REF, "-o", lib] + srcs,
        check=True, capture_output=True)
    _cache["lib"] = lib
    return lib


class KswRC(ctypes.Structure):
    _fields_ = [("score", ctypes.c_int), ("te", ctypes.c_int),
                ("qe", ctypes.c_int), ("score2", ctypes.c_int),
                ("te2", ctypes.c_int), ("tb", ctypes.c_int),
                ("qb", ctypes.c_int)]


def load():
    lib = ctypes.CDLL(_build())
    lib.ksw_extend2.restype = ctypes.c_int
    lib.ksw_extend2.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.ksw_global2.restype = ctypes.c_int
    lib.ksw_global2.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32))]
    lib.shim_align2.restype = None
    lib.shim_align2.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    return lib


def ref_extend2(lib, q, t, mat, o_del, e_del, o_ins, e_ins, w,
                end_bonus, zdrop, h0):
    outs = [ctypes.c_int(0) for _ in range(5)]
    sc = lib.ksw_extend2(
        len(q), bytes(q), len(t), bytes(t), 5, mat.astype('int8').tobytes(),
        o_del, e_del, o_ins, e_ins, w, end_bonus, zdrop, h0,
        *(ctypes.byref(o) for o in outs))
    return (sc, outs[0].value, outs[1].value, outs[2].value,
            outs[3].value, outs[4].value)


def ref_global2(lib, q, t, mat, o_del, e_del, o_ins, e_ins, w):
    n_cigar = ctypes.c_int(0)
    cig = ctypes.POINTER(ctypes.c_uint32)()
    sc = lib.ksw_global2(
        len(q), bytes(q), len(t), bytes(t), 5, mat.astype('int8').tobytes(),
        o_del, e_del, o_ins, e_ins, w,
        ctypes.byref(n_cigar), ctypes.byref(cig))
    cigar = [cig[i] for i in range(n_cigar.value)]
    return sc, cigar


def ref_align2(lib, q, t, mat, o_del, e_del, o_ins, e_ins, xtra):
    out = (ctypes.c_int * 7)()
    lib.shim_align2(
        len(q), bytes(q), len(t), bytes(t), 5, mat.astype('int8').tobytes(),
        o_del, e_del, o_ins, e_ins, xtra, out)
    return KswRC(*out)
