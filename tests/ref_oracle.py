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


PEM_SHIM = r"""
#include <stdint.h>
#include <string.h>
#include <stdlib.h>
#include <ctype.h>
#include "bwa.h"

/* pemerge.c references these from bwa.c; provide equivalents here so we
   don't have to compile bwa.c (which drags in the index + HARP glue). */
unsigned char nst_nt4_table[256];
__attribute__((constructor)) static void init_nt4(void) {
    memset(nst_nt4_table, 4, 256);
    nst_nt4_table['A'] = nst_nt4_table['a'] = 0;
    nst_nt4_table['C'] = nst_nt4_table['c'] = 1;
    nst_nt4_table['G'] = nst_nt4_table['g'] = 2;
    nst_nt4_table['T'] = nst_nt4_table['t'] = 3;
    nst_nt4_table['0'] = 0; nst_nt4_table['1'] = 1;
    nst_nt4_table['2'] = 2; nst_nt4_table['3'] = 3;
}
/* stubs for main_pemerge's IO deps (never called through the shim) */
bseq1_t *bseq_read(int chunk_size, int *n_, void *ks1_, void *ks2_) {
    (void)chunk_size; (void)ks1_; (void)ks2_; *n_ = 0; return 0;
}
void bwa_fill_scmat(int a, int b, int8_t mat[25]) {
    int i, j, k;
    for (i = k = 0; i < 4; ++i) {
        for (j = 0; j < 4; ++j) mat[k++] = i == j ? a : -b;
        mat[k++] = -1;
    }
    for (j = 0; j < 5; ++j) mat[k++] = -1;
}

typedef struct { /* mirror of pem_opt_t (pemerge.c) */
    int a, b, q, r, w;
    int q_def, q_thres;
    int T;
    int chunk_size, n_threads, flag;
    int8_t mat[25];
} pem_opt_shim_t;
extern void *pem_opt_init();
extern int bwa_pemerge(const void *opt, bseq1_t x[2]);

/* run one pair; returns the C error code; on success writes the merged
   seq/qual (NUL-terminated) into out_seq/out_qual (caller buffers). */
int shim_pemerge(int min_ovlp, const char *s1, const char *q1,
                 const char *s2, const char *q2,
                 char *out_seq, char *out_qual, int cap)
{
    pem_opt_shim_t *opt = (pem_opt_shim_t *)pem_opt_init();
    bseq1_t x[2];
    int ret;
    opt->T = opt->a * min_ovlp;
    memset(x, 0, sizeof(x));
    x[0].name = strdup("r"); x[1].name = strdup("r");
    x[0].seq = strdup(s1); x[0].l_seq = strlen(s1);
    x[1].seq = strdup(s2); x[1].l_seq = strlen(s2);
    x[0].qual = q1 && q1[0] ? strdup(q1) : 0;
    x[1].qual = q2 && q2[0] ? strdup(q2) : 0;
    ret = bwa_pemerge(opt, x);
    out_seq[0] = out_qual[0] = 0;
    if (ret == 0 && x[0].l_seq < cap) {
        strcpy(out_seq, x[0].seq);
        if (x[0].qual) strcpy(out_qual, x[0].qual);
    }
    free(opt);
    return ret;
}
"""


def build_pemerge():
    if "pem" in _cache:
        return _cache["pem"]
    d = tempfile.mkdtemp(prefix="refpem")
    lib = os.path.join(d, "libpem.so")
    shim = os.path.join(d, "shim.c")
    with open(shim, "w") as f:
        f.write(PEM_SHIM)
    srcs = [os.path.join(REF, f) for f in
            ("pemerge.c", "ksw.c", "utils.c", "kstring.c",
             "malloc_wrap.c")] + [shim]
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-O2", "-DUSE_MALLOC_WRAPPERS",
         "-I", REF, "-o", lib] + srcs + ["-lz", "-lm", "-lpthread"],
        check=True, capture_output=True)
    L = ctypes.CDLL(lib)
    L.shim_pemerge.restype = ctypes.c_int
    L.shim_pemerge.argtypes = [ctypes.c_int] + [ctypes.c_char_p] * 4 + \
        [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    _cache["pem"] = L
    return L


def build_bwa_binary():
    """Compile the full reference tree (USE_SW mode, HARP globals
    stubbed) into a runnable bwa binary for on-the-fly golden
    generation.  Cached per test session."""
    if "bwa" in _cache:
        return _cache["bwa"]
    d = tempfile.mkdtemp(prefix="refbwa")
    main_stub = os.path.join(d, "main_stub.c")
    with open(main_stub, "w") as f:
        f.write("extern int top_main(int argc, char *argv[]);\n"
                "int main(int argc, char *argv[])"
                "{ return top_main(argc, argv); }\n")
    harp_stub = os.path.join(d, "harp_stub.c")
    with open(harp_stub, "w") as f:
        f.write(
            "#include <stdint.h>\n"
            "static unsigned int hs, rs;\n"
            "uint64_t *SPL_BWT_ref = 0, *SPL_CNT_table = 0;\n"
            "volatile unsigned int *handshake = &hs;\n"
            "volatile unsigned int *read_size = &rs;\n"
            "uint64_t *SPL_BWT_input = 0, *SPL_BWT_output = 0;\n")
    srcs = [os.path.join(REF, f) for f in (
        "utils.c", "kthread.c", "kthread_batch.c", "kstring.c", "ksw.c",
        "bwt.c", "bntseq.c", "bwa.c", "bwamem.c", "bwamem_pair.c",
        "malloc_wrap.c", "QSufSort.c", "bwt_gen.c", "bwase.c",
        "bwaseqio.c", "bwtgap.c", "bwtaln.c", "bamlite.c", "is.c",
        "bwtindex.c", "bwape.c", "kopen.c", "pemerge.c", "bwtsw2_core.c",
        "bwtsw2_main.c", "bwtsw2_aux.c", "bwt_lite.c", "bwtsw2_chain.c",
        "fastmap.c", "bwtsw2_pair.c", "top.c")]
    exe = os.path.join(d, "bwa_ref")
    subprocess.run(
        ["gcc", "-O2", "-DUSE_SW", "-DUSE_MALLOC_WRAPPERS", "-I", REF,
         "-o", exe, main_stub, harp_stub] + srcs
        + ["-lm", "-lz", "-lpthread", "-Wl,--allow-multiple-definition"],
        check=True, capture_output=True)
    _cache["bwa"] = exe
    return exe
