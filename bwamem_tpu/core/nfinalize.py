"""ctypes binding to the native single-end finalize (native/finalize.cpp).

Packs a whole chunk's reads + alignment regions into flat arrays, makes
ONE native call, and slices the returned SAM text back onto the reads.
Byte-identical to the Python finalize path (mark_primary +
reg2sam_se_gen + aln2sam); BWAMEM_TPU_NATIVE_FINALIZE=0 forces Python.

The banded global realignments of mem_reg2aln run inside the native
call (scalar, ~50us each) instead of as device waves: the device keeps
the heavy seeding/SMEM/extension stages, the host finalizes — the
reference's own accelerator/CPU split (SURVEY.md §1).
"""

import ctypes
import os
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libbwamem_native.so")

_lib = None
_lib_lock = threading.Lock()

_I8P = ctypes.POINTER(ctypes.c_int8)
_U8P = ctypes.POINTER(ctypes.c_uint8)
_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("BWAMEM_TPU_NATIVE_FINALIZE", "1") == "0":
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        import subprocess
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_SO_PATH):
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.bm_finalize_se.restype = ctypes.c_void_p
            lib.bm_finalize_se.argtypes = [
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, _I8P,
                ctypes.c_int64, _U8P, ctypes.c_int32, _I64P, _I32P,
                ctypes.c_char_p,
                ctypes.c_int32, ctypes.c_int64, _U8P, _I64P,
                ctypes.c_char_p, _I64P, ctypes.c_char_p, _I64P,
                ctypes.c_char_p, _I64P, ctypes.c_char_p,
                _I64P, _I64P, _I64P, _I32P, _I32P, _I32P, _I32P, _I32P,
                _I32P, _I32P,
                _I64P, _I64P]
            lib.bm_free.restype = None
            lib.bm_free.argtypes = [ctypes.c_void_p]
            _DP = ctypes.POINTER(ctypes.c_double)
            lib.bm_finalize_pe.restype = ctypes.c_void_p
            lib.bm_finalize_pe.argtypes = [
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, _I8P, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_double,
                _I64P, _I64P, _I32P, _DP, _DP,
                ctypes.c_int64, _U8P, ctypes.c_int32, _I64P, _I32P,
                ctypes.c_char_p,
                ctypes.c_int32, ctypes.c_int64, _U8P, _I64P,
                ctypes.c_char_p, _I64P, ctypes.c_char_p, _I64P,
                ctypes.c_char_p, _I64P, ctypes.c_char_p,
                _I64P, _I64P, _I64P, _I32P, _I32P, _I32P, _I32P, _I32P,
                _I32P, _I32P,
                _I64P, _I64P]
        except (OSError, AttributeError):
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ty):
    return a.ctypes.data_as(ty)


_bns_cache = {}


def _pack_bns(bns):
    """Cache the per-genome annotation arrays (one live genome)."""
    ent = _bns_cache.get(id(bns))
    if ent is not None and ent[0] is bns:
        return ent[1]
    ann_off = np.asarray([a.offset for a in bns.anns], dtype=np.int64)
    ann_len = np.asarray([a.length for a in bns.anns], dtype=np.int32)
    ann_names = b"".join(a.name.encode("latin1") + b"\0" for a in bns.anns)
    pac = np.ascontiguousarray(bns.pac, dtype=np.uint8)
    _bns_cache.clear()
    _bns_cache[id(bns)] = (bns, (ann_off, ann_len, ann_names, pac))
    return ann_off, ann_len, ann_names, pac


def _concat_strs(items: List[str]):
    """NUL-terminated concatenation + int64 start offsets."""
    off = np.zeros(len(items) + 1, dtype=np.int64)
    parts = []
    pos = 0
    for i, s in enumerate(items):
        b = s.encode("latin1") + b"\0"
        parts.append(b)
        off[i] = pos
        pos += len(b)
    off[len(items)] = pos
    return b"".join(parts), off


def _pack_chunk(reads, regs: List[list]):
    """Flatten a chunk's reads + regions into the native-call arrays."""
    n = len(reads)
    seq_off = np.zeros(n + 1, dtype=np.int64)
    for i, r in enumerate(reads):
        seq_off[i + 1] = seq_off[i] + len(r.seq_nt4)
    seqs = np.empty(int(seq_off[-1]), dtype=np.uint8)
    for i, r in enumerate(reads):
        seqs[int(seq_off[i]):int(seq_off[i + 1])] = r.seq_nt4

    names, name_off = _concat_strs([r.name for r in reads])
    quals, qual_off = _concat_strs([r.qual or "" for r in reads])
    comms, comm_off = _concat_strs([r.comment or "" for r in reads])

    n_regs = sum(len(g) for g in regs)
    reg_off = np.zeros(n + 1, dtype=np.int64)
    rb = np.zeros(n_regs, dtype=np.int64)
    re_ = np.zeros(n_regs, dtype=np.int64)
    qb = np.zeros(n_regs, dtype=np.int32)
    qe = np.zeros(n_regs, dtype=np.int32)
    sc = np.zeros(n_regs, dtype=np.int32)
    ts = np.zeros(n_regs, dtype=np.int32)
    cs = np.zeros(n_regs, dtype=np.int32)
    wv = np.zeros(n_regs, dtype=np.int32)
    sv = np.zeros(n_regs, dtype=np.int32)
    k = 0
    for i, g in enumerate(regs):
        for p in g:
            rb[k], re_[k] = p.rb, p.re
            qb[k], qe[k] = p.qb, p.qe
            sc[k], ts[k], cs[k] = p.score, p.truesc, p.csub
            wv[k], sv[k] = p.w, p.seedcov
            k += 1
        reg_off[i + 1] = k
    return (seqs, seq_off, names, name_off, quals, qual_off, comms,
            comm_off, reg_off, rb, re_, qb, qe, sc, ts, cs, wv, sv)


def _common_args(opt, bns, packed, n, n_processed, rg_id):
    ann_off, ann_len, ann_names, pac = _pack_bns(bns)
    (seqs, seq_off, names, name_off, quals, qual_off, comms, comm_off,
     reg_off, rb, re_, qb, qe, sc, ts, cs, wv, sv) = packed
    return (
        [bns.l_pac, _ptr(pac, _U8P), len(bns.anns),
         _ptr(ann_off, _I64P), _ptr(ann_len, _I32P), ann_names,
         n, n_processed, _ptr(seqs, _U8P), _ptr(seq_off, _I64P),
         names, _ptr(name_off, _I64P), quals, _ptr(qual_off, _I64P),
         comms, _ptr(comm_off, _I64P), rg_id.encode("latin1"),
         _ptr(reg_off, _I64P), _ptr(rb, _I64P), _ptr(re_, _I64P),
         _ptr(qb, _I32P), _ptr(qe, _I32P), _ptr(sc, _I32P),
         _ptr(ts, _I32P), _ptr(cs, _I32P), _ptr(wv, _I32P),
         _ptr(sv, _I32P)])


def _collect(lib, ptr, rec_off, total, reads) -> bool:
    if not ptr:
        return False
    try:
        blob = ctypes.string_at(ptr, int(total[0]))
    finally:
        lib.bm_free(ptr)
    text = blob.decode("latin1")
    for i, r in enumerate(reads):
        r.sam = text[int(rec_off[i]):int(rec_off[i + 1])]
    return True


def finalize_se_native(opt, bns, reads, regs: List[list],
                       n_processed: int, rg_id: str) -> bool:
    """Run the whole chunk's SE finalize natively; sets read.sam.
    Returns False when unavailable or when the native path bails
    (caller must then run the Python finalize)."""
    lib = _load()
    if lib is None:
        return False
    n = len(reads)
    packed = _pack_chunk(reads, regs)
    mat = np.ascontiguousarray(np.asarray(opt.mat).reshape(-1),
                               dtype=np.int8)
    rec_off = np.zeros(n + 1, dtype=np.int64)
    total = np.zeros(1, dtype=np.int64)
    args = [opt.a, opt.b, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
            opt.w, opt.T, opt.flag, opt.min_seed_len,
            float(opt.mask_level), float(opt.mapQ_coef_len),
            float(opt.mapQ_coef_fac), _ptr(mat, _I8P)]
    args += _common_args(opt, bns, packed, n, n_processed, rg_id)
    args += [_ptr(rec_off, _I64P), _ptr(total, _I64P)]
    ptr = lib.bm_finalize_se(*args)
    return _collect(lib, ptr, rec_off, total, reads)


def finalize_pe_native(opt, bns, pes, reads, regs: List[list],
                       n_processed: int, rg_id: str) -> bool:
    """Run the whole chunk's PE finalize natively (mate rescue, pairing,
    MAPQ reconciliation, SAM); sets read.sam on the interleaved reads.
    `pes` is the 4-orientation PeStat list from pestat()."""
    lib = _load()
    if lib is None:
        return False
    n = len(reads)
    if n % 2:
        return False
    packed = _pack_chunk(reads, regs)
    mat = np.ascontiguousarray(np.asarray(opt.mat).reshape(-1),
                               dtype=np.int8)
    pes_low = np.asarray([p.low for p in pes], dtype=np.int64)
    pes_high = np.asarray([p.high for p in pes], dtype=np.int64)
    pes_failed = np.asarray([p.failed for p in pes], dtype=np.int32)
    pes_avg = np.asarray([p.avg for p in pes], dtype=np.float64)
    pes_std = np.asarray([p.std for p in pes], dtype=np.float64)
    rec_off = np.zeros(n + 1, dtype=np.int64)
    total = np.zeros(1, dtype=np.int64)
    _DP = ctypes.POINTER(ctypes.c_double)
    args = [opt.a, opt.b, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
            opt.w, opt.T, opt.flag, opt.min_seed_len,
            float(opt.mask_level), float(opt.mapQ_coef_len),
            float(opt.mapQ_coef_fac), _ptr(mat, _I8P),
            opt.pen_unpaired, opt.max_matesw,
            float(opt.mask_level_redun),
            _ptr(pes_low, _I64P), _ptr(pes_high, _I64P),
            _ptr(pes_failed, _I32P), _ptr(pes_avg, _DP),
            _ptr(pes_std, _DP)]
    args += _common_args(opt, bns, packed, n, n_processed, rg_id)
    args += [_ptr(rec_off, _I64P), _ptr(total, _I64P)]
    ptr = lib.bm_finalize_pe(*args)
    return _collect(lib, ptr, rec_off, total, reads)
