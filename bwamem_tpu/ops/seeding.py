"""Lock-step batched SMEM iteration and seed production.

TPU-native re-design of the reference's batched seeding pipeline
(smem_next2_batched software/bwamem.c:110-241, mem_insert_seed_batched
software/bwamem.c:357-451): all live reads advance their SMEM iterator
in lock-step, each outer iteration issuing at most two batched smem1
dispatches (main pass + the long-unique-SMEM re-seed pass) to the device
— exactly the dispatch structure the reference sends to the FPGA, with
the per-read `done[]` masking replaced by lane masks.

The ordered main/sub merge and the iterator bookkeeping are scalar host
work on the (tiny) returned interval lists, matching the reference,
which also keeps them on the CPU (software/bwamem.c:185-238).

Seed reference positions come from one batched SA-lookup dispatch over
every occurrence of every kept interval (software/bwamem.c:420,
bwt_sa software/bwt.c:104-114); lanes whose inverse-Psi walk exceeds the
static step cap fall back to the host oracle — the reference's own
HW-caps/CPU-fallback pattern (software/bwt.c:603-717).
"""

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .fm import DeviceFmIndex, sa_lookup_batched

Intv = Tuple[int, int, int, int]  # (x0, x1, s, info=qb<<32|qe)


# Fixed lane counts: every dispatch pads to exactly one shape so the
# device pays ONE compile per kernel no matter the workload (compiles
# are ~90 s on the TPU remote-compile path; padded lanes mask out and
# finish instantly, so the padding is nearly free).
import os as _os
LANES = int(_os.environ.get("BWAMEM_TPU_LANES", "512"))
SA_SLICE = int(_os.environ.get("BWAMEM_TPU_SA_SLICE", "16384"))


class BatchedSeeder:
    """Produces, per read, the ordered interval stream the host
    SmemIterator would produce — computed by batched device kernels."""

    def __init__(self, dfm: DeviceFmIndex, max_len: int = 128,
                 sa_max_steps: int = 128, fm_host=None, m_out: int = 16,
                 timer=None):
        self.dfm = dfm
        self.L = int(max_len)
        # interval-buffer width: typical prev/mem lists are short; lanes
        # that outgrow it fall back to the host oracle (analog of the
        # FPGA's fixed push_mem BRAM, hardware/afu_core.v:5946-5969)
        self.M = 48
        self.m_out = min(int(m_out), self.M)
        self.sa_max_steps = int(sa_max_steps)
        self.fm_host = fm_host  # host oracle for overflow fallback
        self.timer = timer      # engine's kernel-time accounting

    def interval_streams(self, opt, queries: Sequence[np.ndarray]
                         ) -> List[List[Intv]]:
        """Run the full iterator for every read (sliced into fixed-width
        lane groups); returns, per read, the concatenated interval lists
        of every iterator call, in call order (the exact stream
        mem_chain consumes, software/bwamem.c:593-615)."""
        out: List[List[Intv]] = []
        for lo in range(0, len(queries), LANES):
            out.extend(self._interval_streams_slice(
                opt, queries[lo:lo + LANES]))
        return out

    def _interval_streams_slice(self, opt, queries: Sequence[np.ndarray]
                                ) -> List[List[Intv]]:
        n = len(queries)
        B = LANES
        L, M = self.L, self.M
        qpad = np.full((B, L), 4, dtype=np.int8)
        qlen = np.zeros(B, dtype=np.int32)
        for i, q in enumerate(queries):
            qlen[i] = len(q)
            qpad[i, :len(q)] = q

        from ..config import MEM_F_NO_EXACT
        start_width = 2 if (opt.flag & MEM_F_NO_EXACT) else 1
        split_widths = np.zeros(B, dtype=np.int64)
        split_lens = np.zeros(B, dtype=np.int64)
        for i, q in enumerate(queries):
            sl = int(opt.min_seed_len * opt.split_factor + .499)
            split_lens[i] = min(sl, len(q))
            split_widths[i] = opt.split_width

        start = np.zeros(B, dtype=np.int32)
        exhausted = np.zeros(B, dtype=bool)
        exhausted[n:] = True
        out: List[List[Intv]] = [[] for _ in range(n)]

        import jax
        from .smem import smem_iter_step
        d = self.dfm
        # upload loop-invariant arrays once (the query buffer alone is
        # ~1 MB per slice; re-uploading it every iterator step doubles
        # the per-dispatch transfer volume)
        qpad_d = jnp.asarray(qpad)
        qlen_d = jnp.asarray(qlen)
        slens_d = jnp.asarray(split_lens)
        swid_d = jnp.asarray(split_widths)
        from .engine import MIN_WAVE
        while not exhausted.all():
            # skip ambiguous bases (software/bwamem.c:258-259)
            for i in np.nonzero(~exhausted)[0]:
                q = queries[i]
                s = start[i]
                while s < qlen[i] and q[s] > 3:
                    s += 1
                start[i] = s
                if s >= qlen[i]:
                    exhausted[i] = True
            active = ~exhausted
            if not active.any():
                break
            if int(active.sum()) < MIN_WAVE and self.fm_host is not None:
                # straggler tail: finish the few live reads on the host
                # oracle (identical results) instead of paying full-width
                # dispatch round trips
                for i in np.nonzero(active)[0]:
                    while start[i] < qlen[i]:
                        q = queries[i]
                        while start[i] < qlen[i] and q[start[i]] > 3:
                            start[i] += 1
                        if start[i] >= qlen[i]:
                            break
                        oret, matches = self._oracle_step(
                            opt, q, int(start[i]), start_width,
                            int(split_lens[i]), int(split_widths[i]))
                        start[i] = oret
                        out[i].extend(matches)
                    exhausted[i] = True
                break
            x = np.where(active, start, 0).astype(np.int32)
            mi = np.full(B, start_width, dtype=np.int64)
            step = lambda: jax.device_get(smem_iter_step(
                d.blocks, d.primary, d.L2,
                qpad_d, qlen_d, jnp.asarray(x),
                jnp.asarray(mi), jnp.asarray(active),
                slens_d, swid_d,
                L=self.L, M=self.M, M_OUT=self.m_out))
            res = self.timer._timed(step) if self.timer else step()
            (ret, n_mem, m0, m1, ms, mqb, mqe, over1, need2,
             _r2, n2, s0, s1, ss, sqb, sqe, over2) = res
            n_mem = np.where(over1, self.M + 1, n_mem)
            n2 = np.where(over2, self.M + 1, n2)
            ori_start = start.copy()
            start = np.where(active, ret, start).astype(np.int32)

            for i in np.nonzero(active)[0]:
                if int(n_mem[i]) > self.m_out:
                    # host fallback: the whole iterator step via oracle
                    oret, matches = self._oracle_step(
                        opt, queries[i], int(ori_start[i]), start_width,
                        int(split_lens[i]), int(split_widths[i]))
                    start[i] = oret
                    out[i].extend(matches)
                    continue
                matches = [(int(m0[i, j]), int(m1[i, j]), int(ms[i, j]),
                            (int(mqb[i, j]) << 32) | int(mqe[i, j]))
                           for j in range(int(n_mem[i]))]
                if need2[i] and matches:
                    best_len, best = 0, 0
                    for j, p in enumerate(matches):
                        ln = (p[3] & 0xFFFFFFFF) - (p[3] >> 32)
                        if best_len < ln:
                            best_len, best = ln, j
                    pm = matches[best]
                    if int(n2[i]) > self.m_out:  # pass-2 overflow
                        from ..oracle.smem import smem1
                        _, sub = smem1(
                            self.fm_host, queries[i],
                            ((pm[3] >> 32) + (pm[3] & 0xFFFFFFFF)) >> 1,
                            pm[2] + 1)
                    else:
                        sub = [(int(s0[i, j]), int(s1[i, j]),
                                int(ss[i, j]),
                                (int(sqb[i, j]) << 32) | int(sqe[i, j]))
                               for j in range(int(n2[i]))]
                    matches = _merge(matches, sub, best_len,
                                     int(ori_start[i]), int(qlen[i]))
                out[i].extend(matches)
        return out

    def _oracle_step(self, opt, query, x: int, start_width: int,
                     split_len: int, split_width: int):
        """One full iterator step on the host oracle (pass1 + split +
        pass2 + merge) for lanes that overflowed the device buffers."""
        from ..oracle.smem import smem1
        assert self.fm_host is not None, "overflow without host oracle"
        oret, matches = smem1(self.fm_host, query, x, start_width)
        if not matches:
            return oret, matches
        best_len, best = 0, 0
        for j, p in enumerate(matches):
            ln = (p[3] & 0xFFFFFFFF) - (p[3] >> 32)
            if best_len < ln:
                best_len, best = ln, j
        pm = matches[best]
        if (split_len > 0 and best_len >= split_len
                and pm[2] <= split_width):
            _, sub = smem1(self.fm_host, query,
                           ((pm[3] >> 32) + (pm[3] & 0xFFFFFFFF)) >> 1,
                           pm[2] + 1)
            matches = _merge(matches, sub, best_len, x, len(query))
        return oret, matches

    def seed_positions(self, fm_host, intervals_per_read, opt
                       ) -> List[List[Tuple[int, int, int]]]:
        """For each read, the ordered (rbeg, qbeg, len) seed list after
        the min_seed_len/max_occ filters (software/bwamem.c:407-420),
        with all SA lookups batched into one device dispatch."""
        keys: List[int] = []
        layout = []  # (read, intv, slen, qb, n_occ, key_offset)
        for i, intervals in enumerate(intervals_per_read):
            for p in intervals:
                slen = (p[3] & 0xFFFFFFFF) - (p[3] >> 32)
                if slen < opt.min_seed_len or p[2] > opt.max_occ:
                    continue
                layout.append((i, p, slen, p[3] >> 32, p[2], len(keys)))
                keys.extend(range(p[0], p[0] + p[2]))
        out: List[List[Tuple[int, int, int]]] = \
            [[] for _ in intervals_per_read]
        if not keys:
            return out
        d = self.dfm
        karr = np.asarray(keys, dtype=np.int64)
        vals = np.empty(len(karr), dtype=np.int64)
        over = np.empty(len(karr), dtype=bool)
        for lo in range(0, len(karr), SA_SLICE):
            sl = karr[lo:lo + SA_SLICE]
            pad = np.zeros(SA_SLICE, dtype=np.int64)
            pad[:len(sl)] = sl
            import jax
            fn = lambda: jax.device_get(sa_lookup_batched(
                d.blocks, d.primary, d.L2, d.seq_len, d.sa, d.sa_intv,
                jnp.asarray(pad), max_steps=self.sa_max_steps))
            v, o = self.timer._timed(fn) if self.timer else fn()
            vals[lo:lo + len(sl)] = v[:len(sl)]
            over[lo:lo + len(sl)] = o[:len(sl)]
        for idx in np.nonzero(over)[0]:  # host fallback
            vals[idx] = fm_host.sa_lookup(int(karr[idx]))
        for (i, p, slen, qb, n_occ, off) in layout:
            for k in range(n_occ):
                out[i].append((int(vals[off + k]), qb, slen))
        return out


def _merge(matches: List[Intv], sub: List[Intv], max_len: int,
           ori_start: int, qlen: int) -> List[Intv]:
    """Ordered merge of main and re-seeded matches
    (software/bwamem.c:206-238): keep sub-matches at least half the max
    length that end after the original start."""
    merged: List[Intv] = []
    i = j = 0
    while i < len(matches) and j < len(sub):
        pi, pj = matches[i], sub[j]
        xi = (pi[3] >> 32 << 32) | (qlen - (pi[3] & 0xFFFFFFFF))
        xj = (pj[3] >> 32 << 32) | (qlen - (pj[3] & 0xFFFFFFFF))
        if xi < xj:
            merged.append(pi)
            i += 1
        elif ((pj[3] & 0xFFFFFFFF) - (pj[3] >> 32) >= (max_len >> 1)
                and (pj[3] & 0xFFFFFFFF) > ori_start):
            merged.append(pj)
            j += 1
        else:
            j += 1
    merged.extend(matches[i:])
    for pj in sub[j:]:
        if ((pj[3] & 0xFFFFFFFF) - (pj[3] >> 32) >= (max_len >> 1)
                and (pj[3] & 0xFFFFFFFF) > ori_start):
            merged.append(pj)
    return merged
