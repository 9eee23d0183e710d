"""TPU seeding engine: pluggable into core.pipeline.process_seqs.

Replaces the reference's manager-thread + FPGA dispatch machinery
(software/fastmap.c:320-429) with direct batched device kernels — the
TPU is not a contended single accelerator, so the handshake mailbox
disappears and the dispatch loop simply keeps the chip busy
(SURVEY.md §2.4).

Reads longer than the engine's static length cap run entirely through
the host oracle path, mirroring the reference's hardware read-length cap
with CPU fallback (101-byte query buffers, software/bwt.c:575).
"""

from typing import List

import numpy as np

from .fm import DeviceFmIndex
from .seeding import BatchedSeeder


class JaxSeedingEngine:
    def __init__(self, fm_host, max_len: int = 128, sa_max_steps: int = 128):
        self.fm_host = fm_host
        self.dfm = DeviceFmIndex.from_host(fm_host)
        self.seeder = BatchedSeeder(self.dfm, max_len=max_len,
                                    sa_max_steps=sa_max_steps)
        self.max_len = max_len

    def chain_batch(self, opt, reads) -> List[list]:
        """Batched replacement for per-read mem_chain
        (software/bwamem.c:453-501): device seeding + SA, host chain
        insertion replaying the kbtree semantics."""
        from ..core.chain import Chain, ChainTree, _test_and_merge
        from ..core.pipeline import encode_read

        l_pac = None
        for r in reads:
            encode_read(r)

        dev_idx = [i for i, r in enumerate(reads)
                   if len(r.seq_nt4) <= self.max_len
                   and len(r.seq_nt4) >= opt.min_seed_len]
        host_idx = [i for i, r in enumerate(reads)
                    if len(r.seq_nt4) > self.max_len]

        chains: List[list] = [[] for _ in reads]
        if dev_idx:
            queries = [reads[i].seq_nt4 for i in dev_idx]
            streams = self.seeder.interval_streams(opt, queries)
            seeds = self.seeder.seed_positions(self.fm_host, streams, opt)
            l_pac = self.fm_host.seq_len >> 1
            for bi, i in enumerate(dev_idx):
                tree = ChainTree()
                for s in seeds[bi]:
                    rbeg, qbeg, slen = s
                    if rbeg < l_pac < rbeg + slen:
                        continue  # bridging fwd-rev boundary
                    to_add = False
                    if len(tree):
                        low = tree.lower(rbeg)
                        if low is None or not _test_and_merge(
                                opt, l_pac, low, s):
                            to_add = True
                    else:
                        to_add = True
                    if to_add:
                        tree.insert(Chain(pos=rbeg, seeds=[s]))
                chains[i] = tree.chains
        if host_idx:
            from ..core.chain import mem_chain
            l_pac = self.fm_host.seq_len >> 1
            for i in host_idx:
                chains[i] = mem_chain(opt, self.fm_host, l_pac,
                                      reads[i].seq_nt4)
        return chains

    def align_batch(self, opt, fm, bns, pac, reads) -> List[list]:
        """mem_align1_core for a whole batch: batched device seeding,
        shared host chain-filter/extension/dedup downstream."""
        from ..core.pipeline import align1_core
        chains = self.chain_batch(opt, reads)
        return [align1_core(opt, fm, bns, pac, r, chains=chains[i])
                for i, r in enumerate(reads)]
