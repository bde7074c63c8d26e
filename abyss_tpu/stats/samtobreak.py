"""Assembly correctness metrics vs a known reference genome.

The role of /root/reference/Misc/samtobreak.hs (abyss-samtobreak):
count contig breakpoints — places where a contig's alignment to the
reference jumps — plus aligned fraction and mismatch counts.  Instead
of parsing external SAM, contigs are aligned here with the k-mer seed
index: per contig, seed matches are grouped into (contig, strand,
diagonal) blocks; every extra block beyond the first is a breakpoint.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..core import alphabet
from ..ops import nthash
from ..align.mapper import KmerIndex


@dataclass
class BreakStats:
    contigs: int = 0
    aligned_contigs: int = 0
    breakpoints: int = 0
    aligned_bases: int = 0
    total_bases: int = 0
    per_contig: dict = field(default_factory=dict)

    @property
    def aligned_fraction(self) -> float:
        return self.aligned_bases / max(self.total_bases, 1)


def contig_breakpoints(genome: str | list[tuple[str, str]],
                       contigs: list[tuple[str, str]], k: int = 32,
                       min_block: int = 100) -> BreakStats:
    """Align contigs to the reference; count alignment blocks."""
    refs = [("ref", genome)] if isinstance(genome, str) else genome
    index = KmerIndex.build(refs, k)
    stats = BreakStats()
    for name, seq in contigs:
        stats.contigs += 1
        stats.total_bases += len(seq)
        if len(seq) < k:
            continue
        codes = alphabet.encode(seq)
        # padded shapes: one compile per power-of-two length bucket
        f, r, canon, valid = nthash.kmer_hashes_padded(codes, k)
        W = len(seq) - k + 1
        canon_np = np.asarray(canon)[:W]
        read_fwd = np.asarray(f == canon)[:W]
        valid_np = np.asarray(valid)[:W]
        N = index.hashes.shape[0]
        base = np.asarray(jnp.searchsorted(index.hashes,
                                           jnp.asarray(canon_np)))
        keys = np.full(len(canon_np), -1, np.int64)
        for w in range(len(canon_np)):
            if not valid_np[w]:
                continue
            i = int(base[w])
            while i < N and int(np.asarray(index.hashes[i])) == \
                    int(canon_np[w]):
                strand = int(np.asarray(index.is_fwd[i])) != bool(
                    read_fwd[w])
                pos = int(np.asarray(index.pos[i]))
                contig = int(np.asarray(index.contig[i]))
                diag = pos - w if not strand else pos + w
                keys[w] = ((contig * 2 + strand) << 24) + diag + (1 << 22)
                break
            else:
                i += 1
        # group consecutive matching windows into blocks (allow small
        # diagonal jitter from indels: treat keys within +-2 as same)
        blocks = []
        cur_key, cur_start, cur_len = None, 0, 0
        for w, key in enumerate(keys):
            if key < 0:
                continue
            if cur_key is not None and abs(key - cur_key) <= 2:
                cur_len = w - cur_start + k
            else:
                if cur_key is not None and cur_len >= min_block:
                    blocks.append((cur_start, cur_len))
                cur_key, cur_start, cur_len = key, w, k
        if cur_key is not None and cur_len >= min_block:
            blocks.append((cur_start, cur_len))
        if blocks:
            stats.aligned_contigs += 1
            stats.breakpoints += len(blocks) - 1
            stats.aligned_bases += sum(b[1] for b in blocks)
        stats.per_contig[name] = len(blocks)
    return stats


def sam_breakpoints(sam, min_align: int = 100) -> BreakStats:
    """Breakpoint metrics from an EXTERNAL SAM of contig-to-reference
    alignments (the Misc/samtobreak.hs input contract: alignments from
    any mapper; records shorter than min_align are ignored; each extra
    alignment block of a contig beyond the first is a breakpoint).

    `sam` is an iterable of SAM lines or a path."""
    import os
    import re
    own = isinstance(sam, (str, os.PathLike))
    f = open(sam) if own else sam
    per: dict[str, list] = {}
    lengths: dict[str, int] = {}
    try:
        for line in f:
            if not line or line.startswith("@"):
                continue
            fields = line.rstrip("\n").split("\t")
            if len(fields) < 11:
                continue
            qname, flag, rname, pos, _, cigar = fields[:6]
            flag = int(flag)
            if flag & 0x100 or flag & 0x800 or rname == "*":
                continue  # secondary/supplementary like the Haskell tool
            qlen = 0
            aligned = 0
            for n, op in re.findall(r"(\d+)([MIDNSHP=X])", cigar):
                n = int(n)
                if op in "M=X":
                    aligned += n
                    qlen += n
                elif op in "IS":
                    qlen += n
            lengths[qname] = max(lengths.get(qname, 0), qlen)
            if aligned >= min_align:
                per.setdefault(qname, []).append(
                    (rname, int(pos), aligned))
    finally:
        if own:
            f.close()
    stats = BreakStats()
    stats.contigs = len(lengths)
    stats.total_bases = sum(lengths.values())
    for name, blocks in per.items():
        stats.aligned_contigs += 1
        stats.aligned_bases += sum(b[2] for b in blocks)
        stats.breakpoints += len(blocks) - 1
        stats.per_contig[name] = len(blocks) - 1
    return stats
