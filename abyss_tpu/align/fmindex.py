"""FM-index: BWT-based substring index.

Reimplements the role of /root/reference/FMIndex/ (FMIndex.h:20-45,
sais.hxx suffix array, BitArrays.h occurrence tables, sampled SA) used
by abyss-index / abyss-map / abyss-count / abyss-overlap.

Host/numpy implementation: the suffix array is built by prefix doubling
(radix argsort), the occurrence table is a checkpointed cumulative
count, and `locate` uses a sampled SA.  The production read mapper uses
the k-mer seed index (align/mapper.py) — on a vector machine a sorted
hash join beats a pointer-chasing backward search — but the FM-index is
provided for the toolchain's substring/count/overlap capabilities.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

SENTINEL = 0  # '$' < all codes; stored text uses codes+1 internally


def suffix_array(text: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (O(n log^2 n) with numpy sorts)."""
    n = len(text)
    rank = text.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, np.int64)
    k = 1
    while k < n:
        key2 = np.full(n, -1, np.int64)
        key2[:n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        tmp[order[0]] = 0
        prev = order[:-1]
        cur = order[1:]
        newgrp = (rank[cur] != rank[prev]) | (key2[cur] != key2[prev])
        tmp[cur] = np.cumsum(newgrp)
        rank = tmp.copy()
        sa = order
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


@dataclass
class FMIndex:
    bwt: np.ndarray        # uint8[n] (values 0..4; 0 = sentinel)
    C: np.ndarray          # int64[6] cumulative symbol starts
    occ: np.ndarray        # int64[n+1, 5] prefix occurrence counts
    sa_sample: np.ndarray  # sampled suffix array values
    sa_rate: int
    n: int

    @staticmethod
    def build(codes: np.ndarray, sa_rate: int = 8) -> "FMIndex":
        """codes: uint8 array of base codes (0..3)."""
        text = codes.astype(np.int64) + 1
        text = np.concatenate([text, [SENTINEL]])
        n = len(text)
        sa = suffix_array(text)
        bwt = text[(sa - 1) % n].astype(np.uint8)
        counts = np.bincount(text, minlength=6)
        C = np.zeros(6, np.int64)
        C[1:] = np.cumsum(counts)[:-1]
        onehot = np.zeros((n + 1, 5), np.int64)
        for s in range(5):
            onehot[1:, s] = np.cumsum(bwt == s)
        keep = sa % sa_rate == 0
        # store (position in SA order) -> text position for sampled rows
        sa_sample = np.full(n, -1, np.int64)
        sa_sample[keep] = sa[keep]
        return FMIndex(bwt=bwt, C=C, occ=onehot, sa_sample=sa_sample,
                       sa_rate=sa_rate, n=n)

    def backward_search(self, pattern: np.ndarray) -> tuple[int, int]:
        """SA interval [lo, hi) of the pattern (codes 0..3)."""
        lo, hi = 0, self.n
        for c in pattern[::-1].astype(np.int64) + 1:
            lo = self.C[c] + self.occ[lo, c]
            hi = self.C[c] + self.occ[hi, c]
            if lo >= hi:
                return 0, 0
        return int(lo), int(hi)

    def count(self, pattern: np.ndarray) -> int:
        lo, hi = self.backward_search(pattern)
        return hi - lo

    def _sa_at(self, i: int) -> int:
        steps = 0
        while self.sa_sample[i] < 0:
            c = int(self.bwt[i])
            i = int(self.C[c] + self.occ[i, c])
            steps += 1
        return int((self.sa_sample[i] + steps) % self.n)

    def locate(self, pattern: np.ndarray, limit: int = 100) -> list[int]:
        lo, hi = self.backward_search(pattern)
        return sorted(self._sa_at(i) for i in range(lo, min(hi, lo + limit)))
