"""Sorted-table k-mer counter: the scatter-free counting structure.

Motivation (measured on TPU v5e, see BENCH notes): XLA lowers scatter
updates to a serial loop (~20M updates/s), making per-batch counting-
Bloom inserts the bottleneck (~6M k-mers/s), while sorts and gathers run
at memory bandwidth.  The TPU-native replacement for the reference's
counting filter is therefore *sort-based*: collect canonical hashes,
sort once, run-length encode, and answer count/contains queries with
`searchsorted` (vectorized binary search) + one gather.

This is exact (no false positives; collisions only at the 64-bit hash
level), faster than Bloom updates by >100x on this hardware, and
memory-competitive until tens of billions of distinct k-mers (12 bytes
per distinct k-mer vs. the Bloom budget).  The CountingBloomFilter
remains available for strict reference-parity semantics.

The query API matches CountingBloomFilter (count/contains), so the
extension engine and all downstream consumers take either
interchangeably.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import nthash
from .scan import running_min

COUNTER_MAX = 32767  # COVERAGE_MAX, Assembly/VertexData.h:33


def _pad_pow2(x, fill=None):
    """Pad dim 0 up to the next power of two (sentinel/zero fill).

    Compiled sort/merge programs are then per-pow2-bucket instead of
    per-exact-shape: data-dependent sizes otherwise force a fresh XLA
    compile per run, and on this platform a large-sort compile can take
    tens of minutes (remote-compile pathology, BENCH_NOTES.md)."""
    n = x.shape[0]
    m = 1 << max(int(n - 1).bit_length(), 0)
    if m == n:
        return x
    if fill is None:
        fillv = jnp.asarray(0xFFFFFFFFFFFFFFFF, x.dtype)             if x.dtype == jnp.uint64 else jnp.asarray(0, x.dtype)
    else:
        fillv = jnp.asarray(fill, x.dtype)
    pad = jnp.full((m - n,), fillv, x.dtype)
    return jnp.concatenate([x, pad])


@dataclass(frozen=True)
class SortedKmerFilter:
    """Immutable sorted k-mer count table (pytree; static k/threshold)."""

    kmers: jax.Array    # uint64[N] sorted unique canonical hashes
    counts: jax.Array   # int32[N]
    # pre-packed (prefix|count) words for the single-sort probe
    # (ops/sort_join.pack_table); None until finalize() built it
    packed: jax.Array | None = None
    k: int = dataclasses.field(metadata=dict(static=True), default=0)
    threshold: int = dataclasses.field(metadata=dict(static=True), default=2)
    # unused, for API compatibility with CountingBloomFilter
    num_hashes: int = dataclasses.field(metadata=dict(static=True), default=1)

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def n(self) -> int:
        return int(self.kmers.shape[0])

    def count(self, canon, mask=None):
        canon = jnp.asarray(canon, jnp.uint64)
        idx = jnp.searchsorted(self.kmers, canon)
        idx = jnp.minimum(idx, max(self.n - 1, 0))
        hit = (self.kmers[idx] == canon) if self.n else \
            jnp.zeros(canon.shape, bool)
        c = jnp.where(hit, self.counts[idx], 0)
        if mask is not None:
            c = jnp.where(mask, c, 0)
        return c

    def contains(self, canon, mask=None):
        return self.count(canon, mask) >= self.threshold

    def count_bulk(self, canon, mask=None, exact: bool = False):
        """Bulk count via a sort join (ops/sort_join) — the gather-free
        path for large query batches on TPU.

        Default: the packed single-operand-sort probe (40-bit hash
        prefixes; false-join odds ~N*M/2^40 per batch, orders of
        magnitude below the reference's 5% Bloom FPR budget).  Pass
        exact=True for the full-64-bit join."""
        from .sort_join import join_counts, join_counts_packed
        canon = jnp.asarray(canon, jnp.uint64)
        flat = canon.reshape(-1)
        if exact or self.packed is None or flat.shape[0] >= (1 << 23):
            c = join_counts(self.kmers, self.counts, flat)
        else:
            c = join_counts_packed(self.packed, flat)
        c = c.reshape(canon.shape)
        if mask is not None:
            c = jnp.where(mask, c, 0)
        return c

    def contains_bulk(self, canon, mask=None):
        """Bulk solidity: the u32-finish packed probe when available
        (the classify hot path needs only the bit, not the count)."""
        from .sort_join import join_solid_packed
        canon = jnp.asarray(canon, jnp.uint64)
        flat = canon.reshape(-1)
        if self.packed is None or flat.shape[0] >= (1 << 23):
            hit = self.count_bulk(canon, mask) >= self.threshold
            return hit
        hit = join_solid_packed(self.packed, flat,
                                self.threshold).reshape(canon.shape)
        if mask is not None:
            hit = jnp.where(mask, hit, False)
        return hit


class SortedKmerCounter:
    """Streaming builder: accumulates canonical-hash chunks and counts
    them with device sorts (no scatter anywhere).

    Chunks are pre-reduced (sort + RLE) on device as they arrive, then
    merged with one final sort — the two-level strategy keeps peak
    memory at the reduced size.
    """

    def __init__(self, k: int, threshold: int = 2,
                 reduce_every: int = 12 << 20):
        # reduce_every measured on the 4.6 Mbp fixture (round 3, warm):
        # 12M -> 29.1 s count, 24M -> 43.5 s, 64M -> OOM at the
        # pow2-padded 2-operand merge sort.  Fewer/bigger merges LOSE:
        # the pow2 padding of the merge concat lands on the same 67M
        # bucket either way, so larger fresh chunks only add sort work.
        self.k = k
        self.threshold = threshold
        self._hash_chunks: list = []
        self._merged = None  # (keys, counts, n) running device table
        self._pending = 0
        self._reduce_every = reduce_every
        # singleton side-stash (round-4 verdict #2): keys seen ONCE in
        # a reduce window skip the running merge — at k=96 the 0.5%
        # read error rate makes ~90% of 44M distinct fingerprints
        # global singletons, and carrying them through every
        # incremental merge sort dominated stage 1 (1026.6 s).  They
        # are resolved EXACTLY by one sort+RLE at finalize (a key
        # singleton in window A and seen again in window B sums there).
        self._singles: list = []
        self._n_singles = 0

    @staticmethod
    @jax.jit
    def _sort_rle(canon):
        """Sorted unique values + counts of a hash array (device).

        Scan-only: run lengths come from a reversed cummin of run-end
        positions (segment_sum would be a scatter — ~30x slower on TPU).
        """
        s = jnp.sort(canon, stable=False)  # values only: 2.4x on TPU
        n = s.shape[0]
        start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
        last = jnp.concatenate([s[:-1] != s[1:], jnp.ones((1,), bool)])
        pos = jnp.arange(n, dtype=jnp.int32)  # n < 2^31: half-width scan
        # end position of each run, propagated backward to every element
        end_pos = running_min(
            jnp.where(last, pos, jnp.int32(n)), reverse=True)
        counts = jnp.where(start, end_pos - pos + 1, 0)
        keys = jnp.where(start, s, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        return keys, counts

    @staticmethod
    @jax.jit
    def _merge_pairs(keys, counts):
        """Merge (possibly duplicated-key) pairs into compacted
        (keys, totals) — device-only, scan-based.

        Per-key totals on the sorted array come from the cumsum
        differenced against a forward-filled previous-run-end cumsum
        (a running-max scan) — no segment scatter, no bulk
        searchsorted (which crashes this TPU at multi-M rows,
        BENCH_NOTES round 1), and NO host pull (shipping the
        uncompacted intermediate to host costs hundreds of seconds on
        a tunneled device)."""
        from .scan import running_max
        ks, cs = jax.lax.sort((keys, counts.astype(jnp.int64)),
                              num_keys=1, is_stable=False)
        csum = jnp.cumsum(cs)
        last = jnp.concatenate(
            [ks[:-1] != ks[1:], jnp.ones((1,), bool)])
        # cumsum at the previous run's last element, forward-filled
        # (csum is nondecreasing, so a running max fills correctly)
        ends = jnp.where(last, csum, jnp.int64(0))
        prev = running_max(
            jnp.concatenate([jnp.zeros((1,), jnp.int64), ends[:-1]]))
        totals = csum - prev
        keep = last & (ks != jnp.uint64(0xFFFFFFFFFFFFFFFF))
        outk = jnp.where(keep, ks, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        outc = jnp.where(keep, totals, jnp.int64(0))
        # compact: push non-lasts/sentinels to the end, key order kept
        outk, outc = jax.lax.sort((outk, outc), num_keys=1,
                                  is_stable=False)
        n_real = jnp.sum(keep)
        return outk, outc, n_real

    def add(self, canon, mask=None):
        canon = jnp.asarray(canon, jnp.uint64).reshape(-1)
        if mask is not None:
            mask = jnp.asarray(mask).reshape(-1)
            canon = jnp.where(mask, canon, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        self._hash_chunks.append(canon)
        self._pending += canon.shape[0]
        if self._pending >= self._reduce_every:
            self._reduce()

    @staticmethod
    @jax.jit
    def _split_singles(keys, counts):
        """Separate count-1 keys (pushed to the stash) from multi-count
        keys, each compacted by one sort."""
        single = counts == 1
        multi = (counts >= 2)
        sk = jnp.sort(jnp.where(single, keys,
                                jnp.uint64(0xFFFFFFFFFFFFFFFF)),
                      stable=False)
        mk, mc = jax.lax.sort(
            (jnp.where(multi, keys, jnp.uint64(0xFFFFFFFFFFFFFFFF)),
             jnp.where(multi, counts, 0)), num_keys=1, is_stable=False)
        return (sk, jnp.sum(single, dtype=jnp.int32),
                mk, mc, jnp.sum(multi, dtype=jnp.int32))

    def _fold(self, keys, counts):
        """Merge compacted (keys, counts) into the running table."""
        counts = counts.astype(jnp.int64)
        if self._merged is not None:
            k0, c0, _ = self._merged
            keys = _pad_pow2(jnp.concatenate([k0, keys]))
            counts = _pad_pow2(
                jnp.concatenate([c0.astype(jnp.int64), counts]), 0)
        keys, counts, n_real = self._merge_pairs(keys, counts)
        n = int(n_real)  # scalar D2H only
        m = min(1 << max(int(n - 1).bit_length(), 0), keys.shape[0])
        self._merged = (keys[:m],
                        jnp.minimum(counts[:m], COUNTER_MAX
                                    ).astype(jnp.int32), n)

    def _reduce(self, stash: bool = True):
        """Fold pending hash chunks into the running merged table —
        all on device, all at pow2-bucketed shapes.

        One `_merge_pairs` per reduce over concat(running, fresh RLE):
        the running table stays compacted (an LSM-free running merge),
        peak memory ~2x the final distinct set, and the program shapes
        are pow2 buckets so compiles amortize across reduces AND runs
        (a data-dependent shape costs a fresh multi-minute remote
        compile on this platform).  Only two scalar counts cross to
        host per reduce.

        Window singletons go to the side stash (stash=True) instead of
        the running merge."""
        if not self._hash_chunks:
            return
        parts = self._hash_chunks
        self._hash_chunks = []
        self._pending = 0
        allh = _pad_pow2(jnp.concatenate(parts)) if len(parts) > 1 \
            else _pad_pow2(parts[0])
        keys, counts = self._sort_rle(allh)
        del allh
        if stash:
            sk, n_s, keys, counts, _ = self._split_singles(keys, counts)
            ns = int(n_s)
            if ns:
                sb = 1 << max(int(ns - 1).bit_length(), 0)
                self._singles.append(sk[:min(sb, sk.shape[0])])
                self._n_singles += ns
        self._fold(keys, counts)

    def _fold_stash(self):
        """Resolve the singleton stash: sort+RLE it in bounded groups
        and merge each into the running table (a key stashed in two
        windows — true count 2 — sums across the merges; EXACT).
        Bounded groups keep the peak device footprint at the same
        level as a normal reduce (one giant concat OOM'd a 16 GB chip
        at genome scale)."""
        singles, self._singles, self._n_singles = self._singles, [], 0
        group: list = []
        size = 0
        for arr in singles + [None]:
            if arr is not None:
                group.append(arr)
                size += arr.shape[0]
            if (arr is None or size >= self._reduce_every) and group:
                allh = _pad_pow2(jnp.concatenate(group)) \
                    if len(group) > 1 else _pad_pow2(group[0])
                keys, counts = self._sort_rle(allh)
                del allh
                self._fold(keys, counts)
                group, size = [], 0

    def finalize(self) -> SortedKmerFilter:
        self._reduce()
        self._fold_stash()
        if self._merged is None:
            return SortedKmerFilter(
                kmers=jnp.zeros(0, jnp.uint64),
                counts=jnp.zeros(0, jnp.int32),
                k=self.k, threshold=self.threshold)
        keys, counts, n = self._merged
        self._merged = None
        # the one exact-shape slice per dataset (downstream phase
        # programs are per-N anyway)
        kmers = keys[:n]
        counts = counts[:n]
        from .sort_join import pack_table
        return SortedKmerFilter(
            kmers=kmers, counts=counts, packed=pack_table(kmers, counts),
            k=self.k, threshold=self.threshold)


def build_sorted_filter(batches, k: int, threshold: int = 2,
                        ) -> SortedKmerFilter:
    """Count all k-mers of [B, L] code batches into a SortedKmerFilter."""
    counter = SortedKmerCounter(k, threshold)
    for codes in batches:
        canon, valid = nthash.canonical_hashes(jnp.asarray(codes), k)
        counter.add(canon, valid)
    return counter.finalize()


jax.tree_util.register_dataclass(
    SortedKmerFilter, data_fields=["kmers", "counts", "packed"],
    meta_fields=["k", "threshold", "num_hashes"])
