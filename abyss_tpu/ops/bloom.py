"""Bloom filters as device-resident arrays with batched scatter updates.

The reference keeps two filters for Bloom-mode assembly
(/root/reference/BloomDBG/bloom-dbg.cc:359-369):

  * a **counting Bloom filter** over k-mers (8-bit counters,
    vendor/btl_bloomfilter/CountingBloomFilter.hpp) updated with a
    CAS *conservative* increment: an insert bumps only the counters
    currently equal to the minimum;
  * a plain **bit Bloom filter** of "assembled" (visited) k-mers
    (vendor/btl_bloomfilter/BloomFilter.hpp, lock-free atomic-OR).

TPU-native reformulation: both filters are jnp arrays in HBM and all
updates are batched scatters.  The conservative increment has a closed
form under batching — inserting the same key c times sequentially
yields `counter_i = max(counter_i, min_j(counter_j) + c)` — so a batch
insert is: sort the canonical hashes, run-length-encode duplicates,
gather the H counters per unique key, and `scatter_max` the saturated
target values.  This is order-invariant (deterministic regardless of
batch split) and strictly conservative like the reference's update.

Filter sizes are powers of two so indexing is a mask of the 64-bit
ntHash value instead of a modulo.  `contains` = min over the H counters
>= threshold, exactly like CountingBloomFilter.hpp:186-195.

The visited filter stores one byte per bit for now (scatter-or does not
exist as an XLA scatter combiner; a bit-packed Pallas kernel replaces
this on the perf path).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import nthash
from .scan import running_max

COUNTER_MAX = 255  # uint8 saturation, cf. CountingBloomFilter.hpp counter type


def _check_pow2(size: int) -> int:
    if size & (size - 1) or size <= 0:
        raise ValueError(f"filter size must be a power of two, got {size}")
    if size > (1 << 31):
        raise ValueError("filter size must fit int32 indexing (<= 2^31)")
    return size


@dataclass(frozen=True)
class CountingBloomFilter:
    """Counting Bloom filter state (a pytree; methods return new states).

    `counters` is the only array leaf; k/num_hashes/threshold are static
    metadata so the filter can cross jit boundaries.
    """

    counters: jax.Array  # uint8[size + 1]; last slot is the masked-write sink
    k: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_hashes: int = dataclasses.field(metadata=dict(static=True), default=4)
    threshold: int = dataclasses.field(metadata=dict(static=True), default=2)

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def size(self) -> int:
        return self.counters.shape[0] - 1

    @staticmethod
    def create(size: int, k: int, num_hashes: int = 4, threshold: int = 2,
               ) -> "CountingBloomFilter":
        _check_pow2(size)
        return CountingBloomFilter(
            counters=jnp.zeros(size + 1, jnp.uint8),
            k=k, num_hashes=num_hashes, threshold=threshold)

    def _indices(self, canon, mask=None):
        """[..., H] int32 counter indices; masked lanes -> sink slot."""
        hs = nthash.multi_hashes(canon, self.k, self.num_hashes)
        idx = (hs & jnp.uint64(self.size - 1)).astype(jnp.int32)
        if mask is not None:
            idx = jnp.where(mask[..., None], idx, jnp.int32(self.size))
        return idx

    @jax.jit
    def insert_counts(self, canon, counts, mask=None) -> "CountingBloomFilter":
        """Conservatively add `counts[j]` occurrences of each distinct k-mer.

        canon: [N] uint64 canonical hashes (must be unique within the batch
        for exact conservative semantics; duplicates still give a valid
        conservative underestimate). counts: [N] int. mask: [N] bool.
        """
        idx = self._indices(canon, mask)  # [N, H]
        cur = self.counters[idx].astype(jnp.int32)  # [N, H]
        lo = jnp.min(cur, axis=-1)  # [N]
        tgt = jnp.minimum(lo + jnp.asarray(counts, jnp.int32), COUNTER_MAX)
        tgt = jnp.broadcast_to(tgt[..., None], idx.shape)
        new = self.counters.at[idx.reshape(-1)].max(
            tgt.reshape(-1).astype(jnp.uint8), mode="drop")
        new = new.at[self.size].set(0)
        return self._replace(counters=new)

    @jax.jit
    def insert(self, canon, mask=None) -> "CountingBloomFilter":
        """Insert a batch of k-mer hashes (duplicates allowed).

        Sorts + run-length-encodes the batch so duplicate k-mers within
        the batch accumulate their full multiplicity, then applies one
        conservative batched update.  Deterministic and batch-order
        invariant.
        """
        canon = jnp.asarray(canon, jnp.uint64).reshape(-1)
        if mask is not None:
            mask = jnp.asarray(mask).reshape(-1)
            # send masked lanes to a sentinel that sorts last
            canon = jnp.where(mask, canon, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        s = jnp.sort(canon)
        # run starts
        start = jnp.concatenate(
            [jnp.ones((1,), bool), s[1:] != s[:-1]])
        # count of each run at its start position: next start index - mine
        pos = jnp.arange(s.shape[0])
        start_pos = jnp.where(start, pos, -1)
        # for each position, index of run start (cummax)
        run_start = running_max(start_pos)
        # run length for starts = (next_start or N) - start
        # compute via segment trick: count elements per run start
        ones = jnp.ones_like(pos)
        run_len = jax.ops.segment_sum(
            ones, run_start, num_segments=s.shape[0])
        valid = start
        if mask is not None:
            valid = valid & (s != jnp.uint64(0xFFFFFFFFFFFFFFFF))
        return self.insert_counts(s, run_len, mask=valid)

    @jax.jit
    def count(self, canon, mask=None):
        """Min-count per k-mer ([...] int32); masked lanes -> 0."""
        idx = self._indices(canon)
        c = jnp.min(self.counters[idx].astype(jnp.int32), axis=-1)
        if mask is not None:
            c = jnp.where(mask, c, 0)
        return c

    def contains(self, canon, mask=None):
        return self.count(canon, mask) >= self.threshold

    # bulk aliases (API parity with SortedKmerFilter; the Bloom filter's
    # bulk path is the same gather)
    count_bulk = count
    contains_bulk = contains

    @property
    def popcount_bytes(self) -> int:
        return int(self.counters.shape[0] - 1)


@dataclass(frozen=True)
class BitBloomFilter:
    """Plain Bloom filter (visited/assembled k-mer set).

    Byte-per-bit storage updated with scatter-max; replaces the
    reference's lock-free atomic-OR bit array
    (vendor/btl_bloomfilter/BloomFilter.hpp:168-208).
    """

    bits: jax.Array  # uint8[size + 1]
    k: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_hashes: int = dataclasses.field(metadata=dict(static=True), default=4)

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def size(self) -> int:
        return self.bits.shape[0] - 1

    @staticmethod
    def create(size: int, k: int, num_hashes: int = 4) -> "BitBloomFilter":
        _check_pow2(size)
        return BitBloomFilter(bits=jnp.zeros(size + 1, jnp.uint8),
                              k=k, num_hashes=num_hashes)

    def _indices(self, canon, mask=None):
        hs = nthash.multi_hashes(canon, self.k, self.num_hashes)
        idx = (hs & jnp.uint64(self.size - 1)).astype(jnp.int32)
        if mask is not None:
            idx = jnp.where(mask[..., None], idx, jnp.int32(self.size))
        return idx

    @jax.jit
    def insert(self, canon, mask=None) -> "BitBloomFilter":
        idx = self._indices(canon, mask).reshape(-1)
        new = self.bits.at[idx].max(jnp.uint8(1), mode="drop")
        new = new.at[self.size].set(0)
        return self._replace(bits=new)

    def contains(self, canon, mask=None):
        idx = self._indices(canon)
        hit = jnp.min(self.bits[idx], axis=-1) > 0
        if mask is not None:
            hit = jnp.where(mask, hit, False)
        return hit


    def insert_window(self, canon, start: int, end: int,
                      mask=None) -> "BitBloomFilter":
        """Set only bits in [start, end) — the windowed shard build of
        Bloom/BloomFilterWindow.h / bin/abyss-bloom-dist.mk: each shard
        owns a window of the full bit array; union() merges shards."""
        idx = self._indices(canon, mask).reshape(-1)
        inwin = (idx >= start) & (idx < end)
        idx = jnp.where(inwin, idx, jnp.int32(self.size))
        new = self.bits.at[idx].max(jnp.uint8(1), mode="drop")
        new = new.at[self.size].set(0)
        return self._replace(bits=new)

    def union(self, other: "BitBloomFilter") -> "BitBloomFilter":
        """Bitwise OR merge (abyss-bloom union, Bloom/bloom.cc)."""
        return self._replace(bits=jnp.maximum(self.bits, other.bits))

    def intersect(self, other: "BitBloomFilter") -> "BitBloomFilter":
        return self._replace(bits=jnp.minimum(self.bits, other.bits))

    @property
    def popcount(self) -> int:
        return int(jnp.sum(self.bits[:-1] > 0))


def union(a, b):
    """Merge two filters of the same type/geometry (abyss-bloom union).
    For counting filters the conservative merge is elementwise add
    (saturating); for bit filters it is OR."""
    if isinstance(a, CountingBloomFilter):
        s = jnp.minimum(a.counters.astype(jnp.int32) +
                        b.counters.astype(jnp.int32), COUNTER_MAX)
        return a._replace(counters=s.astype(jnp.uint8))
    return a.union(b)


def intersect(a, b):
    if isinstance(a, CountingBloomFilter):
        return a._replace(counters=jnp.minimum(a.counters, b.counters))
    return a.intersect(b)


def save_filter(path: str, f) -> None:
    """Serialize a filter to .npz (the analogue of the reference's
    binary Bloom file format, Bloom/BloomFilter.h write/read)."""
    if isinstance(f, CountingBloomFilter):
        np.savez_compressed(
            path, kind="counting", data=np.asarray(f.counters),
            k=f.k, num_hashes=f.num_hashes, threshold=f.threshold)
    elif isinstance(f, BitBloomFilter):
        np.savez_compressed(path, kind="bit", data=np.asarray(f.bits),
                            k=f.k, num_hashes=f.num_hashes)
    else:
        raise TypeError(type(f))


def load_filter(path: str):
    z = np.load(path, allow_pickle=False)
    kind = str(z["kind"])
    if kind == "counting":
        return CountingBloomFilter(
            counters=jnp.asarray(z["data"]), k=int(z["k"]),
            num_hashes=int(z["num_hashes"]), threshold=int(z["threshold"]))
    if kind == "bit":
        return BitBloomFilter(bits=jnp.asarray(z["data"]), k=int(z["k"]),
                              num_hashes=int(z["num_hashes"]))
    raise ValueError(f"unknown filter kind {kind!r} in {path}")


def recommended_sizes(budget_bytes: int) -> tuple[int, int]:
    """Split a memory budget like the reference: 8/9 counting, 1/9 visited
    (bloom-dbg.cc:359-369), rounded down to powers of two."""
    counting = int(budget_bytes * 8 / 9)
    visited = int(budget_bytes / 9)

    def pow2_floor(x):
        return 1 << (max(x, 2).bit_length() - 1)

    return pow2_floor(counting), pow2_floor(visited)


jax.tree_util.register_dataclass(
    CountingBloomFilter, data_fields=["counters"],
    meta_fields=["k", "num_hashes", "threshold"])
jax.tree_util.register_dataclass(
    BitBloomFilter, data_fields=["bits"], meta_fields=["k", "num_hashes"])
