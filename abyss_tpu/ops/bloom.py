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
COUNTER_MAX = 255  # uint8 saturation, cf. CountingBloomFilter.hpp counter type


# np (not jnp): a module-level jnp constant would initialize the JAX
# backend at import time, which breaks dryrun_multichip's CPU override.
_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _sorted_run_lengths(canon, mask=None):
    """Sort + run-length-encode a hash batch (device, scan-only — a
    segment_sum would be a scatter, ~30x slower on TPU).

    Returns (sorted values, run length at each run start, start mask);
    masked lanes go to a sentinel excluded from the start mask.
    """
    from .scan import running_min
    canon = jnp.asarray(canon, jnp.uint64).reshape(-1)
    if mask is not None:
        canon = jnp.where(jnp.asarray(mask).reshape(-1), canon, _SENTINEL)
    s = jnp.sort(canon, stable=False)
    n = s.shape[0]
    start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    last = jnp.concatenate([s[:-1] != s[1:], jnp.ones((1,), bool)])
    pos = jnp.arange(n, dtype=jnp.int32)
    end_pos = running_min(jnp.where(last, pos, jnp.int32(n)), reverse=True)
    counts = jnp.where(start, end_pos - pos + 1, 0)
    valid = start
    if mask is not None:
        valid = valid & (s != _SENTINEL)
    return s, counts, valid


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
    # "scatter": XLA gather + scatter-max (memory-lean, scatter-bound);
    # "sort": the merge reformulation (ops/sort_join.dense_gather_u8 /
    # dense_scatter_max_u8) — 4 sorts of (size + Q) per batch, batch-
    # amortized; "pallas": binned compare-broadcast kernels
    # (ops/pallas_scatter.py) — sorted update stream + per-tile VPU
    # dense max, no scatter at any level (BENCH_NOTES.md has rates)
    update_mode: str = dataclasses.field(metadata=dict(static=True),
                                         default="scatter")

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
        update_mode = self.update_mode
        if update_mode == "pallas":
            # the binned kernel tiles SUPER=64K counters at a time;
            # smaller filters fall back to the XLA scatter (mirrors the
            # sok-size fallback rather than failing at trace time)
            from .pallas_scatter import SUPER
            if self.size < SUPER:
                update_mode = "scatter"
        if update_mode == "pallas":
            # XLA gather (measured fastest for the read side) + the
            # Pallas binned scatter for the write side
            from .pallas_scatter import scatter_max_u8_pallas
            flat = idx.reshape(-1)
            cur = self.counters[flat].astype(jnp.int32).reshape(
                idx.shape)
            lo = jnp.min(cur, axis=-1)
            tgt = jnp.minimum(lo + jnp.asarray(counts, jnp.int32),
                              COUNTER_MAX)
            tgt = jnp.broadcast_to(tgt[..., None], idx.shape)
            tgt8 = tgt.reshape(-1).astype(jnp.uint8)
            new, sok = scatter_max_u8_pallas(self.counters, flat, tgt8)
            # capacity overflow cannot happen for hash-uniform indices;
            # fall back to the exact XLA scatter if it ever does
            new = jax.lax.cond(
                sok, lambda _: new,
                lambda _: self.counters.at[flat].max(tgt8, mode="drop"),
                None)
        elif update_mode == "sort":
            from .sort_join import dense_gather_u8, dense_scatter_max_u8
            flat = idx.reshape(-1)
            cur = dense_gather_u8(self.counters, flat).reshape(
                idx.shape).astype(jnp.int32)
            lo = jnp.min(cur, axis=-1)
            tgt = jnp.minimum(lo + jnp.asarray(counts, jnp.int32),
                              COUNTER_MAX)
            tgt = jnp.broadcast_to(tgt[..., None], idx.shape)
            new = dense_scatter_max_u8(self.counters, flat,
                                       tgt.reshape(-1).astype(jnp.uint8))
        else:
            cur = self.counters[idx].astype(jnp.int32)  # [N, H]
            lo = jnp.min(cur, axis=-1)  # [N]
            tgt = jnp.minimum(lo + jnp.asarray(counts, jnp.int32),
                              COUNTER_MAX)
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
        s, run_len, valid = _sorted_run_lengths(canon, mask)
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


@dataclass(frozen=True)
class CascadingBloomFilter:
    """Cascade of L bit Bloom filters (Konnector-era counting-by-cascade:
    Bloom/CascadingBloomFilter.h; RResolver's hash-supplied variant
    Bloom/HashAgnosticCascadingBloom.h).

    Reference semantics: one insert promotes a key by exactly one level
    (bits are set in the first level that does not yet contain it);
    `contains` answers against the deepest level, i.e. "seen >= L
    times".  All levels share the same H hash values per key, like the
    reference (HashAgnosticCascadingBloom.h inserts one hash array into
    each level).

    TPU-native batched reformulation (order-invariant): the batch is
    sorted + run-length-encoded, so a key with multiplicity c currently
    at level l ends at min(L, l + c) — identical to c sequential
    reference inserts, regardless of batch boundaries.
    """

    levels: jax.Array  # uint8[L, size + 1]; last slot is the masked sink
    k: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_hashes: int = dataclasses.field(metadata=dict(static=True), default=4)

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def size(self) -> int:
        return self.levels.shape[1] - 1

    @property
    def depth(self) -> int:
        return self.levels.shape[0]

    @property
    def threshold(self) -> int:  # API parity with CountingBloomFilter
        return self.depth

    @staticmethod
    def create(size: int, k: int, num_hashes: int = 4, depth: int = 2,
               ) -> "CascadingBloomFilter":
        _check_pow2(size)
        return CascadingBloomFilter(
            levels=jnp.zeros((depth, size + 1), jnp.uint8),
            k=k, num_hashes=num_hashes)

    def _indices(self, canon, mask=None):
        hs = nthash.multi_hashes(canon, self.k, self.num_hashes)
        idx = (hs & jnp.uint64(self.size - 1)).astype(jnp.int32)
        if mask is not None:
            idx = jnp.where(mask[..., None], idx, jnp.int32(self.size))
        return idx

    def _level_of(self, idx):
        """Current level per key = # of consecutive containing levels
        from the bottom (matches the reference's insert walk, including
        its behaviour under false-positive lower levels)."""
        bits = self.levels[:, idx.reshape(-1)]          # [L, N*H]
        bits = bits.reshape((self.depth,) + idx.shape)  # [L, ..., H]
        present = jnp.min(bits, axis=-1) > 0            # [L, ...]
        return jnp.sum(jnp.cumprod(present.astype(jnp.int32), axis=0), axis=0)

    @jax.jit
    def insert(self, canon, mask=None) -> "CascadingBloomFilter":
        """Insert a batch (duplicates allowed); each occurrence promotes
        its key one level, saturating at the cascade depth."""
        s, run_len, valid = _sorted_run_lengths(canon, mask)
        idx = self._indices(s, valid)            # [N, H]
        new_level = jnp.minimum(
            self._level_of(idx) + run_len, self.depth)  # [N]
        levels = self.levels
        for i in range(self.depth):
            hit = jnp.broadcast_to((new_level >= i + 1)[..., None], idx.shape)
            li = jnp.where(hit, idx, jnp.int32(self.size)).reshape(-1)
            levels = levels.at[i, li].max(jnp.uint8(1), mode="drop")
        levels = levels.at[:, self.size].set(0)
        return self._replace(levels=levels)

    def insert_window(self, canon, start: int, end: int,
                      mask=None) -> "CascadingBloomFilter":
        """Windowed shard build (Bloom/CascadingBloomFilterWindow.h /
        abyss-bloom-dist.mk): process only keys whose hash index falls
        in [start, end).

        Requires num_hashes == 1: the reference cascade addresses ONE
        bit per key per level (`Bloom::hash(key) % size`,
        Bloom/CascadingBloomFilter.h:87-90), so each key's whole
        cascade state lives in exactly one window — which is what makes
        shard builds bit-exact under OR `union`.  With H > 1 a key's
        bits would span windows and promotion would stall.
        """
        if self.num_hashes != 1:
            raise ValueError(
                "windowed cascading builds require num_hashes=1 (the "
                "reference's single-index cascade)")
        from . import nthash
        canon = jnp.asarray(canon, jnp.uint64)
        hs = nthash.multi_hashes(canon, self.k, 1)[..., 0]
        idx = (hs & jnp.uint64(self.size - 1)).astype(jnp.int32)
        own = (idx >= start) & (idx < end)
        if mask is not None:
            own = own & jnp.asarray(mask)
        return self.insert(canon, own)

    @jax.jit
    def count(self, canon, mask=None):
        """Level per key ([...] int32) — a count saturating at depth."""
        canon = jnp.asarray(canon, jnp.uint64)
        c = self._level_of(self._indices(canon))
        if mask is not None:
            c = jnp.where(mask, c, 0)
        return c

    def contains(self, canon, mask=None):
        """Present in the deepest level (seen >= depth times), like
        CascadingBloomFilter.h's contains-at-top."""
        return self.count(canon, mask) >= self.depth

    count_bulk = count
    contains_bulk = contains


def union(a, b):
    """Merge two filters of the same type/geometry (abyss-bloom union).
    For counting filters the conservative merge is elementwise add
    (saturating); for bit filters it is OR."""
    if isinstance(a, CountingBloomFilter):
        s = jnp.minimum(a.counters.astype(jnp.int32) +
                        b.counters.astype(jnp.int32), COUNTER_MAX)
        return a._replace(counters=s.astype(jnp.uint8))
    if isinstance(a, CascadingBloomFilter):
        # Level-wise OR — exact for WINDOW-sharded builds (each shard
        # saw all reads, insert_window: disjoint index ownership).  For
        # filters built from disjoint READ sets this undercounts: a key
        # seen once on each of two shards ORs to level 1, not 2 — split
        # multiplicity across shards needs the counting filter's
        # additive union instead.
        return a._replace(levels=jnp.maximum(a.levels, b.levels))
    return a.union(b)


def intersect(a, b):
    if isinstance(a, CountingBloomFilter):
        return a._replace(counters=jnp.minimum(a.counters, b.counters))
    if isinstance(a, CascadingBloomFilter):
        return a._replace(levels=jnp.minimum(a.levels, b.levels))
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
    elif isinstance(f, CascadingBloomFilter):
        np.savez_compressed(path, kind="cascading",
                            data=np.asarray(f.levels),
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
    if kind == "cascading":
        return CascadingBloomFilter(levels=jnp.asarray(z["data"]),
                                    k=int(z["k"]),
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
    meta_fields=["k", "num_hashes", "threshold", "update_mode"])
jax.tree_util.register_dataclass(
    BitBloomFilter, data_fields=["bits"], meta_fields=["k", "num_hashes"])
jax.tree_util.register_dataclass(
    CascadingBloomFilter, data_fields=["levels"],
    meta_fields=["k", "num_hashes"])
