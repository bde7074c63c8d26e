"""Bulk k-mer count lookup as a sort-merge join (gather-free).

Measured on TPU v5e: device sorts run at ~600M keys/s while random
HBM gathers manage only ~50M/s (and XLA scatters similarly) — so
binary-searching a big table per query (searchsorted) is 100-300x
slower than sorting.  The TPU-native bulk probe is therefore a JOIN:

  1. concatenate (table keys, query keys) with a flag that sorts table
     rows before equal query keys, carrying counts and query indices;
  2. one `lax.sort` groups equal keys;
  3. a segmented associative scan copies each table row's count forward
     across its run of equal query keys (no gathers);
  4. a second sort by original query index restores query order.

Everything is sort/scan, i.e. bandwidth-bound.  Used by the bulk
classification and adjacency paths; point queries still use
searchsorted (fine for small batches / CPU).

All sorts here run `is_stable=False`: every key is either globally
unique (query words carry their original index) or tied only with
bit-identical words, so stability buys nothing — and XLA's stable sort
pays for an implicit iota tie-breaker (measured on TPU v5e at 3.7M
elements: u64 5.85→4.38 ms, u32 13.9→3.3 ms going unstable).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .scan import running_max


@jax.jit
def join_counts(table_keys, table_counts, queries):
    """Counts for each query key (0 when absent from the table).

    table_keys: uint64[M] sorted unique; table_counts: int32[M];
    queries: uint64[N] (any order, duplicates fine).
    Returns int32[N] aligned with `queries`.

    Cost: one single-key 2-operand sort of M+N (group equal hashes,
    table row leading) + scans + one single-operand u64 sort (restore
    query order).  The table/query flag rides in the key's low bit —
    two distinct 64-bit ntHash values colliding after dropping bit 0
    has probability ~ MN/2^63 per batch, far below the engine's other
    probabilistic bounds.
    """
    M = table_keys.shape[0]
    N = queries.shape[0]
    if M == 0:
        return jnp.zeros(N, jnp.int32)
    one = jnp.uint64(1)
    keys = jnp.concatenate([
        jnp.asarray(table_keys, jnp.uint64) & ~one,     # flag 0: table
        jnp.asarray(queries, jnp.uint64) | one])        # flag 1: query
    # payload: (original index+1) << 32 | count+1; queries carry count 0
    payload = jnp.concatenate([
        jnp.asarray(table_counts, jnp.int32).astype(jnp.int64) + 1,
        (jnp.arange(N, dtype=jnp.int64) + 1) << jnp.int64(32)])
    sk, sp = jax.lax.sort((keys, payload), num_keys=1, is_stable=False)

    # group id = the hash sans flag bit; nondecreasing after the sort, so
    # a running max over (segment_id << 32 | count+1) leaves every element
    # holding its own segment's table count — no gathers, one scan.
    group = sk >> one
    start = jnp.concatenate([jnp.ones((1,), bool), group[1:] != group[:-1]])
    seg = jnp.cumsum(start.astype(jnp.int64))
    enc = (seg << jnp.int64(32)) | (sp & jnp.int64(0xFFFFFFFF))
    run = running_max(enc)
    counts_sorted = jnp.maximum(
        (run & jnp.int64(0xFFFFFFFF)).astype(jnp.int32) - 1, 0)

    # restore query order with ONE u64 sort of (idx+1) << 32 | count:
    # table rows have idx payload 0 and sort first; queries follow in
    # original order.
    back = (sp & (jnp.int64(0xFFFFFFFF) << jnp.int64(32))).astype(
        jnp.uint64) | counts_sorted.astype(jnp.uint64)
    sb = jax.lax.sort(back, is_stable=False)
    return (sb[M:] & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)


def join_contains(table_keys, table_counts, queries, threshold: int):
    return join_counts(table_keys, table_counts, queries) >= threshold


# --------------------------------------------------------------------------
# Packed probe: everything in ONE u64 word per element, so the join is
# two single-operand u64 sorts + one scan — no multi-operand comparator
# sorts at all.  Layout: [63:24] 40-bit hash prefix | [23] query flag |
# table rows: [14:0] count; query rows: [22:0] original index.
#
# Truncating ntHash to its top 40 bits makes this probabilistic:
# expected false joins per batch = M*N/2^40 (~1e-6 per query at M=N=1M),
# i.e. ~50,000x below the reference's counting-Bloom FPR target of 5%
# (README.md Bloom-mode sizing).  Colliding table prefixes resolve to
# the max count (conservative, like the Bloom filter's union bound).

PREFIX_SHIFT = 24
# np (not jnp): module-level jnp constants would initialize the JAX
# backend at import time (breaks dryrun_multichip's CPU override).
FLAG_BIT = np.uint64(1 << 23)
IDX_MASK = np.uint64((1 << 23) - 1)
COUNT_MASK = np.uint64((1 << 15) - 1)


def pack_table(table_keys, table_counts):
    """Pre-pack a sorted table for `join_counts_packed` (do this once
    per filter; the result is sorted because the prefix order follows
    the full-hash order)."""
    k = jnp.asarray(table_keys, jnp.uint64)
    c = jnp.minimum(jnp.asarray(table_counts, jnp.int32), 0x7FFF)
    return (k >> jnp.uint64(PREFIX_SHIFT) << jnp.uint64(PREFIX_SHIFT)) \
        | c.astype(jnp.uint64)


def pack_queries(queries):
    """Pack query hashes as (prefix | flag | original index) words."""
    q = jnp.asarray(queries, jnp.uint64)
    N = q.shape[0]
    return (q >> jnp.uint64(PREFIX_SHIFT) << jnp.uint64(PREFIX_SHIFT)) \
        | FLAG_BIT | jnp.arange(N, dtype=jnp.uint64)


def _merge_pass(x, s: int):
    """One stage of Batcher's bitonic merger at stride s; returns the
    exchanged array and the swap mask (needed to invert the routing)."""
    v = x.reshape(-1, 2, s)
    a, b = v[:, 0], v[:, 1]
    m = a > b
    lo = jnp.where(m, b, a)
    hi = jnp.where(m, a, b)
    return jnp.stack([lo, hi], 1).reshape(x.shape), m


def _unmerge_pass(c, m, s: int):
    """Invert one `_merge_pass` on a payload array using its swap mask."""
    v = c.reshape(-1, 2, s)
    a, b = v[:, 0], v[:, 1]
    return jnp.stack([jnp.where(m, b, a), jnp.where(m, a, b)],
                     1).reshape(c.shape)


@jax.jit
def join_counts_merge(packed_table, queries):
    """Counts per query via a log-depth bitonic MERGE of the pre-sorted
    packed table — not a full (M+N) re-sort.

    MEASURED SLOWER than `join_counts_packed` on TPU v5e (12.5M vs
    67.5M queries/s at M=N=1.25M, BENCH_NOTES.md): each hand-rolled
    compare-exchange pass is a full HBM round trip at stride-hostile
    layouts, while XLA's `lax.sort` fuses many network stages per HBM
    pass inside VMEM.  Kept as the reference formulation of the
    merge-with-inverse-routing idea (and for backends where sort is
    comparator-bound): the table side is already sorted, so grouping
    only needs Batcher's single bitonic merge (log2(P) passes) whose
    recorded swap masks are replayed in reverse to route counts back
    without a second full-width sort.

    queries: uint64[N], N < 2^23.  Returns int32[N] in query order.
    """
    M = packed_table.shape[0]
    N = queries.shape[0]
    if M == 0:
        return jnp.zeros(N, jnp.int32)
    sq = jax.lax.sort(pack_queries(queries), is_stable=False)

    P = 1 << max(M + N - 1, 1).bit_length()
    pad = jnp.full(P - M - N, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    # ascending table, MAX pads, descending queries: bitonic
    x = jnp.concatenate([packed_table, pad, sq[::-1]])
    masks = []
    s = P // 2
    while s >= 1:
        x, m = _merge_pass(x, s)
        masks.append(m)
        s //= 2

    prefix = x >> jnp.uint64(PREFIX_SHIFT)
    is_query = (x & FLAG_BIT) != 0
    enc = (prefix << jnp.uint64(16)) | jnp.where(
        is_query, jnp.uint64(0), x & COUNT_MASK)
    run = running_max(enc)
    count = jnp.where(run >> jnp.uint64(16) == prefix,
                      run & jnp.uint64(0xFFFF), jnp.uint64(0))
    count = count.astype(jnp.uint32)

    s = 1
    for m in reversed(masks):
        count = _unmerge_pass(count, m, s)
        s *= 2
    cq = count[P - N:][::-1]    # aligned with sq

    # restore original query order: one N-word sort keyed by index
    back = ((sq & IDX_MASK) << jnp.uint64(16)) | cq.astype(jnp.uint64)
    sb = jax.lax.sort(back, is_stable=False)
    return (sb & jnp.uint64(0xFFFF)).astype(jnp.int32)


@partial(jax.jit, static_argnums=2)
def join_solid_packed(packed_table, queries, threshold: int):
    """`join_counts_packed(...) >= threshold` with a cheaper finish:
    the order-restoring sort carries (index << 1 | solid-bit) u32
    words instead of u64 (index | count) — measured +8% on the whole
    probe at 16K reads, more at larger batches (BENCH_NOTES.md).
    Returns bool[N] in query order."""
    M = packed_table.shape[0]
    N = queries.shape[0]
    if M == 0:
        return jnp.zeros(N, bool)
    sk = jax.lax.sort(jnp.concatenate([packed_table, pack_queries(queries)]), is_stable=False)
    prefix = sk >> jnp.uint64(PREFIX_SHIFT)
    is_query = (sk & FLAG_BIT) != 0
    enc = (prefix << jnp.uint64(16)) | jnp.where(
        is_query, jnp.uint64(0), sk & COUNT_MASK)
    run = running_max(enc)
    bit = ((run >> jnp.uint64(16) == prefix) &
           ((run & jnp.uint64(0xFFFF)) >= threshold)).astype(jnp.uint32)
    back = jnp.where(is_query,
                     ((sk & IDX_MASK) << jnp.uint64(1)).astype(jnp.uint32)
                     | bit,
                     jnp.uint32(0xFFFFFFFF))
    sb = jax.lax.sort(back, is_stable=False)
    return (sb[:N] & jnp.uint32(1)).astype(bool)


@partial(jax.jit, static_argnums=2)
def join_solid_merge(packed_table, queries, threshold: int):
    """`join_counts_merge(...) >= threshold`, but the order-restoring
    sort carries only (index << 1 | solid-bit) u32 words — ~2x less
    comparator/bandwidth work than the u64 count-carrying unsort.
    Returns bool[N] in query order.  Same measured caveat as
    `join_counts_merge`: on TPU the packed sort probe wins."""
    M = packed_table.shape[0]
    N = queries.shape[0]
    if M == 0:
        return jnp.zeros(N, bool)
    sq = jax.lax.sort(pack_queries(queries), is_stable=False)

    P = 1 << max(M + N - 1, 1).bit_length()
    pad = jnp.full(P - M - N, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    x = jnp.concatenate([packed_table, pad, sq[::-1]])
    masks = []
    s = P // 2
    while s >= 1:
        x, m = _merge_pass(x, s)
        masks.append(m)
        s //= 2

    prefix = x >> jnp.uint64(PREFIX_SHIFT)
    is_query = (x & FLAG_BIT) != 0
    enc = (prefix << jnp.uint64(16)) | jnp.where(
        is_query, jnp.uint64(0), x & COUNT_MASK)
    run = running_max(enc)
    bit = ((run >> jnp.uint64(16) == prefix) &
           ((run & jnp.uint64(0xFFFF)) >= threshold)).astype(jnp.uint32)

    s = 1
    for m in reversed(masks):
        bit = _unmerge_pass(bit, m, s)
        s *= 2
    bq = bit[P - N:][::-1]

    back = ((sq & IDX_MASK) << jnp.uint64(1)).astype(jnp.uint32) | bq
    sb = jax.lax.sort(back, is_stable=False)
    return (sb & jnp.uint32(1)).astype(bool)


@jax.jit
def join_counts_packed(packed_table, queries):
    """Counts for each query against a `pack_table` result.

    queries: uint64[N], N < 2^23.  Returns int32[N] in query order.
    """
    N = queries.shape[0]
    q = jnp.asarray(queries, jnp.uint64)
    qp = (q >> jnp.uint64(PREFIX_SHIFT) << jnp.uint64(PREFIX_SHIFT)) \
        | FLAG_BIT | jnp.arange(N, dtype=jnp.uint64)
    sk = jax.lax.sort(jnp.concatenate([packed_table, qp]), is_stable=False)

    prefix = sk >> jnp.uint64(PREFIX_SHIFT)
    is_query = (sk & FLAG_BIT) != 0
    enc = (prefix << jnp.uint64(16)) | jnp.where(
        is_query, jnp.uint64(0), sk & COUNT_MASK)
    run = running_max(enc)
    # the running max belongs to this element's prefix group by
    # monotonicity; its low 16 bits are the group's table count (0 if
    # the group has no table row)
    count = jnp.where(run >> jnp.uint64(16) == prefix,
                      run & jnp.uint64(0xFFFF), jnp.uint64(0))

    back = jnp.where(is_query,
                     ((sk & IDX_MASK) << jnp.uint64(16)) | count,
                     jnp.uint64(0xFFFFFFFFFFFFFFFF))
    sb = jax.lax.sort(back, is_stable=False)
    return (sb[:N] & jnp.uint64(0xFFFF)).astype(jnp.int32)


@jax.jit
def join_rows(table_keys, queries):
    """Row index in sorted-unique `table_keys` for each query key
    (-1 when absent) — the gather-free replacement for a bulk
    `searchsorted` membership probe (adjacency builds probe 8 neighbour
    candidates per stored k-mer, AdjacencyAlgorithm.h:9-46; at millions
    of rows the binary search is ~23 full-array gather passes and
    crashes/stalls the TPU, while this is two sorts + two scans).

    Exact on the FULL 64-bit key (no prefix truncation, no flag-bit
    stealing — packed k-mer keys may legitimately differ only in bit
    0): equal-key grouping uses an unstable single-key sort, and the
    unique table row of each group is propagated to its queries with a
    forward AND a backward running max, so the tie order between the
    table row and its queries never matters.

    table_keys: uint64[M] sorted unique; queries: uint64[N] any order.
    Returns int32[N] aligned with `queries`.
    """
    M = table_keys.shape[0]
    N = queries.shape[0]
    if M == 0:
        return jnp.full(N, -1, jnp.int32)
    keys = jnp.concatenate([jnp.asarray(table_keys, jnp.uint64),
                            jnp.asarray(queries, jnp.uint64)])
    # payload: table rows carry (0 | row+1); queries carry (qpos+1) << 32
    payload = jnp.concatenate([
        jnp.arange(1, M + 1, dtype=jnp.int64),
        (jnp.arange(N, dtype=jnp.int64) + 1) << jnp.int64(32)])
    sk, sp = jax.lax.sort((keys, payload), num_keys=1, is_stable=False)

    start = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    seg = jnp.cumsum(start.astype(jnp.int64))
    enc = (seg << jnp.int64(32)) | (sp & jnp.int64(0xFFFFFFFF))
    fwd = running_max(enc)
    bwd = running_max(
        (-seg << jnp.int64(32)) | (sp & jnp.int64(0xFFFFFFFF)),
        reverse=True)
    row1 = jnp.maximum(
        jnp.where(fwd >> jnp.int64(32) == seg,
                  fwd & jnp.int64(0xFFFFFFFF), 0),
        jnp.where((bwd >> jnp.int64(32)) == -seg,
                  bwd & jnp.int64(0xFFFFFFFF), 0))

    back = (sp & (jnp.int64(0xFFFFFFFF) << jnp.int64(32))).astype(
        jnp.uint64) | row1.astype(jnp.uint64)
    sb = jax.lax.sort(back, is_stable=False)
    return ((sb[M:] & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32) - 1)


# --------------------------------------------------------------------------
# dense-array gather / scatter-max by sorting (counting-Bloom hot path)
#
# Random gathers run ~50M elts/s and XLA scatters ~20M elts/s on this
# chip (BENCH_NOTES.md), while u64 sorts run at hundreds of M keys/s.
# Both dense-array accesses therefore reformulate as a MERGE: sort the
# update/query stream together with one marker per dense slot, answer
# with a forward-fill (running max of slot-tagged payloads), and
# restore order with a second sort.  Cost: 2 sorts of (M + Q) each —
# batch-size amortized, no serialization
# (vendor/btl_bloomfilter/CountingBloomFilter.hpp:118-196's CAS loop
# reformulated for a machine where sorts beat atomics).


def dense_gather_u8(dense, idx):
    """values[q] = dense[idx[q]] without a gather.

    dense: uint8[M] (M < 2^31), idx: int32[Q] (Q < 2^32) -> uint8[Q].
    """
    dense = jnp.asarray(dense, jnp.uint8)
    idx = jnp.asarray(idx)
    M = dense.shape[0]
    Q = idx.shape[0]
    slot_m = jnp.arange(M, dtype=jnp.uint64)
    # markers (flag 0) sort before queries (flag 1) within a slot
    k_m = (slot_m << jnp.uint64(33)) | dense.astype(jnp.uint64)
    k_q = (idx.astype(jnp.uint64) << jnp.uint64(33)) | \
        (jnp.uint64(1) << jnp.uint64(32)) | \
        jnp.arange(Q, dtype=jnp.uint64)
    s = jnp.sort(jnp.concatenate([k_m, k_q]), stable=False)
    slot = s >> jnp.uint64(33)
    is_q = ((s >> jnp.uint64(32)) & jnp.uint64(1)) != 0
    enc = jnp.where(~is_q, (slot << jnp.uint64(8)) |
                    (s & jnp.uint64(0xFF)), jnp.uint64(0))
    run = running_max(enc)
    val = jnp.where((run >> jnp.uint64(8)) == slot,
                    run & jnp.uint64(0xFF), jnp.uint64(0))
    # order-restoring sort: queries keyed by original position
    back = jnp.where(is_q, ((s & jnp.uint64(0xFFFFFFFF))
                            << jnp.uint64(8)) | val,
                     jnp.uint64(0xFFFFFFFFFFFFFFFF))
    out = jnp.sort(back, stable=False)[:Q]
    return (out & jnp.uint64(0xFF)).astype(jnp.uint8)


def dense_scatter_max_u8(dense, idx, vals):
    """dense[idx[q]] = max(dense[idx[q]], vals[q]) without a scatter.

    dense: uint8[M], idx: int32[Q], vals: uint8[Q] -> new uint8[M].
    """
    dense = jnp.asarray(dense, jnp.uint8)
    idx = jnp.asarray(idx)
    vals = jnp.asarray(vals, jnp.uint8)
    M = dense.shape[0]
    slot_m = jnp.arange(M, dtype=jnp.uint64)
    # updates (flag 0) sort before their slot's marker (flag 1), so a
    # forward running max over slot-tagged update values is complete
    # when it reaches the marker
    k_m = (slot_m << jnp.uint64(33)) | \
        (jnp.uint64(1) << jnp.uint64(32)) | dense.astype(jnp.uint64)
    k_u = (idx.astype(jnp.uint64) << jnp.uint64(33)) | \
        vals.astype(jnp.uint64)
    s = jnp.sort(jnp.concatenate([k_m, k_u]), stable=False)
    slot = s >> jnp.uint64(33)
    is_m = ((s >> jnp.uint64(32)) & jnp.uint64(1)) != 0
    enc = jnp.where(~is_m, (slot << jnp.uint64(8)) |
                    (s & jnp.uint64(0xFF)), jnp.uint64(0))
    run = running_max(enc)
    upd = jnp.where((run >> jnp.uint64(8)) == slot,
                    run & jnp.uint64(0xFF), jnp.uint64(0))
    newval = jnp.maximum(s & jnp.uint64(0xFF), upd)
    # markers carry the result back out, keyed by slot
    back = jnp.where(is_m, (slot << jnp.uint64(8)) | newval,
                     jnp.uint64(0xFFFFFFFFFFFFFFFF))
    out = jnp.sort(back, stable=False)[:M]
    return (out & jnp.uint64(0xFF)).astype(jnp.uint8)
