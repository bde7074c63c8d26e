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
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def join_counts(table_keys, table_counts, queries):
    """Counts for each query key (0 when absent from the table).

    table_keys: uint64[M] sorted unique; table_counts: int32[M];
    queries: uint64[N] (any order, duplicates fine).
    Returns int32[N] aligned with `queries`.
    """
    M = table_keys.shape[0]
    N = queries.shape[0]
    if M == 0:
        return jnp.zeros(N, jnp.int32)
    keys = jnp.concatenate([table_keys, jnp.asarray(queries, jnp.uint64)])
    flag = jnp.concatenate([jnp.zeros(M, jnp.int32),
                            jnp.ones(N, jnp.int32)])
    vals = jnp.concatenate([jnp.asarray(table_counts, jnp.int32),
                            jnp.full(N, -1, jnp.int32)])
    idx = jnp.concatenate([jnp.full(M, -1, jnp.int32),
                           jnp.arange(N, dtype=jnp.int32)])
    sk, sf, sv, si = jax.lax.sort((keys, flag, vals, idx), num_keys=2)

    # segment starts at key changes; within a segment the (unique) table
    # row, if present, is first (flag 0 sorts before 1).  Propagate the
    # table count across its segment with one cummax over an encoding
    # (segment_id << 32 | count+1): segment ids are nondecreasing, so the
    # running max at any element is its own segment's best (= the table
    # row's count if the segment has one) — no gathers, builtin scan.
    start = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    seg = jnp.cumsum(start.astype(jnp.int64))
    enc = (seg << jnp.int64(32)) | jnp.where(
        sf == 0, sv.astype(jnp.int64) + 1, jnp.int64(0))
    run = jax.lax.associative_scan(jnp.maximum, enc)
    counts_sorted = jnp.maximum(
        (run & jnp.int64(0xFFFFFFFF)) - 1, 0).astype(jnp.int32)

    # restore query order: sort by original index; table rows (-1) first
    _, out = jax.lax.sort((si, counts_sorted), num_keys=1)
    return out[M:]


def join_contains(table_keys, table_counts, queries, threshold: int):
    return join_counts(table_keys, table_counts, queries) >= threshold
