"""Open-addressing hash tables for device-resident set membership.

The sort-merge join (ops/sort_join) is the right membership primitive
when the query batch is large relative to the table (cost ~ one sort of
table+queries).  Inside a multi-level device loop the economics flip:
each level issues a SMALL query batch against a LARGE, growing visited
set, and re-sorting the full store every level is O(N log N) per level.
An open-addressing table answers the same query with ~1 HBM line per
probe (a [C, B] gather of B CONTIGUOUS slots), and supports device-side
inserts (B bounded scatter/readback rounds), so a bounded-window probe
is O(C) per level regardless of table size.

Used by the konnector device BFS (gap/konnector.py) for the solid-k-mer
set, the two visited sets, and the meet-dedup set.

Collision policy: the table stores full 64-bit keys; a probe hit is a
64-bit match.  Callers that key on derived/surrogate hashes must verify
hits against exact payloads (the konnector BFS re-checks (pair, canon,
packed text) on every hit).  EMPTY (all-ones) is reserved: a real key
equal to EMPTY is never stored (callers' keys are hashes; odds 2^-64).

No reference-code counterpart: the reference's unordered_set /
sparse_hash_map play this role (Common/HashMap.h); this is the
TPU-resident equivalent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)
B = 8  # probe window (slots per bucket scan)


def _mix_np(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (host)."""
    z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def mix64(z):
    """splitmix64 finalizer (device, u64)."""
    z = z + jnp.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return z ^ (z >> jnp.uint64(31))


def table_size(n_keys: int, load: float = 0.25, lo: int = 1 << 10) -> int:
    """Power-of-two slot count targeting the given load factor."""
    want = max(int(n_keys / max(load, 1e-6)), lo)
    return 1 << max(want - 1, 1).bit_length()


def build(keys: np.ndarray, size: int | None = None) -> np.ndarray:
    """Host-side build of a membership table: uint64[size + B] slots.

    Each key lands at mix(key) & (size-1) + b for the smallest free
    b < B; on window overflow the table is rebuilt at 2x (geometric,
    rare below ~50% load)."""
    keys = np.asarray(keys, np.uint64)
    if size is None:
        size = table_size(len(keys))
    while True:
        tab = np.full(size + B, EMPTY, np.uint64)
        remaining = keys[keys != EMPTY]
        base = (_mix_np(remaining) & np.uint64(size - 1)).astype(np.int64)
        for b in range(B):
            if not len(remaining):
                break
            cand = base + b
            # one winner per slot among remaining keys
            uniq, first = np.unique(cand, return_index=True)
            free = tab[uniq] == EMPTY
            tab[uniq[free]] = remaining[first[free]]
            placed = tab[cand] == remaining
            remaining = remaining[~placed]
            base = base[~placed]
        if not len(remaining):
            return tab
        size *= 2


def build_kv(keys: np.ndarray, vals: np.ndarray,
             size: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Host-side build of a key->int32 value table."""
    keys = np.asarray(keys, np.uint64)
    vals = np.asarray(vals, np.int32)
    if size is None:
        size = table_size(len(keys))
    while True:
        tab = np.full(size + B, EMPTY, np.uint64)
        vtab = np.full(size + B, -1, np.int32)
        live = keys != EMPTY
        remaining, rvals = keys[live], vals[live]
        base = (_mix_np(remaining) & np.uint64(size - 1)).astype(np.int64)
        for b in range(B):
            if not len(remaining):
                break
            cand = base + b
            uniq, first = np.unique(cand, return_index=True)
            free = tab[uniq] == EMPTY
            tab[uniq[free]] = remaining[first[free]]
            vtab[uniq[free]] = rvals[first[free]]
            placed = tab[cand] == remaining
            remaining, rvals = remaining[~placed], rvals[~placed]
            base = base[~placed]
        if not len(remaining):
            return tab, vtab
        size *= 2


class ProbeSet:
    """Pytree view of a membership table with the filter `contains`
    API: one [C, B] gather + compare per probe, safe INSIDE device
    loop bodies (a searchsorted probe per while-loop iteration is the
    measured round-5 pathology on this backend — the bloom engine's
    extension loop at 32k steps/dispatch ran minutes per dispatch
    through it)."""

    def __init__(self, tab):
        self.tab = tab

    def contains(self, q, mask=None):
        hit = contains(self.tab, jnp.asarray(q, jnp.uint64).reshape(-1)
                       ).reshape(jnp.shape(q))
        if mask is not None:
            hit = hit & mask
        return hit


jax.tree_util.register_pytree_node(
    ProbeSet, lambda p: ((p.tab,), None),
    lambda _, c: ProbeSet(c[0]))


_SOLID_CACHE: dict[int, tuple] = {}


def solid_table(filt):
    """Device hash table of a counting filter's solid keys (exact:
    count >= threshold), cached per filter object."""
    key = id(filt)
    hit = _SOLID_CACHE.get(key)
    if hit is not None:
        return hit[1]
    kmers = np.asarray(filt.kmers)
    counts = np.asarray(filt.counts)
    tab = jnp.asarray(build(kmers[counts >= filt.threshold]))
    if len(_SOLID_CACHE) > 3:
        _SOLID_CACHE.clear()
    _SOLID_CACHE[key] = (filt, tab)
    return tab


def contains(tab, queries):
    """Device membership probe: bool[C].  tab: uint64[size + B]."""
    size = tab.shape[0] - B
    base = (mix64(queries) & jnp.uint64(size - 1)).astype(jnp.int32)
    idx = base[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]
    got = jnp.take(tab, idx)                       # [C, B] contiguous slots
    return jnp.any(got == queries[:, None], axis=1)


def lookup(tab, vtab, queries):
    """Device key->value probe: (found bool[C], val int32[C] or -1).

    Returns the FIRST window slot whose key matches; callers verify the
    payload exactly (see module docstring)."""
    size = tab.shape[0] - B
    base = (mix64(queries) & jnp.uint64(size - 1)).astype(jnp.int32)
    idx = base[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]
    got = jnp.take(tab, idx)
    hit = got == queries[:, None]
    found = jnp.any(hit, axis=1)
    col = jnp.argmax(hit, axis=1)
    slot = base + col.astype(jnp.int32)
    val = jnp.where(found, jnp.take(vtab, slot), jnp.int32(-1))
    return found, val


def lookup_slot(tab, vtab, queries):
    """Like lookup, additionally returning the matching slot index
    (int32[C]; undefined where not found) so callers can patch the
    stored value in place."""
    size = tab.shape[0] - B
    base = (mix64(queries) & jnp.uint64(size - 1)).astype(jnp.int32)
    idx = base[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]
    got = jnp.take(tab, idx)
    hit = got == queries[:, None]
    found = jnp.any(hit, axis=1)
    col = jnp.argmax(hit, axis=1)
    slot = base + col.astype(jnp.int32)
    val = jnp.where(found, jnp.take(vtab, slot), jnp.int32(-1))
    return found, val, slot


def insert(tab, vtab, keys, vals, live):
    """Device insert of (keys -> vals) where live; B rounds of
    attempt-scatter + readback (losing racers retry the next slot).

    Returns (tab, vtab, failed) where failed counts live keys that
    found no free slot in their window (caller treats as overflow).
    Concurrent duplicate keys are the caller's responsibility (the BFS
    dedups each level before inserting)."""
    size = tab.shape[0] - B
    oob = jnp.int32(tab.shape[0])  # drop target for masked lanes
    base = (mix64(keys) & jnp.uint64(size - 1)).astype(jnp.int32)
    placed = ~live
    for b in range(B):
        tgt = base + b
        cur = jnp.take(tab, tgt)
        attempt = ~placed & (cur == EMPTY)
        widx = jnp.where(attempt, tgt, oob)
        tab = tab.at[widx].set(keys, mode="drop")
        got = jnp.take(tab, tgt)
        newly = attempt & (got == keys)
        vtab = vtab.at[jnp.where(newly, tgt, oob)].set(vals, mode="drop")
        placed = placed | (~placed & (got == keys) & (cur == EMPTY)) | newly
        # also: key already present in an earlier slot of the window is
        # NOT handled here — callers pre-probe when presence matters
    failed = jnp.sum(~placed)
    return tab, vtab, failed
