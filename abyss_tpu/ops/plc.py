"""Probabilistic log counter (PLC): minifloat counting Bloom filter.

Reimplements /root/reference/LogKmerCount/plc.h:15-40: counters are
8-bit minifloats (3-bit exponent, 5-bit mantissa) incremented
probabilistically so that 8 bits can count into the millions with
bounded relative error — the memory-lean alternative counting filter
(`logcounter` tool).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MANT_BITS = 5
MANT = 1 << MANT_BITS  # 32


def to_count(minifloat):
    """Decode minifloat codes to approximate counts (plc.h toValue)."""
    m = jnp.asarray(minifloat, jnp.int32)
    exp = m >> MANT_BITS
    mant = m & (MANT - 1)
    return jnp.where(exp == 0, mant,
                     (mant + MANT) << (exp - 1)).astype(jnp.int32)


def increment(minifloat, rand_u32):
    """Probabilistically increment: codes with exponent e advance with
    probability 2^-(e-1) (plc.h increment)."""
    m = jnp.asarray(minifloat, jnp.int32)
    exp = m >> MANT_BITS
    # probability denominator 2^(exp-1); always increment when exp <= 1
    shift = jnp.maximum(exp - 1, 0)
    take = (rand_u32 & ((jnp.uint32(1) << shift.astype(jnp.uint32))
                        - jnp.uint32(1))) == 0
    nxt = jnp.minimum(m + 1, 255)
    return jnp.where(take, nxt, m).astype(jnp.uint8)


class PLCArray:
    """A counting array of probabilistic log counters."""

    def __init__(self, size: int, seed: int = 0):
        self.counters = jnp.zeros(size, jnp.uint8)
        self.key = jax.random.PRNGKey(seed)

    def insert(self, idx):
        idx = jnp.asarray(idx, jnp.int32).reshape(-1)
        self.key, sub = jax.random.split(self.key)
        rnd = jax.random.randint(
            sub, idx.shape, 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
        cur = self.counters[idx]
        new = increment(cur, rnd)
        self.counters = self.counters.at[idx].max(new)

    def count(self, idx):
        return to_count(self.counters[jnp.asarray(idx, jnp.int32)])
