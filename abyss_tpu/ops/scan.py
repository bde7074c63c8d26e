"""Running (prefix) scans tuned for TPU.

`jax.lax.associative_scan` lowers to an odd/even recursion whose
strided slices (`x[::2]`) fight the TPU's (8, 128) tiling: measured
355M u64 elements/s at 3.7M.  A hand-unrolled Hillis-Steele ladder of
CONTIGUOUS shift-and-combine passes runs at memory bandwidth instead:
2.29G u64 elements/s — 6.4x faster — despite doing O(n log n) work
(BENCH_NOTES.md).  The same lesson as the bitonic-merge negative
result, from the other side: layout beats work count on this machine.

Only 1-D scans are provided; the ladder unrolls log2(n) static passes,
so n must be static (it always is under jit).
"""

from __future__ import annotations

import jax.numpy as jnp


def running(x, op, identity, reverse: bool = False):
    """Inclusive scan of `op` (associative) along a 1-D array.

    identity: value with op(identity, v) == v, used to pad the shifted
    operand.  reverse=True scans right-to-left (suffix scan).
    """
    n = x.shape[0]
    s = 1
    while s < n:
        pad = jnp.full((s,), identity, x.dtype)
        if reverse:
            x = op(x, jnp.concatenate([x[s:], pad]))
        else:
            x = op(x, jnp.concatenate([pad, x[:-s]]))
        s *= 2
    return x


def running_max(x, reverse: bool = False):
    info = jnp.iinfo(x.dtype)
    return running(x, jnp.maximum, info.min, reverse)


def running_min(x, reverse: bool = False):
    info = jnp.iinfo(x.dtype)
    return running(x, jnp.minimum, info.max, reverse)


def running_sum(x, reverse: bool = False):
    return running(x, jnp.add, 0, reverse)
