"""Pallas binned scatter-max over a u8 counter array — the VERDICT
round-1 #4 "binned scatter" attempt, with its measured verdict.

The conservative counting-Bloom insert (reference semantics:
vendor/btl_bloomfilter/CountingBloomFilter.hpp:118-196) is bound by H
random counter reads + H random writes per k-mer.  Round-1 quoted the
XLA scatter at ~20 M updates/s; round-2 measurement at the real shapes
(2^24 u8 counters, 3.7 M updates) shows XLA is far better than that —
raw gather 117 M/s, raw scatter-max 98 M/s, sort+RLE+sorted-hint
scatter 109 M/s (scripts/exp_scatter.py) — which puts the measured
full insert (12 M k-mers/s at H=4, i.e. ~100 M random accesses/s)
AT the chip's random-access bound already.

This module is the binned-scatter reformulation: sort the update
stream by counter index (contiguous per-tile windows, no gathers),
then per 1024-counter sub-tile apply the window as a vectorized
[C, 128] compare-broadcast max — no scatter at any level.

Status on this toolchain (v5e via axon, jax 0.9): the kernel is
correct (interpret-mode tests in tests/test_pallas_scatter.py) but
this Mosaic build rejects every practical lowering:

  1. in-kernel converts involving i64 or sub-32-bit types recurse in
     `_convert_element_type_lowering_rule` (so: all-i32 compute, i32
     fori bounds, i32 semaphore indices);
  2. dynamic VMEM/HBM 1-D slices must be 1024-element-aligned in both
     offset and LENGTH — per-sub-tile windows must be padded from the
     ~286-element 2.5x-mean capacity to >= 1024+1024, which multiplies
     the compare-broadcast work by ~7x;
  3. 1-D -> (C,1) / 3-D vector shape casts are unsupported, which
     forbids the [C,1] x [1,128] outer-product layout for a 1-D
     DMA'd stream ((N,1)-shaped streams in turn violate the dim-1
     tiling for DMA).

With (2) alone the kernel's work (~27 G i32-ops for 3.7 M updates =
~28 ms) matches the XLA scatter it was meant to replace (~38 ms), so
even a successful compile would be near-neutral.  Conclusion
(BENCH_NOTES.md): the conservative insert is random-access-bound and
the XLA path is already at that bound; the framework's speed path is
the sorted exact table (450 M k-mers/s count) and its at-scale path is
the mesh-sharded table; Bloom mode stays as the memory-parity option
at its measured, bound-limited rate.  `update_mode="pallas"` remains
wired for interpreter-mode verification and for future toolchains.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 8             # sub-tile = 8 rows x 128 lanes = 1024 counters
SUB = ROWS * LANES   # (VMEM dynamic slices must be 1024-aligned on
                     # this Mosaic build, so the sub-tile IS the
                     # alignment quantum)
SUBS = 64            # sub-tiles per super-tile
SUPER = SUBS * SUB   # counters per super-tile (64K)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _plan(size: int, q: int):
    """(n_super, cap_s, c_w) for a size-counter filter, q updates.

    c_w is the per-sub-tile update WINDOW: the slice [s_al, s_al+c_w)
    where s_al is the sub's stream start aligned DOWN to 1024 — so c_w
    carries up to 1023 elements of slack on top of the 2.5x-mean
    capacity."""
    if size % SUPER:
        raise ValueError(f"filter size must be a multiple of {SUPER}")
    n_super = size // SUPER
    mean_s = q / n_super
    mean_b = q / (n_super * SUBS)
    c_b = _pad_to(max(32, int(2.5 * mean_b) + 16), 32)
    c_w = _pad_to(c_b + SUB, SUB)
    cap_s = _pad_to(max(int(4.0 * mean_s), c_w) + SUB, SUB)
    return n_super, cap_s, c_b, c_w


def _presort(idx, payload, payload_bits: int, size: int, n_super: int):
    """Sort (idx, payload) by idx; compute sub-tile starts + overflow
    stats.  Entries with idx >= size sort past the last tile."""
    q = idx.shape[0]
    ck = (idx.astype(jnp.int64) << payload_bits) | payload.astype(jnp.int64)
    ck = jnp.sort(ck)
    sidx = (ck >> payload_bits).astype(jnp.int32)
    spay = (ck & ((1 << payload_bits) - 1))
    n_sub = n_super * SUBS
    edges = jnp.arange(n_sub + 1, dtype=jnp.int32) * SUB
    sub_starts = jnp.searchsorted(sidx, edges).astype(jnp.int32)
    max_run_b = jnp.max(sub_starts[1:] - sub_starts[:-1])
    sstarts = sub_starts[::SUBS]
    max_run_s = jnp.max(sstarts[1:] - sstarts[:-1])
    return sidx, spay, sub_starts, max_run_b, max_run_s


def _mk_kernel(n_super: int, cap_s: int, c_b: int, c_w: int):
    def kernel(starts_hbm, idx_hbm, val_hbm, cnt_hbm, out_hbm,
               tile_vmem, out_vmem, idx_vmem, val_vmem, dtile_vmem,
               st_smem, sems):
        def super_body(t, _):
            st_dma = pltpu.make_async_copy(
                starts_hbm.at[pl.ds(
                    pl.multiple_of(t * SUB, SUB), SUB)], st_smem,
                sems.at[np.int32(0)])
            st_dma.start()
            cnt_dma = pltpu.make_async_copy(
                cnt_hbm.at[pl.ds(t * (SUBS * ROWS), SUBS * ROWS), :],
                tile_vmem, sems.at[np.int32(1)])
            cnt_dma.start()
            st_dma.wait()
            s0 = st_smem[0]
            idx_dma = pltpu.make_async_copy(
                idx_hbm.at[pl.ds(s0, cap_s)], idx_vmem,
                sems.at[np.int32(2)])
            idx_dma.start()
            val_dma = pltpu.make_async_copy(
                val_hbm.at[pl.ds(s0, cap_s)], val_vmem,
                sems.at[np.int32(3)])
            val_dma.start()
            val_dma.wait()
            cnt_dma.wait()
            idx_dma.wait()

            base_t = t * SUPER

            def sub_body(j, _):
                s_rel = jnp.minimum(
                    jnp.maximum(st_smem[j] - s0, jnp.int32(0)),
                    jnp.int32(cap_s - c_w))
                e_rel = jnp.minimum(
                    jnp.maximum(st_smem[j + 1] - s0, jnp.int32(0)),
                    jnp.int32(cap_s))
                # align the window start down to the 1024 quantum; the
                # validity mask re-selects [s_rel, e_rel).  All arrays
                # stay 2D: Mosaic cannot shape-cast 1D<->3D vectors.
                s_al = jnp.left_shift(
                    jnp.right_shift(s_rel, jnp.int32(10)), jnp.int32(10))
                off = pl.multiple_of(s_al, SUB)
                li = idx_vmem[pl.ds(off, c_w), :]        # [c_w, 1]
                lv = val_vmem[pl.ds(off, c_w), :]
                ci = jax.lax.broadcasted_iota(
                    jnp.int32, (c_w, 1), 0) + s_al
                cvalid = (ci >= s_rel) & (ci < e_rel)
                lidx = li - (base_t + j * SUB)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, LANES), 1)
                # one 128-lane row at a time (static 8x unroll), each a
                # [c_w, 128] compare-broadcast + keepdims max-reduce
                for r in range(ROWS):
                    pix = lane + r * LANES
                    hit = (lidx == pix) & cvalid
                    dense = jnp.max(
                        jnp.where(hit, lv, jnp.int32(0)),
                        axis=0, keepdims=True)       # [1, LANES]
                    dtile_vmem[r, :] = dense[0, :]
                r0 = pl.multiple_of(j * ROWS, ROWS)
                row = tile_vmem[pl.ds(r0, ROWS), :]
                out_vmem[pl.ds(r0, ROWS), :] = jnp.maximum(
                    row, dtile_vmem[:])
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(SUBS), sub_body,
                              jnp.int32(0))
            out_dma = pltpu.make_async_copy(
                out_vmem,
                out_hbm.at[pl.ds(t * (SUBS * ROWS), SUBS * ROWS), :],
                sems.at[np.int32(1)])
            out_dma.start()
            out_dma.wait()
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_super),
                          super_body, jnp.int32(0))

    return kernel


@jax.jit
def scatter_max_u8_pallas(counters, idx, val):
    """counters[i] <- max(counters[i], val[j]) for every idx[j] == i.

    counters: [S(+1)] u8 (pow2 prefix is binned; a trailing sink slot
    passes through untouched); idx: [Q] int32 in any order (entries
    >= S are dropped); val: [Q] u8.  Returns (new_counters, ok) where
    ok=False means a capacity overflow (callers fall back to the XLA
    scatter) — for hash-uniform indices this never fires."""
    size = 1 << (int(counters.shape[0]).bit_length() - 1)
    q = idx.shape[0]
    n_super, cap_s, c_b, c_w = _plan(size, q)
    sidx, sval, sub_starts, mb, ms = _presort(idx, val, 8, size, n_super)
    ok = (mb <= c_b) & (ms <= cap_s - c_w)
    sidx_p = jnp.concatenate(
        [sidx, jnp.full((cap_s,), np.int32(2**31 - 1), jnp.int32)])
    sval_p = jnp.concatenate(
        [sval.astype(jnp.int32), jnp.zeros((cap_s,), jnp.int32)])

    a = sub_starts[:-1].reshape(n_super, SUBS)
    nxt = jnp.concatenate([a[1:, 0], sub_starts[-1:]])
    starts_rows = jnp.concatenate(
        [a, nxt[:, None],
         jnp.zeros((n_super, SUB - SUBS - 1), jnp.int32)],
        axis=1).reshape(-1)

    kern = _mk_kernel(n_super, cap_s, c_b, c_w)
    out = pl.pallas_call(
        kern,
        # all operands pinned to HBM: ANY may promote small inputs to
        # VMEM, where unaligned DMA slices are rejected
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        # the kernel is all-int32: Mosaic cannot lower sub-32-bit
        # converts (or 64-bit ones) inside kernels on this build
        out_shape=jax.ShapeDtypeStruct((size // LANES, LANES),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((SUBS * ROWS, LANES), jnp.int32),
            pltpu.VMEM((SUBS * ROWS, LANES), jnp.int32),
            pltpu.VMEM((cap_s, 1), jnp.int32),
            pltpu.VMEM((cap_s, 1), jnp.int32),
            pltpu.VMEM((ROWS, LANES), jnp.int32),
            pltpu.SMEM((SUB,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts_rows, sidx_p.reshape(-1, 1), sval_p.reshape(-1, 1),
      counters[:size].astype(jnp.int32).reshape(-1, LANES))
    new = out.reshape(-1).astype(jnp.uint8)
    if counters.shape[0] > size:
        new = jnp.concatenate([new, counters[size:]])
    return new, ok
