"""Pallas TPU kernels for the hash hot path.

The ntHash pipeline (ops/nthash.py) runs on uint64, which the TPU
emulates with 32-bit lanes.  This kernel computes the canonical window
hashes of a read batch natively in uint32 lane pairs, with every
position-dependent quantity precomputed into constant tables:

  * per-position pre-rotated seed tables T[p, c] = srol^(-p)(tab[c])
    (and srol^(+p) for the reverse strand) are baked in as [L, 4]
    uint32 constants — no variable-amount rotation on the way in;
  * the prefix XOR across the read is a log-step lane-roll scan on the
    VPU (pltpu.roll);
  * only the two final window rotations use variable amounts, and
    those amounts are [1, L] constants.

`kmer_hashes_pallas` is exact-parity with ops/nthash.kmer_hashes
(interpreter-mode and hardware tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import nthash


def _srol_np(v: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Host split-rotate with per-element amounts (uint64)."""
    v = v.astype(np.uint64)
    n33 = (n % 33).astype(np.uint64)
    n31 = (n % 31).astype(np.uint64)
    M33 = np.uint64((1 << 33) - 1)
    M31 = np.uint64((1 << 31) - 1)
    lo = v & M33
    hi = v >> np.uint64(33)
    lo = ((lo << n33) | (lo >> (np.uint64(33) - n33))) & M33
    hi = ((hi << n31) | (hi >> (np.uint64(31) - n31))) & M31
    return (hi << np.uint64(33)) | lo


def _build_consts(k: int, L: int):
    P = nthash.SROL_PERIOD
    p = np.arange(L)
    ftab = nthash._FWD_TAB[:4][None, :].repeat(L, 0)
    rtab = nthash._REV_TAB[:4][None, :].repeat(L, 0)
    yf = _srol_np(ftab, ((-p) % P)[:, None].repeat(4, 1))
    zr = _srol_np(rtab, (p % P)[:, None].repeat(4, 1))

    def split(x):
        return (x & np.uint64(0xFFFFFFFF)).astype(np.uint32), \
            (x >> np.uint64(32)).astype(np.uint32)

    yf_lo, yf_hi = split(yf)
    zr_lo, zr_hi = split(zr)
    fin_f = (k - 1 + p) % P
    fin_r = (P - p % P) % P
    return dict(
        yf_lo=yf_lo, yf_hi=yf_hi, zr_lo=zr_lo, zr_hi=zr_hi,
        f33=(fin_f % 33).astype(np.uint32), f31=(fin_f % 31).astype(np.uint32),
        r33=(fin_r % 33).astype(np.uint32), r31=(fin_r % 31).astype(np.uint32))


def _shr(x, n):
    """Logical right shift on int32 lanes (Mosaic-friendly)."""
    return jax.lax.shift_right_logical(x, n)


def _srol_u32(lo, hi, n33, n31):
    """Split-rotate left on (lo, hi) int32 halves of a 64-bit ntHash
    value (bit-exact unsigned semantics on int32 lanes); n33 in [0, 33),
    n31 in [0, 31), int32 vectors.

    Layout: lo = bits 0..31; hi bit0 = bit 32 (top of the 33-bit part),
    hi bits 1..31 = the 31-bit part.
    """
    one = jnp.int32(1)
    a = lo
    h1 = hi & one
    h31 = _shr(hi, one)

    n = n33
    ns = jnp.minimum(n, jnp.int32(31))
    vl_lo = jnp.where(n == 0, a,
                      jnp.where(n >= 32, jnp.int32(0),
                                jax.lax.shift_left(a, ns)))
    top_sh = jnp.minimum(jnp.int32(32) - ns, jnp.int32(31))
    vl_hi = jnp.where(n == 0, h1,
                      jnp.where(n >= 32, a & one, _shr(a, top_sh) & one))
    m = jnp.int32(33) - n
    ms = jnp.minimum(m, jnp.int32(31))
    mm = jnp.minimum(jnp.int32(32) - ms, jnp.int32(31))
    vr_lo = jnp.where(m >= 33, jnp.int32(0),
                      jnp.where(m >= 32, h1,
                                jax.lax.shift_left(h1, mm) | _shr(a, ms)))
    r_lo = vl_lo | vr_lo
    r_h1 = vl_hi

    n2 = n31
    n2s = jnp.minimum(n2, jnp.int32(30))
    rh = (jax.lax.shift_left(h31, n2s) |
          _shr(h31, jnp.int32(31) - n2s)) & jnp.int32(0x7FFFFFFF)
    rh = jnp.where(n2 == 0, h31, rh)
    return r_lo, r_h1 | jax.lax.shift_left(rh, one)


def _lane_roll(v, s: int):
    """Circular lane shift by +s (like jnp.roll on axis 1).

    pltpu.roll fails Mosaic verification on this TPU build; a
    slice+concatenate lowers cleanly and fuses.
    """
    s = s % v.shape[1]
    if s == 0:
        return v
    return jnp.concatenate([v[:, -s:], v[:, :-s]], axis=1)


def _hash_kernel_factory(k: int, L: int):

    def kernel(codes_ref, tabs_ref, amts_ref, canlo_ref, canhi_ref,
               valid_ref):
        codes = codes_ref[:]  # [8, L] int32
        tabs = tabs_ref[:]    # [16, L]: yf_lo[c], yf_hi[c], zr_lo[c], zr_hi[c]
        amts = amts_ref[:]    # [8, L]: f33, f31, r33, r31, pad
        B = codes.shape[0]
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

        def lut(row0, c):
            out = jnp.broadcast_to(tabs[row0:row0 + 1, :], c.shape)
            for i in range(1, 4):
                out = jnp.where(c == i,
                                tabs[row0 + i:row0 + i + 1, :], out)
            return jnp.where(c >= 4, jnp.int32(0), out)

        ylo = lut(0, codes)
        yhi = lut(4, codes)
        zlo = lut(8, codes)
        zhi = lut(12, codes)

        def pxor(v):
            s = 1
            while s < L:
                v = v ^ jnp.where(pos >= s, _lane_roll(v, s),
                                  jnp.int32(0))
                s *= 2
            return v

        Pylo, Pyhi, Pzlo, Pzhi = pxor(ylo), pxor(yhi), pxor(zlo), pxor(zhi)

        def wxor(p_):
            a = _lane_roll(p_, L - (k - 1))
            b = jnp.where(pos >= 1, _lane_roll(p_, 1), jnp.int32(0))
            return a ^ b

        wylo, wyhi = wxor(Pylo), wxor(Pyhi)
        wzlo, wzhi = wxor(Pzlo), wxor(Pzhi)

        def amt(row):
            return jnp.broadcast_to(amts[row:row + 1, :], codes.shape)

        flo2, fhi2 = _srol_u32(wylo, wyhi, amt(0), amt(1))
        rlo2, rhi2 = _srol_u32(wzlo, wzhi, amt(2), amt(3))
        # unsigned compare on int32 lanes: flip the sign bit
        sbit = jnp.int32(-2147483648)
        fhi_u, rhi_u = fhi2 ^ sbit, rhi2 ^ sbit
        flo_u, rlo_u = flo2 ^ sbit, rlo2 ^ sbit
        fless = (fhi_u < rhi_u) | ((fhi2 == rhi2) & (flo_u <= rlo_u))
        canlo_ref[:] = jnp.where(fless, flo2, rlo2)
        canhi_ref[:] = jnp.where(fless, fhi2, rhi2)

        bad = (codes >= 4).astype(jnp.int32)
        s = 1
        pb = bad
        while s < L:
            pb = pb + jnp.where(pos >= s, _lane_roll(pb, s), jnp.int32(0))
            s *= 2
        hi_b = _lane_roll(pb, L - (k - 1))
        lo_b = jnp.where(pos >= 1, _lane_roll(pb, 1), jnp.int32(0))
        valid_ref[:] = ((hi_b - lo_b) == 0).astype(jnp.int32)

    return kernel


@partial(jax.jit, static_argnums=(1, 2))
def kmer_hashes_pallas(codes, k: int, interpret: bool = False):
    """Canonical window hashes via the Pallas kernel.

    codes: [B, L] uint8/int32. Returns (canon uint64[B, W],
    valid bool[B, W]) matching nthash.kmer_hashes()[2:4].

    Note: this Mosaic build rejects gridded pallas_calls, so the kernel
    processes CHUNK rows per (gridless) invocation and the batch is
    mapped over chunks with lax.map.
    """
    CHUNK = 256
    codes = jnp.asarray(codes).astype(jnp.int32)
    B, L = codes.shape
    W = L - k + 1
    kernel = _hash_kernel_factory(k, L)
    c = _build_consts(k, L)
    tabs = jnp.asarray(np.concatenate(
        [c["yf_lo"].T, c["yf_hi"].T, c["zr_lo"].T, c["zr_hi"].T],
        axis=0).view(np.int32))
    amts = jnp.asarray(np.stack(
        [c["f33"], c["f31"], c["r33"], c["r31"],
         np.zeros_like(c["f33"]), np.zeros_like(c["f33"]),
         np.zeros_like(c["f33"]), np.zeros_like(c["f33"])]).view(np.int32))

    pad = (-B) % CHUNK
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.full((pad, L), 4, jnp.int32)], axis=0)
    nchunks = codes.shape[0] // CHUNK
    chunks = codes.reshape(nchunks, CHUNK, L)

    call = pl.pallas_call(
        kernel,
        interpret=interpret,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((CHUNK, L), jnp.int32),
            jax.ShapeDtypeStruct((CHUNK, L), jnp.int32),
            jax.ShapeDtypeStruct((CHUNK, L), jnp.int32)))

    canlo, canhi, valid = jax.lax.map(
        lambda x: call(x, tabs, amts), chunks)
    canlo = canlo.reshape(-1, L)[:B, :W]
    canhi = canhi.reshape(-1, L)[:B, :W]
    valid = valid.reshape(-1, L)[:B, :W]
    canlo_u = canlo.view(jnp.uint32).astype(jnp.uint64)
    canhi_u = canhi.view(jnp.uint32).astype(jnp.uint64)
    canon = (canhi_u << jnp.uint64(32)) | canlo_u
    return canon, valid != 0
