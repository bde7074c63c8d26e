"""ntHash rolling DNA hash, reformulated for TPU as a parallel scan.

The reference assembler hashes k-mers with ntHash
(/root/reference/vendor/nthash/nthash.hpp): each base maps to a fixed
64-bit seed, and the k-mer hash is the XOR of the seeds "split-rotated"
by their distance from the k-mer end.  The split rotation `srol` rotates
the low 33 bits and the high 31 bits of a 64-bit word independently
(nthash.hpp rol1+swapbits033), so srol has period lcm(33, 31) = 1023.

The reference computes hashes with a sequential O(1)-per-step roll
(NTF64/NTR64/NTC64, nthash.hpp:219-305).  Sequential rolls are hostile
to a vector machine, but srol distributes over XOR, giving a closed
form for every window at once:

    fwd(i) = XOR_{j<k} srol^(k-1-j) F[s(i+j)]
           = srol^(k-1+i) ( XOR_{p in [i, i+k)} srol^(-p) F[s(p)] )
    rev(i) = XOR_{j<k} srol^(j)     R[s(i+j)]
           = srol^(-i)    ( XOR_{p in [i, i+k)} srol^(+p) R[s(p)] )

where F/R are the forward/complement base seed tables.  A single
prefix-XOR scan over the read therefore yields *all* window hashes in
O(L) work with no sequential dependence except the scan itself —
`jax.lax.associative_scan` runs it in O(log L) depth on device.

Canonical hash = min(fwd, rev) and the extra Bloom hash functions are
derived from the canonical value exactly as the reference does
(RollingHash::getHashes → NTE64, /root/reference/BloomDBG/RollingHash.h:137-146),
so hash values here are bit-identical to the reference (golden-tested in
tests/test_nthash.py against vectors generated from the vendored header).

O(1) incremental rolls (`roll_right`, `roll_left`) are also provided for
the unitig-extension engine, mirroring NTC64/NTC64L semantics.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 64-bit per-base seeds of the published ntHash algorithm
# (nthash.hpp:24-28; also in the ntHash paper, Mohamadi et al. 2016).
SEED_A = 0x3C8BFBB395C60474
SEED_C = 0x3193C18562A02B4C
SEED_G = 0x20323ED082572324
SEED_T = 0x295549F54BE24456

MULTI_SEED = 0x90B45D39FB6DA1FA  # nthash.hpp multiSeed
MULTI_SHIFT = 27  # nthash.hpp multiShift

SROL_PERIOD = 1023  # lcm(33, 31)

_M33 = np.uint64((1 << 33) - 1)
_M31 = np.uint64((1 << 31) - 1)

# index 4 (BAD) hashes to 0, like seedN in the reference table.
_FWD_TAB = np.array([SEED_A, SEED_C, SEED_G, SEED_T, 0], dtype=np.uint64)
# reverse-complement table: seed of the complement base (seedTab[c & cpOff])
_REV_TAB = np.array([SEED_T, SEED_G, SEED_C, SEED_A, 0], dtype=np.uint64)


def srol(v, n):
    """Split-rotate left: rotate low 33 bits and high 31 bits independently.

    Equivalent to n applications of the reference's rol1+swapbits033
    (nthash.hpp:189-211).  `v` uint64 array; `n` int array or scalar
    (any non-negative value; reduced mod 33/31 internally).
    """
    v = jnp.asarray(v, jnp.uint64)
    n = jnp.asarray(n)
    n33 = jnp.asarray(n % 33, jnp.uint64)
    n31 = jnp.asarray(n % 31, jnp.uint64)
    lo = v & _M33
    hi = v >> jnp.uint64(33)
    lo = ((lo << n33) | (lo >> (jnp.uint64(33) - n33))) & _M33
    hi = ((hi << n31) | (hi >> (jnp.uint64(31) - n31))) & _M31
    return (hi << jnp.uint64(33)) | lo


def sror1(v):
    """Inverse of one split-rotation (ror1+swapbits3263, nthash.hpp:193-216)."""
    return srol(v, SROL_PERIOD - 1)


@partial(jax.jit, static_argnums=(1,))
def kmer_hashes(codes, k: int):
    """All k-mer window hashes of a batch of reads, in one parallel pass.

    Args:
      codes: [..., L] uint8 base codes (0..3; >=4 marks N/padding).
      k: k-mer length (static).

    Returns:
      (fwd, rev, canon, valid): each [..., L-k+1]; `valid[..., i]` is True
      iff window [i, i+k) contains only ACGT codes.  Hash values at
      invalid windows are unspecified.
    """
    codes = jnp.asarray(codes)
    L = codes.shape[-1]
    W = L - k + 1
    if W <= 0:
        raise ValueError(f"read length {L} < k={k}")
    safe = jnp.minimum(codes, 4).astype(jnp.int32)

    p = jnp.arange(L)
    # per-position pre-rotated seed terms
    y = srol(jnp.take(jnp.asarray(_FWD_TAB), safe, axis=0),
             (-p) % SROL_PERIOD)
    z = srol(jnp.take(jnp.asarray(_REV_TAB), safe, axis=0),
             p % SROL_PERIOD)

    # exclusive prefix XOR along the read
    def pxor(a):
        s = jax.lax.associative_scan(jnp.bitwise_xor, a, axis=-1)
        zerocol = jnp.zeros(a.shape[:-1] + (1,), a.dtype)
        return jnp.concatenate([zerocol, s], axis=-1)  # [..., L+1]

    Py = pxor(y)
    Pz = pxor(z)

    i = jnp.arange(W)
    wy = Py[..., k:] ^ Py[..., :W]  # XOR over window [i, i+k)
    wz = Pz[..., k:] ^ Pz[..., :W]
    fwd = srol(wy, (k - 1 + i) % SROL_PERIOD)
    rev = srol(wz, (SROL_PERIOD - i % SROL_PERIOD) % SROL_PERIOD)
    canon = jnp.minimum(fwd, rev)

    bad = (codes >= 4).astype(jnp.int32)
    Pbad = jnp.cumsum(bad, axis=-1)
    Pbad = jnp.concatenate(
        [jnp.zeros(bad.shape[:-1] + (1,), Pbad.dtype), Pbad], axis=-1)
    valid = (Pbad[..., k:] - Pbad[..., :W]) == 0
    return fwd, rev, canon, valid


# Independent second seed set for wide-mode collision DETECTION
# (round-3 verdict #3): the checksum hash must not be derivable from
# the primary hash (NTE64-style extra hashes are functions of the seed
# hash, so a primary collision propagates to them).  These are
# splitmix64 mixes of the primary seeds — fixed, published-constant
# style, with the complement-pairing R2[c] = F2[3-c] preserved so
# rev2(seq) == fwd2(rc(seq)) exactly like NTR64/NTF64.
ALT_A = 0x9E2C61E1E2B1A3D7
ALT_C = 0x6F1D7D3E85A97C15
ALT_G = 0xB46E2D9C0F53A681
ALT_T = 0x1C84F3B6D92E074A
_ALT_FWD_TAB = np.array([ALT_A, ALT_C, ALT_G, ALT_T, 0], dtype=np.uint64)
_ALT_REV_TAB = np.array([ALT_T, ALT_G, ALT_C, ALT_A, 0], dtype=np.uint64)


@partial(jax.jit, static_argnums=(1,))
def kmer_hashes_alt(codes, k: int):
    """Window hashes under the INDEPENDENT alternate seed table — the
    wide-mode text checksum.  Same closed-form scan as kmer_hashes;
    returns (fwd2, rev2) only (validity comes from the primary call).
    Two distinct k-mer texts colliding in BOTH the primary fingerprint
    and this checksum needs a simultaneous 128-bit coincidence
    (~n^2/2^129 — ~1e-20 at the reference's 20.3e9 human-scale k-mers,
    Assembly/DBG.h:114-120)."""
    codes = jnp.asarray(codes)
    L = codes.shape[-1]
    W = L - k + 1
    safe = jnp.minimum(codes, 4).astype(jnp.int32)
    p = jnp.arange(L)
    y = srol(jnp.take(jnp.asarray(_ALT_FWD_TAB), safe, axis=0),
             (-p) % SROL_PERIOD)
    z = srol(jnp.take(jnp.asarray(_ALT_REV_TAB), safe, axis=0),
             p % SROL_PERIOD)

    def pxor(a):
        s = jax.lax.associative_scan(jnp.bitwise_xor, a, axis=-1)
        zerocol = jnp.zeros(a.shape[:-1] + (1,), a.dtype)
        return jnp.concatenate([zerocol, s], axis=-1)

    Py = pxor(y)
    Pz = pxor(z)
    i = jnp.arange(W)
    wy = Py[..., k:] ^ Py[..., :W]
    wz = Pz[..., k:] ^ Pz[..., :W]
    fwd = srol(wy, (k - 1 + i) % SROL_PERIOD)
    rev = srol(wz, (SROL_PERIOD - i % SROL_PERIOD) % SROL_PERIOD)
    return fwd, rev


def mask_runs(mask: str) -> tuple[tuple[int, int], ...]:
    """[start, end) runs of masked ('0') positions of a spaced seed."""
    runs = []
    i = 0
    while i < len(mask):
        if mask[i] == "0":
            j = i
            while j < len(mask) and mask[j] == "0":
                j += 1
            runs.append((i, j))
            i = j
        else:
            i += 1
    return tuple(runs)


def kmer_pair_mask(k: int, K: int) -> str:
    """SpacedSeed::kmerPair (BloomDBG/SpacedSeed.h:18-26): K ones, a
    k-2K gap of zeros, K ones — the K-mode (paired DBG style) seed."""
    assert K <= k // 2
    return "1" * K + "0" * (k - 2 * K) + "1" * K


def qr_seed(length: int) -> str:
    """SpacedSeed::qrSeed (SpacedSeed.h:40-53): quadratic-residue seed."""
    assert length >= 11
    seed = ["1"] * length
    for i in range(length):
        for j in range(1, length):
            if j * j % length == i:
                seed[i] = "0"
                break
    return "".join(seed)


def qr_seed_pair(k: int, K: int) -> str:
    """SpacedSeed::qrSeedPair: QR seed + gap + reversed QR seed, so the
    overall pattern is symmetric (SpacedSeed.h:55-75)."""
    qr = qr_seed(K)
    return (qr + "0" * (k - 2 * K) + qr[::-1])[:k]


def resolved_impl() -> str:
    """The hash implementation the engine paths will actually use:
    ABYSS_TPU_HASH if set, else pallas on TPU backends, xla elsewhere.
    bench.py records this so the bench JSON matches reality."""
    impl = os.environ.get("ABYSS_TPU_HASH")
    if impl is None:
        try:
            impl = ("pallas" if jax.devices()[0].platform
                    in ("tpu", "axon") else "xla")
        except Exception:
            impl = "xla"
    return impl


def canonical_hashes(codes, k: int):
    """(canon, valid) for all k-windows via the configured backend.

    The canonical-only hot paths (filter load, counting, solidity
    probes) default to the hand-written Pallas kernel on TPU backends
    (ops/pallas_kernels.kmer_hashes_pallas): measured end-to-end it
    lifts the stage-1 count from 445M to 543M k-mers/s/chip
    (BENCH_NOTES.md round 2).  ABYSS_TPU_HASH=xla|pallas overrides;
    non-TPU backends and shapes the kernel rejects fall back to the
    fused XLA prefix-scan path."""
    impl = resolved_impl()
    if impl == "pallas":
        try:
            from .pallas_kernels import kmer_hashes_pallas
            return kmer_hashes_pallas(codes, k)
        except Exception:
            pass
    _, _, canon, valid = kmer_hashes(codes, k)
    return canon, valid


@partial(jax.jit, static_argnums=(1,))
def masked_kmer_hashes(codes, mask: str):
    """Spaced-seed window hashes (maskHash, nthash.hpp:537-547 /
    RollingHash.h reset): the full-k-mer fwd/rc hashes with the masked
    positions' seed contributions XORed back out.

    mask: '1'/'0' string of length k.  Bit-identical to the reference's
    maskHash.  Masked runs are corrected with prefix-XOR windows, so the
    cost is O(#runs), not O(#masked positions).
    """
    k = len(mask)
    codes = jnp.asarray(codes)
    L = codes.shape[-1]
    W = L - k + 1
    if W <= 0:
        raise ValueError(f"read length {L} < k={k}")
    safe = jnp.minimum(codes, 4).astype(jnp.int32)
    p = jnp.arange(L)
    y = srol(jnp.take(jnp.asarray(_FWD_TAB), safe, axis=0),
             (-p) % SROL_PERIOD)
    z = srol(jnp.take(jnp.asarray(_REV_TAB), safe, axis=0),
             p % SROL_PERIOD)

    def pxor(a):
        s = jax.lax.associative_scan(jnp.bitwise_xor, a, axis=-1)
        zerocol = jnp.zeros(a.shape[:-1] + (1,), a.dtype)
        return jnp.concatenate([zerocol, s], axis=-1)

    Py = pxor(y)
    Pz = pxor(z)
    i = jnp.arange(W)
    wy = Py[..., k:] ^ Py[..., :W]
    wz = Pz[..., k:] ^ Pz[..., :W]
    # correction: XOR out each masked run's contribution
    for a, b in mask_runs(mask):
        wy = wy ^ (Py[..., b:b + W] ^ Py[..., a:a + W])
        wz = wz ^ (Pz[..., b:b + W] ^ Pz[..., a:a + W])
    fwd = srol(wy, (k - 1 + i) % SROL_PERIOD)
    rev = srol(wz, (SROL_PERIOD - i % SROL_PERIOD) % SROL_PERIOD)
    canon = jnp.minimum(fwd, rev)
    bad = (codes >= 4).astype(jnp.int32)
    Pbad = jnp.cumsum(bad, axis=-1)
    Pbad = jnp.concatenate(
        [jnp.zeros(bad.shape[:-1] + (1,), Pbad.dtype), Pbad], axis=-1)
    valid = (Pbad[..., k:] - Pbad[..., :W]) == 0
    return fwd, rev, canon, valid


def nte64(h, k: int, i):
    """Extra hash #i from a base hash (NTE64, nthash.hpp:337-343)."""
    h = jnp.asarray(h, jnp.uint64)
    mult = jnp.asarray(i, jnp.uint64) ^ (
        jnp.uint64(k) * jnp.uint64(MULTI_SEED))
    t = h * mult
    return t ^ (t >> jnp.uint64(MULTI_SHIFT))


def multi_hashes(canon, k: int, num_hashes: int):
    """[..., H] Bloom hash values: canonical hash + NTE64-derived extras.

    Matches RollingHash::getHashes (/root/reference/BloomDBG/RollingHash.h:137).
    """
    canon = jnp.asarray(canon, jnp.uint64)
    hs = [canon]
    for i in range(1, num_hashes):
        hs.append(nte64(canon, k, i))
    return jnp.stack(hs, axis=-1)


def hash_base(codes_k, k: int):
    """(fwd, rev) hash of single k-mers given as [..., k] code arrays."""
    f, r, _, _ = kmer_hashes(codes_k, k)
    return f[..., 0], r[..., 0]


# ---------------------------------------------------------------------------
# O(1) incremental rolls for the extension engine.
# srol^k(seed) tables are tiny (4 entries) and depend only on k.


def _srol_np(v: np.ndarray, n: int) -> np.ndarray:
    """Host-side split-rotate (for building constant tables)."""
    v = v.astype(np.uint64)
    n33, n31 = n % 33, n % 31
    lo = v & np.uint64((1 << 33) - 1)
    hi = v >> np.uint64(33)
    if n33:
        lo = ((lo << np.uint64(n33)) | (lo >> np.uint64(33 - n33))) \
            & np.uint64((1 << 33) - 1)
    if n31:
        hi = ((hi << np.uint64(n31)) | (hi >> np.uint64(31 - n31))) \
            & np.uint64((1 << 31) - 1)
    return (hi << np.uint64(33)) | lo


_ROLLED_TAB_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _rolled_tab(tab, k: int):
    key = (id(tab), k)
    if key not in _ROLLED_TAB_CACHE:
        _ROLLED_TAB_CACHE[key] = _srol_np(np.asarray(tab), k)
    return _ROLLED_TAB_CACHE[key]


def roll_right(f, r, k: int, c_out, c_in):
    """Roll hash state one base to the right (NTC64 sliding, nthash.hpp:275).

    c_out: first base code of the current k-mer; c_in: incoming base code.
    Returns (f', r').
    """
    ftab = jnp.asarray(_FWD_TAB)
    rtab = jnp.asarray(_REV_TAB)
    ftab_k = jnp.asarray(_rolled_tab(_FWD_TAB, k))
    rtab_k = jnp.asarray(_rolled_tab(_REV_TAB, k))
    c_out = jnp.minimum(jnp.asarray(c_out, jnp.int32), 4)
    c_in = jnp.minimum(jnp.asarray(c_in, jnp.int32), 4)
    f2 = srol(f, 1) ^ jnp.take(ftab, c_in) ^ jnp.take(ftab_k, c_out)
    r2 = sror1(jnp.asarray(r, jnp.uint64)
               ^ jnp.take(rtab_k, c_in) ^ jnp.take(rtab, c_out))
    return f2, r2


def roll_left(f, r, k: int, c_out, c_in):
    """Roll hash state one base to the left (NTC64L, nthash.hpp:283-305).

    c_out: last base code of the current k-mer; c_in: incoming base code
    (new first base).  Returns (f', r').
    """
    ftab = jnp.asarray(_FWD_TAB)
    rtab = jnp.asarray(_REV_TAB)
    ftab_k = jnp.asarray(_rolled_tab(_FWD_TAB, k))
    rtab_k = jnp.asarray(_rolled_tab(_REV_TAB, k))
    c_out = jnp.minimum(jnp.asarray(c_out, jnp.int32), 4)
    c_in = jnp.minimum(jnp.asarray(c_in, jnp.int32), 4)
    f2 = sror1(jnp.asarray(f, jnp.uint64)
               ^ jnp.take(ftab_k, c_in) ^ jnp.take(ftab, c_out))
    r2 = srol(r, 1) ^ jnp.take(rtab, c_in) ^ jnp.take(rtab_k, c_out)
    return f2, r2


def kmer_hashes_padded(codes_1d, k: int):
    """Hash ONE variable-length sequence with a power-of-two padded
    device shape, so repeated calls compile O(log max_len) programs
    instead of one per distinct length (per-length tracing made the
    4.6 Mb pipeline's per-contig hashing unboundedly slow; padding code
    4 invalidates the padded windows).

    Returns (fwd, rev, canon, valid) numpy arrays of the PADDED window
    count — callers keep the padded shape through downstream jitted
    filter calls (otherwise those retrace per length) and mask with
    `valid`, which is False for every padded window.
    """
    import numpy as np
    codes_1d = np.asarray(codes_1d, np.uint8).reshape(-1)
    n = codes_1d.shape[0]
    P = max(1 << max(n - 1, 1).bit_length(), 64)
    buf = np.full(P, 4, np.uint8)
    buf[:n] = codes_1d
    f, r, canon, valid = kmer_hashes(jnp.asarray(buf[None]), k)
    return f[0], r[0], canon[0], valid[0]
