"""Paired de Bruijn graph engine (the reference's K-mode).

Reimplements /root/reference/PairedDBG/: the vertex is a `KmerPair` —
two k-mers whose starts are K - k apart (KmerPair.h:14), giving an
effective span K >> k at fixed storage — and edges carry a `Dinuc`
(one base entering each sub-window; 16 symbols, Dinuc.h:9).  The
reference re-instantiates the whole Assembly/ template stack; here the
pair engine reuses the sorted-table machinery of hash_dbg with a
pair-packing scheme: both k-mers 2-bit-packed into one uint64
(k <= 16), canonicalized against the pair reverse complement
rc(pair(a, b)) = pair(rc(b), rc(a)).

Contig emission: the chain of pairs determines bases over the full
span; interior positions not yet covered by any sub-window of a short
chain are undetermined and emitted as 'N' (the same information the
reference has).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import alphabet
from . import hash_dbg
from .hash_dbg import KmerTable


def pack_pairs(codes, k: int, K: int):
    """Pack every (a, b) k-mer pair window of [B, L] codes: a at i,
    b at i + K - k.  Returns (fwd, rc, canon, valid) uint64[B, W]."""
    if k > 16:
        raise ValueError(f"paired engine needs k <= 16, got {k}")
    if K < 2 * k:
        raise ValueError(f"span K must be >= 2k, got K={K} k={k}")
    codes = jnp.asarray(codes)
    L = codes.shape[-1]
    W = L - K + 1
    if W <= 0:
        raise ValueError(f"read length {L} < K={K}")
    fa, ra, _, va = hash_dbg.pack_kmers(codes, k)
    # windows of b start at offset K-k
    off = K - k
    fb = fa[..., off:off + W]
    rb = ra[..., off:off + W]
    vb = va[..., off:off + W]
    fa = fa[..., :W]
    ra = ra[..., :W]
    va = va[..., :W]
    sh = jnp.uint64(2 * k)
    fwd = (fa << sh) | fb
    rc = (rb << sh) | ra  # rc(pair(a,b)) = (rc(b), rc(a))
    canon = jnp.minimum(fwd, rc)
    return fwd, rc, canon, va & vb


def unpack_pair(packed: int, k: int) -> tuple[str, str]:
    b = packed & ((1 << (2 * k)) - 1)
    a = packed >> (2 * k)
    return hash_dbg.unpack_kmer(a, k), hash_dbg.unpack_kmer(b, k)


def count_pairs(batches, k: int, K: int) -> KmerTable:
    chunks = []
    for codes in batches:
        _, _, canon, valid = pack_pairs(jnp.asarray(codes), k, K)
        canon = np.asarray(canon).reshape(-1)
        valid = np.asarray(valid).reshape(-1)
        chunks.append(canon[valid])
    allk = np.concatenate(chunks) if chunks else np.zeros(0, np.uint64)
    kmers, counts = np.unique(allk, return_counts=True)
    return KmerTable(
        k, kmers, np.minimum(counts, hash_dbg.COVERAGE_MAX).astype(np.int32),
        np.ones(len(kmers), bool))


def _rc_pair(x, k: int):
    """Vectorized pair reverse complement."""
    x = jnp.asarray(x, jnp.uint64)
    mask = jnp.uint64((1 << (2 * k)) - 1)
    b = x & mask
    a = x >> jnp.uint64(2 * k)
    ra = hash_dbg._rc_packed(a << jnp.uint64(64 - 2 * k) >> jnp.uint64(64 - 2 * k), k) \
        if False else hash_dbg._rc_packed(a, k)
    rb = hash_dbg._rc_packed(b, k)
    return (rb << jnp.uint64(2 * k)) | ra


def build_pair_adjacency(t: KmerTable, k: int) -> np.ndarray:
    """nbr int32[N, 32]: right Dinuc (16) then left Dinuc (16) neighbour
    rows, -1 when absent.  Dinuc (c1, c2) shifts base c1 into the a
    window and c2 into the b window (Dinuc.h semantics)."""
    kmers = jnp.asarray(t.kmers)
    N = t.n
    maskk = jnp.uint64((1 << (2 * k)) - 1)
    sh = jnp.uint64(2 * k)
    a = kmers >> sh
    b = kmers & maskk
    cols = []
    for c1 in range(4):
        for c2 in range(4):
            na = ((a << jnp.uint64(2)) | jnp.uint64(c1)) & maskk
            nb = ((b << jnp.uint64(2)) | jnp.uint64(c2)) & maskk
            y = (na << sh) | nb
            cols.append(jnp.minimum(y, _rc_pair(y, k)))
    top = jnp.uint64(2 * (k - 1))
    for c1 in range(4):
        for c2 in range(4):
            na = (a >> jnp.uint64(2)) | (jnp.uint64(c1) << top)
            nb = (b >> jnp.uint64(2)) | (jnp.uint64(c2) << top)
            y = (na << sh) | nb
            cols.append(jnp.minimum(y, _rc_pair(y, k)))
    cand = jnp.stack(cols, axis=1)
    idx = jnp.searchsorted(kmers, cand.reshape(-1)).reshape(N, 32)
    idx = jnp.minimum(idx, max(N - 1, 0))
    hit = kmers[idx] == cand
    return np.asarray(jnp.where(hit, idx.astype(jnp.int32), -1))


def assemble_pairs(batches, k: int, K: int, kc: int = 2,
                   ) -> list[tuple[str, int]]:
    """Count pairs, build adjacency, link unique successors, emit
    contigs (with 'N' for undetermined interior positions)."""
    t = count_pairs(batches, k, K)
    t.alive &= t.counts >= kc
    nbr = build_pair_adjacency(t, k)
    N = t.n
    alive = t.alive
    ok = (nbr >= 0) & np.where(nbr >= 0, alive[np.maximum(nbr, 0)], False)
    right_deg = ok[:, :16].sum(axis=1)
    left_deg = ok[:, 16:].sum(axis=1)
    rc = np.asarray(_rc_pair(jnp.asarray(t.kmers), k))
    palin = rc == t.kmers

    nxt = np.full(2 * N, -1, np.int64)
    maskp = (1 << (4 * k)) - 1
    maskk = (1 << (2 * k)) - 1
    for strand in (0, 1):
        deg = right_deg if strand == 0 else left_deg
        cols = slice(0, 16) if strand == 0 else slice(16, 32)
        rows = np.nonzero(alive & (deg == 1) & ~palin)[0]
        if not len(rows):
            continue
        sub = np.where(ok[rows, cols], nbr[rows, cols], -1)
        tgt = sub.max(axis=1)
        din = np.argmax(sub, axis=1)  # dinuc index c1*4+c2
        c1, c2 = din >> 2, din & 3
        x = t.kmers[rows]
        a = (x >> np.uint64(2 * k)).astype(np.uint64)
        b = (x & np.uint64(maskk)).astype(np.uint64)
        if strand == 0:
            na = ((a << np.uint64(2)) | c1.astype(np.uint64)) & np.uint64(maskk)
            nb = ((b << np.uint64(2)) | c2.astype(np.uint64)) & np.uint64(maskk)
        else:
            xr = np.asarray(_rc_pair(jnp.asarray(x), k))
            a = (xr >> np.uint64(2 * k)).astype(np.uint64)
            b = (xr & np.uint64(maskk)).astype(np.uint64)
            # a LEFT Dinuc (c1, c2) maps to the rc walk orientation as a
            # right Dinuc with components swapped and complemented
            na = ((a << np.uint64(2)) | (3 - c2).astype(np.uint64)) & np.uint64(maskk)
            nb = ((b << np.uint64(2)) | (3 - c1).astype(np.uint64)) & np.uint64(maskk)
        y = ((na << np.uint64(2 * k)) | nb).astype(np.uint64)
        same = t.kmers[tgt] == y
        tstrand = np.where(same, 0, 1)
        t_in = np.where(tstrand == 0, left_deg[tgt], right_deg[tgt])
        good = (t_in == 1) & ~palin[tgt]
        src = 2 * rows + strand
        nxt[src[good]] = (2 * tgt + tstrand)[good]

    head, pos = hash_dbg._pointer_double(nxt)
    alive_ov = np.repeat(alive, 2)
    order = np.lexsort((pos, head))
    order = order[alive_ov[order]]
    heads = head[order]
    bounds = np.nonzero(np.concatenate([[True], heads[1:] != heads[:-1]]))[0]
    contigs = []
    seen = set()
    span = K
    for bi, s in enumerate(bounds):
        e = bounds[bi + 1] if bi + 1 < len(bounds) else len(order)
        chain = order[s:e]
        rows_, strands = chain >> 1, chain & 1
        n_steps = len(chain)
        # sequence buffer over [0, n_steps - 1 + K)
        total = n_steps - 1 + span
        buf = np.full(total, 4, np.uint8)
        for j, (r, st) in enumerate(zip(rows_, strands)):
            x = int(t.kmers[r]) if st == 0 else int(rc[r])
            astr, bstr = unpack_pair(x, k)
            a_codes = alphabet.encode(astr)
            b_codes = alphabet.encode(bstr)
            buf[j:j + k] = a_codes
            buf[j + span - k:j + span] = b_codes
        seq = alphabet.decode(buf)
        canon = min(seq, alphabet.revcomp(seq))
        if canon in seen:
            continue
        seen.add(canon)
        contigs.append((canon, int(t.counts[rows_].sum())))
    return contigs
