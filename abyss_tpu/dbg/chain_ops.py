"""Device-resident chain machinery for the exact DBG engine.

Round-2 profiling showed the post-adjacency phases dominated genome-
scale stage-1 wall-clock (trim 937 s + bubbles 84 s + assemble 154 s of
1364 s at 4.6 Mbp): every trim round re-derived oriented successors,
pulled ~400 MB of chain state to host and ran 50M-entry numpy
pointer-doubling/argsorts, and contig emission joined bases one at a
time in Python.  This module moves all of it onto the device:

  oriented successors   -> one fused elementwise+gather program over
                           all rows (the vector form of
                           SplitAlgorithm.h:28-100's per-vertex tests)
  list ranking          -> pointer doubling under jit; for trim the
                           doubling is CAPPED at ceil(log2(t)) rounds
                           (chains longer than the tip bound can never
                           be trimmed, so they never need ranking —
                           TrimAlgorithm.h:15-99's length bound applied
                           to the ranking itself)
  chain decomposition   -> one unstable u64 sort of packed
                           (head, pos) keys + Hillis-Steele segment
                           fills (ops/scan.py); segment heads/ends/
                           lengths come from two scans, no host argsort
  trim kill rules       -> segment gathers + one masked scatter
                           (processTerminatedBranchTrim:186-199's
                           BS_NOEXT / BS_AMBI_OPP conditions)
  erode                 -> a while_loop fixpoint on device
                           (ErodeAlgorithm.h:63-113)

Bubble grouping, the low-coverage mean test and contig emission keep
their decisions on host (float64 coverage means match the reference's
doubles bit-for-bit) but consume ONE pulled array — the sorted oriented
vertices of the alive chains (the sort puts dead/unranked entries last,
so only the alive prefix crosses the link) — and do all per-chain work
as vectorized numpy over segment boundaries (np.diff / reduceat), never
per-base Python.

Cycles (circular unitigs) are broken at their minimum oriented vertex
on device: a parallel min-reduction rides the pointer doubling, the
edge into each cycle's minimum is cut, and ranking re-runs under a
lax.cond only when a cycle was actually present.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.scan import running_max, running_min

_SENT = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def _interleave(a, b):
    """[N],[N] -> [2N] with out[2i]=a[i], out[2i+1]=b[i]."""
    return jnp.stack([a, b], axis=-1).reshape(-1)


def _rc_packed(x, k: int):
    """Reverse complement of 2-bit packed k-mers (vectorized)."""
    x = ~x
    x = ((x & jnp.uint64(0x3333333333333333)) << jnp.uint64(2)) | \
        ((x & jnp.uint64(0xCCCCCCCCCCCCCCCC)) >> jnp.uint64(2))
    x = ((x & jnp.uint64(0x0F0F0F0F0F0F0F0F)) << jnp.uint64(4)) | \
        ((x & jnp.uint64(0xF0F0F0F0F0F0F0F0)) >> jnp.uint64(4))
    x = ((x & jnp.uint64(0x00FF00FF00FF00FF)) << jnp.uint64(8)) | \
        ((x & jnp.uint64(0xFF00FF00FF00FF00)) >> jnp.uint64(8))
    x = ((x & jnp.uint64(0x0000FFFF0000FFFF)) << jnp.uint64(16)) | \
        ((x & jnp.uint64(0xFFFF0000FFFF0000)) >> jnp.uint64(16))
    x = (x << jnp.uint64(32)) | (x >> jnp.uint64(32))
    return x >> jnp.uint64(64 - 2 * k)


def _degrees_dev(nbr8, alive):
    """(right_deg, left_deg) int32[N] over alive targets.

    nbr8: int32[8, N] (direction-major — a [N, 8] array is
    (8,128)-tile-padded ~16x on TPU, see hash_dbg._cand_rows)."""
    ok = (nbr8 >= 0) & alive[jnp.clip(nbr8, 0)]
    return (ok[:4].sum(axis=0, dtype=jnp.int32),
            ok[4:].sum(axis=0, dtype=jnp.int32))


# --------------------------------------------------------------------------
# oriented successors


@partial(jax.jit, static_argnums=(0,))
def _nxt_packed(k: int, kmers, nbr8, alive):
    """Unique-successor links nxt[ov] for oriented vertices ov=2*i+s,
    packed mode: the device form of hash_dbg._oriented_next."""
    N = kmers.shape[0]
    rd, ld = _degrees_dev(nbr8, alive)
    rc = _rc_packed(kmers, k)
    palin = rc == kmers
    mask = jnp.uint64((1 << (2 * k)) - 1) if 2 * k < 64 else \
        jnp.uint64(0xFFFFFFFFFFFFFFFF)

    def one_strand(strand):
        cols = nbr8[:4] if strand == 0 else nbr8[4:]
        okc = (cols >= 0) & alive[jnp.clip(cols, 0)]
        sub = jnp.where(okc, cols, -1)          # [4, N]
        tgt = jnp.max(sub, axis=0)              # unique when deg==1
        base = jnp.argmax(sub, axis=0).astype(jnp.uint64)
        tgt_c = jnp.clip(tgt, 0)
        if strand == 0:
            y = ((kmers << jnp.uint64(2)) | base) & mask
        else:
            # a stored-orientation LEFT extension by base c appends the
            # complement base (3 - c) in the rc walk orientation
            y = ((rc << jnp.uint64(2)) | (jnp.uint64(3) - base)) & mask
        same = kmers[tgt_c] == y
        tstrand = jnp.where(same, 0, 1)
        deg = rd if strand == 0 else ld
        t_in = jnp.where(tstrand == 0, ld[tgt_c], rd[tgt_c])
        good = alive & (deg == 1) & ~palin & (tgt >= 0) & \
            (t_in == 1) & ~palin[tgt_c]
        ov_t = 2 * tgt_c.astype(jnp.int32) + tstrand
        src = 2 * jnp.arange(N, dtype=jnp.int32) + strand
        nxt_s = jnp.where(good & (ov_t != src), ov_t, -1)
        return nxt_s

    return _interleave(one_strand(0), one_strand(1))


@partial(jax.jit, static_argnums=(0,))
def _nxt_wide(k: int, kmers, hr, firstb, lastb, nbr8, alive):
    """Wide-mode successors: orientation resolved by O(1) ntHash rolls
    of the stored (fwd=canonical, rev=hr) hash state."""
    from ..ops import nthash
    N = kmers.shape[0]
    rd, ld = _degrees_dev(nbr8, alive)
    palin = hr == kmers

    def one_strand(strand):
        cols = nbr8[:4] if strand == 0 else nbr8[4:]
        okc = (cols >= 0) & alive[jnp.clip(cols, 0)]
        sub = jnp.where(okc, cols, -1)
        tgt = jnp.max(sub, axis=0)
        base = jnp.argmax(sub, axis=0).astype(jnp.uint8)
        tgt_c = jnp.clip(tgt, 0)
        if strand == 0:
            f2, _ = nthash.roll_right(kmers, hr, k, firstb, base)
        else:
            f2, _ = nthash.roll_right(
                hr, kmers, k, (jnp.uint8(3) - lastb).astype(jnp.uint8),
                (jnp.uint8(3) - base).astype(jnp.uint8))
        same = kmers[tgt_c] == f2
        tstrand = jnp.where(same, 0, 1)
        deg = rd if strand == 0 else ld
        t_in = jnp.where(tstrand == 0, ld[tgt_c], rd[tgt_c])
        good = alive & (deg == 1) & ~palin & (tgt >= 0) & \
            (t_in == 1) & ~palin[tgt_c]
        ov_t = 2 * tgt_c.astype(jnp.int32) + tstrand
        src = 2 * jnp.arange(N, dtype=jnp.int32) + strand
        return jnp.where(good & (ov_t != src), ov_t, -1)

    return _interleave(one_strand(0), one_strand(1))


# --------------------------------------------------------------------------
# list ranking


def _prev_of(nxt):
    """Backward links: prev[nxt[v]] = v; heads have prev -1.  The nxt
    relation has in/out-degree <= 1 (both endpoints must be unambiguous),
    so the scatter never collides."""
    n = nxt.shape[0]
    idx = jnp.where(nxt >= 0, nxt, n)
    return jnp.full(n, -1, jnp.int32).at[idx].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")


def _capped_rank(nxt, rounds: int):
    """Pointer doubling capped at `rounds`: (head, pos, converged).
    Vertices further than 2**rounds from their chain head stay
    unconverged (their P holds a mid-chain ancestor)."""
    n = nxt.shape[0]
    prev = _prev_of(nxt)
    isroot = prev < 0
    P = jnp.where(isroot, jnp.arange(n, dtype=jnp.int32), prev)
    dist = (~isroot).astype(jnp.int32)
    for _ in range(rounds):
        dist = dist + dist[P]
        P = P[P]
    return P, dist, isroot[P]


@jax.jit
def _full_rank(nxt):
    """Full list ranking with on-device cycle breaking: (head, pos).
    Cycles are broken at their minimum oriented vertex, matching
    hash_dbg._pointer_double's host resolution."""
    n = nxt.shape[0]
    prev = _prev_of(nxt)
    isroot = prev < 0
    iota = jnp.arange(n, dtype=jnp.int32)

    def rank(prev_links, with_min):
        isr = prev_links < 0
        P0 = jnp.where(isr, iota, prev_links)
        d0 = (~isr).astype(jnp.int32)
        M0 = iota

        def cond(s):
            i, P, d, M, changed = s
            return changed & (i < 34)

        def body(s):
            i, P, d, M, _ = s
            d2 = d + d[P]
            M2 = jnp.minimum(M, M[P]) if with_min else M
            P2 = P[P]
            return (i + 1, P2, d2, M2, jnp.any(P2 != P))

        _, P, d, M, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), P0, d0, M0, jnp.bool_(True)))
        return P, d, isr[P], M

    P, dist, conv, M = rank(prev, True)
    has_cycle = jnp.any(~conv)

    def rebreak(_):
        # cut the edge into each cycle's minimum member, re-rank
        cut = (~conv) & (nxt == M)
        idx = jnp.where(cut, jnp.clip(nxt, 0), n)
        prev2 = prev.at[idx].set(-1, mode="drop")
        P2, d2, _, _ = rank(prev2, False)
        return P2, d2

    P, dist = jax.lax.cond(has_cycle, rebreak, lambda _: (P, dist), None)
    return P, dist


# --------------------------------------------------------------------------
# chain segments in sorted (head, pos) order


def _seg_fills(sk):
    """Given sorted packed keys (head<<32|pos, SENT for excluded):
    (valid, start, start_pos, end_pos) per element."""
    n = sk.shape[0]
    valid = sk != _SENT
    head = (sk >> jnp.uint64(32)).astype(jnp.int64)
    first = jnp.concatenate([jnp.ones((1,), bool), head[1:] != head[:-1]])
    lastf = jnp.concatenate([head[:-1] != head[1:], jnp.ones((1,), bool)])
    start = valid & first
    last = valid & lastf
    pos = jnp.arange(n, dtype=jnp.int32)
    start_pos = running_max(jnp.where(start, pos, -1))
    end_pos = running_min(jnp.where(last, pos, n), reverse=True)
    return valid, start, start_pos, end_pos


def _sorted_chain_keys(P, dist, alive_ov):
    key = jnp.where(alive_ov,
                    (P.astype(jnp.uint64) << jnp.uint64(32))
                    | dist.astype(jnp.uint64), _SENT)
    sk, ov_s = jax.lax.sort(
        (key, jnp.arange(P.shape[0], dtype=jnp.int32)),
        num_keys=1, is_stable=False)
    return sk, ov_s


@partial(jax.jit, static_argnums=(6,))
def _trim_round_impl(nxt, outdeg_ov, indeg_ov, alive, counts, max_tip,
                     rounds_t: int):
    """One batched trimSequences pass (TrimAlgorithm.h:38-99) with the
    ranking capped at the tip bound: chains longer than max_tip can
    never be killed, and any chain of length <= max_tip fully converges
    within ceil(log2(max_tip)) doubling rounds, so truncated chains
    appear with observed length 2**rounds+1 > max_tip and fail `short`.
    Returns (new_alive, rows_removed)."""
    N = alive.shape[0]
    P, dist, conv = _capped_rank(nxt, rounds_t)
    alive_ov = jnp.repeat(alive, 2) & conv
    sk, ov_s = _sorted_chain_keys(P, dist, alive_ov)
    valid, start, start_pos, end_pos = _seg_fills(sk)
    length = end_pos - start_pos + 1
    headv = ov_s[jnp.clip(start_pos, 0)]
    endv = ov_s[jnp.clip(end_pos, 0, 2 * N - 1)]
    start_blunt = indeg_ov[headv] == 0
    removing_end = outdeg_ov[endv] <= 1       # BS_NOEXT / BS_AMBI_OPP
    kill = valid & start_blunt & (length <= max_tip) & removing_end
    rows = jnp.where(kill, ov_s >> 1, N)
    killrow = jnp.zeros(N, bool).at[rows].set(True, mode="drop")
    removed = jnp.sum(alive & killrow, dtype=jnp.int32)
    return alive & ~killrow, removed


@partial(jax.jit, static_argnums=(3,))
def _erode_rounds_dev(nbr8, alive, weak, max_rounds: int):
    """Up to max_rounds erode rounds (ErodeAlgorithm.h:63-113): each
    drops the current blunt-ended weak layer.  weak: bool[N]
    precomputed coverage test (counts < e, or either strand < E).

    The fixpoint is CHUNKED: erosion depth equals the longest weak run
    behind a blunt end, which at a coverage-model `e` can reach
    thousands of layers — an unbounded on-device while_loop at that
    depth gets the worker killed by the execution watchdog (observed
    as 'TPU worker process crashed' at genome scale).  The host loops
    chunks until the returned changed flag clears."""
    def cond(s):
        i, _, _, changed = s
        return changed & (i < max_rounds)

    def body(s):
        i, alive, total, _ = s
        rd, ld = _degrees_dev(nbr8, alive)
        kill = ((rd == 0) | (ld == 0)) & weak & alive
        n = jnp.sum(kill, dtype=jnp.int32)
        return i + 1, alive & ~kill, total + n, n > 0

    _, alive, total, changed = jax.lax.while_loop(
        cond, body, (jnp.int32(0), alive, jnp.int32(0), jnp.bool_(True)))
    return alive, total, changed


@jax.jit
def _erode_round_impl(nxt, indeg_ov, alive, weak):
    """One erode round: remove every blunt-started chain of the weak
    subgraph (see DeviceDBG.erode).  Returns (new_alive, rows_removed).
    """
    N = alive.shape[0]
    weak_ov = jnp.repeat(weak, 2)
    nxt_w = jnp.where(
        weak_ov & (nxt >= 0) & weak_ov[jnp.clip(nxt, 0)], nxt, -1)
    P, dist = _full_rank(nxt_w)
    alive_ov = jnp.repeat(alive, 2) & weak_ov
    sk, ov_s = _sorted_chain_keys(P, dist, alive_ov)
    valid, start, start_pos, end_pos = _seg_fills(sk)
    headv = ov_s[jnp.clip(start_pos, 0)]
    kill = valid & (indeg_ov[headv] == 0)
    rows = jnp.where(kill, ov_s >> 1, N)
    killrow = jnp.zeros(N, bool).at[rows].set(True, mode="drop")
    removed = jnp.sum(alive & killrow, dtype=jnp.int32)
    return alive & ~killrow, removed


@jax.jit
def _chains_sorted_dev(nxt, alive):
    """Full chain decomposition: sorted (head, pos) order of all alive
    oriented vertices.  Returns (ov_s, start flags, alive_ov_count);
    the alive prefix of ov_s/start is the only data emission needs."""
    P, dist = _full_rank(nxt)
    alive_ov = jnp.repeat(alive, 2)
    sk, ov_s = _sorted_chain_keys(P, dist, alive_ov)
    start = (sk != _SENT) & \
        ((sk & jnp.uint64(0xFFFFFFFF)) == jnp.uint64(0))
    return ov_s, start, jnp.sum(alive_ov, dtype=jnp.int32)


# --------------------------------------------------------------------------
# host-facing wrapper


class DeviceDBG:
    """Device-resident view of a KmerTable for the chain phases.

    Uploads kmers/adjacency/counts once; `alive` lives on device across
    erode/trim rounds and is synced back to the host table by the
    hash_dbg phase wrappers.  Arrays are direction-major [8, N] on
    device (tile-padding, see hash_dbg._cand_rows).
    """

    def __init__(self, t):
        self.t = t
        self.k = t.k
        self.n = t.n
        self.wide = t.wide
        self.kmers_d = jnp.asarray(t.kmers)
        self.nbr_d = jnp.asarray(np.ascontiguousarray(t.nbr.T))
        self.counts_d = jnp.asarray(t.counts)
        if self.wide:
            self.hr_d = jnp.asarray(t.hr)
            fb, lb = t.end_bases()
            self.firstb_d = jnp.asarray(fb)
            self.lastb_d = jnp.asarray(lb)
        self.alive_d = jnp.asarray(t.alive)

    def sync_from_host(self):
        self.alive_d = jnp.asarray(self.t.alive)

    def sync_to_host(self):
        # np.asarray of a device buffer is read-only; later phases
        # mutate alive in place
        self.t.alive = np.array(self.alive_d)

    def _nxt(self):
        if self.wide:
            return _nxt_wide(self.k, self.kmers_d, self.hr_d,
                             self.firstb_d, self.lastb_d,
                             self.nbr_d, self.alive_d)
        return _nxt_packed(self.k, self.kmers_d, self.nbr_d, self.alive_d)

    def _deg_ov(self):
        rd, ld = _degrees_dev(self.nbr_d, self.alive_d)
        outdeg = _interleave(rd, ld)
        indeg = _interleave(ld, rd)
        return outdeg, indeg

    def erode(self, e: int, e_strand: int = 0) -> int:
        """Erode fixpoint by WEAK-CHAIN removal: layer-by-layer peeling
        (ErodeAlgorithm.h's observer cascade) needs one round per
        erosion layer — thousands at a coverage-model `e` (117 s
        measured at 4.6 Mbp, and an unbounded device loop gets the
        worker watchdog-killed).  Instead each round ranks the chains
        of the weak subgraph (full-graph degree conditions, so links
        mirror the peel rule exactly) and removes every blunt-started
        weak chain WHOLE; rounds now equal the branching depth of the
        eroded region, not its length.  The fixpoint is identical:
        peeling erodes a chain iff its head is blunt and every next
        vertex has walk in-degree 1 — precisely the chain membership
        rule — and stray cases (branch vertices exposed by a removed
        chain, palindromes, opposite-side bluntness) become new blunt
        heads the following round."""
        weak = self.counts_d < e
        if e_strand > 0 and self.t.fwd_counts is not None:
            fwd = jnp.asarray(self.t.fwd_counts)
            rev = self.counts_d - fwd
            weak = weak | (fwd < e_strand) | (rev < e_strand)
        total = 0
        while True:
            nxt = self._nxt()
            outdeg, indeg = self._deg_ov()
            self.alive_d, removed = _erode_round_impl(
                nxt, indeg, self.alive_d, weak)
            removed = int(removed)
            if removed == 0:
                return total
            total += removed

    def trim(self, max_tip: int) -> int:
        if max_tip <= 0:
            return 0
        rounds_t = max(int(np.ceil(np.log2(max_tip))), 0) if max_tip > 1 \
            else 0
        total = 0
        while True:
            nxt = self._nxt()
            outdeg, indeg = self._deg_ov()
            self.alive_d, removed = _trim_round_impl(
                nxt, outdeg, indeg, self.alive_d, self.counts_d,
                jnp.int32(max_tip), rounds_t)
            removed = int(removed)
            if removed == 0:
                return total
            total += removed

    def chains(self):
        """Host chain structure: (ov_s, sidx, lengths) — the sorted
        alive oriented vertices, segment start indices, and per-chain
        lengths.  One D2H pull of the alive prefix."""
        ov_s_d, start_d, cnt_d = _chains_sorted_dev(self._nxt(),
                                                    self.alive_d)
        a = int(cnt_d)
        if a == 0:
            return (np.zeros(0, np.int32), np.zeros(0, np.int64),
                    np.zeros(0, np.int64))
        ov_s = np.asarray(ov_s_d[:a])
        start = np.asarray(start_d[:a])
        sidx = np.flatnonzero(start)
        lengths = np.diff(np.append(sidx, a))
        return ov_s, sidx, lengths
