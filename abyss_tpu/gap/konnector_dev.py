"""Device-resident bidirectional constrained BFS for Konnector.

The round-4 engine (gap/konnector.py `_connect_chunk`) ran ONE device
dispatch per BFS *level* (roll + canon + solid probe) with every join —
visited sets, in-level dedup, meet detection — on the host.  Correct and
parity-proven, but each level pays a device round trip (~35-60 ms on a
tunneled TPU) and the deepest pair dictates ~10^3 levels: 77 pairs/s vs
the reference binary's 5814 (BENCH_NOTES round 4).

This module moves the whole search into a segmented `lax.while_loop`:
tens of levels advance per dispatch, with fixed-capacity device stores
and O(1)-per-query open-addressing joins (ops/hash_probe) instead of
per-level host sort-joins:

  node stores   flat per-side arrays (pair, canon, fh/rh, packed words,
                depth) with a frontier expressed as [fstart, fstart+fcount)
                — new nodes are appended contiguously, so the next
                level's frontier is just the freshly appended range.
  visited sets  per-side hash tables keyed on skey = canon ^ mix(pair);
                every hit is VERIFIED against exact (pair, canon, packed
                text) — a text mismatch is a fingerprint collision and
                the candidate is (correctly) treated as a distinct fresh
                node (advisor round-4 finding #2).
  meets         hash-set dedup on mix(pair, F-canon, R-canon), with the
                per-pair common-edge counter and TOO_MANY_PATHS /
                MAX_COST_EXCEEDED flags updated in-loop, matching the
                host engine's per-level semantics exactly.
  edges         tree AND non-tree parent edges appended to a bounded
                edge buffer (the traversal DAG for path enumeration,
                cf. ConstrainedBidiBFSVisitor.h's m_traversalGraph).

The frontier capacity is a per-segment COMPILE-TIME bucket: between
segments the host reads five scalars and re-dispatches with the next
power-of-two program, so early wide levels and the long narrow tail
each run at their own cost.  Capacity overflows abort cleanly and the
caller falls back to the host-level engine (same results, slower).

Reference semantics: Konnector/konnector.h:235 (connectPairs),
Graph/ConstrainedBidiBFSVisitor.h (depth caps, cost cap, common-edge
cap, non-tree edges).  Reconstruction/classification stays on the host
(gap/konnector.py) and is shared verbatim with the host search engine.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nthash
from ..ops import hash_probe as hp
from ..ops.scan import running_max, running_sum

U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


class SideState(NamedTuple):
    pair: jax.Array      # int32[N] (sentinel rows = P)
    canon: jax.Array     # uint64[N]
    fh: jax.Array        # uint64[N]
    rh: jax.Array        # uint64[N]
    depth: jax.Array     # int32[N]
    words: jax.Array     # uint64[N, W]
    vtk: jax.Array       # uint64[S+B] visited hash keys
    vtv: jax.Array       # int32[S+B] visited hash values (node idx)
    e_child: jax.Array   # int32[E]
    e_parent: jax.Array  # int32[E]
    n: jax.Array         # int32 scalar: node count
    fstart: jax.Array    # int32 scalar
    fcount: jax.Array    # int32 scalar
    e_n: jax.Array       # int32 scalar


class BFSState(NamedTuple):
    f: SideState
    r: SideState
    cost: jax.Array      # int32[P+1]
    fail: jax.Array      # int32[P+1]  0 ok / 1 paths / 2 branches / 3 cost
    ncom: jax.Array      # int32[P+1]
    maxd_f: jax.Array    # int32[P+1]
    maxd_r: jax.Array    # int32[P+1]
    m_pair: jax.Array    # int32[M]
    m_f: jax.Array       # int32[M]
    m_r: jax.Array       # int32[M]
    mtk: jax.Array       # uint64[SM+B] meet-dedup hash keys
    mtv: jax.Array       # int32[SM+B]
    m_n: jax.Array       # int32 scalar
    overflow: jax.Array  # int32 scalar (bitmask)
    lvl: jax.Array       # int32 scalar


def _first_base_dev(words):
    return ((words[:, 0] >> jnp.uint64(62)) & jnp.uint64(3)).astype(jnp.int32)


def _last_base_dev(words, k: int):
    j = k - 1
    return ((words[:, j // 32] >> jnp.uint64(62 - 2 * (j % 32)))
            & jnp.uint64(3)).astype(jnp.int32)


def _tail_mask(k: int, W: int):
    r = k - 32 * (W - 1)
    if r < 32:
        return jnp.uint64(~((1 << (64 - 2 * r)) - 1) & 0xFFFFFFFFFFFFFFFF)
    return jnp.uint64(0xFFFFFFFFFFFFFFFF)


def _shift_right_dev(words, k: int, c):
    """[C, W] words: drop base 0, append base c at k-1."""
    W = words.shape[1]
    out = words << jnp.uint64(2)
    if W > 1:
        out = jnp.concatenate(
            [out[:, :-1] | (words[:, 1:] >> jnp.uint64(62)), out[:, -1:]],
            axis=1)
    j = k - 1
    add = c.astype(jnp.uint64) << jnp.uint64(62 - 2 * (j % 32))
    out = out.at[:, j // 32].set(out[:, j // 32] | add)
    return out.at[:, W - 1].set(out[:, W - 1] & _tail_mask(k, W))


def _shift_left_dev(words, k: int, c):
    """[C, W] words: prepend base c at 0, drop base k-1."""
    W = words.shape[1]
    out = words >> jnp.uint64(2)
    if W > 1:
        out = jnp.concatenate(
            [out[:, :1], out[:, 1:] | (words[:, :-1] << jnp.uint64(62))],
            axis=1)
    out = out.at[:, 0].set(out[:, 0] | (c.astype(jnp.uint64)
                                        << jnp.uint64(62)))
    return out.at[:, W - 1].set(out[:, W - 1] & _tail_mask(k, W))


def _mix3(a, b, c):
    return hp.mix64(a + hp.mix64(b + hp.mix64(c)))


def _append_edges(side: SideState, child, parent, mask, overflow):
    """Append (child, parent) rows where mask; bump e_n; flag overflow."""
    E = side.e_child.shape[0]
    cnt = jnp.sum(mask, dtype=jnp.int32)
    rank = running_sum(mask.astype(jnp.int32)) - 1
    dest = side.e_n + rank
    ok = mask & (dest < E)
    widx = jnp.where(ok, dest, E)
    e_child = side.e_child.at[widx].set(child.astype(jnp.int32),
                                        mode="drop")
    e_parent = side.e_parent.at[widx].set(parent.astype(jnp.int32),
                                          mode="drop")
    overflow = overflow | jnp.where(side.e_n + cnt > E, 4, 0)
    return side._replace(e_child=e_child, e_parent=e_parent,
                         e_n=side.e_n + cnt), overflow


def _side_level(st: BFSState, fwd: bool, ptab, *, k: int, F_cap: int,
                max_cost: int, max_paths: int) -> BFSState:
    side = st.f if fwd else st.r
    other = st.r if fwd else st.f
    N = side.pair.shape[0]
    P = st.cost.shape[0] - 1
    W = side.words.shape[1]
    maxd = st.maxd_f if fwd else st.maxd_r

    lane = jnp.arange(F_cap, dtype=jnp.int32)
    act = lane < side.fcount
    src = jnp.minimum(side.fstart + jnp.where(act, lane, 0), N - 1)
    ppair = jnp.where(act, side.pair[src], P)
    pwords = side.words[src]
    pfh = jnp.where(act, side.fh[src], 0)
    prh = jnp.where(act, side.rh[src], 0)
    pdep = jnp.where(act, side.depth[src], 0)

    c_out = (_first_base_dev(pwords) if fwd else _last_base_dev(pwords, k))
    bases = jnp.arange(4, dtype=jnp.int32)
    roll = nthash.roll_right if fwd else nthash.roll_left
    f2, r2 = roll(pfh[:, None], prh[:, None], k, c_out[:, None],
                  bases[None, :])
    C = F_cap * 4
    cf = f2.reshape(C)
    cr = r2.reshape(C)
    canon = jnp.minimum(cf, cr)
    cpair = jnp.repeat(ppair, 4)
    cparent = jnp.repeat(src, 4)
    cdep = jnp.repeat(pdep, 4) + 1
    pdep_c = jnp.repeat(pdep, 4)
    c_in = jnp.tile(bases, F_cap)
    act_c = jnp.repeat(act, 4)

    # solid probe + pre-cost fail gate (host: keep = solid & fail==0)
    solid = hp.contains(ptab, jnp.where(act_c, canon, U64MAX))
    keep0 = act_c & solid & (st.fail[cpair] == 0)

    # cost accounting, then MAX_COST_EXCEEDED
    cost = st.cost.at[cpair].add(jnp.where(keep0, 1, 0))
    fail = jnp.where((cost > max_cost) & (st.fail == 0), 3, st.fail)
    keep = keep0 & (fail[cpair] == 0)

    # child words + surrogate key
    pw4 = jnp.repeat(pwords, 4, axis=0)
    cw = (_shift_right_dev(pw4, k, c_in) if fwd
          else _shift_left_dev(pw4, k, c_in))
    skey = canon ^ hp.mix64(cpair.astype(jnp.uint64))

    # own-side visited lookup (verified: pair, canon, packed text)
    q = jnp.where(keep, skey, U64MAX)
    ofound, oval = hp.lookup(side.vtk, side.vtv, q)
    ovc = jnp.minimum(jnp.maximum(oval, 0), N - 1)
    overify = ofound & (side.pair[ovc] == cpair) & \
        (side.canon[ovc] == canon) & \
        jnp.all(side.words[ovc] == cw, axis=1)
    own_idx = jnp.where(overify, oval, -1)

    # other-side (meet) lookup, same verification
    tfound, tval = hp.lookup(other.vtk, other.vtv, q)
    No = other.pair.shape[0]
    tvc = jnp.minimum(jnp.maximum(tval, 0), No - 1)
    tverify = tfound & (other.pair[tvc] == cpair) & \
        (other.canon[tvc] == canon) & \
        jnp.all(other.words[tvc] == cw, axis=1)
    meet_val = jnp.where(tverify, tval, -1)

    pd_ok = pdep_c < maxd[cpair]
    is_meet = (meet_val >= 0) & pd_ok & keep

    # ---- meets: dedup on (pair, F-canon, R-canon), record, count ------
    if fwd:
        fnode, rnode = cparent, jnp.maximum(meet_val, 0)
        fcan = side.canon[jnp.minimum(cparent, N - 1)]
        rcan = other.canon[tvc]
    else:
        fnode, rnode = jnp.maximum(meet_val, 0), cparent
        fcan = other.canon[tvc]
        rcan = side.canon[jnp.minimum(cparent, N - 1)]
    mkey = _mix3(cpair.astype(jnp.uint64), fcan, rcan)
    mq = jnp.where(is_meet, mkey, U64MAX)
    mfound, _ = hp.lookup(st.mtk, st.mtv, mq)
    cand_new = is_meet & ~mfound
    # in-level dedup of equal meet keys: sort (mkey, lane), first of run
    dk = jnp.where(cand_new, mkey, U64MAX)
    dks, dlane = jax.lax.sort((dk, jnp.arange(C, dtype=jnp.int32)),
                              num_keys=1, is_stable=False)
    firstrun = (dks != U64MAX) & jnp.concatenate(
        [jnp.ones((1,), bool), dks[1:] != dks[:-1]])
    new_w = jnp.zeros(C, bool).at[dlane].set(firstrun)
    mtk, mtv, mfail = hp.insert(st.mtk, st.mtv,
                                jnp.where(new_w, mkey, U64MAX),
                                jnp.zeros(C, jnp.int32), new_w)
    ncom = st.ncom.at[cpair].add(jnp.where(new_w, 1, 0))
    fail = jnp.where((ncom > max_paths) & (fail == 0)
                     & (jnp.arange(P + 1) < P), 1, fail)
    M = st.m_pair.shape[0]
    mcnt = jnp.sum(new_w, dtype=jnp.int32)
    mrank = running_sum(new_w.astype(jnp.int32)) - 1
    mdest = st.m_n + mrank
    mok = new_w & (mdest < M)
    mwidx = jnp.where(mok, mdest, M)
    m_pair = st.m_pair.at[mwidx].set(cpair, mode="drop")
    m_f = st.m_f.at[mwidx].set(fnode.astype(jnp.int32), mode="drop")
    m_r = st.m_r.at[mwidx].set(rnode.astype(jnp.int32), mode="drop")
    overflow = st.overflow | jnp.where(st.m_n + mcnt > M, 8, 0) \
        | jnp.where(mfail > 0, 16, 0)
    m_n = st.m_n + mcnt

    # ---- non-tree edges to already-visited own-side nodes -------------
    is_old = (own_idx >= 0) & ~is_meet
    side, overflow = _append_edges(
        side, jnp.maximum(own_idx, 0), cparent, is_old, overflow)

    # ---- fresh nodes: in-level dedup, append, tree + duplicate edges --
    fresh = keep & ~is_meet & (own_idx < 0) & pd_ok & \
        (fail[cpair] == 0) & (cdep <= maxd[cpair])
    fk = jnp.where(fresh, skey, U64MAX)
    fks, flane = jax.lax.sort((fk, jnp.arange(C, dtype=jnp.int32)),
                              num_keys=1, is_stable=False)
    fresh_s = fks != U64MAX
    winner_s = fresh_s & jnp.concatenate(
        [jnp.ones((1,), bool), fks[1:] != fks[:-1]])
    rank_s = running_sum(winner_s.astype(jnp.int32)) - 1
    dest_s = side.n + rank_s
    wtotal = jnp.sum(winner_s, dtype=jnp.int32)
    overflow = overflow | jnp.where(side.n + wtotal > N, 1, 0)

    lw = jnp.minimum(flane, C - 1)
    wok = winner_s & (dest_s < N)
    widx = jnp.where(wok, dest_s, N)
    pair_a = side.pair.at[widx].set(cpair[lw], mode="drop")
    canon_a = side.canon.at[widx].set(canon[lw], mode="drop")
    fh_a = side.fh.at[widx].set(cf[lw], mode="drop")
    rh_a = side.rh.at[widx].set(cr[lw], mode="drop")
    depth_a = side.depth.at[widx].set(cdep[lw], mode="drop")
    words_a = side.words.at[widx].set(cw[lw], mode="drop")
    vtk, vtv, vfail = hp.insert(side.vtk, side.vtv,
                                jnp.where(wok, fks, U64MAX),
                                dest_s, wok)
    overflow = overflow | jnp.where(vfail > 0, 2, 0)
    side = side._replace(pair=pair_a, canon=canon_a, fh=fh_a, rh=rh_a,
                         depth=depth_a, words=words_a, vtk=vtk, vtv=vtv)
    # tree edges (winners) then duplicate-discovery edges to the winner
    side, overflow = _append_edges(side, dest_s, cparent[lw], wok,
                                   overflow)
    wdest_ff = running_max(jnp.where(winner_s, dest_s, -1))
    loser_s = fresh_s & ~winner_s
    side, overflow = _append_edges(
        side, jnp.maximum(wdest_ff, 0), cparent[lw], loser_s, overflow)

    side = side._replace(fstart=side.n, fcount=wtotal,
                         n=jnp.minimum(side.n + wtotal, N))
    kw = dict(f=side, r=st.r) if fwd else dict(f=st.f, r=side)
    return st._replace(cost=cost, fail=fail, ncom=ncom, m_pair=m_pair,
                       m_f=m_f, m_r=m_r, mtk=mtk, mtv=mtv, m_n=m_n,
                       overflow=overflow, **kw)


@partial(jax.jit,
         static_argnames=("k", "T", "F_cap", "max_cost", "max_paths"))
def run_segment(st: BFSState, ptab, *, k: int, T: int, F_cap: int,
                max_cost: int, max_paths: int) -> BFSState:
    """Advance up to T BFS levels (both sides per level) on device."""

    def body(st):
        st = _side_level(st, True, ptab, k=k, F_cap=F_cap,
                         max_cost=max_cost, max_paths=max_paths)
        st = _side_level(st, False, ptab, k=k, F_cap=F_cap,
                         max_cost=max_cost, max_paths=max_paths)
        return st._replace(lvl=st.lvl + 1)

    def cond(st):
        return ((st.lvl < T) & (st.overflow == 0) &
                ((st.f.fcount > 0) | (st.r.fcount > 0)) &
                (st.f.fcount <= F_cap) & (st.r.fcount <= F_cap))

    return jax.lax.while_loop(cond, body, st._replace(lvl=jnp.int32(0)))


@jax.jit
def _compact_nodes(side: SideState, need):
    """Sort node rows so rows of needed pairs come first (by original
    index), returning sorted payloads + the original indices + count."""
    N = side.pair.shape[0]
    iota = jnp.arange(N, dtype=jnp.int64)
    needed = need[side.pair] & (iota < side.n)
    key = jnp.where(needed, iota, jnp.int64(1) << 40)
    _, perm = jax.lax.sort((key, iota.astype(jnp.int32)), num_keys=1,
                           is_stable=False)
    return (jnp.sum(needed, dtype=jnp.int32), side.pair[perm],
            side.canon[perm], side.depth[perm], side.words[perm], perm)


@jax.jit
def _compact_edges(side: SideState, need):
    E = side.e_child.shape[0]
    iota = jnp.arange(E, dtype=jnp.int64)
    child = jnp.minimum(jnp.maximum(side.e_child, 0),
                        side.pair.shape[0] - 1)
    needed = (iota < side.e_n) & (side.e_child >= 0) & \
        need[side.pair[child]]
    key = jnp.where(needed, iota, jnp.int64(1) << 40)
    ks, c_s, p_s = jax.lax.sort(
        (key, side.e_child, side.e_parent), num_keys=1, is_stable=False)
    return jnp.sum(needed, dtype=jnp.int32), c_s, p_s


class PulledSide:
    """Host view of one side after the device search: node arrays of
    the pairs needing reconstruction, with edges remapped to pulled-row
    indices.  Attribute-compatible with gap/konnector._Side for the
    shared classification/reconstruction code."""

    def __init__(self, pair, canon, depth, words, e_child, e_parent):
        self.pair = pair
        self.canon = canon
        self.depth = depth
        self.words = words
        self.e_child = e_child
        self.e_parent = e_parent


def _bucket(n: int, lo: int = 64) -> int:
    return max(lo, 1 << max(int(n) - 1, 1).bit_length())


_PTAB_CACHE: dict[int, tuple] = {}


def solid_table(filt):
    """Device hash table of the filter's solid keys (cached per filter)."""
    key = id(filt)
    hit = _PTAB_CACHE.get(key)
    if hit is not None:
        return hit[1]
    kmers = np.asarray(filt.kmers)
    counts = np.asarray(filt.counts)
    tab = jnp.asarray(hp.build(kmers[counts >= filt.threshold]))
    if len(_PTAB_CACHE) > 3:
        _PTAB_CACHE.clear()
    _PTAB_CACHE[key] = (filt, tab)
    return tab


def device_capable(filt) -> bool:
    return all(hasattr(filt, a) for a in ("kmers", "counts", "threshold"))


def search(filt, P: int, active: np.ndarray, s_k: np.ndarray,
           g_k: np.ndarray, s_words: np.ndarray, g_words: np.ndarray,
           s_fh, s_rh, g_fh, g_rh, maxd_f: np.ndarray,
           maxd_r: np.ndarray, k: int, params, verbose: bool = False):
    """Run the device BFS for one chunk.

    Returns (F_side, R_side, cost, fail, meets, ncom) with sides as
    PulledSide (host numpy), or None when capacities overflow (the
    caller falls back to the host-level search engine).
    """
    import os
    A = len(active)
    W = s_words.shape[1]
    N = int(os.environ.get("ABYSS_TPU_KONN_NODES", 1 << 21))
    E = 2 * N
    M = 1 << 17
    SM = 1 << 19
    S = 4 * N
    max_cost = int(min(params.max_cost, (1 << 30)))
    max_paths = int(params.max_paths)
    T = 48

    for attempt in range(3):
        st = _init_state(P, A, active, s_words, g_words, s_fh, s_rh,
                         g_fh, g_rh, maxd_f, maxd_r, N, E, M, SM, S, W)
        if st is None:
            return None
        ptab = solid_table(filt)
        F_cap = _bucket(A)
        while True:
            st = run_segment(st, ptab, k=k, T=T, F_cap=F_cap,
                             max_cost=max_cost, max_paths=max_paths)
            ff, fr, ovf = jax.device_get(
                (st.f.fcount, st.r.fcount, st.overflow))
            if ovf:
                break
            if ff == 0 and fr == 0:
                return _pull(st, P, s_k, active)
            F_cap = _bucket(max(int(ff), int(fr)))
        # capacity overflow: grow and retry from scratch
        if int(ovf) & (8 | 16):  # meet buffers
            M *= 4
            SM *= 4
        N *= 2
        E = 2 * N
        S = 4 * N
        if N > (1 << 23):
            return None
        if verbose:
            print(f"[konnector-dev] capacity overflow (mask {int(ovf)}); "
                  f"retrying with N={N}", flush=True)
    return None


def _init_state(P, A, active, s_words, g_words, s_fh, s_rh, g_fh, g_rh,
                maxd_f, maxd_r, N, E, M, SM, S, W):
    if A > N:
        return None

    def mkside(words, fh, rh):
        pair = np.full(N, P, np.int32)
        pair[:A] = active
        canon = np.zeros(N, np.uint64)
        canon[:A] = np.minimum(fh, rh)
        fh_a = np.zeros(N, np.uint64)
        fh_a[:A] = fh
        rh_a = np.zeros(N, np.uint64)
        rh_a[:A] = rh
        wa = np.zeros((N, W), np.uint64)
        wa[:A] = words
        skey = canon[:A] ^ hp._mix_np(active.astype(np.uint64))
        vtk = np.full(S + hp.B, hp.EMPTY, np.uint64)
        vtv = np.full(S + hp.B, -1, np.int32)
        base = (hp._mix_np(skey) & np.uint64(S - 1)).astype(np.int64)
        rem = np.arange(A)
        for b in range(hp.B):
            if not len(rem):
                break
            cand = base[rem] + b
            uniq, first = np.unique(cand, return_index=True)
            free = vtk[uniq] == hp.EMPTY
            vtk[uniq[free]] = skey[rem[first[free]]]
            vtv[uniq[free]] = rem[first[free]]
            placed = vtk[base[rem] + b] == skey[rem]
            rem = rem[~placed]
        if len(rem):
            return None
        return SideState(
            pair=jnp.asarray(pair), canon=jnp.asarray(canon),
            fh=jnp.asarray(fh_a), rh=jnp.asarray(rh_a),
            depth=jnp.zeros(N, jnp.int32), words=jnp.asarray(wa),
            vtk=jnp.asarray(vtk), vtv=jnp.asarray(vtv),
            e_child=jnp.full(E, -1, jnp.int32),
            e_parent=jnp.full(E, -1, jnp.int32),
            n=jnp.int32(A), fstart=jnp.int32(0), fcount=jnp.int32(A),
            e_n=jnp.int32(0))

    f = mkside(s_words, s_fh, s_rh)
    r = mkside(g_words, g_fh, g_rh)
    if f is None or r is None:
        return None
    md_f = np.zeros(P + 1, np.int32)
    md_f[:P] = np.minimum(maxd_f, (1 << 30))
    md_r = np.zeros(P + 1, np.int32)
    md_r[:P] = np.minimum(maxd_r, (1 << 30))
    return BFSState(
        f=f, r=r,
        cost=jnp.zeros(P + 1, jnp.int32),
        fail=jnp.zeros(P + 1, jnp.int32),
        ncom=jnp.zeros(P + 1, jnp.int32),
        maxd_f=jnp.asarray(md_f), maxd_r=jnp.asarray(md_r),
        m_pair=jnp.full(M, -1, jnp.int32),
        m_f=jnp.full(M, -1, jnp.int32),
        m_r=jnp.full(M, -1, jnp.int32),
        mtk=jnp.full(SM + hp.B, hp.EMPTY, jnp.uint64),
        mtv=jnp.full(SM + hp.B, -1, jnp.int32),
        m_n=jnp.int32(0), overflow=jnp.int32(0), lvl=jnp.int32(0))


def _pull(st: BFSState, P: int, s_k, active):
    """Pull classification scalars + the reconstruction subgraph."""
    cost, fail, ncom, m_n = jax.device_get(
        (st.cost, st.fail, st.ncom, st.m_n))
    cost = cost[:P].astype(np.int64)
    fail = fail[:P].astype(np.int8)
    ncom = ncom[:P].astype(np.int64)
    m_n = int(m_n)
    # meets (small): pull a pow2 bucket
    mb = _bucket(max(m_n, 1))
    m_pair = np.asarray(jax.device_get(st.m_pair[:mb]))[:m_n]
    m_fn = np.asarray(jax.device_get(st.m_f[:mb]))[:m_n]
    m_rn = np.asarray(jax.device_get(st.m_r[:mb]))[:m_n]

    need = np.zeros(P + 1, bool)
    need[:P] = (ncom > 0) & (fail == 0)
    need_d = jnp.asarray(need)

    def pull_side(side):
        cnt, pair_s, canon_s, depth_s, words_s, idx_s = _compact_nodes(
            side, need_d)
        n = int(cnt)
        nb = _bucket(max(n, 1))
        pair = np.asarray(jax.device_get(pair_s[:nb]))[:n]
        canon = np.asarray(jax.device_get(canon_s[:nb]))[:n]
        depth = np.asarray(jax.device_get(depth_s[:nb]))[:n]
        words = np.asarray(jax.device_get(words_s[:nb]))[:n]
        idx = np.asarray(jax.device_get(idx_s[:nb]))[:n]
        ec_cnt, c_s, p_s = _compact_edges(side, need_d)
        en = int(ec_cnt)
        eb = _bucket(max(en, 1))
        ech = np.asarray(jax.device_get(c_s[:eb]))[:en]
        epa = np.asarray(jax.device_get(p_s[:eb]))[:en]
        # remap device node indices -> pulled rows (idx sorted ascending)
        ech_r = np.searchsorted(idx, ech)
        epa_r = np.searchsorted(idx, epa)
        okc = (ech_r < n) & (idx[np.minimum(ech_r, max(n - 1, 0))] == ech) \
            if n else np.zeros(en, bool)
        okp = (epa_r < n) & (idx[np.minimum(epa_r, max(n - 1, 0))] == epa) \
            if n else np.zeros(en, bool)
        ok = okc & okp
        return PulledSide(pair.astype(np.int64), canon,
                          depth.astype(np.int32), words,
                          ech_r[ok].astype(np.int64),
                          epa_r[ok].astype(np.int64)), idx

    F, fidx = pull_side(st.f)
    R, ridx = pull_side(st.r)
    # remap meet node ids (only meets of needed pairs are usable)
    mask = (m_pair >= 0) & (m_pair < P) & need[np.minimum(m_pair, P)]
    meets = []
    for mp, mf, mr in zip(m_pair[mask], m_fn[mask], m_rn[mask]):
        fi = np.searchsorted(fidx, mf)
        ri = np.searchsorted(ridx, mr)
        if fi < len(F.pair) and fidx[fi] == mf and \
                ri < len(R.pair) and ridx[ri] == mr:
            meets.append((int(mp), int(fi), int(ri)))
    return F, R, cost, fail, meets, ncom
