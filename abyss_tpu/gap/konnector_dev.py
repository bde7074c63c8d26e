"""Device-resident bidirectional constrained BFS for Konnector.

Round-4 ran ONE device dispatch per BFS level (77 pairs/s vs the
reference binary's 5814); the first round-5 engine moved the level loop
into a `lax.while_loop` but carried the ENTIRE node/visited/edge store
(hundreds of MB) through every iteration — and on this platform each
level then paid a state-proportional copy (~60 ms/level at 2^21 nodes,
measured by loop-differencing), capping throughput at ~35-85 pairs/s
regardless of chunking.

This version splits the state by update frequency:

  frozen operands   the big stores — per-side node payloads
                    (pair/canon/words), the visited hash tables
                    (key -> global node idx), and the global meet-dedup
                    table — enter `run_segment` as read-only jit
                    operands.  In-loop they are only GATHERED (cheap at
                    any size); they are extended ONCE per segment by
                    host-orchestrated merge ops outside the loop.
  small carries     the frontier buffers, a segment-local node store
                    (fixed few-thousand-row capacity), segment-local
                    visited/meet hash tables, edge and meet append
                    buffers, and the per-pair cost/fail/ncom arrays.
                    Everything the loop writes is O(frontier), so the
                    per-level cost no longer scales with the search
                    size.

  in-level dedup    sort-free: candidates insert their surrogate key
                    into the segment hash table with their lane id as
                    value; a re-lookup names the winning lane, the
                    winners take contiguous global indices, and the
                    stored value is patched to the final index
                    (losers' duplicate-discovery edges then read the
                    winner's index off the same table).

Between segments only eight control scalars cross to the host; node
payloads, edges and meets accumulate in device-resident global stores
(append-merged once per segment, doubled on demand) and are pulled ONCE
at the end of the search as plain host arrays with global indices — no
device compaction pass, no per-segment bulk D2H.

Reference semantics are unchanged: Konnector/konnector.h:235
(connectPairs), Graph/ConstrainedBidiBFSVisitor.h (depth caps, cost
cap, common-edge cap, non-tree edges).  Every visited/meet hit is
verified against exact (pair, canon, packed text) so fingerprint
collisions cannot splice wrong k-mers (round-4 advisor #2).
Classification and path reconstruction stay in gap/konnector.py and
are shared verbatim with the host fallback engine.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nthash
from ..ops import hash_probe as hp
from ..ops.scan import running_sum

U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


# --------------------------------------------------------------------------
# packed-word helpers (2-bit k-mer text, base 0 in the top bits)


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


def _unpack_words_dev(words, k: int):
    """[F, W] packed words -> [F, k] base codes."""
    j = np.arange(k)
    wsel = words[:, j // 32]
    shift = jnp.asarray((62 - 2 * (j % 32)).astype(np.uint64))
    return ((wsel >> shift[None, :]) & jnp.uint64(3)).astype(jnp.uint8)


# --------------------------------------------------------------------------
# state


class FrozenSide(NamedTuple):
    """Read-only per-side operands for one segment dispatch.  depth and
    the edge store are never read in-loop; they ride here so the final
    host pull is a single slice per array."""
    pair: jax.Array    # int32[N]
    canon: jax.Array   # uint64[N]
    words: jax.Array   # uint64[N, W]
    depth: jax.Array   # int32[N]
    vtk: jax.Array     # uint64[S+B]  visited keys
    vtv: jax.Array     # int32[S+B]   visited values (global idx)
    n0: jax.Array      # int32 scalar: rows merged so far
    ge_c: jax.Array    # int32[GE] global edge child
    ge_p: jax.Array    # int32[GE] global edge parent
    ge_n: jax.Array    # int32 scalar


class SegSide(NamedTuple):
    """Small per-side carry: frontier + segment-local appends."""
    fr_gidx: jax.Array    # int32[F_cap] global idx of frontier rows
    fr_pair: jax.Array    # int32[F_cap]
    fr_fh: jax.Array      # uint64[F_cap]
    fr_rh: jax.Array      # uint64[F_cap]
    fr_words: jax.Array   # uint64[F_cap, W]
    fr_depth: jax.Array   # int32[F_cap]
    fr_count: jax.Array   # int32 scalar
    s_pair: jax.Array     # int32[SegCap]
    s_canon: jax.Array    # uint64[SegCap]
    s_fh: jax.Array       # uint64[SegCap]
    s_rh: jax.Array       # uint64[SegCap]
    s_words: jax.Array    # uint64[SegCap, W]
    s_depth: jax.Array    # int32[SegCap]
    s_vtk: jax.Array      # uint64[SegTab+B]
    s_vtv: jax.Array      # int32[SegTab+B]
    s_n: jax.Array        # int32 scalar
    e_child: jax.Array    # int32[SegE]
    e_parent: jax.Array   # int32[SegE]
    e_n: jax.Array        # int32 scalar


class SegState(NamedTuple):
    f: SegSide
    r: SegSide
    m_pair: jax.Array     # int32[SegM]
    m_f: jax.Array        # int32[SegM] global F-node idx
    m_r: jax.Array        # int32[SegM] global R-node idx
    m_key: jax.Array      # uint64[SegM]
    sm_tk: jax.Array      # uint64[SegMT+B] segment meet-dedup keys
    sm_tv: jax.Array      # int32[SegMT+B]
    m_n: jax.Array        # int32 scalar
    cost: jax.Array       # int32[P+1]
    fail: jax.Array       # int32[P+1]  0 ok / 1 paths / 3 cost
    ncom: jax.Array       # int32[P+1]
    hard: jax.Array       # int32 scalar: hash-table insert overflow
    lvl: jax.Array        # int32 scalar


def _g2(garr, sarr, idx, n0):
    """Two-path gather: global rows [0, n0) from the frozen store, rows
    >= n0 from the segment store."""
    ins = idx >= n0
    gi = jnp.clip(idx, 0, garr.shape[0] - 1)
    si = jnp.clip(idx - n0, 0, sarr.shape[0] - 1)
    g = garr[gi]
    s = sarr[si]
    m = ins.reshape(ins.shape + (1,) * (g.ndim - 1))
    return jnp.where(m, s, g)


def _vlookup(fz: FrozenSide, side: SegSide, q):
    """Visited probe over frozen + segment tables (keys live in exactly
    one: segment keys merge into the frozen table between segments)."""
    f1, v1 = hp.lookup(fz.vtk, fz.vtv, q)
    f2, v2 = hp.lookup(side.s_vtk, side.s_vtv, q)
    return f1 | f2, jnp.where(f2, v2, v1)


def _side_level(st: SegState, fwd: bool, own_fz: FrozenSide,
                oth_fz: FrozenSide, ptab, mtk_g, mtv_g, maxd, *, k: int,
                F_cap: int, max_cost: int, max_paths: int) -> SegState:
    side = st.f if fwd else st.r
    other = st.r if fwd else st.f
    P = st.cost.shape[0] - 1
    W = side.fr_words.shape[1]
    SegCap = side.s_pair.shape[0]
    SegE = side.e_child.shape[0]
    SegM = st.m_pair.shape[0]

    lane = jnp.arange(F_cap, dtype=jnp.int32)
    act = lane < side.fr_count
    ppair = jnp.where(act, side.fr_pair, P)
    pwords = side.fr_words
    pfh = jnp.where(act, side.fr_fh, 0)
    prh = jnp.where(act, side.fr_rh, 0)
    pdep = jnp.where(act, side.fr_depth, 0)
    pgidx = side.fr_gidx
    pcanon = jnp.minimum(pfh, prh)

    c_out = (_first_base_dev(pwords) if fwd else _last_base_dev(pwords, k))
    bases = jnp.arange(4, dtype=jnp.int32)
    roll = nthash.roll_right if fwd else nthash.roll_left
    f2, r2 = roll(pfh[:, None], prh[:, None], k, c_out[:, None],
                  bases[None, :])
    C = F_cap * 4
    lane4 = jnp.arange(C, dtype=jnp.int32)
    cf = f2.reshape(C)
    cr = r2.reshape(C)
    canon = jnp.minimum(cf, cr)
    cpair = jnp.repeat(ppair, 4)
    cparent = jnp.repeat(pgidx, 4)
    pcan4 = jnp.repeat(pcanon, 4)
    cdep = jnp.repeat(pdep, 4) + 1
    pdep_c = jnp.repeat(pdep, 4)
    c_in = jnp.tile(bases, F_cap)
    act_c = jnp.repeat(act, 4)

    # solid probe + pre-cost fail gate (host engine: solid & fail==0)
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
    q = jnp.where(keep, skey, U64MAX)

    # own-side visited lookup (verified: pair, canon, packed text)
    ofound, oval = _vlookup(own_fz, side, q)
    ovc = jnp.maximum(oval, 0)
    overify = ofound & \
        (_g2(own_fz.pair, side.s_pair, ovc, own_fz.n0) == cpair) & \
        (_g2(own_fz.canon, side.s_canon, ovc, own_fz.n0) == canon) & \
        jnp.all(_g2(own_fz.words, side.s_words, ovc, own_fz.n0) == cw,
                axis=1)
    own_idx = jnp.where(overify, oval, -1)

    # other-side (meet) lookup, same verification
    tfound, tval = _vlookup(oth_fz, other, q)
    tvc = jnp.maximum(tval, 0)
    tcanon = _g2(oth_fz.canon, other.s_canon, tvc, oth_fz.n0)
    tverify = tfound & \
        (_g2(oth_fz.pair, other.s_pair, tvc, oth_fz.n0) == cpair) & \
        (tcanon == canon) & \
        jnp.all(_g2(oth_fz.words, other.s_words, tvc, oth_fz.n0) == cw,
                axis=1)
    meet_val = jnp.where(tverify, tval, -1)

    pd_ok = pdep_c < maxd[cpair]
    is_meet = (meet_val >= 0) & pd_ok & keep

    # ---- meets: dedup on (pair, F-canon, R-canon) -----------------------
    if fwd:
        fnode, rnode = cparent, jnp.maximum(meet_val, 0)
        fcan, rcan = pcan4, tcanon
    else:
        fnode, rnode = jnp.maximum(meet_val, 0), cparent
        fcan, rcan = tcanon, pcan4
    mkey = _mix3(cpair.astype(jnp.uint64), fcan, rcan)
    mq = jnp.where(is_meet, mkey, U64MAX)
    mf1, _ = hp.lookup(mtk_g, mtv_g, mq)
    mf2, _ = hp.lookup(st.sm_tk, st.sm_tv, mq)
    cand_new = is_meet & ~mf1 & ~mf2
    sm_tk, sm_tv, mtfail = hp.insert(
        st.sm_tk, st.sm_tv, jnp.where(cand_new, mkey, U64MAX),
        lane4, cand_new)
    _, wl = hp.lookup(sm_tk, sm_tv, jnp.where(cand_new, mkey, U64MAX))
    new_w = cand_new & (wl == lane4)
    ncom = st.ncom.at[cpair].add(jnp.where(new_w, 1, 0))
    fail = jnp.where((ncom > max_paths) & (fail == 0)
                     & (jnp.arange(P + 1) < P), 1, fail)
    mrank = running_sum(new_w.astype(jnp.int32)) - 1
    mdest = st.m_n + mrank
    mok = new_w & (mdest < SegM)
    mwidx = jnp.where(mok, mdest, SegM)
    m_pair = st.m_pair.at[mwidx].set(cpair, mode="drop")
    m_f = st.m_f.at[mwidx].set(fnode.astype(jnp.int32), mode="drop")
    m_r = st.m_r.at[mwidx].set(rnode.astype(jnp.int32), mode="drop")
    m_key = st.m_key.at[mwidx].set(mkey, mode="drop")
    m_n = st.m_n + jnp.sum(new_w, dtype=jnp.int32)
    hard = st.hard | jnp.where(mtfail > 0, 16, 0)

    # ---- edges (non-tree + tree + duplicate-discovery) ------------------
    is_old = (own_idx >= 0) & ~is_meet

    # ---- fresh nodes: sort-free in-level dedup, append ------------------
    fresh = keep & ~is_meet & (own_idx < 0) & pd_ok & \
        (fail[cpair] == 0) & (cdep <= maxd[cpair])
    fk = jnp.where(fresh, skey, U64MAX)
    s_vtk, s_vtv, vfail = hp.insert(side.s_vtk, side.s_vtv, fk, lane4,
                                    fresh)
    hard = hard | jnp.where(vfail > 0, 2, 0)
    _, wl2, slot2 = hp.lookup_slot(s_vtk, s_vtv, fk)
    winner = fresh & (wl2 == lane4)
    rank = running_sum(winner.astype(jnp.int32)) - 1
    wtotal = jnp.sum(winner, dtype=jnp.int32)
    n_tot = own_fz.n0 + side.s_n
    gdest = n_tot + rank
    sdest = side.s_n + rank
    wok = winner & (sdest < SegCap)
    swidx = jnp.where(wok, sdest, SegCap)
    s_pair = side.s_pair.at[swidx].set(cpair, mode="drop")
    s_canon = side.s_canon.at[swidx].set(canon, mode="drop")
    s_fh = side.s_fh.at[swidx].set(cf, mode="drop")
    s_rh = side.s_rh.at[swidx].set(cr, mode="drop")
    s_words = side.s_words.at[swidx].set(cw, mode="drop")
    s_depth = side.s_depth.at[swidx].set(cdep, mode="drop")
    # patch the table value from winner lane -> final global index
    oobslot = jnp.int32(s_vtk.shape[0])
    s_vtv = s_vtv.at[jnp.where(wok, slot2, oobslot)].set(
        gdest.astype(jnp.int32), mode="drop")
    # losers re-read the winner's global index off the patched table
    _, gidx_of = hp.lookup(s_vtk, s_vtv, fk)
    loser = fresh & ~winner

    # edge appends: non-tree (old), tree (winners), duplicate (losers)
    def append(ec, ep, en, child, mask):
        cnt = jnp.sum(mask, dtype=jnp.int32)
        erank = running_sum(mask.astype(jnp.int32)) - 1
        edest = en + erank
        eok = mask & (edest < SegE)
        eidx = jnp.where(eok, edest, SegE)
        ec = ec.at[eidx].set(child.astype(jnp.int32), mode="drop")
        ep = ep.at[eidx].set(cparent.astype(jnp.int32), mode="drop")
        return ec, ep, en + cnt

    ec, ep, en = side.e_child, side.e_parent, side.e_n
    ec, ep, en = append(ec, ep, en, jnp.maximum(own_idx, 0), is_old)
    ec, ep, en = append(ec, ep, en, gdest, wok)
    ec, ep, en = append(ec, ep, en, jnp.maximum(gidx_of, 0), loser)

    # new frontier = this level's winners
    fok = wok & (rank < F_cap)
    fwidx = jnp.where(fok, rank, F_cap)
    fr_gidx = jnp.zeros(F_cap, jnp.int32).at[fwidx].set(
        gdest.astype(jnp.int32), mode="drop")
    fr_pair = jnp.full(F_cap, P, jnp.int32).at[fwidx].set(
        cpair, mode="drop")
    fr_fh = jnp.zeros(F_cap, jnp.uint64).at[fwidx].set(cf, mode="drop")
    fr_rh = jnp.zeros(F_cap, jnp.uint64).at[fwidx].set(cr, mode="drop")
    fr_words = jnp.zeros((F_cap, W), jnp.uint64).at[fwidx].set(
        cw, mode="drop")
    fr_depth = jnp.zeros(F_cap, jnp.int32).at[fwidx].set(
        cdep, mode="drop")

    side = SegSide(
        fr_gidx=fr_gidx, fr_pair=fr_pair, fr_fh=fr_fh, fr_rh=fr_rh,
        fr_words=fr_words, fr_depth=fr_depth, fr_count=wtotal,
        s_pair=s_pair, s_canon=s_canon, s_fh=s_fh, s_rh=s_rh,
        s_words=s_words, s_depth=s_depth, s_vtk=s_vtk, s_vtv=s_vtv,
        s_n=side.s_n + wtotal, e_child=ec, e_parent=ep, e_n=en)
    kw = dict(f=side, r=st.r) if fwd else dict(f=st.f, r=side)
    return st._replace(cost=cost, fail=fail, ncom=ncom, m_pair=m_pair,
                       m_f=m_f, m_r=m_r, m_key=m_key, sm_tk=sm_tk,
                       sm_tv=sm_tv, m_n=m_n, hard=hard, **kw)


@partial(jax.jit,
         static_argnames=("k", "T", "F_cap", "max_cost", "max_paths"))
def run_segment(st: SegState, fz_f: FrozenSide, fz_r: FrozenSide, ptab,
                mtk_g, mtv_g, maxd_f, maxd_r, *, k: int, T: int,
                F_cap: int, max_cost: int, max_paths: int) -> SegState:
    """Advance up to T BFS levels (both sides per level); exits early on
    frontier overflow or when a segment store is nearly full."""
    SegCap = st.f.s_pair.shape[0]
    SegE = st.f.e_child.shape[0]
    SegM = st.m_pair.shape[0]

    def body(st):
        st = _side_level(st, True, fz_f, fz_r, ptab, mtk_g, mtv_g,
                         maxd_f, k=k, F_cap=F_cap, max_cost=max_cost,
                         max_paths=max_paths)
        st = _side_level(st, False, fz_r, fz_f, ptab, mtk_g, mtv_g,
                         maxd_r, k=k, F_cap=F_cap, max_cost=max_cost,
                         max_paths=max_paths)
        return st._replace(lvl=st.lvl + 1)

    def cond(st):
        # room for the NEXT level's worst case given the CURRENT
        # frontiers (a static 4*F_cap bound made every segment exit
        # after ~2 levels at wide frontiers — the round-5 konnector
        # steady run spent one dispatch+merge+sync per LEVEL)
        room = ((st.f.s_n + 4 * st.f.fr_count <= SegCap) &
                (st.r.s_n + 4 * st.r.fr_count <= SegCap) &
                (st.f.e_n + 12 * st.f.fr_count <= SegE) &
                (st.r.e_n + 12 * st.r.fr_count <= SegE) &
                (st.m_n + 4 * (st.f.fr_count + st.r.fr_count) <= SegM))
        return ((st.lvl < T) & (st.hard == 0) & room &
                ((st.f.fr_count > 0) | (st.r.fr_count > 0)) &
                (st.f.fr_count <= F_cap) & (st.r.fr_count <= F_cap))

    return jax.lax.while_loop(cond, body, st._replace(lvl=jnp.int32(0)))


# --------------------------------------------------------------------------
# host orchestration


class PulledSide:
    """Host view of one side: full node arrays (indices ARE global
    ids) + parent edges.  Attribute-compatible with gap/konnector's
    classification/reconstruction code."""

    def __init__(self, pair, canon, depth, words, e_child, e_parent):
        self.pair = pair
        self.canon = canon
        self.depth = depth
        self.words = words
        self.e_child = e_child
        self.e_parent = e_parent


def _bucket(n: int, lo: int = 64) -> int:
    return max(lo, 1 << max(int(n) - 1, 1).bit_length())


solid_table = hp.solid_table


def device_capable(filt) -> bool:
    return all(hasattr(filt, a) for a in ("kmers", "counts", "threshold"))


@jax.jit
def _merge_side(fz: FrozenSide, side: SegSide):
    """Append the segment's nodes and edges into the frozen store and
    insert the new visited keys (shapes fixed by the segment caps)."""
    SegCap = side.s_pair.shape[0]
    SegE = side.e_child.shape[0]
    N = fz.pair.shape[0]
    GE = fz.ge_c.shape[0]
    i = jnp.arange(SegCap, dtype=jnp.int32)
    mask = i < side.s_n
    dest = fz.n0 + i
    widx = jnp.where(mask & (dest < N), dest, N)
    pair = fz.pair.at[widx].set(side.s_pair, mode="drop")
    canon = fz.canon.at[widx].set(side.s_canon, mode="drop")
    words = fz.words.at[widx].set(side.s_words, mode="drop")
    depth = fz.depth.at[widx].set(side.s_depth, mode="drop")
    skey = side.s_canon ^ hp.mix64(side.s_pair.astype(jnp.uint64))
    vtk, vtv, vfail = hp.insert(
        fz.vtk, fz.vtv, jnp.where(mask, skey, U64MAX), dest, mask)
    j = jnp.arange(SegE, dtype=jnp.int32)
    emask = j < side.e_n
    edest = fz.ge_n + j
    eidx = jnp.where(emask & (edest < GE), edest, GE)
    ge_c = fz.ge_c.at[eidx].set(side.e_child, mode="drop")
    ge_p = fz.ge_p.at[eidx].set(side.e_parent, mode="drop")
    overfull = ((fz.n0 + side.s_n > N) | (fz.ge_n + side.e_n > GE) |
                (vfail > 0))
    return FrozenSide(pair, canon, words, depth, vtk, vtv,
                      fz.n0 + side.s_n, ge_c, ge_p,
                      fz.ge_n + side.e_n), overfull


@jax.jit
def _merge_meets(gm, st: SegState):
    """Append segment meets to the global meet arrays + dedup table."""
    m_pair_g, m_f_g, m_r_g, gm_n, mtk_g, mtv_g = gm
    SegM = st.m_pair.shape[0]
    GM = m_pair_g.shape[0]
    i = jnp.arange(SegM, dtype=jnp.int32)
    mask = i < st.m_n
    dest = gm_n + i
    widx = jnp.where(mask & (dest < GM), dest, GM)
    m_pair_g = m_pair_g.at[widx].set(st.m_pair, mode="drop")
    m_f_g = m_f_g.at[widx].set(st.m_f, mode="drop")
    m_r_g = m_r_g.at[widx].set(st.m_r, mode="drop")
    mtk_g, mtv_g, mfail = hp.insert(
        mtk_g, mtv_g, jnp.where(mask, st.m_key, U64MAX),
        jnp.zeros(SegM, jnp.int32), mask)
    overfull = (gm_n + st.m_n > GM) | (mfail > 0)
    return (m_pair_g, m_f_g, m_r_g, gm_n + st.m_n, mtk_g, mtv_g), \
        overfull


@partial(jax.jit, static_argnames=("N2", "S2", "GE2"))
def _grow_side(fz: FrozenSide, N2: int, S2: int, GE2: int):
    """Reallocate the frozen store; the visited table is rebuilt on
    device from the rows merged so far."""
    N, W = fz.words.shape
    GE = fz.ge_c.shape[0]
    pair = jnp.concatenate([fz.pair, jnp.zeros(N2 - N, jnp.int32)])
    canon = jnp.concatenate([fz.canon, jnp.zeros(N2 - N, jnp.uint64)])
    words = jnp.concatenate(
        [fz.words, jnp.zeros((N2 - N, W), jnp.uint64)])
    depth = jnp.concatenate([fz.depth, jnp.zeros(N2 - N, jnp.int32)])
    ge_c = jnp.concatenate([fz.ge_c, jnp.full(GE2 - GE, -1, jnp.int32)])
    ge_p = jnp.concatenate([fz.ge_p, jnp.full(GE2 - GE, -1, jnp.int32)])
    vtk = jnp.full(S2 + hp.B, hp.EMPTY, jnp.uint64)
    vtv = jnp.full(S2 + hp.B, -1, jnp.int32)
    live = jnp.arange(N2, dtype=jnp.int32) < fz.n0
    skeys = jnp.where(live, canon ^ hp.mix64(pair.astype(jnp.uint64)),
                      U64MAX)
    vtk, vtv, vfail = hp.insert(vtk, vtv, skeys,
                                jnp.arange(N2, dtype=jnp.int32), live)
    return FrozenSide(pair, canon, words, depth, vtk, vtv, fz.n0,
                      ge_c, ge_p, fz.ge_n), vfail


def _fresh_seg(F_cap: int, SegCap: int, SegE: int, SegM: int, W: int,
               P: int, cost, fail, ncom, fr_f, fr_r) -> SegState:
    SegTab = 4 * SegCap
    SegMT = 4 * SegM

    def mkside(fr):
        return SegSide(
            fr_gidx=fr[0], fr_pair=fr[1], fr_fh=fr[2], fr_rh=fr[3],
            fr_words=fr[4], fr_depth=fr[5], fr_count=fr[6],
            s_pair=jnp.zeros(SegCap, jnp.int32),
            s_canon=jnp.zeros(SegCap, jnp.uint64),
            s_fh=jnp.zeros(SegCap, jnp.uint64),
            s_rh=jnp.zeros(SegCap, jnp.uint64),
            s_words=jnp.zeros((SegCap, W), jnp.uint64),
            s_depth=jnp.zeros(SegCap, jnp.int32),
            s_vtk=jnp.full(SegTab + hp.B, hp.EMPTY, jnp.uint64),
            s_vtv=jnp.full(SegTab + hp.B, -1, jnp.int32),
            s_n=jnp.int32(0),
            e_child=jnp.full(SegE, -1, jnp.int32),
            e_parent=jnp.full(SegE, -1, jnp.int32),
            e_n=jnp.int32(0))

    return SegState(
        f=mkside(fr_f), r=mkside(fr_r),
        m_pair=jnp.full(SegM, -1, jnp.int32),
        m_f=jnp.full(SegM, -1, jnp.int32),
        m_r=jnp.full(SegM, -1, jnp.int32),
        m_key=jnp.zeros(SegM, jnp.uint64),
        sm_tk=jnp.full(SegMT + hp.B, hp.EMPTY, jnp.uint64),
        sm_tv=jnp.full(SegMT + hp.B, -1, jnp.int32),
        m_n=jnp.int32(0), cost=cost, fail=fail, ncom=ncom,
        hard=jnp.int32(0), lvl=jnp.int32(0))


def _frontier_pad(fr, F_old: int, F_new: int, P: int, W: int):
    """Re-bucket frontier buffers to a new F_cap."""
    gidx, pair, fh, rh, words, depth, count = fr
    if F_new == F_old:
        return fr

    def pad(a, fill):
        if F_new > F_old:
            padshape = (F_new - F_old,) + a.shape[1:]
            return jnp.concatenate(
                [a, jnp.full(padshape, fill, a.dtype)])
        return a[:F_new]

    return (pad(gidx, 0), pad(pair, P), pad(fh, 0), pad(rh, 0),
            pad(words, 0), pad(depth, 0), count)


def _init_frozen(A, active, words, fh, rh, N, S, GE, W, P):
    pair = np.full(N, P, np.int32)
    pair[:A] = active
    canon = np.zeros(N, np.uint64)
    canon[:A] = np.minimum(fh, rh)
    wa = np.zeros((N, W), np.uint64)
    wa[:A] = words
    skey = canon[:A] ^ hp._mix_np(active.astype(np.uint64))
    vtk, vtv = hp.build_kv(skey, np.arange(A, dtype=np.int32), size=S)
    if vtk.shape[0] != S + hp.B:
        return None  # host build grew the table; caller resizes
    return FrozenSide(jnp.asarray(pair), jnp.asarray(canon),
                      jnp.asarray(wa), jnp.zeros(N, jnp.int32),
                      jnp.asarray(vtk), jnp.asarray(vtv), jnp.int32(A),
                      jnp.full(GE, -1, jnp.int32),
                      jnp.full(GE, -1, jnp.int32), jnp.int32(0))


def search(filt, P: int, active: np.ndarray, s_k: np.ndarray,
           g_k: np.ndarray, s_words: np.ndarray, g_words: np.ndarray,
           s_fh, s_rh, g_fh, g_rh, maxd_f: np.ndarray,
           maxd_r: np.ndarray, k: int, params, verbose: bool = False):
    """Run the device BFS for one chunk.

    Returns (F_side, R_side, cost, fail, meets, ncom) with sides as
    PulledSide (host numpy, global indices), or None when the engine
    cannot run this chunk (host fallback)."""
    import os
    A = len(active)
    W = s_words.shape[1]
    max_cost = int(min(params.max_cost, (1 << 30)))
    max_paths = int(params.max_paths)
    T = 48
    N_LIMIT = 1 << int(os.environ.get("ABYSS_TPU_KONN_LOG_LIMIT", 24))

    N = _bucket(max(4 * A, 1 << 14))
    ptab = solid_table(filt)
    maxd_f_d = jnp.asarray(np.concatenate(
        [np.minimum(maxd_f, 1 << 30).astype(np.int32), [0]]))
    maxd_r_d = jnp.asarray(np.concatenate(
        [np.minimum(maxd_r, 1 << 30).astype(np.int32), [0]]))

    fz_f = _init_frozen(A, active, s_words, s_fh, s_rh, N, 4 * N, 2 * N,
                        W, P)
    fz_r = _init_frozen(A, active, g_words, g_fh, g_rh, N, 4 * N, 2 * N,
                        W, P)
    if fz_f is None or fz_r is None:
        return None

    GM = 1 << 16
    SMG = 1 << 18
    gm = (jnp.full(GM, -1, jnp.int32), jnp.full(GM, -1, jnp.int32),
          jnp.full(GM, -1, jnp.int32), jnp.int32(0),
          jnp.full(SMG + hp.B, hp.EMPTY, jnp.uint64),
          jnp.full(SMG + hp.B, -1, jnp.int32))

    cost = jnp.zeros(P + 1, jnp.int32)
    fail = jnp.zeros(P + 1, jnp.int32)
    ncom = jnp.zeros(P + 1, jnp.int32)

    F_cap = _bucket(A)

    def init_frontier(active_, fh, rh, words, F):
        Aa = len(active_)
        gidx = np.zeros(F, np.int32)
        gidx[:Aa] = np.arange(Aa)
        pair = np.full(F, P, np.int32)
        pair[:Aa] = active_
        fh_a = np.zeros(F, np.uint64)
        fh_a[:Aa] = fh
        rh_a = np.zeros(F, np.uint64)
        rh_a[:Aa] = rh
        wa = np.zeros((F, W), np.uint64)
        wa[:Aa] = words
        dep = np.zeros(F, np.int32)
        return (jnp.asarray(gidx), jnp.asarray(pair), jnp.asarray(fh_a),
                jnp.asarray(rh_a), jnp.asarray(wa), jnp.asarray(dep),
                jnp.int32(Aa))

    fr_f = init_frontier(active, s_fh, s_rh, s_words, F_cap)
    fr_r = init_frontier(active, g_fh, g_rh, g_words, F_cap)

    for _round in range(100000):
        SegCap = max(1 << 13, 16 * F_cap)
        SegE = 4 * SegCap
        SegM = max(1 << 12, 16 * F_cap)
        st = _fresh_seg(F_cap, SegCap, SegE, SegM, W, P, cost, fail,
                        ncom, fr_f, fr_r)
        st = run_segment(st, fz_f, fz_r, ptab, gm[4], gm[5], maxd_f_d,
                         maxd_r_d, k=k, T=T, F_cap=F_cap,
                         max_cost=max_cost, max_paths=max_paths)
        cost, fail, ncom = st.cost, st.fail, st.ncom

        # merges run unconditionally (device-side overfull flags); the
        # eight control scalars cross in one device_get
        fz_f, of_f = _merge_side(fz_f, st.f)
        fz_r, of_r = _merge_side(fz_r, st.r)
        gm, of_m = _merge_meets(gm, st)
        (fcf, fcr, hard, off, ofr, ofm, n0f, n0r) = jax.device_get(
            (st.f.fr_count, st.r.fr_count, st.hard, of_f, of_r, of_m,
             fz_f.n0, fz_r.n0))
        if int(hard):
            if verbose:
                print(f"[konnector-dev] hash overflow (mask {int(hard)});"
                      f" host fallback", flush=True)
            return None
        if bool(off) or bool(ofr) or bool(ofm):
            # a global store overflowed during the merge: grow and
            # replay this segment's merge on the regrown store.  The
            # merge is idempotent up to duplicate visited-key inserts,
            # so rerun from the PRE-merge frozen state: rebuild it by
            # rolling n0 back (scatters past the old n0 only wrote
            # rows the replay will rewrite identically).
            def regrow(fz, stside, n0_new):
                N2 = _bucket(max(int(n0_new) * 2, fz.pair.shape[0]))
                if N2 > N_LIMIT:
                    return None
                fzb = fz._replace(n0=fz.n0 - stside.s_n,
                                  ge_n=fz.ge_n - stside.e_n)
                fz2, vfail = _grow_side(fzb, N2, 4 * N2, 2 * N2)
                if int(vfail):
                    return None
                fz2, of2 = _merge_side(fz2, stside)
                if bool(of2):
                    return None
                return fz2

            if bool(off):
                fz_f = regrow(fz_f, st.f, n0f)
                if fz_f is None:
                    return None
            if bool(ofr):
                fz_r = regrow(fz_r, st.r, n0r)
                if fz_r is None:
                    return None
            if bool(ofm):
                return None  # meet stores are generously sized
        if int(fcf) == 0 and int(fcr) == 0:
            break

        # frontier re-bucket (grow on overflow, shrink on narrow tails)
        need = _bucket(max(int(fcf), int(fcr)))
        if int(fcf) > F_cap or int(fcr) > F_cap:
            # frontier overflowed its buffers: rebuild from the last
            # level's winners, now merged at the top of the global
            # store
            def rebuild(fz, cnt, F):
                lo = fz.n0 - cnt
                idx = jnp.arange(F, dtype=jnp.int32) + lo
                ok = jnp.arange(F, dtype=jnp.int32) < cnt
                ic = jnp.clip(idx, 0, fz.pair.shape[0] - 1)
                return (jnp.where(ok, ic, 0).astype(jnp.int32),
                        jnp.where(ok, fz.pair[ic], P),
                        jnp.zeros(F, jnp.uint64),   # fh/rh rebuilt below
                        jnp.zeros(F, jnp.uint64),
                        jnp.where(ok[:, None], fz.words[ic], 0),
                        jnp.where(ok, fz.depth[ic], 0),
                        jnp.int32(0) + cnt)

            # fh/rh aren't stored globally; recompute from the packed
            # words with one hash call
            def with_hashes(fr, fz, cnt, F):
                gidx, pair, _, _, words, depth, count = fr
                codes = _unpack_words_dev(words, k)
                fh, rh = nthash.hash_base(codes, k)
                ok = jnp.arange(F, dtype=jnp.int32) < cnt
                return (gidx, pair, jnp.where(ok, fh, 0),
                        jnp.where(ok, rh, 0), words, depth, count)

            fr_f = with_hashes(rebuild(fz_f, int(fcf), need), fz_f,
                               int(fcf), need)
            fr_r = with_hashes(rebuild(fz_r, int(fcr), need), fz_r,
                               int(fcr), need)
            F_cap = need
        elif need != F_cap:
            fr_f = _frontier_pad(
                (st.f.fr_gidx, st.f.fr_pair, st.f.fr_fh, st.f.fr_rh,
                 st.f.fr_words, st.f.fr_depth, st.f.fr_count),
                F_cap, need, P, W)
            fr_r = _frontier_pad(
                (st.r.fr_gidx, st.r.fr_pair, st.r.fr_fh, st.r.fr_rh,
                 st.r.fr_words, st.r.fr_depth, st.r.fr_count),
                F_cap, need, P, W)
            F_cap = need
        else:
            fr_f = (st.f.fr_gidx, st.f.fr_pair, st.f.fr_fh, st.f.fr_rh,
                    st.f.fr_words, st.f.fr_depth, st.f.fr_count)
            fr_r = (st.r.fr_gidx, st.r.fr_pair, st.r.fr_fh, st.r.fr_rh,
                    st.r.fr_words, st.r.fr_depth, st.r.fr_count)
    else:
        return None

    # one bulk pull at the end
    def pull_side(fz, n0):
        nb = min(_bucket(max(int(n0), 1)), fz.pair.shape[0])
        en = int(jax.device_get(fz.ge_n))
        eb = min(_bucket(max(en, 1)), fz.ge_c.shape[0])
        return PulledSide(
            np.asarray(fz.pair[:nb])[:int(n0)].astype(np.int64),
            np.asarray(fz.canon[:nb])[:int(n0)],
            np.asarray(fz.depth[:nb])[:int(n0)],
            np.asarray(fz.words[:nb])[:int(n0)],
            np.asarray(fz.ge_c[:eb])[:en].astype(np.int64),
            np.asarray(fz.ge_p[:eb])[:en].astype(np.int64))

    cost_h, fail_h, ncom_h, gm_n = jax.device_get(
        (cost, fail, ncom, gm[3]))
    F = pull_side(fz_f, jax.device_get(fz_f.n0))
    R = pull_side(fz_r, jax.device_get(fz_r.n0))
    cost_h = cost_h[:P].astype(np.int64)
    fail_h = fail_h[:P].astype(np.int8)
    ncom_h = ncom_h[:P].astype(np.int64)
    meets = []
    mn = int(gm_n)
    if mn:
        mb = min(_bucket(mn), GM)
        mp = np.asarray(gm[0][:mb])[:mn]
        mf = np.asarray(gm[1][:mb])[:mn]
        mr = np.asarray(gm[2][:mb])[:mn]
        ok = (mp >= 0) & (mp < P)
        for i, fi, ri in zip(mp[ok], mf[ok], mr[ok]):
            meets.append((int(i), int(fi), int(ri)))
    return F, R, cost_h, fail_h, meets, ncom_h
