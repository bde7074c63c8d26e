"""Batched unitig extension over a Bloom-filter de Bruijn graph.

TPU reformulation of the reference's per-read recursive walk
(/root/reference/Graph/ExtendPath.h): instead of one pointer-chasing
walk per thread, a whole *batch* of paths advances in lockstep.  Each
step probes the 4 right extensions and 4 left predecessors of every
active path head with O(1) incremental ntHash rolls and one fused
gather into the counting filter, then advances the unambiguous paths.

The reference's semantics are kept:

  * `successor()` doubling schedule (ExtendPath.h:346-383): at a fork,
    branches must survive a look-ahead of depth i = 0, 1, 2, 4, ... up
    to `trim`; exactly one survivor → continue, none → dead end,
    several at i == trim → ambiguous.
  * `lookBehind` (ExtendPath.h:404-447): a step also checks the
    *incoming* branches of the new head; an ambiguous or unexpected
    predecessor stops extension with AMBI_IN (tip reconnection check).
  * Bloom false-positive branches die within `fpTrim` steps and are
    eliminated by the look-ahead, like trueBranch (ExtendPath.h:174-247).
  * cycles terminate with CYCLE (ExtendPath.h:640-658); the batched
    engine detects return-to-seed on device and full cycles on host at
    chunk boundaries.

Branch look-aheads are data-dependent and rare, so they are *deferred*:
the fast lock-step loop marks paths NEED_F / NEED_B, the host compacts
the stuck minority, and a batched BFS (`branch_depths`) measures branch
depths width-capped at `lookahead_width`.  This is the
frontier-compaction pattern: the hot loop stays dense and static-shaped.

Differences from the reference (documented approximations):
  * trueBranch's direction-reversal rescue for short branches that
    reconnect (ExtendPath.h:206-236) is not modeled; a branch is true
    iff a path of the scheduled depth extends from it.  With a counting
    filter (kc >= 2) the affected X-patterns are rare.
  * The BFS frontier is width-capped; overflowing branches count as
    deep (conservative: prefers AMBI over wrong joins).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import alphabet
from ..ops import nthash
from ..ops.bloom import CountingBloomFilter

# path status codes (superset of PathExtensionResultCode, ExtendPath.h:47-57)
ACTIVE = 0
DEAD_END = 1
AMBI_IN = 2
AMBI_OUT = 3
CYCLE = 4
CHUNK_LIMIT = 5
NEED_B = 6  # >=2 raw predecessors: needs behind-branch resolution
NEED_F = 7  # >=2 raw successors: needs forward-branch resolution

STATUS_NAMES = {
    ACTIVE: "ACTIVE", DEAD_END: "DEAD_END", AMBI_IN: "AMBI_IN",
    AMBI_OUT: "AMBI_OUT", CYCLE: "CYCLE", CHUNK_LIMIT: "CHUNK_LIMIT",
    NEED_B: "NEED_B", NEED_F: "NEED_F",
}


def bucket_size(n: int, lo: int = 64) -> int:
    """Round up to a power of two (>= lo) so jitted kernels see a small,
    stable set of shapes instead of recompiling per batch size."""
    return max(lo, 1 << max(n - 1, 1).bit_length())


def walk_filter(cbf):
    """The solidity structure to probe INSIDE the walk loops.

    A SortedKmerFilter answers `contains` by searchsorted — fine for
    bulk batch queries, but per-iteration inside `lax.while_loop` it
    ran minutes per dispatch on the tunneled TPU (round-5 BENCH_NOTES);
    walks probe an exact open-addressing table of the solid keys
    instead (one [C, 8] gather per step).  Counting-Bloom filters
    probe their own bit arrays, already one-gather-per-step."""
    from ..ops import hash_probe as hp
    if hasattr(cbf, "kmers") and hasattr(cbf, "threshold"):
        return hp.ProbeSet(hp.solid_table(cbf))
    return cbf


def doubling_schedule(trim: int) -> list[int]:
    """successor()'s branch-depth schedule: 0, 1, 2, 4, ... trim
    (ExtendPath.h:355 `i = (i == 0) ? 1 : min(trim, 2*i)`)."""
    sched = [0]
    i = 0
    while i < trim:
        i = 1 if i == 0 else min(trim, 2 * i)
        sched.append(i)
    return sched


class ExtendState(NamedTuple):
    """Device state for a batch of paths being extended FORWARD."""

    buf: jax.Array      # uint8[P, BUF] base codes; bases [0, length) valid
    length: jax.Array   # int32[P] current path length in bases
    f: jax.Array        # uint64[P] forward hash of head k-mer
    r: jax.Array        # uint64[P] reverse hash of head k-mer
    status: jax.Array   # int8[P]
    seed_canon: jax.Array  # uint64[P] canonical hash of the original seed
    has_prev: jax.Array    # bool[P] whether buf[length-k-1] is meaningful


def init_state(seed_codes: np.ndarray, buf_len: int, k: int,
               prev_base: np.ndarray | None = None,
               seed_canon: np.ndarray | None = None) -> ExtendState:
    """Build extension state from [P, k] seed k-mers (+ optional previous
    base for warm restarts of chunked extensions).

    With a previous base, the seed occupies buf[1:k+1] and the behind
    check is armed from the first step.
    """
    P, kk = seed_codes.shape
    assert kk == k
    warm = prev_base is not None
    off = 1 if warm else 0
    buf = np.full((P, buf_len), alphabet.BAD, np.uint8)
    if warm:
        buf[:, 0] = prev_base
    buf[:, off:off + k] = seed_codes
    f, r = nthash.hash_base(jnp.asarray(seed_codes), k)
    canon = jnp.minimum(f, r)
    if seed_canon is None:
        seed_canon = canon
    return ExtendState(
        buf=jnp.asarray(buf),
        length=jnp.full(P, k + off, jnp.int32),
        f=f, r=r,
        status=jnp.zeros(P, jnp.int8),
        seed_canon=jnp.asarray(seed_canon, jnp.uint64),
        has_prev=jnp.full(P, warm, bool),
    )


def _candidate_hashes(st: ExtendState, k: int):
    """Hashes of the 4 forward and 4 backward neighbours of each head.

    Returns (fc, rc) uint64[P, 4] forward candidates, (fb, rb) for
    predecessors.
    """
    P = st.length.shape[0]
    rows = jnp.arange(P)
    c_out_f = st.buf[rows, st.length - k].astype(jnp.int32)   # base leaving
    c_out_b = st.buf[rows, st.length - 1].astype(jnp.int32)   # head last base
    bases = jnp.arange(4, dtype=jnp.int32)
    fc, rc = nthash.roll_right(st.f[:, None], st.r[:, None], k,
                               c_out_f[:, None], bases[None, :])
    fb, rb = nthash.roll_left(st.f[:, None], st.r[:, None], k,
                              c_out_b[:, None], bases[None, :])
    return fc, rc, fb, rb


@partial(jax.jit, static_argnums=(2, 3))
def fast_extend(cbf: CountingBloomFilter, st: ExtendState, k: int,
                max_steps: int) -> ExtendState:
    """Advance all unambiguous paths up to max_steps bases.

    Each step mirrors extendPathBySingleVertex (ExtendPath.h:404-461):
    behind check first (AMBI_IN), then forward successor; paths with >=2
    raw candidate branches in either direction stop with NEED_B/NEED_F
    for the host-side resolution pass.

    The loop is a `lax.while_loop` with a data-dependent cond: a
    constant-trip `lax.scan` here was UNROLLED by this platform's
    compiler (one T=512 program compiled >45 min locally — round-5
    BENCH_NOTES), and the dynamic cond also exits early when every
    lane is terminal.  The carried [P, BUF] buffer costs a copy per
    step (~50 ns/KB), so callers keep P tight via lane compaction
    (extend_forward) — the chunk ladder grows BUF only as surviving
    lanes shrink."""
    P, BUF = st.buf.shape

    def step(carry):
        st, n = carry
        active = st.status == ACTIVE
        fc, rc, fb, rb = _candidate_hashes(st, k)
        canon_f = jnp.minimum(fc, rc)
        canon_b = jnp.minimum(fb, rb)
        both = jnp.concatenate([canon_f, canon_b], axis=1)  # [P, 8]
        solid = cbf.contains(both)
        solid_f = solid[:, :4]
        solid_b = solid[:, 4:]
        n_fwd = jnp.sum(solid_f, axis=1)
        n_back = jnp.sum(solid_b, axis=1)

        need_b = st.has_prev & (n_back >= 2)
        dead = n_fwd == 0
        need_f = n_fwd >= 2

        base = jnp.argmax(solid_f, axis=1).astype(jnp.uint8)
        new_f = jnp.take_along_axis(fc, base[:, None].astype(jnp.int32),
                                    axis=1)[:, 0]
        new_r = jnp.take_along_axis(rc, base[:, None].astype(jnp.int32),
                                    axis=1)[:, 0]
        new_canon = jnp.minimum(new_f, new_r)
        cycle = new_canon == st.seed_canon
        room = st.length < BUF

        advance = active & ~need_b & ~dead & ~need_f & ~cycle & room

        new_status = jnp.where(
            active,
            jnp.where(need_b, NEED_B,
                      jnp.where(dead, DEAD_END,
                                jnp.where(need_f, NEED_F,
                                          jnp.where(cycle, CYCLE,
                                                    jnp.where(room, ACTIVE,
                                                              CHUNK_LIMIT))))),
            st.status).astype(jnp.int8)

        rows = jnp.arange(P)
        wpos = jnp.where(advance, st.length, BUF)  # BUF -> dropped
        buf = st.buf.at[rows, wpos].set(base, mode="drop")
        st = st._replace(
            buf=buf,
            length=jnp.where(advance, st.length + 1, st.length),
            f=jnp.where(advance, new_f, st.f),
            r=jnp.where(advance, new_r, st.r),
            status=new_status,
            has_prev=st.has_prev | advance,
        )
        return st, n + 1

    def cond(carry):
        st, n = carry
        return (n < max_steps) & jnp.any(st.status == ACTIVE)

    st, _ = jax.lax.while_loop(cond, step, (st, jnp.int32(0)))
    return st


@partial(jax.jit, static_argnums=(3, 4, 5))
def branch_depths(cbf: CountingBloomFilter, root_codes, root_hashes,
                  k: int, max_depth: int, width: int):
    """Max reachable FORWARD depth from each root k-mer, capped at max_depth.

    Batched BFS with a width-capped frontier; the vectorized analogue of
    lookAhead/trueBranch's DFS (ExtendPath.h:96-160).  Roots whose k-mer
    is not itself solid still report depth 0.

    Args:
      root_codes: uint8[N, k] root k-mer codes.
      root_hashes: (f, r) uint64[N] of the roots.
      max_depth, width: static caps.

    Returns:
      int32[N] depth: number of extension steps achievable (0..max_depth).
    """
    f0, r0 = root_hashes
    N = f0.shape[0]
    W = width
    # frontier state: codes [N, W, k], hashes [N, W], alive [N, W]
    codes = jnp.broadcast_to(root_codes[:, None, :], (N, W, k)).astype(jnp.uint8)
    f = jnp.broadcast_to(f0[:, None], (N, W))
    r = jnp.broadcast_to(r0[:, None], (N, W))
    alive = jnp.zeros((N, W), bool).at[:, 0].set(True)

    def step(carry, _):
        codes, f, r, alive, depth = carry
        bases = jnp.arange(4, dtype=jnp.int32)
        c_out = codes[:, :, 0].astype(jnp.int32)
        fc, rc = nthash.roll_right(f[..., None], r[..., None], k,
                                   c_out[..., None], bases[None, None, :])
        canon = jnp.minimum(fc, rc)  # [N, W, 4]
        solid = cbf.contains(canon) & alive[..., None]
        # children: [N, W*4]
        child_f = fc.reshape(N, W * 4)
        child_r = rc.reshape(N, W * 4)
        child_alive = solid.reshape(N, W * 4)
        child_codes = jnp.concatenate(
            [jnp.broadcast_to(codes[:, :, None, 1:], (N, W, 4, k - 1)),
             jnp.broadcast_to(
                 jnp.arange(4, dtype=jnp.uint8)[None, None, :, None],
                 (N, W, 4, 1))],
            axis=-1).reshape(N, W * 4, k)
        # compact: take up to W live children (stable order)
        order = jnp.argsort(~child_alive, axis=1, stable=True)[:, :W]
        take = lambda a: jnp.take_along_axis(
            a, order.reshape(N, W, *([1] * (a.ndim - 2))), axis=1)
        new_codes = jnp.take_along_axis(child_codes, order[..., None], axis=1)
        new_f = jnp.take_along_axis(child_f, order, axis=1)
        new_r = jnp.take_along_axis(child_r, order, axis=1)
        new_alive = jnp.take_along_axis(child_alive, order, axis=1)
        any_alive = jnp.any(new_alive, axis=1)
        depth = depth + any_alive.astype(jnp.int32)
        # freeze dead lanes so depth stops increasing
        return (new_codes, new_f, new_r, new_alive, depth), None

    init = (codes, f, r, alive, jnp.zeros(N, jnp.int32))
    (codes, f, r, alive, depth), _ = jax.lax.scan(
        step, init, None, length=max_depth)
    return depth


def successor_decision(depths: np.ndarray, present: np.ndarray, trim: int,
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized successor() doubling-schedule decision (host side).

    Args:
      depths: int[N, 4] branch depth per base (only meaningful where present).
      present: bool[N, 4] branch exists in the filter.
      trim: trim length.

    Returns:
      (code, base): code int[N] in {DEAD_END, ACTIVE, AMBI_OUT} where
      ACTIVE means a unique branch won; base int[N] the winning base.
    """
    N = depths.shape[0]
    d = np.where(present, depths, -1)
    code = np.full(N, AMBI_OUT, np.int8)
    base = np.zeros(N, np.int64)
    decided = np.zeros(N, bool)
    for i in doubling_schedule(trim):
        cnt = (d >= i).sum(axis=1)
        is_dead = ~decided & (cnt == 0)
        code[is_dead] = DEAD_END
        decided |= is_dead
        is_one = ~decided & (cnt == 1)
        base[is_one] = np.argmax(d[is_one] >= i, axis=1)
        code[is_one] = ACTIVE
        decided |= is_one
    return code, base


class _StuckView(NamedTuple):
    idx: np.ndarray          # indices of stuck paths in the batch
    head: np.ndarray         # uint8[M, k] head k-mer codes
    prev_base: np.ndarray    # int[M] expected predecessor base (buf[len-k-1])
    f: np.ndarray
    r: np.ndarray


@partial(jax.jit, static_argnums=(1,))
def _stuck_heads(buf, k: int, length):
    """Device gathers of each path's trailing k-mer + preceding base
    (pulling the whole [P, BUF] buffer to host per resolution cost the
    round-5 bloom pass 2 ~8 MB of tunnel traffic each way per resolve)."""
    BUF = buf.shape[1]
    start = jnp.maximum(length - k, 0)
    head = jnp.take_along_axis(
        buf, jnp.clip(start[:, None] + jnp.arange(k)[None, :], 0,
                      BUF - 1), axis=1)
    prev_idx = length - k - 1
    prev_val = jnp.take_along_axis(
        buf, jnp.clip(prev_idx, 0, BUF - 1)[:, None], axis=1)[:, 0]
    prev = jnp.where(prev_idx >= 0, prev_val, 0)
    return head, prev


def _gather_stuck(st: ExtendState, k: int, which: int,
                  heads_np, prev_np, status_np) -> _StuckView:
    idx = np.nonzero(status_np == which)[0]
    return _StuckView(idx, heads_np[idx], prev_np[idx].astype(np.int64),
                      None, None)


def _branch_info(cbf, roots: np.ndarray, k: int, trim: int, width: int,
                 M: int, return_hashes: bool = False):
    """Presence + look-ahead depth for [M*4, k] branch-root k-mers,
    padded to a power-of-two batch so kernels don't recompile."""
    N = roots.shape[0]
    NP_ = bucket_size(N)
    padded = np.zeros((NP_, k), np.uint8)
    padded[:N] = roots
    rf, rr = nthash.hash_base(jnp.asarray(padded), k)
    canon = jnp.minimum(rf, rr)
    present = np.asarray(cbf.contains(canon))[:N].reshape(M, 4)
    depths = np.asarray(branch_depths(
        cbf, jnp.asarray(padded), (rf, rr), k, trim, width))[:N].reshape(M, 4)
    if return_hashes:
        rfm = np.asarray(rf)[:N].reshape(M, 4)
        rrm = np.asarray(rr)[:N].reshape(M, 4)
        return present, depths, (rfm, rrm)
    return present, depths


@jax.jit
def _apply_resolution(buf, length, f, r, status_new, idx, base, nf, nr):
    """One scatter applying the forward-resolution advances: lane idx
    appends `base` at its current length and reactivates (pad rows
    carry idx == P and are dropped)."""
    P, BUF = buf.shape
    idx_c = jnp.clip(idx, 0, P - 1)
    wpos = jnp.where(idx < P, jnp.take(length, idx_c), BUF)
    buf = buf.at[jnp.where(idx < P, idx, P), wpos].set(base, mode="drop")
    oob = jnp.where(idx < P, idx, P)
    length = length.at[oob].add(1, mode="drop")
    f = f.at[oob].set(nf, mode="drop")
    r = r.at[oob].set(nr, mode="drop")
    return buf, length, f, r, status_new


def _resolve(cbf: CountingBloomFilter, st: ExtendState, k: int, trim: int,
             width: int) -> ExtendState:
    """Resolve NEED_B / NEED_F paths with batched branch look-aheads.

    Outcomes: behind-ambiguous paths stop AMBI_IN; forward forks either
    pick a unique true branch (path advances one base and reactivates),
    die (DEAD_END), or stop AMBI_OUT.  Only the [P, k] head windows and
    small per-lane arrays cross to the host; buffer updates are one
    device scatter."""
    status = np.asarray(st.status).copy()
    length = np.asarray(st.length)
    heads_d, prev_d = _stuck_heads(st.buf, k, st.length)
    heads_np = np.asarray(heads_d)
    prev_np = np.asarray(prev_d)

    # ---- behind resolution -------------------------------------------------
    sb = _gather_stuck(st, k, NEED_B, heads_np, prev_np, status)
    if len(sb.idx):
        # predecessor candidates: base c + head[:-1]; evaluated by REVERSE
        # depth == FORWARD depth of the reverse complement k-mer.
        M = len(sb.idx)
        roots = np.zeros((M * 4, k), np.uint8)
        for c in range(4):
            pred = np.concatenate(
                [np.full((M, 1), c, np.uint8), sb.head[:, :-1]], axis=1)
            roots[c::4] = alphabet.revcomp_codes(pred)
        present, depths = _branch_info(cbf, roots, k, trim, width, M)
        code, base = successor_decision(depths, present, trim)
        ok = (code == ACTIVE) & (base == sb.prev_base)
        status[sb.idx[ok]] = NEED_F          # behind fine; forward still due
        status[sb.idx[~ok]] = AMBI_IN

    # ---- forward resolution ------------------------------------------------
    sf = _gather_stuck(st, k, NEED_F, heads_np, prev_np, status)
    adv_idx: list[int] = []
    adv_base: list[int] = []
    adv_f: list[int] = []
    adv_r: list[int] = []
    if len(sf.idx):
        M = len(sf.idx)
        roots = np.zeros((M * 4, k), np.uint8)
        for c in range(4):
            roots[c::4] = np.concatenate(
                [sf.head[:, 1:], np.full((M, 1), c, np.uint8)], axis=1)
        present, depths, (rfm, rrm) = _branch_info(
            cbf, roots, k, trim, width, M, return_hashes=True)
        code, base = successor_decision(depths, present, trim)
        seed_canon = np.asarray(st.seed_canon)[sf.idx]
        BUF = st.buf.shape[1]
        for j in range(M):
            i = sf.idx[j]
            if code[j] == ACTIVE:
                b = int(base[j])
                ncanon = min(rfm[j, b], rrm[j, b])
                if ncanon == seed_canon[j]:
                    status[i] = CYCLE
                elif length[i] >= BUF:
                    status[i] = CHUNK_LIMIT
                else:
                    adv_idx.append(int(i))
                    adv_base.append(b)
                    adv_f.append(rfm[j, b])
                    adv_r.append(rrm[j, b])
                    status[i] = ACTIVE
            else:
                status[i] = code[j]

    P = st.buf.shape[0]
    nb = bucket_size(max(len(adv_idx), 1), lo=8)
    idx_p = np.full(nb, P, np.int64)
    base_p = np.zeros(nb, np.uint8)
    f_p = np.zeros(nb, np.uint64)
    r_p = np.zeros(nb, np.uint64)
    if adv_idx:
        idx_p[:len(adv_idx)] = adv_idx
        base_p[:len(adv_idx)] = adv_base
        f_p[:len(adv_idx)] = adv_f
        r_p[:len(adv_idx)] = adv_r
    buf, length_d, f_d, r_d, status_d = _apply_resolution(
        st.buf, st.length, st.f, st.r, jnp.asarray(status),
        jnp.asarray(idx_p), jnp.asarray(base_p), jnp.asarray(f_p),
        jnp.asarray(r_p))
    return ExtendState(
        buf=buf, length=length_d, f=f_d, r=r_d, status=status_d,
        seed_canon=st.seed_canon, has_prev=st.has_prev)


def _first_revisit(canon: np.ndarray) -> int:
    """Window index of the first k-mer whose canonical hash was already
    seen at an earlier window; -1 if all distinct.

    The host-side analogue of the visited-set cycle stop
    (ExtendPath.h:648-658), made independent of the chunk size: with
    large device chunks a small cycle can wrap many times before the
    host looks, so the path must be truncated at the FIRST revisit, not
    merely popped by one vertex.  Uses 64-bit canonical ntHash values
    (collision odds ~L^2/2^64 per path — negligible for a Bloom-mode
    engine that is itself probabilistic)."""
    L = len(canon)
    if L < 2:
        return -1
    order = np.argsort(canon, kind="stable")
    s = canon[order]
    dup = s[1:] == s[:-1]
    if not dup.any():
        return -1
    return int(order[1:][dup].min())


def extend_forward(cbf: CountingBloomFilter, seed_codes: np.ndarray,
                   k: int, trim: int, width: int = 16, chunk: int = 512,
                   max_len: int = 1 << 22, prev_base=None,
                   chunk_max: int = 1 << 15,
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extend [P, k] seeds FORWARD to their unitig ends.

    The per-dispatch step budget DOUBLES at every warm restart (chunk →
    chunk_max): long unitig walks are inherently serial, and on a
    tunneled TPU each dispatch pays a ~35-60 ms round trip, so a 1 Mb
    walk at a fixed 512-step chunk is ~2000 round trips (the round-4
    genome-scale Bloom DNF, BENCH_NOTES).  Doubling bounds the dispatch
    count at O(L/chunk_max + log(chunk_max/chunk)) while short walks
    never allocate the big buffers.

    Returns (bufs uint8[P, L*], lengths int32[P], status int8[P]) where
    status is one of DEAD_END / AMBI_IN / AMBI_OUT / CYCLE / CHUNK_LIMIT.
    """
    P0 = seed_codes.shape[0]
    P = bucket_size(P0, lo=8)
    seeds_p = np.zeros((P, k), np.uint8)
    seeds_p[:P0] = seed_codes
    prev_p = None
    if prev_base is not None:
        prev_p = np.zeros(P, np.uint8)
        prev_p[:P0] = prev_base
    warm0 = prev_base is not None
    st = init_state(seeds_p, k + (1 if warm0 else 0) + chunk, k,
                    prev_base=prev_p)
    if P > P0:  # pad rows are inert
        s = np.asarray(st.status).copy()
        s[P0:] = DEAD_END
        st = st._replace(status=jnp.asarray(s))
    out_bufs = None
    cur_chunk = chunk
    # lane_map[j] = output row of state row j; pad rows map to -1.
    # Warm restarts COMPACT to the continuing lanes: the carried
    # [P, BUF] buffer costs a copy per step, and long walks leave few
    # survivors — the ladder grows BUF exactly as P shrinks.
    lane_map = np.full(P, -1, np.int64)
    lane_map[:P0] = np.arange(P0)
    while True:
        st = fast_extend(cbf, st, k, cur_chunk)
        status = np.asarray(st.status)
        if ((status == NEED_B) | (status == NEED_F)).any():
            st = _resolve(cbf, st, k, trim, width)
            status = np.asarray(st.status)
        if (status == ACTIVE).any():
            continue
        # all terminal for this chunk: stitch into the running contigs
        buf = np.asarray(st.buf)
        length = np.asarray(st.length)
        if out_bufs is None:
            out_bufs, out_len, out_status = \
                buf[:P0].copy(), length[:P0].copy(), status[:P0].copy()
        else:
            skip = k + 1  # continuation chunks start with [prev_base + seed]
            grow = buf.shape[1] - skip
            new = np.full((P0, out_bufs.shape[1] + grow), alphabet.BAD,
                          np.uint8)
            new[:, :out_bufs.shape[1]] = out_bufs
            for j in range(buf.shape[0]):
                i = lane_map[j]
                if i < 0 or out_status[i] != CHUNK_LIMIT:
                    continue
                n_ext = length[j] - skip  # bases beyond warm seed
                if n_ext > 0:
                    new[i, out_len[i]:out_len[i] + n_ext] = \
                        buf[j, skip:length[j]]
                    out_len[i] += n_ext
                out_status[i] = status[j]
            out_bufs = new
        # exact cross-chunk cycle detection on paths that are still
        # going: one joined device hash call for all of them, truncating
        # each at its first revisited vertex (reference visited-set stop)
        going = np.nonzero(out_status == CHUNK_LIMIT)[0]
        if len(going):
            sep = np.full(1, alphabet.BAD, np.uint8)
            joined = np.concatenate(
                [x for i in going
                 for x in (out_bufs[i, :out_len[i]], sep)])
            _, _, canon, _ = nthash.kmer_hashes_padded(joined, k)
            canon = np.asarray(canon)
            pos = 0
            for i in going:
                L = int(out_len[i])
                r = _first_revisit(canon[pos:pos + L - k + 1])
                if r >= 0:
                    out_status[i] = CYCLE
                    out_len[i] = r + k - 1
                pos += L + 1
        if not (out_status == CHUNK_LIMIT).any() or \
                out_bufs.shape[1] >= max_len:
            break
        # warm restart for the surviving lanes only, doubled budget
        cur_chunk = min(cur_chunk * 2, chunk_max)
        cont = np.nonzero(out_status == CHUNK_LIMIT)[0]
        Pc = bucket_size(len(cont), lo=8)
        lane_map = np.full(Pc, -1, np.int64)
        lane_map[:len(cont)] = cont
        seeds = np.zeros((Pc, k), np.uint8)
        prevb = np.zeros(Pc, np.uint8)
        for j, i in enumerate(cont):
            L = out_len[i]
            seeds[j] = out_bufs[i, L - k:L]
            prevb[j] = out_bufs[i, L - k - 1] if L > k else 0
        st = init_state(seeds, k + 1 + cur_chunk, k, prev_base=prevb)
        if Pc > len(cont):  # pad rows are inert
            s = np.asarray(st.status).copy()
            s[len(cont):] = DEAD_END
            st = st._replace(status=jnp.asarray(s))
    return out_bufs, out_len, out_status


def lookahead_ok(cbf: CountingBloomFilter, root_codes, k: int, depth: int,
                 width: int = 8) -> np.ndarray:
    """True where a path of `depth` steps extends FORWARD from the root
    (lookAhead, ExtendPath.h:146-161)."""
    root_codes = np.asarray(root_codes, np.uint8)
    N = root_codes.shape[0]
    NP_ = bucket_size(N)
    padded = np.zeros((NP_, k), np.uint8)
    padded[:N] = root_codes
    rf, rr = nthash.hash_base(jnp.asarray(padded), k)
    d = branch_depths(cbf, jnp.asarray(padded), (rf, rr), k, depth, width)
    return np.asarray(d)[:N] >= depth
