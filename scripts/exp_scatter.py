"""Experiment: counting-Bloom counter update formulations on TPU.

The conservative counting-Bloom insert is gather+scatter-max bound
(VERDICT round 1 weak #1).  Measures candidate formulations of the two
primitives over a 2^24-counter u8 filter:

  gather  cur = counters[idx]                 (H random reads / k-mer)
  scatter counters[idx] = max(counters[idx],v) (H random writes / k-mer)

Variants:
  A. raw .at[].max / [] take            (round-1 baseline, ~11.5M kmers/s)
  B. pre-sorted + RLE'd unique indices, scatter with
     indices_are_sorted=True, unique_indices=True (XLA fast-path hints)
  C. sorted but NOT uniqued, hints only on sortedness
  D. gather with sorted hint
Run on the real chip: python scripts/exp_scatter.py
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

sys.setrecursionlimit(100_000)

import numpy as np

import abyss_tpu  # noqa: F401
import jax
import jax.numpy as jnp

S = int(os.environ.get("EXP_SIZE", 1 << 24))          # counters
Q = int(os.environ.get("EXP_Q", 3_700_000))           # updates per batch
ITERS = int(os.environ.get("EXP_ITERS", 6))


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0:1])


def _timed(fn, reps=3):
    _sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]


def _loop_rate(mk_loop, n=ITERS):
    t1 = _timed(mk_loop(1))
    tn = _timed(mk_loop(n))
    return max((tn - t1) / (n - 1), 1e-9)


def report(name, t):
    print(f"{name:44s} {Q / t / 1e6:10.1f} M updates/s   ({t*1e3:.2f} ms)")


def main():
    rng = np.random.default_rng(0)
    idx0 = jax.device_put(rng.integers(0, S, size=Q, dtype=np.int32))
    val0 = jax.device_put(rng.integers(1, 250, size=Q, dtype=np.uint8))
    counters = jax.device_put(np.zeros(S + 1, dtype=np.uint8))

    def perturb(i, idx):
        return jnp.bitwise_and(idx + i, jnp.int32(S - 1))

    # -- A: raw scatter-max -------------------------------------------------
    def mk_a(n):
        @jax.jit
        def f(c, idx, val):
            def body(i, c):
                return c.at[perturb(i, idx)].max(val, mode="drop")
            return jax.lax.fori_loop(0, n, body, c)
        return lambda: f(counters, idx0, val0)
    report("A raw scatter-max", _loop_rate(mk_a))

    # -- B: sort + RLE-unique + hinted scatter ------------------------------
    def mk_b(n):
        @jax.jit
        def f(c, idx, val):
            def body(i, c):
                ii = perturb(i, idx)
                ck = (ii.astype(jnp.uint32) << 8) | val.astype(jnp.uint32)
                ck = jnp.sort(ck)
                ui = (ck >> 8).astype(jnp.int32)
                uv = (ck & 0xFF).astype(jnp.uint8)
                # last of each run has max val; mark others to sink
                is_last = jnp.concatenate(
                    [ui[1:] != ui[:-1], jnp.ones((1,), bool)])
                ui = jnp.where(is_last, ui, jnp.int32(S))
                return c.at[ui].max(uv, mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=False)
            return jax.lax.fori_loop(0, n, body, c)
        return lambda: f(counters, idx0, val0)
    report("B sort+RLE, sorted-hint scatter", _loop_rate(mk_b))

    # -- B2: same but also unique hint (sink dup is a lie only for sink) ----
    def mk_b2(n):
        @jax.jit
        def f(c, idx, val):
            def body(i, c):
                ii = perturb(i, idx)
                ck = (ii.astype(jnp.uint32) << 8) | val.astype(jnp.uint32)
                ck = jnp.sort(ck)
                ui = (ck >> 8).astype(jnp.int32)
                uv = (ck & 0xFF).astype(jnp.uint8)
                is_last = jnp.concatenate(
                    [ui[1:] != ui[:-1], jnp.ones((1,), bool)])
                # make sinks distinct-ish is impossible; accept repeated S
                ui = jnp.where(is_last, ui, jnp.int32(S))
                return c.at[ui].max(uv, mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=True)
            return jax.lax.fori_loop(0, n, body, c)
        return lambda: f(counters, idx0, val0)
    report("B2 sort+RLE, sorted+unique-hint scatter", _loop_rate(mk_b2))

    # -- C: sorted-only hinted scatter (no RLE) -----------------------------
    def mk_c(n):
        @jax.jit
        def f(c, idx, val):
            def body(i, c):
                ii = jnp.sort(perturb(i, idx))
                return c.at[ii].max(val, mode="drop",
                                    indices_are_sorted=True)
            return jax.lax.fori_loop(0, n, body, c)
        return lambda: f(counters, idx0, val0)
    report("C sorted-only hinted scatter", _loop_rate(mk_c))

    # -- D: gathers ---------------------------------------------------------
    def mk_d(n):
        @jax.jit
        def f(c, idx):
            def body(i, acc):
                g = c[perturb(i, idx)]
                return acc + g.astype(jnp.int32).sum(dtype=jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return lambda: f(counters, idx0)
    report("D raw gather", _loop_rate(mk_d))

    def mk_d2(n):
        @jax.jit
        def f(c, idx):
            def body(i, acc):
                ii = jnp.sort(perturb(i, idx))
                g = jnp.take(c, ii, indices_are_sorted=True)
                return acc + g.astype(jnp.int32).sum(dtype=jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return lambda: f(counters, idx0)
    report("D2 sorted hinted gather", _loop_rate(mk_d2))

    # -- profile the real insert's stages at bloom-bench shapes ---------
    from abyss_tpu.ops import nthash
    from abyss_tpu.ops.bloom import CountingBloomFilter, _sorted_run_lengths
    NK = Q // 4  # k-mers; H=4 indices each
    canon0 = jax.device_put(
        rng.integers(0, 2**63, size=NK, dtype=np.uint64))
    filt = CountingBloomFilter.create(S, 25, 4, 2)

    def mk_h(n):
        @jax.jit
        def f(canon):
            def body(i, acc):
                c = canon ^ jnp.uint64(i)
                hs = nthash.multi_hashes(c, 25, 4)
                return acc ^ hs[0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.uint64(0))
        return lambda: f(canon0)
    t = _loop_rate(mk_h)
    print(f"multi_hashes H=4: {NK/t/1e6:10.1f} M kmers/s ({t*1e3:.2f} ms)")

    def mk_r(n):
        @jax.jit
        def f(canon):
            def body(i, acc):
                c = canon ^ jnp.uint64(i)
                s_, rl, v = _sorted_run_lengths(c, None)
                return acc ^ s_[0] ^ jnp.uint64(rl[1])
            return jax.lax.fori_loop(0, n, body, jnp.uint64(0))
        return lambda: f(canon0)
    t = _loop_rate(mk_r)
    print(f"sort+RLE pre-pass: {NK/t/1e6:10.1f} M kmers/s ({t*1e3:.2f} ms)")

    def mk_i(n):
        @jax.jit
        def f(filt, canon):
            def body(i, fi):
                return fi.insert(canon ^ jnp.uint64(i))
            return jax.lax.fori_loop(0, n, body, filt)
        return lambda: f(filt, canon0)
    t = _loop_rate(mk_i)
    print(f"full insert H=4: {NK/t/1e6:10.1f} M kmers/s ({t*1e3:.2f} ms)")


def main_pallas():
    """Pallas binned scatter/gather (ops/pallas_scatter.py) on-chip."""
    from abyss_tpu.ops import pallas_scatter as ps
    rng = np.random.default_rng(0)
    idx0 = jax.device_put(rng.integers(0, S, size=Q, dtype=np.int32))
    val0 = jax.device_put(rng.integers(1, 250, size=Q, dtype=np.uint8))
    counters = jax.device_put(np.zeros(S + 1, dtype=np.uint8))

    def perturb(i, idx):
        return jnp.bitwise_and(idx + i, jnp.int32(S - 1))

    def mk_e(n):
        @jax.jit
        def f(c, idx, val):
            def body(i, c):
                new, _ = ps.scatter_max_u8_pallas(
                    c, perturb(i, idx), val)
                return new
            return jax.lax.fori_loop(0, n, body, c)
        return lambda: f(counters, idx0, val0)
    report("E pallas binned scatter-max (incl sort)", _loop_rate(mk_e))

    if hasattr(ps, "gather_u8_pallas"):
        def mk_f(n):
            @jax.jit
            def f(c, idx):
                def body(i, acc):
                    g, _ = ps.gather_u8_pallas(c, perturb(i, idx))
                    return acc + g.astype(jnp.int32).sum(dtype=jnp.int32)
                return jax.lax.fori_loop(0, n, body, jnp.int32(0))
            return lambda: f(counters, idx0)
        report("F pallas binned gather (incl sort+unsort)", _loop_rate(mk_f))
    else:
        print("F pallas binned gather: skipped (gather_u8_pallas not "
              "implemented)")

    # correctness on hardware
    new, ok = ps.scatter_max_u8_pallas(counters, idx0, val0)
    ref = np.zeros(S + 1, np.uint8)
    i_np, v_np = np.asarray(idx0), np.asarray(val0)
    np.maximum.at(ref, i_np, v_np)
    print("hw scatter ok:", bool(ok), "match:",
          np.array_equal(np.asarray(new)[:S], ref[:S]))


if __name__ == "__main__":
    if "--pallas-only" in sys.argv:
        main_pallas()
    else:
        main()
