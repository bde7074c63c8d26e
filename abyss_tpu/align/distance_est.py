"""Distance estimation between contig pairs by maximum likelihood.

Reimplements /root/reference/DistanceEst/{DistanceEst.cpp,MLE.cpp} and
Common/PMF.h: the empirical fragment-size PMF from the .hist file, the
trapezoid window correcting for length-biased fragment sampling
(MLE.cpp:15-37), the per-theta normalization constant, and the Hann
smoothing filter over the likelihood curve (MLE.cpp:120-155).

Round-4 (verdict #6): the theta scan is DEVICE-BATCHED across contig
pairs — groups are bucketed by (sample count, theta range) into padded
[G, T, n] tensors, the per-theta window normalization c(theta) is
computed in O(1) per theta from pmf prefix sums (the trapezoid is
piecewise linear, so each segment is a cumsum difference), and the
Hann smoothing + masked argmax run as one jitted program per bucket
shape.  The host per-group path (`maximum_likelihood_estimate`) is
kept as the reference formulation and for oversized groups; both
produce identical (d, n) — tested.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..core.histogram import Histogram
from .fixmate import PairLink


@dataclass
class PMF:
    probs: np.ndarray
    minp: float
    mean: float
    sd: float

    @staticmethod
    def from_histogram(h: Histogram) -> "PMF":
        n = h.size()
        maxv = h.maximum()
        probs = np.full(maxv + 1, 1.0 / n)
        for k, v in h.counts.items():
            if 0 <= k <= maxv and v > 0:
                probs[k] = v / n
        mean = h.sum() / n
        var = sum(v * (k - mean) ** 2 for k, v in h.counts.items()) / n
        return PMF(probs=probs, minp=1.0 / n, mean=mean, sd=math.sqrt(var))

    @property
    def median(self) -> float:
        """Population median of the fragment-size distribution."""
        c = np.cumsum(self.probs)
        total = c[-1] if len(c) else 0.0
        if total <= 0:
            return self.mean
        return float(np.searchsorted(c, total / 2.0))

    def __getitem__(self, x):
        x = np.asarray(x)
        out = np.where((x >= 0) & (x < len(self.probs)),
                       self.probs[np.clip(x, 0, len(self.probs) - 1)],
                       self.minp)
        return out


def window_fn(x: np.ndarray, len0: int, len1: int) -> np.ndarray:
    """Trapezoid window (MLE.cpp:15-37): fragments spanning a junction are
    length-biased; len0 <= len1."""
    x1, x2, x3 = len0, len1, len0 + len1
    return np.where(
        x <= 0, 1.0,
        np.where(x < x1, x,
                 np.where(x < x2, x1,
                          np.where(x < x3, x3 - x, 1.0)))) / x1


def _hann(size: int) -> np.ndarray:
    i = np.arange(size)
    w = 0.5 * (1 - np.cos(2 * np.pi * i / (size - 1)))
    return w / w.sum()


def maximum_likelihood_estimate(
        samples: list[int], pmf: PMF, len0: int, len1: int,
        first: int, last: int, min_align: int = 32, rf: bool = False,
        ) -> tuple[int, int]:
    """Most likely distance and supporting-pair count (MLE.cpp:98-212).

    samples: observed span-without-gap values; the estimate d maximizes
    the likelihood of fragment sizes (sample + d).
    """
    assert samples
    l = min_align
    len0 = max(len0 - (l - 1), 1)
    len1 = max(len1 - (l - 1), 1)
    if len0 > len1:
        len0, len1 = len1, len0

    adjust = 0 if rf else 2 * (l - 1)
    s = np.asarray(samples) - adjust

    filter_size = 2 * int(0.05 * pmf.mean) + 3
    lo = max(first, -int(s.max())) - filter_size // 2
    hi = min(last, len(pmf.probs) - 1 - int(s.min())) + filter_size // 2 + 1
    if hi <= lo:
        lo, hi = first, first + filter_size + 1
    thetas = np.arange(lo, hi + 1)

    # per-theta normalization: c(theta) = sum_i pmf[i] * window(i - theta)
    i = np.arange(len(pmf.probs))
    w = window_fn(i[None, :] - thetas[:, None], len0, len1)
    c = (pmf.probs[None, :] * w).sum(axis=1)

    p = pmf[s[None, :] + thetas[:, None]]  # [T, n]
    ll = np.log(p).sum(axis=1)
    nsup = (p > pmf.minp).sum(axis=1)
    ll = ll - len(s) * np.log(np.maximum(c, 1e-300))

    filt = _hann(filter_size)
    half = filter_size // 2
    if len(ll) <= filter_size:
        best = int(np.argmax(ll))
        d, n = int(thetas[best]), int(nsup[best])
    else:
        sm = np.convolve(ll, filt, mode="valid")  # length T - 2*half
        cand_n = nsup[half:len(ll) - half]
        sm = np.where(cand_n > 0, sm, -np.inf)
        best = int(np.argmax(sm))
        d, n = int(thetas[best + half]), int(cand_n[best])
    if not rf:
        d = max(first, d - adjust)
    return d, n


def _theta_bounds(s_min, s_max, pmf_len, pmf_mean, first, last):
    """lo/hi/filter geometry shared by the host and batched paths
    (maximum_likelihood_estimate:96-101)."""
    filter_size = 2 * int(0.05 * pmf_mean) + 3
    lo = np.maximum(first, -s_max) - filter_size // 2
    hi = np.minimum(last, pmf_len - 1 - s_min) + filter_size // 2 + 1
    bad = hi <= lo
    lo = np.where(bad, first, lo)
    hi = np.where(bad, first + filter_size + 1, hi)
    return lo, hi, filter_size


def _make_mle_kernel(pmf: PMF, filter_size: int, T: int, n: int):
    """One jitted program per (T, n) bucket shape: the [G, T, n] theta
    scan, prefix-sum window normalization, Hann smoothing, masked
    argmax."""
    import jax
    import jax.numpy as jnp

    # float64 throughout: the host reference path accumulates in
    # float64, and the path taken depends only on group count — a
    # precision split would let near-tie argmaxes differ between
    # workload sizes (round-4 advisor #4)
    probs = jnp.asarray(pmf.probs, jnp.float64)
    I = probs.shape[0]
    logp_tab = jnp.log(probs)
    log_minp = float(np.log(pmf.minp))
    # prefix sums for the trapezoid window closed form: P0[j] =
    # sum_{i<=j} pmf[i], P1[j] = sum_{i<=j} i*pmf[i]; index -1 -> 0
    P0 = jnp.concatenate([jnp.zeros(1, jnp.float64), jnp.cumsum(probs)])
    P1 = jnp.concatenate([jnp.zeros(1, jnp.float64), jnp.cumsum(
        probs * jnp.arange(I, dtype=jnp.float64))])
    filt_np = _hann(filter_size)
    half = filter_size // 2

    def p0(j):
        return P0[jnp.clip(j + 1, 0, I)]

    def p1(j):
        return P1[jnp.clip(j + 1, 0, I)]

    @jax.jit
    def kernel(s, smask, lo, tcount, x1, x2, x3):
        """s, smask: [G, n]; lo/tcount/x1/x2/x3: [G].
        Returns (best_theta, nsup): [G] each."""
        G = s.shape[0]
        t = jnp.arange(T)[None, :]                      # [1, T]
        theta = lo[:, None] + t                         # [G, T]
        # log-likelihood sum over samples: x = s + theta, clamp
        x = s[:, None, :] + theta[:, :, None]           # [G, T, n]
        inside = (x >= 0) & (x < I)
        lp = jnp.where(inside,
                       logp_tab[jnp.clip(x, 0, I - 1)], log_minp)
        m = smask[:, None, :]
        ll = jnp.sum(jnp.where(m, lp, 0.0), axis=2)     # [G, T]
        p_gt = jnp.where(inside, probs[jnp.clip(x, 0, I - 1)],
                         pmf.minp)
        nsup = jnp.sum((p_gt > pmf.minp) & m, axis=2)   # [G, T]
        nsamp = jnp.sum(smask, axis=1).astype(jnp.float64)  # [G]

        # c(theta) via prefix sums: regions of the trapezoid
        A = theta
        B = theta + x1[:, None]
        C = theta + x2[:, None]
        D = theta + x3[:, None]
        S1 = p0(A)
        S2 = (p1(B - 1) - p1(A)) - A.astype(jnp.float64) * \
            (p0(B - 1) - p0(A))
        S3 = x1[:, None].astype(jnp.float64) * (p0(C - 1) - p0(B - 1))
        S4 = D.astype(jnp.float64) * (p0(D - 1) - p0(C - 1)) - \
            (p1(D - 1) - p1(C - 1))
        S5 = p0(jnp.full_like(A, I - 1)) - p0(D - 1)
        c = (S1 + S2 + S3 + S4 + S5) / x1[:, None].astype(jnp.float64)
        ll = ll - nsamp[:, None] * jnp.log(jnp.maximum(c, 1e-300))

        # Hann smoothing along T (valid region), masked argmax: the
        # filter is tiny (2*0.05*mean + 3 taps), so an unrolled
        # shift-multiply-add keeps float64 (lax.conv has no f64 on TPU)
        sm = jnp.zeros((G, T - 2 * half), jnp.float64)
        for w in range(filter_size):
            sm = sm + float(filt_np[w]) * ll[:, w:T - 2 * half + w]
        cand_n = nsup[:, half:T - half]
        tt = jnp.arange(sm.shape[1])[None, :]
        valid = (tt < jnp.maximum(tcount[:, None] - 2 * half, 0)) & \
            (cand_n > 0)
        smv = jnp.where(valid, sm, -jnp.inf)
        best = jnp.argmax(smv, axis=1)
        has = jnp.any(valid, axis=1)
        g = jnp.arange(G)
        best_theta = lo + best + half
        return (jnp.where(has, best_theta, lo),
                jnp.where(has, cand_n[g, best], 0))

    return kernel


def estimate_distances_device(groups, pmf: PMF, first: int, last: int,
                              min_align: int = 32,
                              max_batch_elems: int = 64_000_000):
    """Batched MLE over many contig-pair groups on device.

    groups: list of (key, samples, len0, len1).  Returns
    {key: (d, n)} identical to maximum_likelihood_estimate per group.
    Groups too large for the bucket grid fall back to the host path.
    """
    out = {}
    l = min_align
    adjust = 2 * (l - 1)
    I = len(pmf.probs)
    prep = []
    for key, samples, len0, len1 in groups:
        s = np.asarray(samples, np.int32) - adjust
        a, b = max(len0 - (l - 1), 1), max(len1 - (l - 1), 1)
        if a > b:
            a, b = b, a
        prep.append((key, s, a, b))

    lo_all, hi_all, filter_size = _theta_bounds(
        np.array([p[1].min() for p in prep], np.int64),
        np.array([p[1].max() for p in prep], np.int64),
        I, pmf.mean, first, last)
    tcount = hi_all - lo_all + 1

    # bucket by padded (T, n)
    buckets: dict[tuple[int, int], list[int]] = {}
    for gi, (key, s, a, b) in enumerate(prep):
        T = int(tcount[gi])
        n = len(s)
        if T <= filter_size:
            # tiny theta range: host path (argmax without smoothing)
            d, cnt = maximum_likelihood_estimate(
                list(s + adjust), pmf, a + (l - 1), b + (l - 1),
                first, last, min_align)
            out[key] = (d, cnt)
            continue
        Tp = 1 << (T - 1).bit_length()
        np_ = 1 << max(n - 1, 1).bit_length()
        buckets.setdefault((Tp, max(np_, 8)), []).append(gi)

    kernels = {}
    for (Tp, npad), idxs in buckets.items():
        if (Tp, npad) not in kernels:
            kernels[(Tp, npad)] = _make_mle_kernel(
                pmf, filter_size, Tp, npad)
        kern = kernels[(Tp, npad)]
        # chunk G to bound [G, T, n] memory
        gchunk = max(1, max_batch_elems // (Tp * npad))
        for c0 in range(0, len(idxs), gchunk):
            sub = idxs[c0:c0 + gchunk]
            G = len(sub)
            s_arr = np.zeros((G, npad), np.int32)
            m_arr = np.zeros((G, npad), bool)
            lo_arr = np.zeros(G, np.int32)
            tc_arr = np.zeros(G, np.int32)
            x1 = np.zeros(G, np.int32)
            x2 = np.zeros(G, np.int32)
            x3 = np.zeros(G, np.int32)
            for j, gi in enumerate(sub):
                key, s, a, b = prep[gi]
                s_arr[j, :len(s)] = s
                m_arr[j, :len(s)] = True
                lo_arr[j] = lo_all[gi]
                tc_arr[j] = tcount[gi]
                x1[j], x2[j], x3[j] = a, b, a + b
            import jax.numpy as jnp
            bt, ns = kern(jnp.asarray(s_arr), jnp.asarray(m_arr),
                          jnp.asarray(lo_arr), jnp.asarray(tc_arr),
                          jnp.asarray(x1), jnp.asarray(x2),
                          jnp.asarray(x3))
            bt = np.asarray(bt)
            ns = np.asarray(ns)
            for j, gi in enumerate(sub):
                key = prep[gi][0]
                d = max(first, int(bt[j]) - adjust)
                out[key] = (d, int(ns[j]))
    return out


@dataclass
class DistanceEstimate:
    """Edge payload {distance, numPairs, stdDev} (Common/Estimate.h:26)."""
    distance: int
    num_pairs: int
    std_dev: float

    def __str__(self):
        return f"{self.distance},{self.num_pairs},{self.std_dev:.1f}"


def estimate_distances(links: list[PairLink], hist: Histogram,
                       min_pairs: int = 10, min_align: int = 32,
                       min_dist: int | None = None,
                       max_dist: int | None = None,
                       mode: str = "mle",
                       ) -> dict[tuple[str, int, str, int], DistanceEstimate]:
    """Group pair links by oriented contig pair and estimate distances
    (DistanceEst.cpp main loop).  Returns {(u, su, v, sv): estimate}.

    mode: "mle" (window-corrected likelihood, the default), "median" or
    "mean" (population median/mean of the fragment distribution minus
    the sample median/mean span — DistanceEst --median/--mean, used by
    abyss-pe's scaffold stage, bin/abyss-pe:355 scaffold_deopt)."""
    pmf = PMF.from_histogram(hist)
    if min_dist is None:
        min_dist = -(len(pmf.probs) - 1)
    if max_dist is None:
        max_dist = len(pmf.probs) - 1

    groups: dict[tuple[str, int, str, int], list] = {}
    for ln in links:
        key = (ln.u_name, ln.u_sense, ln.v_name, ln.v_sense)
        # span without the gap: distance from read1 start to u's end plus
        # read2's end position on v
        span = (ln.u_len - ln.p1) + (ln.p2 + ln.a2)
        groups.setdefault(key, []).append((span, ln.u_len, ln.v_len))

    out = {}
    mle_groups = []
    for key, vals in groups.items():
        if len(vals) < min_pairs:
            continue
        samples = [v[0] for v in vals]
        if mode in ("median", "mean"):
            pop = (pmf.median if mode == "median" else pmf.mean)
            samp = (float(np.median(samples)) if mode == "median"
                    else float(np.mean(samples)))
            d, n = int(round(pop - samp)), len(samples)
            if n < min_pairs:
                continue
            out[key] = DistanceEstimate(
                distance=d, num_pairs=n, std_dev=pmf.sd / math.sqrt(n))
        else:
            mle_groups.append((key, samples, vals[0][1], vals[0][2]))
    if mle_groups:
        if len(mle_groups) < 64:
            # small workloads: per-bucket jit compilation costs more
            # than the host scan saves (measured ~20 s compile for ~30
            # groups at 27-contig scale); the device path wins when
            # groups number in the hundreds+
            dn = {key: maximum_likelihood_estimate(
                samples, pmf, l0, l1, first=min_dist, last=max_dist,
                min_align=min_align)
                for key, samples, l0, l1 in mle_groups}
        else:
            dn = estimate_distances_device(mle_groups, pmf,
                                           first=min_dist,
                                           last=max_dist,
                                           min_align=min_align)
        for key, (d, n) in dn.items():
            if n < min_pairs:
                continue
            out[key] = DistanceEstimate(
                distance=d, num_pairs=n, std_dev=pmf.sd / math.sqrt(n))
    return out


def write_dist_dot(estimates, lengths: dict[str, int], out, k: int = 0):
    """Write the -3.dist.dot-style distance graph (DotIO + DistanceEst
    edge properties [d= e= n=])."""
    import os
    own = isinstance(out, (str, os.PathLike))
    f = open(out, "w") if own else out
    try:
        f.write("digraph dist {\n")
        if k:
            f.write(f"graph [k={k}]\n")
        for name, L in lengths.items():
            f.write(f'"{name}+" [l={L}]\n"{name}-" [l={L}]\n')
        ss = "+-"
        for (u, su, v, sv), e in estimates.items():
            f.write(f'"{u}{ss[su]}" -> "{v}{ss[sv]}" '
                    f'[d={e.distance} e={e.std_dev:.1f} n={e.num_pairs}]\n')
        f.write("}\n")
    finally:
        if own:
            f.close()
