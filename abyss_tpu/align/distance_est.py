"""Distance estimation between contig pairs by maximum likelihood.

Reimplements /root/reference/DistanceEst/{DistanceEst.cpp,MLE.cpp} and
Common/PMF.h: the empirical fragment-size PMF from the .hist file, the
trapezoid window correcting for length-biased fragment sampling
(MLE.cpp:15-37), the per-theta normalization constant, and the Hann
smoothing filter over the likelihood curve (MLE.cpp:120-155).

The theta scan is a dense (n_theta x pmf_range) computation — vectorized
here with numpy (a device batch over many contig pairs is the later
optimization; E. coli-scale inputs run in milliseconds on host).
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
    for key, vals in groups.items():
        if len(vals) < min_pairs:
            continue
        samples = [v[0] for v in vals]
        if mode in ("median", "mean"):
            import numpy as np
            pop = (pmf.median if mode == "median" else pmf.mean)
            samp = (float(np.median(samples)) if mode == "median"
                    else float(np.mean(samples)))
            d, n = int(round(pop - samp)), len(samples)
        else:
            d, n = maximum_likelihood_estimate(
                samples, pmf, vals[0][1], vals[0][2],
                first=min_dist, last=max_dist, min_align=min_align)
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
