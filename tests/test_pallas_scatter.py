"""Pallas binned scatter-max / gather (ops/pallas_scatter.py): the
TPU-native reformulation of the counting-Bloom counter update
(VERDICT round-1 #4; CountingBloomFilter.hpp:118-196 semantics).
Interpret-mode on CPU; the on-chip rates live in scripts/exp_scatter.py
and BENCH_NOTES.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from abyss_tpu.ops import pallas_scatter as ps


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    S = 1 << 17
    Q = 5000
    idx = rng.integers(0, S, size=Q).astype(np.int32)
    idx[:10] = S + 1  # beyond-size entries must be dropped
    val = rng.integers(1, 250, size=Q).astype(np.uint8)
    cnt = rng.integers(0, 100, size=S + 1).astype(np.uint8)
    return S, idx, val, cnt


def test_scatter_max_matches_numpy(data):
    S, idx, val, cnt = data
    ref = cnt.copy()
    np.maximum.at(ref, np.minimum(idx, S), np.where(idx < S, val, 0))
    ref[S] = cnt[S]  # sink slot untouched
    with pltpu.force_tpu_interpret_mode():
        new, ok = ps.scatter_max_u8_pallas(
            jnp.asarray(cnt), jnp.asarray(idx), jnp.asarray(val))
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(new), ref)


def test_overflow_detected():
    """Adversarial non-uniform indices overflow a window and must
    flip ok=False (callers fall back to the XLA scatter)."""
    S = 1 << 17
    Q = 4096
    idx = np.zeros(Q, np.int32)  # all to one counter: max run = Q
    val = np.ones(Q, np.uint8)
    cnt = np.zeros(S, np.uint8)
    with pltpu.force_tpu_interpret_mode():
        _, ok = ps.scatter_max_u8_pallas(
            jnp.asarray(cnt), jnp.asarray(idx), jnp.asarray(val))
    assert not bool(ok)


def test_counting_bloom_pallas_mode_matches_scatter():
    """update_mode='pallas' produces bit-identical counters to the XLA
    scatter mode (conservative-insert algebra preserved)."""
    from abyss_tpu.ops.bloom import CountingBloomFilter
    rng = np.random.default_rng(3)
    canon = jnp.asarray(rng.integers(0, 2**63, size=3000, dtype=np.uint64))
    mask = jnp.asarray(rng.random(3000) < 0.9)
    fa = CountingBloomFilter.create(1 << 17, 25, 4, 2)
    fb = fa._replace(update_mode="pallas")
    fa = fa.insert(canon, mask)
    with pltpu.force_tpu_interpret_mode():
        fb = fb.insert(canon, mask)
    np.testing.assert_array_equal(
        np.asarray(fa.counters), np.asarray(fb.counters))
