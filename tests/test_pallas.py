"""Pallas ntHash kernel parity (interpreter mode on the CPU backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from abyss_tpu.ops import nthash
from abyss_tpu.ops.pallas_kernels import kmer_hashes_pallas


@pytest.mark.parametrize("k", [5, 25])
def test_pallas_nthash_parity(k):
    rng = np.random.default_rng(31)
    codes = rng.integers(0, 4, size=(7, 80), dtype=np.uint8)
    codes[2, 10] = 4  # an N: windows covering it are invalid
    canon_p, valid_p = kmer_hashes_pallas(jnp.asarray(codes), k,
                                          interpret=True)
    _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(codes), k)
    assert np.array_equal(np.asarray(valid_p), np.asarray(valid))
    vp = np.asarray(valid)
    assert np.array_equal(np.asarray(canon_p)[vp], np.asarray(canon)[vp])
