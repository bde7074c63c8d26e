"""Device chain machinery (dbg/chain_ops.py) vs the numpy reference
implementations in hash_dbg: every post-adjacency phase must produce
identical kills and identical contigs on error-laden fixtures.

The numpy paths (ABYSS_TPU_CHAIN=host) are the executable documentation
of the semantics (themselves parity-locked against the reference
binaries in test_reference_parity.py); the device paths are the
performance implementation.  Fixtures include sequencing errors (tips +
bubbles fire), a repeat (ambiguous junctions), reverse-complement
reads, wide mode (k > 32) and a circular genome (cycle breaking)."""

import os

import numpy as np
import pytest

from abyss_tpu.core import alphabet
from abyss_tpu.dbg import hash_dbg


def _canon(s: str) -> str:
    return min(s, alphabet.revcomp(s))


def _fixture(rng, k, circular=False, n_reads=1200, glen=5000,
             err=0.006):
    g = rng.integers(0, 4, glen).astype(np.uint8)
    g = np.concatenate([g, g[glen // 3: glen // 3 + 400]])  # repeat
    src = np.concatenate([g, g[:120]]) if circular else g
    L = 120
    reads = []
    for _ in range(n_reads):
        p = rng.integers(0, len(src) - L)
        r = src[p:p + L].copy()
        errpos = rng.random(L) < err
        r[errpos] = (r[errpos] + rng.integers(1, 4, errpos.sum())) % 4
        if rng.random() < 0.5:
            r = 3 - r[::-1]
        reads.append(r)
    return np.array(reads)


def _run_phases(mode, reads, k):
    old = os.environ.get("ABYSS_TPU_CHAIN")
    os.environ["ABYSS_TPU_CHAIN"] = mode
    try:
        t = hash_dbg.count_kmers([reads], k, strand_counts=True)
        hash_dbg.apply_coverage_threshold(t, 2)
        hash_dbg.compact(t)
        hash_dbg.build_adjacency(t)
        counts = (hash_dbg.erode(t, 2, 1), hash_dbg.trim(t, k),
                  hash_dbg.remove_low_coverage_contigs(t, 2.5),
                  hash_dbg.erode(t, 2), hash_dbg.trim(t, k))
        popped = hash_dbg.pop_bubbles_kmer(t, 3 * k)
        contigs = hash_dbg.assemble(t)
    finally:
        if old is None:
            os.environ.pop("ABYSS_TPU_CHAIN", None)
        else:
            os.environ["ABYSS_TPU_CHAIN"] = old
    return t, counts, popped, contigs


@pytest.mark.parametrize("k,circular", [(25, False), (49, False),
                                        (25, True), (40, True)])
def test_device_matches_host(k, circular):
    rng = np.random.default_rng(k * 2 + circular)
    reads = _fixture(rng, k, circular=circular)
    t1, n1, pop1, c1 = _run_phases("host", reads, k)
    t2, n2, pop2, c2 = _run_phases("device", reads, k)
    assert n1 == n2
    assert np.array_equal(t1.alive, t2.alive)
    # popped-branch orientation follows each implementation's chain
    # dedup rule; compare canonically
    assert sorted(map(_canon, pop1)) == sorted(map(_canon, pop2))
    assert dict(c1) == dict(c2)
    assert len(c1) == len(c2)


def test_compact_preserves_assembly():
    rng = np.random.default_rng(9)
    reads = _fixture(rng, 25)
    t1 = hash_dbg.count_kmers([reads], 25)
    hash_dbg.apply_coverage_threshold(t1, 2)
    t2 = hash_dbg.count_kmers([reads], 25)
    hash_dbg.apply_coverage_threshold(t2, 2)
    hash_dbg.compact(t2)
    assert t2.n == int(t1.alive.sum()) < t1.n
    for t in (t1, t2):
        hash_dbg.build_adjacency(t)
        hash_dbg.erode(t, 2)
        hash_dbg.trim(t, 25)
    c1 = dict(hash_dbg.assemble(t1))
    c2 = dict(hash_dbg.assemble(t2))
    assert c1 == c2
