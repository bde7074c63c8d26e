"""Sorted-table k-mer counter: exactness + drop-in compatibility with
the counting Bloom filter in the extension engine."""

import numpy as np
import jax.numpy as jnp

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.dbg import extend as ext
from abyss_tpu.ops import nthash, sorted_filter


def test_counts_exact():
    k = 21
    rng = np.random.default_rng(1)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 2000))
    codes = alphabet.encode(seq)[None]
    f = sorted_filter.build_sorted_filter([codes, codes], k, threshold=2)
    _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(codes), k)
    counts = np.asarray(f.count(canon, valid))
    canon_np = np.asarray(canon)[0]
    uniq, exact = np.unique(canon_np, return_counts=True)
    of = dict(zip(uniq.tolist(), (2 * exact).tolist()))
    for c, n in zip(canon_np, counts[0]):
        assert n == of[int(c)]
    # absent k-mers are 0 (no false positives)
    other = alphabet.encode(sim.random_genome(500, seed=9))[None]
    _, _, canon2, valid2 = nthash.kmer_hashes(jnp.asarray(other), k)
    assert np.asarray(f.count(canon2, valid2)).max() == 0


def test_streaming_reduction_matches():
    k = 15
    rng = np.random.default_rng(2)
    batches = [rng.integers(0, 4, (64, 80), dtype=np.uint8)
               for _ in range(4)]
    one = sorted_filter.build_sorted_filter(batches, k)
    ctr = sorted_filter.SortedKmerCounter(k, reduce_every=1000)
    for b in batches:
        _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(b), k)
        ctr.add(canon, valid)
    two = ctr.finalize()
    np.testing.assert_array_equal(np.asarray(one.kmers),
                                  np.asarray(two.kmers))
    np.testing.assert_array_equal(np.asarray(one.counts),
                                  np.asarray(two.counts))


def test_extension_engine_with_sorted_filter():
    """The extension engine runs unchanged on the sorted filter."""
    k = 15
    genome = sim.random_genome(400, seed=3)
    codes = alphabet.encode(genome)[None]
    f = sorted_filter.build_sorted_filter([codes], k, threshold=1)
    seed = alphabet.encode(genome[:k])[None]
    buf, length, status = ext.extend_forward(f, seed, k, trim=k)
    assert status[0] == ext.DEAD_END
    assert alphabet.decode(buf[0, :length[0]]) == genome
