"""Adversarial wide-mode fingerprint collision (VERDICT r1 weak #7).

The k > 32 engine keys on 64-bit canonical ntHash fingerprints
(hash_dbg.py module docstring): a collision merges two distinct k-mers
into one table row.  This test PLANTS a collision by patching the hash
to alias one k-mer onto another and asserts the failure mode is the
documented bounded one — one merged row, first-seen text wins, counts
conserved, assembly completes without error — not corruption."""

import numpy as np
import pytest

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.dbg import hash_dbg
from abyss_tpu.ops import nthash


@pytest.fixture
def collided(monkeypatch):
    k = 40
    genome = sim.random_genome(1500, seed=70)
    reads = [genome[s:s + 80] for s in range(0, len(genome) - 80, 3)]
    codes = np.full((len(reads), 80), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = alphabet.encode(r)

    # find two well-separated k-mers and alias B's fingerprint onto A's
    import jax.numpy as jnp
    _, _, canon, _ = nthash.kmer_hashes(jnp.asarray(codes[:1]), k)
    canon = np.asarray(canon)[0]
    target_a, target_b = np.uint64(canon[0]), np.uint64(canon[30])
    assert target_a != target_b

    orig = nthash.kmer_hashes

    def patched(codes_j, kk):
        f, r, c, v = orig(codes_j, kk)
        c = jnp.where(c == target_b, target_a, c)
        return f, r, c, v

    monkeypatch.setattr(nthash, "kmer_hashes", patched)
    return k, genome, codes, target_a, target_b


def test_collision_merges_one_row_and_assembly_survives(collided):
    k, genome, codes, target_a, target_b = collided
    t = hash_dbg.count_kmers([codes], k)
    # the two k-mers merged: the aliased fingerprint appears once
    hits = np.searchsorted(t.kmers, target_a)
    assert t.kmers[hits] == target_a
    assert target_b not in t.kmers
    # counts conserved (merged row carries both multiplicities)
    n_per_read = codes.shape[1] - k + 1
    total_expected = sum(
        int((codes[i] < 4).all()) * n_per_read
        for i in range(codes.shape[0]))
    assert int(t.counts.sum()) == total_expected
    # exactly one text stored for the merged row (first occurrence)
    seq_row = hash_dbg.unpack_text(t.text[hits], k)
    assert len(seq_row) == k
    # assembly must complete; damage is local (a chimeric junction at
    # the collision), most of the genome still assembles
    contigs = hash_dbg.assemble_table(t, kc=1, erode_cov=0)
    total = sum(len(s) for s, c in contigs)
    assert total > 0.8 * len(genome)
