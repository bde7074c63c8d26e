"""Konnector pair connection + Sealer gap closing tests."""

import numpy as np
import jax.numpy as jnp

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.gap import konnector, sealer
from abyss_tpu.ops import bloom, nthash


K = 21


def build_filter(seqs, k=K, size=1 << 20):
    f = bloom.CountingBloomFilter.create(size, k, 4, threshold=1)
    for s in seqs:
        codes = alphabet.encode(s)[None]
        _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(codes), k)
        f = f.insert(canon, valid)
    return f


def test_connect_simple_pair():
    genome = sim.random_genome(1000, seed=80)
    f = build_filter([genome])
    # fragment 0..400: read1 = [0:100], read2 = rc([300:400])
    r1 = genome[:100]
    r2 = alphabet.revcomp(genome[300:400])
    res = konnector.connect_pairs(f, [(r1, r2)], K, max_gap=400)[0]
    assert res.reason == "CONNECTED", res
    assert res.seq == genome[:400]


def test_connect_no_path():
    g1 = sim.random_genome(300, seed=81)
    g2 = sim.random_genome(300, seed=82)
    f = build_filter([g1, g2])
    res = konnector.connect_pairs(
        f, [(g1[:80], alphabet.revcomp(g2[-80:]))], K, max_gap=300)[0]
    assert res.reason in ("NO_PATH", "NO_KMER")


def test_connect_batch():
    genome = sim.random_genome(3000, seed=83)
    f = build_filter([genome])
    pairs = []
    truth = []
    for s in range(0, 2500, 500):
        r1 = genome[s:s + 100]
        r2 = alphabet.revcomp(genome[s + 250:s + 350])
        pairs.append((r1, r2))
        truth.append(genome[s:s + 350])
    results = konnector.connect_pairs(f, pairs, K, max_gap=300)
    ok = sum(1 for r, t in zip(results, truth)
             if r.reason == "CONNECTED" and r.seq == t)
    assert ok >= 4, [r.reason for r in results]


def test_sealer_closes_gap(tmp_path):
    genome = sim.random_genome(4000, seed=84)
    pr = sim.simulate_paired_reads(genome, coverage=30, read_len=100,
                                   seed=85)
    p1, p2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    pr.write_fastq(p1, p2)
    # scaffold with a gap of 150 Ns replacing genome[2000:2150]
    scaffold = genome[:2000] + "N" * 150 + genome[2150:]
    sealed, stats = sealer.seal(
        [("s0", scaffold)], [p1, p2], ks=[21], bloom_bytes=8 << 20,
        flank=100, max_gap=400)
    assert stats.gaps == 1
    assert stats.closed == 1
    assert sealed[0][1] == genome


def test_konnector_extend_outward():
    """--extend grows a connected pseudo-read outward to the genome ends
    (konnector.cc extendRead)."""
    import numpy as np
    from abyss_tpu import sim
    from abyss_tpu.core import alphabet
    from abyss_tpu.dbg import bloom_dbg
    from abyss_tpu.dbg.params import AssemblyParams
    from abyss_tpu.gap import konnector
    from abyss_tpu.ops import nthash
    from abyss_tpu.ops.bloom import CountingBloomFilter
    import jax.numpy as jnp
    k = 25
    genome = sim.random_genome(1200, seed=55)
    reads = [genome[i:i + 80] for i in range(0, len(genome) - 80, 7)]
    arr = np.full((len(reads), 80), 4, np.uint8)
    for i, r in enumerate(reads):
        arr[i, :len(r)] = alphabet.encode(r)
    cbf = CountingBloomFilter.create(1 << 20, k, 4, threshold=1)
    _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(arr), k)
    cbf = cbf.insert(canon, valid)
    middle = genome[500:650]
    out = konnector.extend_outward(cbf, [middle], k)
    assert len(out[0]) > len(middle) + 200
    grc = alphabet.revcomp(genome)
    assert out[0] in genome or out[0] in grc


def test_connect_with_cascading_filter():
    """CascadingBloomFilter is drop-in for konnector solidity (the
    reference's Konnector::CascadingBloomFilter path): 2x-inserted
    genome k-mers are solid at depth 2, and pair connection works."""
    genome = sim.random_genome(1000, seed=85)
    f = bloom.CascadingBloomFilter.create(1 << 20, K, depth=2)
    for _ in range(2):
        codes = alphabet.encode(genome)[None]
        _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(codes), K)
        f = f.insert(canon, valid)
    r1 = genome[:100]
    r2 = alphabet.revcomp(genome[300:400])
    res = konnector.connect_pairs(f, [(r1, r2)], K, max_gap=400)[0]
    assert res.reason == "CONNECTED", res
    assert res.seq == genome[:400]
