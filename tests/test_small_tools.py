"""SAM IO, pileup consensus, DAssembler, PLC counters, kmerprint."""

import numpy as np
import pytest

from abyss_tpu import sim
from abyss_tpu.align import consensus, mapper, sam
from abyss_tpu.core import alphabet
from abyss_tpu.dbg import dassembler, hash_dbg
from abyss_tpu.ops import plc


def test_sam_roundtrip():
    a = mapper.Alignment(qname="r1", rname="c0", rev=False, pos=42,
                         qstart=5, qend=95, read_len=100, score=50,
                         mapq=60, rlen=1000)
    line = sam.emit(a)
    fields = line.split("\t")
    assert fields[0] == "r1" and fields[2] == "c0"
    assert fields[3] == "43"  # 1-based
    assert fields[5] == "5S90M5S"
    b = sam.parse(line, {"c0": 1000})
    assert (b.rname, b.pos, b.qstart, b.qend, b.rev) == \
        ("c0", 42, 5, 95, False)
    # reverse strand roundtrip
    a2 = mapper.Alignment(qname="r2", rname="c0", rev=True, pos=10,
                          qstart=3, qend=98, read_len=100, score=50,
                          mapq=60, rlen=1000)
    b2 = sam.parse(sam.emit(a2), {"c0": 1000})
    assert (b2.pos, b2.qstart, b2.qend, b2.rev) == (10, 3, 98, True)
    # unmapped
    assert sam.parse(sam.emit(None, qname="r3")) is None
    assert "\t4\t" in sam.emit(None, qname="r3")


def test_pileup_consensus_fixes_contig_error():
    genome = sim.random_genome(1000, seed=110)
    # contig with one wrong base
    bad = list(genome)
    bad[500] = "A" if genome[500] != "A" else "C"
    bad = "".join(bad)
    al = mapper.KmerAligner([("c0", bad)], k=32)
    pile = consensus.Pileup([("c0", bad)])
    rng = np.random.default_rng(111)
    reads, ids = [], []
    for i in range(120):
        p = int(rng.integers(0, 900))
        reads.append(genome[p:p + 100])
        ids.append(f"r{i}")
    codes = np.full((len(reads), 128), 4, np.uint8)
    lengths = np.zeros(len(reads), np.int32)
    for i, s in enumerate(reads):
        codes[i, :len(s)] = alphabet.encode(s)
        lengths[i] = len(s)
    alns = al.align_batch(codes, lengths, ids)
    for a, s in zip(alns, reads):
        pile.add(a, s)
    called = pile.call(min_cov=3)[0][1]
    assert called == genome


def test_dassembler_extends_seed():
    genome = sim.random_genome(1500, seed=112)
    rng = np.random.default_rng(113)
    reads = []
    for _ in range(300):
        p = int(rng.integers(0, 1400))
        r = genome[p:p + 100]
        reads.append(r if rng.random() < 0.5 else alphabet.revcomp(r))
    seed = genome[700:800]
    contig = dassembler.assemble_region(seed, reads, min_overlap=40)
    assert len(contig) > 1200
    assert contig in genome or alphabet.revcomp(contig) in genome


def test_plc_counts_approximately():
    arr = plc.PLCArray(16, seed=1)
    idx = np.zeros(1, np.int32)
    for _ in range(2000):
        arr.insert(idx)
    c = int(arr.count(idx)[0])
    assert 1000 <= c <= 4000, c  # log-counter: bounded relative error


def test_plc_small_counts_exact():
    arr = plc.PLCArray(8, seed=2)
    for _ in range(20):
        arr.insert(np.asarray([3], np.int32))
    # counts below the mantissa limit (32) are exact
    assert int(arr.count(np.asarray([3], np.int32))[0]) == 20


def test_kmerprint_like_dump():
    # the kmerprint role: dump the k-mer table as text
    k = 11
    seq = sim.random_genome(100, seed=114)
    codes = alphabet.encode(seq)[None]
    t = hash_dbg.count_kmers([codes], k)
    lines = [f"{hash_dbg.unpack_kmer(int(km), k)}\t{c}"
             for km, c in zip(t.kmers, t.counts)]
    assert len(lines) == t.n
    for l in lines[:5]:
        s, c = l.split("\t")
        assert len(s) == k and int(c) >= 1


def test_fmindex_count_locate():
    from abyss_tpu.align import fmindex
    genome = sim.random_genome(2000, seed=115)
    codes = alphabet.encode(genome)
    fm = fmindex.FMIndex.build(codes)
    rng = np.random.default_rng(116)
    for _ in range(10):
        p = int(rng.integers(0, 1950))
        pat = codes[p:p + 40]
        assert fm.count(pat) >= 1
        assert p in fm.locate(pat)
    # absent pattern
    other = alphabet.encode(sim.random_genome(40, seed=117))
    assert fm.count(other) == 0
    # repeated pattern counts occurrences
    text = alphabet.encode("ACGTACGTACGT")
    fm2 = fmindex.FMIndex.build(text)
    assert fm2.count(alphabet.encode("ACGT")) == 3
    assert fm2.locate(alphabet.encode("ACGT")) == [0, 4, 8]


def test_samtobreak_counts_misjoins():
    from abyss_tpu.stats import samtobreak
    g = sim.random_genome(6000, seed=118)
    good = g[1000:3000]
    # chimeric contig: two distant genome pieces joined
    chimera = g[0:800] + g[4000:4800]
    stats = samtobreak.contig_breakpoints(
        g, [("good", good), ("chim", chimera)], k=32)
    assert stats.contigs == 2
    assert stats.per_contig["good"] == 1
    assert stats.per_contig["chim"] == 2
    assert stats.breakpoints == 1
    assert stats.aligned_fraction > 0.9


def test_fmindex_scale_device_build():
    """Scale-tier FM build (round-4 verdict #8): the device prefix-
    doubling path (n >= 1M triggers it; CPU backend here) must build a
    multi-Mbp index whose count/locate agree with brute force."""
    import time
    import numpy as np
    from abyss_tpu import sim
    from abyss_tpu.core import alphabet
    from abyss_tpu.align.fmindex import FMIndex

    genome = sim.random_genome(3_000_000, seed=9)
    codes = alphabet.encode(genome)
    t0 = time.time()
    fm = FMIndex.build(codes)
    wall = time.time() - t0
    # memory tier: bwt + checkpointed occ + dense samples + mask
    bytes_per_base = (fm.bwt.nbytes + fm.occ_ck.nbytes + fm.sa_vals.nbytes
                      + fm.sa_mask.nbytes + fm.sa_rank.nbytes) / fm.n
    assert bytes_per_base < 4.0, f"{bytes_per_base:.1f} B/base"
    rng = np.random.default_rng(3)
    for _ in range(5):
        s = int(rng.integers(0, len(genome) - 40))
        pat = genome[s:s + 40]
        exp = genome.count(pat)
        assert fm.count(alphabet.encode(pat)) == exp
        assert s in fm.locate(alphabet.encode(pat), limit=50)
    absent = "ACGT" * 10 + "A"
    if absent not in genome:
        assert fm.count(alphabet.encode(absent)) == 0
    print(f"3 Mbp FM build: {wall:.1f}s, {bytes_per_base:.2f} B/base")
