"""Tests: mergepairs, Overlap tool, overlap graph + layout, paired DBG."""

import numpy as np
import pytest

from abyss_tpu import sim
from abyss_tpu.align import mergepairs
from abyss_tpu.align.distance_est import DistanceEstimate
from abyss_tpu.core import alphabet
from abyss_tpu.dbg import paired_dbg
from abyss_tpu.graph import overlap_graph, overlap_tool
from abyss_tpu.graph.contig_graph import ContigGraph, node


def test_mergepairs_overlapping():
    g = sim.random_genome(300, seed=90)
    # fragment of 150: read1 = [0:100], read2 = rc([50:150]) -> 50 bp overlap
    r1 = g[:100]
    r2 = alphabet.revcomp(g[50:150])
    merged = mergepairs.merge_pair(r1, None, r2, None)
    assert merged == g[:150]


def test_mergepairs_mismatch_consensus():
    g = sim.random_genome(200, seed=91)
    r1 = list(g[:100])
    r1[80] = "A" if g[80] != "A" else "C"  # error with low quality
    q1 = "I" * 80 + "!" + "I" * 19
    r2 = alphabet.revcomp(g[40:140])
    merged = mergepairs.merge_pair("".join(r1), q1, r2, "I" * 100)
    assert merged == g[:140]  # high-quality base wins


def test_mergepairs_no_overlap():
    a = sim.random_genome(100, seed=92)
    b = sim.random_genome(100, seed=93)
    assert mergepairs.merge_pair(a, None, alphabet.revcomp(b), None) is None


def test_overlap_tool_adds_edge():
    g0 = sim.random_genome(1000, seed=94)
    c0, c1 = g0[:520], g0[490:]  # 30 bp true overlap
    g = ContigGraph()
    g.add_contig("0", len(c0))
    g.add_contig("1", len(c1))
    seqs = {"0": c0, "1": c1}
    est = {("0", 0, "1", 0): DistanceEstimate(-28, 20, 3.0)}
    added = overlap_tool.add_overlap_edges(g, seqs, est)
    assert added == 1
    assert g.out[node(0, 0)][node(1, 0)]["d"] == -30


def test_overlap_graph_and_layout():
    g0 = sim.random_genome(600, seed=95)
    pieces = [("0", g0[:250]), ("1", g0[220:450]), ("2", g0[420:])]
    og = overlap_graph.build_overlap_graph_variable(pieces, min_overlap=20)
    assert og.has_edge(node(0, 0), node(1, 0))
    assert og.out[node(0, 0)][node(1, 0)]["d"] == -30
    laid = overlap_graph.layout(pieces, min_overlap=20)
    best = max(laid, key=lambda x: len(x[1]))
    assert best[1] == g0 or best[1] == alphabet.revcomp(g0)


def test_paired_dbg_resolves_repeat():
    # a repeat longer than k but shorter than K: the plain k engine
    # fragments; the paired engine walks through
    rng = np.random.default_rng(96)
    rep = "".join("ACGT"[i] for i in rng.integers(0, 4, 30))
    ga = "".join("ACGT"[i] for i in rng.integers(0, 4, 120))
    gb = "".join("ACGT"[i] for i in rng.integers(0, 4, 120))
    gc = "".join("ACGT"[i] for i in rng.integers(0, 4, 120))
    genome = ga + rep + gb + rep + gc
    k, K = 13, 56
    # perfect coverage: overlapping "reads"
    reads = [genome[i:i + 100] for i in range(0, len(genome) - 99, 5)]
    codes = np.full((len(reads), 100), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = alphabet.encode(r)

    from abyss_tpu.dbg import hash_dbg
    plain, _ = hash_dbg.assemble_reads([codes], k, kc=1, erode_cov=0,
                                       tip_len=0)
    plain_longest = max(len(s) for s, _ in plain)

    paired = paired_dbg.assemble_pairs([codes], k, K, kc=1)
    paired_longest = max(len(s) for s, _ in paired)
    assert paired_longest > plain_longest
    # the paired engine should recover (nearly) the whole genome
    assert paired_longest >= len(genome) - K, \
        (paired_longest, len(genome))


def test_pack_pairs_roundtrip():
    k, K = 8, 20
    seq = sim.random_genome(40, seed=97)
    codes = alphabet.encode(seq)[None]
    fwd, rc, canon, valid = paired_dbg.pack_pairs(codes, k, K)
    a, b = paired_dbg.unpack_pair(int(np.asarray(fwd)[0, 0]), k)
    assert a == seq[:k]
    assert b == seq[K - k:K]
    # rc really is the packed pair of the reverse-complemented window
    win_rc = alphabet.revcomp(seq[:K])
    ar, br = paired_dbg.unpack_pair(int(np.asarray(rc)[0, 0]), k)
    assert ar == win_rc[:k] and br == win_rc[K - k:K]


@pytest.mark.slow
def test_multi_k_sweep():
    from abyss_tpu.dbg import hash_dbg
    genome = sim.random_genome(3000, seed=98)
    pr = sim.simulate_paired_reads(genome, coverage=25, read_len=100,
                                   seed=99)
    seqs = [s for _, s, _ in pr.reads1] + [s for _, s, _ in pr.reads2]
    codes = np.full((len(seqs), 100), 4, np.uint8)
    for i, s in enumerate(seqs):
        codes[i, :len(s)] = alphabet.encode(s)

    def batches():
        return [codes]

    contigs = hash_dbg.multi_k_sweep(batches, ks=[17, 25, 31], kc=2)
    longest = max(len(s) for s, _ in contigs)
    assert longest > 0.9 * len(genome)
    grc = alphabet.revcomp(genome)
    best = max(contigs, key=lambda c: len(c[0]))[0]
    assert best in genome or best in grc
