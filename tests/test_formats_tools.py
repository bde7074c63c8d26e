"""Tests for the round-1 parity additions: colour space, GFA1/SAM/ASQG
graph IO, converters (fatoagp/samtoafg/joindist/cstont/tabtomd), the
MSA path consensus, the abyss-bloom tool (incl. windowed sharded build
== single build, mirroring IntegrationTest's abyss_bloom_dist tests),
and CLI smoke tests for the new per-binary entry points."""

import io
import os
import sys

import numpy as np
import pytest

from abyss_tpu.core import alphabet
from abyss_tpu import sim


# --- colour space ---------------------------------------------------------

def test_colour_space_roundtrip():
    seq = "ACGTTGCAACGT"
    cs = alphabet.nucleotide_to_colour(seq)
    assert cs[0] == "A"
    assert all(c in "0123" for c in cs[1:])
    back = alphabet.colour_to_nucleotide(cs[0], cs[1:])
    assert back == seq[1:]


def test_colour_space_detection():
    assert alphabet.is_colour_space("A0123012")
    assert not alphabet.is_colour_space("ACGT")
    # XOR identity: colour between b and b is 0
    assert alphabet.nucleotide_to_colour("AA") == "A0"
    assert alphabet.nucleotide_to_colour("AC") == "A1"


def test_colour_space_n_handling():
    cs = alphabet.nucleotide_to_colour("ANGT")
    assert cs == "A..1"  # G^T = 2^3 = 1; N pairs give '.'


# --- graph IO: GFA1 / SAM / ASQG -----------------------------------------

def _tiny_graph():
    from abyss_tpu.graph.contig_graph import ContigGraph, node
    g = ContigGraph()
    g.add_contig("0", 100, 10)
    g.add_contig("1", 80, 8)
    g.add_edge(node(0, 0), node(1, 0), {"d": -24})
    return g


def test_gfa1_roundtrip(tmp_path):
    from abyss_tpu.graph import graphio
    g = _tiny_graph()
    p = str(tmp_path / "g.gfa1")
    graphio.write_gfa1(g, p, k=25)
    g2, k = graphio.read_gfa(p)
    assert k == 25
    assert sorted(g2.names) == ["0", "1"]
    assert g2.lengths[g2.id_of("0")] == 100
    assert g2.coverages[g2.id_of("0")] == 10
    from abyss_tpu.graph.contig_graph import node
    edges = dict(g2.out_edges(node(g2.id_of("0"), 0)))
    assert node(g2.id_of("1"), 0) in edges
    assert edges[node(g2.id_of("1"), 0)]["d"] == -24


def test_sam_graph_roundtrip(tmp_path):
    from abyss_tpu.graph import graphio
    g = _tiny_graph()
    p = str(tmp_path / "g.sam")
    graphio.write_sam_graph(g, p)
    g2, _ = graphio.read_sam_graph(p)
    assert sorted(g2.names) == ["0", "1"]
    assert g2.lengths[g2.id_of("1")] == 80
    assert g2.num_edges() >= 1


def test_asqg_roundtrip(tmp_path):
    from abyss_tpu.io.formats import read_asqg, write_asqg
    g = _tiny_graph()
    seqs = {"0": "A" * 100, "1": "C" * 80}
    p = str(tmp_path / "g.asqg")
    write_asqg(g, seqs, p)
    g2, seqs2 = read_asqg(p)
    assert seqs2["0"] == "A" * 100
    assert sorted(g2.names) == ["0", "1"]


# --- converters ------------------------------------------------------------

def test_joindist(tmp_path):
    a = tmp_path / "a.dist"
    b = tmp_path / "b.dist"
    a.write_text("0 1+,50,10,2.5 ;\n")
    b.write_text("0 1+,48,20,1.5 ;\n")
    from abyss_tpu.io.formats import join_dist
    out = io.StringIO()
    join_dist([str(a), str(b)], out)
    text = out.getvalue()
    # min-stddev estimate wins
    assert "1+,48,20,1.5" in text
    assert "1+,50" not in text


def test_sam_to_afg():
    from abyss_tpu.io.formats import sam_to_afg
    sam = [
        ">ctg1\n", "ACGTACGTACGT\n",
        "r1\t64\tctg1\t1\t60\t8M\t*\t0\t0\tACGTACGT\tIIIIIIII\n",
        "r1\t128\tctg1\t5\t60\t8M\t*\t0\t0\tACGTACGT\tIIIIIIII\n",
    ]
    out = io.StringIO()
    sam_to_afg(sam, out, mean=200, sd=20)
    text = out.getvalue()
    assert "{LIB" in text and "{DST" in text
    assert text.count("{RED") == 2
    assert "{FRG" in text          # the pair got a fragment record
    assert "{CTG" in text and "{TLE" in text


def test_fatoagp():
    from abyss_tpu.io.formats import fa_to_agp
    agp, scaftigs = fa_to_agp([("s1", "ACGT" * 20 + "N" * 10 + "TTTT" * 20)],
                              min_contig=10)
    assert len(scaftigs) == 2
    kinds = [line.split("\t")[4] for line in agp]
    assert kinds == ["W", "N", "W"]


# --- MSA consensus (PathConsensus / dialign replacement) -------------------

def test_msa_consensus_identical():
    from abyss_tpu.align.dialign import msa_consensus
    cons, ident = msa_consensus(["ACGTACGTAA"] * 3)
    assert cons == "ACGTACGTAA"
    assert ident == pytest.approx(1.0)


def test_msa_consensus_majority_vote():
    from abyss_tpu.align.dialign import msa_consensus
    # one SNP in one of three candidates: majority wins
    cons, ident = msa_consensus(
        ["ACGTACGTACGTACGT", "ACGTACGTACGTACGT", "ACGTACCTACGTACGT"])
    assert cons == "ACGTACGTACGTACGT"
    assert ident > 0.9


def test_msa_consensus_identity_gate():
    from abyss_tpu.align.dialign import msa_consensus
    cons, ident = msa_consensus(
        ["AAAAAAAAAAAAAAAA", "CGCGCGCGCGCGCGCG"], min_identity=0.9)
    assert cons is None
    assert ident < 0.9


def test_nw_traceback_gaps():
    from abyss_tpu.align.dialign import nw_traceback, GAP
    ra, rb = nw_traceback(alphabet.encode("ACGTACGT"),
                          alphabet.encode("ACGACGT"))
    assert len(ra) == len(rb) == 8
    assert (rb == GAP).sum() == 1
    assert (ra == GAP).sum() == 0


# --- abyss-bloom tool -------------------------------------------------------

@pytest.fixture(scope="module")
def readset(tmp_path_factory):
    d = tmp_path_factory.mktemp("bloomtool")
    genome = sim.random_genome(3000, seed=7)
    reads = sim.simulate_paired_reads(genome, coverage=20.0, seed=7)
    p1, p2 = str(d / "r1.fq"), str(d / "r2.fq")
    reads.write_fastq(p1, p2)
    return d, p1, p2


def test_bloom_build_union_window_parity(readset, capsys):
    """Windowed shard builds OR-merged == single-shot build — the
    abyss-bloom-dist integration-test invariant."""
    d, p1, p2 = readset
    from abyss_tpu.cli import bloom_tool
    single = str(d / "single.npz")
    bloom_tool.main(["build", "-k", "21", "-b", "1M", single, p1, p2])
    shards = []
    for i in (1, 2, 3):
        sp = str(d / f"w{i}.npz")
        bloom_tool.main(["build", "-k", "21", "-b", "1M",
                         "-w", f"{i}/3", sp, p1, p2])
        shards.append(sp)
    merged = str(d / "merged.npz")
    bloom_tool.main(["union", merged] + shards)
    from abyss_tpu.ops import bloom as bloom_ops
    a = bloom_ops.load_filter(single)
    b = bloom_ops.load_filter(merged)
    assert np.array_equal(np.asarray(a.bits), np.asarray(b.bits))
    # info runs
    bloom_tool.main(["info", single])
    assert "occupancy" in capsys.readouterr().out


def test_bloom_compare_and_kmers(readset, capsys):
    d, p1, p2 = readset
    from abyss_tpu.cli import bloom_tool
    f1 = str(d / "c1.npz")
    bloom_tool.main(["build", "-k", "21", "-b", "1M", f1, p1])
    bloom_tool.main(["compare", "-m", "jaccard", f1, f1])
    out = capsys.readouterr().out
    assert "jaccard: 1.0" in out
    bloom_tool.main(["kmers", "--count-only", f1, p1])


def test_bloom_trim(readset, capsys):
    d, p1, _ = readset
    from abyss_tpu.cli import bloom_tool
    f1 = str(d / "t1.npz")
    bloom_tool.main(["build", "-k", "21", "-b", "1M", "-t", "counting",
                     f1, p1])
    bloom_tool.main(["trim", f1, p1])
    out = capsys.readouterr().out
    assert out.startswith("@")  # fastq records survive


# --- CLI smoke tests --------------------------------------------------------

def _contig_fixture(tmp_path):
    genome = sim.random_genome(2000, seed=3)
    contigs = [("0", genome[:1100]), ("1", genome[1000:])]
    fa = str(tmp_path / "contigs.fa")
    with open(fa, "w") as f:
        for n, s in contigs:
            f.write(f">{n} {len(s)} 99\n{s}\n")
    reads = sim.simulate_paired_reads(genome, coverage=15.0, seed=3)
    p1, p2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    reads.write_fastq(p1, p2)
    return genome, fa, p1, p2


def test_map_and_distanceest_cli(tmp_path, capsys):
    from abyss_tpu.cli import tools2
    genome, fa, p1, p2 = _contig_fixture(tmp_path)
    tools2.map_main([p1, fa, "-l", "32"])
    out = capsys.readouterr().out
    assert "@SQ" in out
    assert any(not ln.startswith("@") for ln in out.splitlines() if ln)
    dist = str(tmp_path / "out.dist.dot")
    tools2.distanceest_main(
        [p1, p2, "--target", fa, "--dot", "-n", "1", "-o", dist,
         "--hist", str(tmp_path / "h.hist")])
    assert os.path.exists(dist)
    text = open(dist).read()
    assert "digraph" in text


def test_overlap_layout_cli(tmp_path, capsys):
    from abyss_tpu.cli import tools2
    genome = sim.random_genome(600, seed=5)
    fa = str(tmp_path / "frag.fa")
    with open(fa, "w") as f:
        f.write(f">a\n{genome[:350]}\n>b\n{genome[300:]}\n")
    tools2.overlap_main([fa, "-m", "20"])
    assert "digraph" in capsys.readouterr().out
    tools2.layout_main([fa, "-m", "20"])
    out = capsys.readouterr().out
    assert out.startswith(">")
    # fully laid out: one merged sequence reconstructing the genome
    seq = out.splitlines()[1]
    assert seq == genome


def test_scaffold_junction_cli(tmp_path, capsys):
    from abyss_tpu.cli import tools2
    dist = tmp_path / "d.dist.dot"
    dist.write_text(
        'digraph dist {\n'
        '"0+" [l=500 C=50]\n"0-" [l=500 C=50]\n'
        '"1+" [l=400 C=40]\n"1-" [l=400 C=40]\n'
        '"0+" -> "1+" [d=100 e=2.0 n=20]\n'
        '"1-" -> "0-" [d=100 e=2.0 n=20]\n}\n')
    tools2.scaffold_main([str(dist), "-n", "1-5", "-s", "100"])
    out = capsys.readouterr().out
    assert "0+" in out and "1+" in out
    # junction on a linear graph: none
    tools2.junction_main([str(dist)])


def test_filtergraph_cli(tmp_path, capsys):
    from abyss_tpu.cli import tools2
    from abyss_tpu.graph import graphio
    g = _tiny_graph()
    p = str(tmp_path / "g.dot")
    graphio.write_dot(g, p, k=25)
    tools2.filtergraph_main([p, "-k", "25", "-t", "0", "-i", "0"])
    out = capsys.readouterr().out
    assert "digraph" in out


def test_converters_cli(tmp_path, capsys):
    from abyss_tpu.cli import tools2
    fa = tmp_path / "s.fa"
    fa.write_text(">s1\n" + "ACGT" * 30 + "N" * 12 + "GGCC" * 30 + "\n")
    tools2.fatoagp_main([str(fa)])
    out = capsys.readouterr().out
    assert "\tN\t" in out
    # cstont
    cs = tmp_path / "c.fa"
    nt = "ACGTTGCA"
    from abyss_tpu.core.alphabet import nucleotide_to_colour
    cs.write_text(f">r1\n{nucleotide_to_colour(nt)}\n")
    tools2.cstont_main([str(cs)])
    out = capsys.readouterr().out
    assert nt[1:] in out
    # tabtomd
    tab = tmp_path / "t.tab"
    tab.write_text("n\tN50\n3\t1000\n")
    tools2.tabtomd_main([str(tab)])
    out = capsys.readouterr().out
    assert out.startswith("| n")


def test_count_kmerprint_dawg_align_cli(tmp_path, capsys):
    from abyss_tpu.cli import tools2
    fa = tmp_path / "x.fa"
    fa.write_text(">x\nACGTACGTACGTACGTACGT\n")
    tools2.count_main(["-k", "5", str(fa)])
    out = capsys.readouterr().out
    assert "ACGTA" in out or "TACGT" in out
    tools2.dawg_main([str(fa)])
    assert "digraph dawg" in capsys.readouterr().out
    pair = tmp_path / "p.fa"
    pair.write_text(">a\nACGTACGT\n>b\nACGACGT\n")
    tools2.align_main([str(pair)])
    out = capsys.readouterr().out
    assert "-" in out  # the deletion shows as a gap


def test_mergepairs_cli(tmp_path, capsys):
    from abyss_tpu.cli import tools2
    genome = sim.random_genome(300, seed=11)
    r1 = tmp_path / "m1.fq"
    r2 = tmp_path / "m2.fq"
    frag = genome[50:250]
    a = frag[:120]
    b = alphabet.revcomp(frag[-120:])
    r1.write_text(f"@p/1\n{a}\n+\n{'I' * len(a)}\n")
    r2.write_text(f"@p/2\n{b}\n+\n{'I' * len(b)}\n")
    tools2.mergepairs_main([str(r1), str(r2), "-o",
                            str(tmp_path / "mg")])
    merged = open(tmp_path / "mg_merged.fastq").read().splitlines()
    assert merged[1] == frag


def test_fixmate_cli_roundtrip(tmp_path, capsys, monkeypatch):
    from abyss_tpu.cli import tools2
    genome, fa, p1, p2 = _contig_fixture(tmp_path)
    # produce SAM via map, feed to fixmate
    tools2.map_main([p1, p2, fa, "-l", "32"])
    samtext = capsys.readouterr().out
    samf = tmp_path / "a.sam"
    samf.write_text(samtext)
    hist = tmp_path / "f.hist"
    tools2.fixmate_main(["-h", str(hist), str(samf)])
    capsys.readouterr()
    assert hist.exists()
