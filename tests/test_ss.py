"""ss= strand-specific mode (round-3 verdict #9): pe wires ss=1 to
assemble_stranded (ContigGraphAlgorithms.h:250, bin/abyss-pe:217-218)
and the stranded predicate changes which chains merge."""
import os

import numpy as np

from abyss_tpu import sim
from abyss_tpu.graph import algorithms
from abyss_tpu.graph.contig_graph import ContigGraph, node
from abyss_tpu.pipeline import pe


def _chain_graph():
    """a+ -> b+ -> c-  : the b->c join is mixed-orientation."""
    g = ContigGraph()
    seqs = {}
    for nm, s in (("a", "ACGTACGTAC"), ("b", "CCATGGATCC"),
                  ("c", "TTGACCATAA")):
        g.add_contig(nm, len(s), 1)
        seqs[nm] = s
    g.add_edge(node(0, 0), node(1, 0), {"d": -4})
    g.add_edge(node(1, 0), node(2, 1), {"d": -4})
    return g, seqs


def test_assemble_stranded_skips_mixed_orientation():
    g, _ = _chain_graph()
    # default mode merges the full 3-contig chain
    chains = algorithms.assemble_chains(g)
    assert any(len(c) == 3 for c in chains)
    # stranded mode merges only the all-forward prefix a+ -> b+
    # (IsPositive: both endpoints sense 0, ContigGraphAlgorithms.h:244)
    st = algorithms.assemble_stranded(g)
    assert st == [[node(0, 0), node(1, 0)]]


def test_merge_linear_chains_ss_changes_output():
    g, seqs = _chain_graph()
    g2, _, _ = algorithms.merge_linear_chains(*_chain_graph())
    g2s, _, _ = algorithms.merge_linear_chains(g, seqs, ss=True)
    # default: one merged contig; ss: a+b merged, c kept separate
    assert len(list(g2.contigs())) == 1
    assert len(list(g2s.contigs())) == 2


def test_parse_ss():
    p = pe.parse_params(["name=x", "in=a.fq", "ss=1"])
    assert p.ss is True
    assert pe.parse_params(["name=x", "in=a.fq"]).ss is False


def test_pe_ss_smoke(tmp_path):
    genome = sim.genome_with_repeats(8000, seed=7, n_repeats=1,
                                     repeat_len=200)
    pr = sim.simulate_paired_reads(genome, coverage=25, read_len=100,
                                   fragment_mean=400, fragment_sd=40,
                                   error_rate=0.0, seed=8)
    p1, p2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    pr.write_fastq(p1, p2)
    params = pe.PipelineParams(
        name="ss", k=31, in_files=[p1, p2], outdir=str(tmp_path),
        min_pairs=5, verbose=0, batch_size=2048, max_read_len=128,
        engine="exact", ss=True)
    artifacts = pe.run(params)
    assert os.path.exists(artifacts["scaffolds"])
