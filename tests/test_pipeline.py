"""Full-pipeline integration test: reads -> unitigs -> contigs ->
scaffolds on a simulated genome (the analogue of the reference's
IntegrationTest + README synthetic smoke test)."""

import os

import numpy as np
import pytest

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.io import fastx
from abyss_tpu.pipeline import pe
from abyss_tpu.scaffold import paths as pathtools
from abyss_tpu.graph.contig_graph import ContigGraph, node


def test_constrained_search_basic():
    g = ContigGraph()
    for i, L in enumerate([100, 50, 50, 100]):
        g.add_contig(str(i), L)
    # diamond: 0 -> {1, 2} -> 3, want path consistent with 3 at distance
    # matching via branch 1 only if lengths differed; here both match.
    for a, b in [(0, 1), (0, 2), (1, 3), (2, 3)]:
        g.add_edge(node(a, 0), node(b, 0), {"d": -10})
    cons = [pathtools.Constraint(target=node(3, 0), distance=30, error=15)]
    sols = pathtools.constrained_search(g, node(0, 0), cons)
    assert len(sols) == 2  # both branches satisfy
    # tighter constraint on intermediate: require visiting 1
    cons = [pathtools.Constraint(target=node(1, 0), distance=-10, error=2),
            pathtools.Constraint(target=node(3, 0), distance=30, error=15)]
    sols = pathtools.constrained_search(g, node(0, 0), cons)
    assert len(sols) == 1
    assert sols[0] == [node(0, 0), node(1, 0), node(3, 0)]


def test_merge_consistent_paths():
    a = [2, 4, 6]
    b = [4, 6, 8]
    c = [2, 4]  # contained
    merged = pathtools.merge_consistent_paths([a, b, c])
    assert len(merged) == 1
    got = merged[0]
    flipped = [v ^ 1 for v in reversed(got)]
    assert got == [2, 4, 6, 8] or flipped == [2, 4, 6, 8]


def test_merge_paths_opposite_orientation():
    """Per-seed paths sharing contigs in opposite senses must chain
    into one path (each contig materialized exactly once) — regression
    for duplicated contigs in stage-6 output."""
    # fragments of the chain 2 4 6 8, one written reverse-complemented
    a = [2, 4]                     # 1+ 2+
    b = [7, 5]                     # 3- 2-  == flipped(4, 6) == 2+ 3+
    c = [6, 8]                     # 3+ 4+
    merged = pathtools.merge_consistent_paths([a, b, c])
    assert len(merged) == 1
    got = merged[0]
    flipped = [v ^ 1 for v in reversed(got)]
    assert got == [2, 4, 6, 8] or flipped == [2, 4, 6, 8]


@pytest.mark.slow
def test_full_pipeline_on_simulated_genome(tmp_path):
    # repeats shorter than the fragment length, so mate pairs can bridge
    # them and scaffolding has real work to do
    # sized to keep the CPU-backend suite fast while still exercising
    # repeats, bubbles, and mate-pair scaffolding
    genome = sim.genome_with_repeats(16000, seed=101, n_repeats=2,
                                     repeat_len=250)
    pr = sim.simulate_paired_reads(genome, coverage=30, read_len=100,
                                   fragment_mean=500, fragment_sd=50,
                                   error_rate=0.003, seed=102)
    p1 = str(tmp_path / "r1.fq")
    p2 = str(tmp_path / "r2.fq")
    pr.write_fastq(p1, p2)

    params = pe.PipelineParams(
        name="t", k=31, in_files=[p1, p2], bloom_bytes=32 << 20,
        outdir=str(tmp_path), min_pairs=5, verbose=0, batch_size=2048,
        max_read_len=128)
    artifacts = pe.run(params)

    assert os.path.exists(artifacts["unitigs"])
    assert os.path.exists(artifacts["contigs"])
    assert os.path.exists(artifacts["scaffolds"])

    def n50(path):
        from abyss_tpu.core.histogram import Histogram
        ls = [len(r.seq) for r in fastx.read_fastx(path)]
        return Histogram.of(ls).n50(), max(ls), sum(ls)

    u_n50, u_max, u_sum = n50(artifacts["unitigs"])
    s_n50, s_max, s_sum = n50(artifacts["scaffolds"])
    # pipeline must not lose the genome
    assert u_sum > 0.9 * len(genome)
    assert s_sum > 0.9 * len(genome)
    # scaffolding should improve or maintain contiguity
    assert s_n50 >= u_n50
    # scaffolds should be large relative to the genome
    assert s_max > 0.3 * len(genome), (u_n50, s_n50, s_max)

    # every scaffold must be consistent with the genome: each N-free
    # block of every scaffold aligns exactly
    grc = alphabet.revcomp(genome)
    for r in fastx.read_fastx(artifacts["scaffolds"]):
        for block in r.seq.split("N"):
            if len(block) >= 200:
                assert block in genome or block in grc

    stats = open(artifacts["stats"]).read()
    assert "unitigs" in stats and "scaffolds" in stats


def test_pipeline_exact_engine(tmp_path):
    genome = sim.random_genome(12000, seed=301)
    pr = sim.simulate_paired_reads(genome, coverage=30, read_len=100,
                                   error_rate=0.002, seed=302)
    p1, p2 = str(tmp_path / "e1.fq"), str(tmp_path / "e2.fq")
    pr.write_fastq(p1, p2)
    params = pe.PipelineParams(
        name="x", k=27, in_files=[p1, p2], engine="exact",
        outdir=str(tmp_path), min_pairs=5, verbose=0, batch_size=2048,
        max_read_len=128)
    artifacts = pe.run(params)
    from abyss_tpu.core import alphabet as _a
    total = 0
    grc = _a.revcomp(genome)
    for r in fastx.read_fastx(artifacts["scaffolds"]):
        total += len(r.seq)
        for block in r.seq.split("N"):
            if len(block) >= 200:
                assert block in genome or block in grc
    assert total > 0.9 * len(genome)


def test_path_consensus_resolves_bubble():
    """Two near-identical candidate paths (bubble): SimpleGraph emits
    the ambiguous prefix+nN+suffix path (SimpleGraph.cpp
    constructAmbiguousPath), then PathConsensus resolves the gap to a
    consensus contig — no N run in the merged sequence."""
    from abyss_tpu.align.distance_est import DistanceEstimate
    from abyss_tpu.graph.contig_graph import ContigGraph, node
    from abyss_tpu.scaffold import path_algebra as pa
    from abyss_tpu.scaffold import path_consensus
    g = ContigGraph()
    s = sim.random_genome(300, seed=400)
    arm_a = s[100:149]
    arm_b = arm_a[:24] + ("A" if arm_a[24] != "A" else "C") + arm_a[25:]
    seqs = {"0": s[:110], "1": arm_a, "2": arm_b, "3": s[140:]}
    for name, (L, C) in zip("0123", [(110, 50), (49, 40), (49, 5),
                                     (160, 50)]):
        g.add_contig(name, L, C)
    for a, b in [(0, 1), (0, 2)]:
        g.add_edge(node(a, 0), node(b, 0), {"d": -10})
    for a, b in [(1, 3), (2, 3)]:
        g.add_edge(node(a, 0), node(b, 0), {"d": -9})
    est = {("0", 0, "3", 0): DistanceEstimate(30, 20, 3.0)}
    seed_paths = pathtools.simple_graph_seed_paths(
        g, est, {n: g.id_of(n) for n in "0123"}, k=11)
    assert node(0, 0) in seed_paths
    amb_path = seed_paths[node(0, 0)]
    assert amb_path[0] == node(0, 0) and amb_path[-1] == node(3, 0)
    assert any(pa.is_amb(e) for e in amb_path)
    res = path_consensus.resolve_paths(g, seqs, [amb_path], k=11,
                                       identity=0.9)
    out = res.paths[0]
    assert not any(pa.is_amb(e) for e in out)
    assert len(res.new_contigs) == 1  # the emitted consensus contig
    seq = pathtools.materialize_path(out, g, seqs, k=11)
    assert "N" not in seq


@pytest.mark.slow
def test_pipeline_exact_engine_wide_k(tmp_path):
    """Exact engine above the one-word limit (wide fingerprint mode,
    k=40): full pipeline, scaffolds must cover the genome."""
    genome = sim.random_genome(8000, seed=401)
    pr = sim.simulate_paired_reads(genome, coverage=30, read_len=100,
                                   error_rate=0.001, seed=402)
    p1, p2 = str(tmp_path / "w1.fq"), str(tmp_path / "w2.fq")
    pr.write_fastq(p1, p2)
    params = pe.PipelineParams(
        name="w", k=40, in_files=[p1, p2], engine="exact",
        outdir=str(tmp_path), min_pairs=5, verbose=0, batch_size=2048,
        max_read_len=128)
    artifacts = pe.run(params)
    from abyss_tpu.core import alphabet as _a
    total = 0
    grc = _a.revcomp(genome)
    for r in fastx.read_fastx(artifacts["scaffolds"]):
        total += len(r.seq)
        for block in r.seq.split("N"):
            if len(block) >= 200:
                assert block in genome or block in grc
    assert total > 0.9 * len(genome)


def test_paired_dbg_wide_mode_matches_packed():
    """k=14 (packed) vs the same data run through the wide fingerprint
    path: identical contigs (the wide path lifts the k<=16 cap)."""
    from abyss_tpu.dbg import paired_dbg
    from abyss_tpu.core import alphabet
    import numpy as np
    genome = sim.random_genome(1200, seed=50)
    k, K = 14, 40
    reads = []
    for start in range(0, len(genome) - 70, 3):
        reads.append(genome[start:start + 70])
    codes = np.full((len(reads), 70), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = alphabet.encode(r)
    packed = paired_dbg.assemble_pairs([codes], k, K, kc=1)
    wide = paired_dbg.assemble_pairs_wide([codes], k, K, kc=1)
    assert sorted(s for s, c in packed) == sorted(s for s, c in wide)


def test_paired_dbg_large_k():
    """K=50 k=25 (reference-realistic values, impossible under the
    round-1 k<=16 cap) assembles the genome (VERDICT r1 #9)."""
    from abyss_tpu.dbg import paired_dbg
    from abyss_tpu.core import alphabet
    import numpy as np
    genome = sim.random_genome(2000, seed=51)
    k, K = 25, 50
    reads = []
    for start in range(0, len(genome) - 80, 3):
        reads.append(genome[start:start + 80])
    codes = np.full((len(reads), 80), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = alphabet.encode(r)
    contigs = paired_dbg.assemble_pairs([codes], k, K, kc=1)
    best = max((s for s, c in contigs), key=len)
    grc = alphabet.revcomp(genome)
    core = best.strip("N")
    assert len(core) > 0.9 * len(genome)
    assert core in genome or core in grc
