"""abyss-pe library semantics e2e (VERDICT r1 #1): lib=/pe=/mp= with
distinct paired-end and mate-pair libraries, the full reference stage
chain (-4.path1/2/3, -5, -6.path, -7, -8), and the headline property —
mate-pair scaffolding bridges repeats the PE fragments cannot span
(bin/abyss-pe:140-160,189-373,620-749)."""

import os

import pytest

from abyss_tpu import sim
from abyss_tpu.core.histogram import Histogram
from abyss_tpu.io import fastx
from abyss_tpu.pipeline import pe


def _n50(path):
    lens = [len(r.seq) for r in fastx.read_fastx(path)]
    h = Histogram.of(x for x in lens if x >= 500)
    return int(h.n50()) if h.size() else 0


@pytest.fixture(scope="module")
def libraries(tmp_path_factory):
    """A 30 kb genome with 700 bp exact repeats; a short-insert PE
    library (frag 400 < repeat) and a long-insert MP library
    (frag 2500 > repeat)."""
    d = tmp_path_factory.mktemp("libs")
    genome = sim.genome_with_repeats(30000, seed=9, n_repeats=8,
                                     repeat_len=700)
    pe_reads = sim.simulate_paired_reads(
        genome, coverage=35, read_len=100, fragment_mean=400,
        fragment_sd=40, seed=21)
    mp_reads = sim.simulate_paired_reads(
        genome, coverage=25, read_len=100, fragment_mean=2500,
        fragment_sd=250, seed=22)
    pea1, pea2 = str(d / "pea_1.fq"), str(d / "pea_2.fq")
    mpc1, mpc2 = str(d / "mpc_1.fq"), str(d / "mpc_2.fq")
    pe_reads.write_fastq(pea1, pea2)
    mp_reads.write_fastq(mpc1, mpc2)
    return {"genome": genome, "pea": [pea1, pea2], "mpc": [mpc1, mpc2],
            "dir": d}


@pytest.mark.slow
def test_pe_mp_library_chain(libraries, tmp_path):
    d = libraries
    outdir = str(tmp_path / "with_mp")
    p = pe.PipelineParams(
        name="lib", k=31,
        libs={"pea": pe.Library("pea", d["pea"]),
              "mpc": pe.Library("mpc", d["mpc"], n=5)},
        pe_names=["pea"], mp_names=["mpc"],
        outdir=outdir, min_pairs=5, min_len=200, verbose=0,
        batch_size=2048, max_read_len=128)
    artifacts = pe.run(p)

    # the reference artifact DAG exists (bin/abyss-pe:553-749)
    for suffix in ["1.fa", "1.dot", "2.fa", "2.dot", "3.fa", "3.dot",
                   "3.dist", "3.dist.dot", "4.fa", "4.dot", "4.path1",
                   "4.path2", "4.path3", "5.fa", "5.dot", "5.path",
                   "6.fa", "6.dot", "6.path", "7.fa", "7.dot",
                   "7.path", "8.fa", "8.dot", "stats.tab"]:
        assert os.path.exists(os.path.join(outdir, f"lib-{suffix}")), \
            f"missing artifact lib-{suffix}"
    # per-library artifacts: {lib}-3.hist/{lib}-3.dist for pe,
    # {lib}-6.hist/{lib}-6.dist.dot for mp
    for f in ["pea-3.hist", "pea-3.dist", "mpc-6.hist",
              "mpc-6.dist.dot"]:
        assert os.path.exists(os.path.join(outdir, f)), f"missing {f}"
    # the mp library must NOT be mapped at stage 3, nor pe at stage 6
    assert not os.path.exists(os.path.join(outdir, "mpc-3.hist"))
    assert not os.path.exists(os.path.join(outdir, "pea-6.hist"))

    # scaffolds cover the genome
    from abyss_tpu.core import alphabet
    genome = d["genome"]
    grc = alphabet.revcomp(genome)
    total = 0
    for r in fastx.read_fastx(artifacts["scaffolds"]):
        total += len(r.seq)
        for block in r.seq.split("N"):
            if len(block) >= 300:
                assert block in genome or block in grc
    assert total > 0.9 * len(genome)


@pytest.mark.slow
def test_mp_scaffolding_beats_pe_only(libraries, tmp_path):
    """VERDICT r1 #1 done-criterion: mp-driven scaffolding must beat
    the pe-only N50 on a repeat-broken genome."""
    d = libraries
    results = {}
    for tag, mp_names in [("pe_only", ["pea"]), ("with_mp", ["mpc"])]:
        outdir = str(tmp_path / tag)
        p = pe.PipelineParams(
            name="x", k=31,
            libs={"pea": pe.Library("pea", d["pea"]),
                  "mpc": pe.Library("mpc", d["mpc"], n=5)},
            pe_names=["pea"], mp_names=mp_names,
            outdir=outdir, min_pairs=5, min_len=200, verbose=0,
            batch_size=2048, max_read_len=128)
        artifacts = pe.run(p)
        results[tag] = _n50(artifacts["scaffolds"])
    assert results["with_mp"] > results["pe_only"], results


@pytest.mark.slow
def test_pe_paired_dbg_K50_k25(tmp_path):
    """pe k=50 K=25 (span 50 of two 25-mers) — the reference-
    realistic paired-DBG configuration
    the round-1 k<=16 cap made impossible (VERDICT r1 #9)."""
    genome = sim.random_genome(6000, seed=61)
    pr = sim.simulate_paired_reads(genome, coverage=35, read_len=100,
                                   seed=62)
    p1, p2 = str(tmp_path / "k1.fq"), str(tmp_path / "k2.fq")
    pr.write_fastq(p1, p2)
    p = pe.PipelineParams(
        name="kp", k=50, K=25, in_files=[p1, p2], outdir=str(tmp_path),
        min_pairs=5, verbose=0, batch_size=2048, max_read_len=128)
    artifacts = pe.run(p)
    from abyss_tpu.core import alphabet
    total = 0
    grc = alphabet.revcomp(genome)
    for r in fastx.read_fastx(artifacts["scaffolds"]):
        total += len(r.seq)
    assert total > 0.8 * len(genome)
