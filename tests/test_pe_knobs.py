"""pe e/E/t/c/b passthrough (round-2 verdict weak #7): the reference's
core assembly knobs reach the exact engine and change stage-1 output;
unset knobs default the reference way (e/E/c from the coverage model,
CoverageAlgorithm.h:72-113)."""
import numpy as np

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.core.histogram import Histogram
from abyss_tpu.dbg import hash_dbg
from abyss_tpu.pipeline import pe


def _codes(genome, n_reads, read_len=80, seed=5, err=0.01):
    rng = np.random.default_rng(seed)
    g = alphabet.encode(genome)
    codes = np.full((n_reads, read_len), 4, np.uint8)
    for i in range(n_reads):
        s = rng.integers(0, len(genome) - read_len + 1)
        r = g[s:s + read_len].copy()
        bad = rng.random(read_len) < err
        r[bad] = (r[bad] + rng.integers(1, 4, bad.sum())) % 4
        if rng.random() < 0.5:
            r = alphabet.revcomp_codes(r)
        codes[i] = r
    return codes


def test_kv_parsing(tmp_path):
    argv = ["name=x", "k=31", "e=2", "E=1", "t=50", "c=3.5", "b=150",
            "in=a.fq", f"outdir={tmp_path}"]
    p = pe.parse_params(argv)
    assert (p.e, p.E, p.t, p.c, p.b) == (2, 1, 50, 3.5, 150)


def test_knobs_change_engine_output():
    genome = sim.random_genome(6000, seed=41)
    codes = _codes(genome, 3000, seed=42)
    base, _ = hash_dbg.assemble_reads([codes], 25, kc=2, auto_params=True,
                                      erode_cov=None, erode_strand=None,
                                      min_mean_cov=None)
    harsh, _ = hash_dbg.assemble_reads([codes], 25, kc=2, erode_cov=2,
                                       erode_strand=0, tip_len=50,
                                       min_mean_cov=30.0, bubble_len=126)
    # c=30 kills everything below 30x mean coverage
    assert sorted(s for s, _ in base) != sorted(s for s, _ in harsh)


def test_auto_params_match_reference_rule():
    h = Histogram.of([1]*50 + [2]*20 + [8]*5 + [9]*30 + [10]*40)
    e, E, c = hash_dbg.auto_coverage_params(h)
    thr = hash_dbg.coverage_threshold(h)
    assert e == int(round(max(2.0, thr)))
    assert E in (0, 1)
    assert c >= 2.0
