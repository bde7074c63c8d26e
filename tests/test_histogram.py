"""Histogram + contiguity stats tests (mirrors Unittest/Common/HistogramTest.cpp
semantics plus fac table checks)."""

import numpy as np

from abyss_tpu.core.histogram import (Histogram, contiguity_stats,
                                      format_stats_table)
from abyss_tpu.stats.fac import fac
from abyss_tpu.io import fastx


def test_basic_moments():
    h = Histogram.of([1, 2, 2, 3, 3, 3])
    assert h.size() == 6
    assert h.sum() == 14
    assert h.minimum() == 1 and h.maximum() == 3
    assert h.median() == 3  # percentile(0.5): value where cum > 3
    assert h.count(2, 3) == 5


def test_n50_simple():
    # contigs: 100 x1, 50 x2 -> total 200, N50: cumulative from smallest
    # value reaching 100 -> arg_min(100): 50*2=100 -> 50
    h = Histogram.of([100, 50, 50])
    assert h.n50() == 50
    # add a big contig: 300 total 500, half 250: 50+50+100=200 <250 -> 300
    h2 = Histogram.of([100, 50, 50, 300])
    assert h2.n50() == 300


def test_esize():
    h = Histogram.of([10, 10])
    assert abs(h.expected_value() - 10.0) < 1e-9
    h = Histogram.of([10, 30])
    # (100 + 900) / 40 = 25
    assert abs(h.expected_value() - 25.0) < 1e-9


def test_first_local_minimum():
    h = Histogram()
    # classic coverage histogram: error spike at 1-2, dip at 4, peak at 10
    data = {1: 1000, 2: 400, 3: 100, 4: 30, 5: 40, 6: 80, 7: 150, 8: 250,
            9: 300, 10: 320, 11: 280, 12: 200}
    for k, v in data.items():
        h.insert(k, v)
    assert h.first_local_minimum() == 4


def test_trim_and_noise():
    h = Histogram.of([1, 1, 5, 100])
    t = h.trim_low(5)
    assert t.size() == 2 and t.minimum() == 5
    h2 = Histogram.of([1, 2, 50])
    assert 50 not in h2.remove_noise().counts


def test_hist_text_roundtrip():
    h = Histogram.of([3, 3, 7])
    t = h.to_text()
    assert t == "3\t2\n7\t1\n"
    assert Histogram.from_text(t).counts == h.counts


def test_contiguity_stats():
    lengths = [100, 600, 800, 1500, 2000]
    row = contiguity_stats(lengths, min_size=500, name="x")
    assert row["n"] == 5
    assert row["n:500"] == 4
    assert row["sum"] == 4900
    assert row["max"] == 2000
    assert row["min"] == 600
    # N50: cumulative 600+800=1400 < 2450, +1500=2900 >= 2450 -> 1500
    assert row["N50"] == 1500
    assert row["L50"] == 2  # contigs >= N50: 1500, 2000


def test_ng50():
    lengths = [600, 800, 1500, 2000]
    row = contiguity_stats(lengths, min_size=500, exp_size=10000)
    # sum=4900 < G/2=5000 -> NG50 = min
    assert row["NG50"] == 600
    row = contiguity_stats(lengths, min_size=500, exp_size=4000)
    # arg_min(4900-2000=2900) -> 1500
    assert row["NG50"] == 1500


def test_fac_on_fasta(tmp_path):
    p = str(tmp_path / "c.fa")
    fastx.write_fasta(p, [("a", "A" * 700), ("b", "C" * 1200),
                          ("c", "G" * 100)])
    rows = fac([p])
    assert rows[0]["n"] == 3 and rows[0]["n:500"] == 2
    table = format_stats_table(rows)
    assert table.splitlines()[0].startswith("n\tn:500\tL50")
