"""Native C++ FASTX reader: parity with the Python reader."""

import gzip

import numpy as np
import pytest

from abyss_tpu import sim
from abyss_tpu.io import fastx, native_fastx


pytestmark = pytest.mark.skipif(not native_fastx.available(),
                                reason="native toolchain unavailable")


def write_test_fastq(path, n=100, L=100, seed=0, gz=False):
    genome = sim.random_genome(5000, seed=seed)
    pr = sim.simulate_paired_reads(genome, coverage=n * L / 5000,
                                   read_len=L, seed=seed + 1)
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for rid, seq, qual in pr.reads1:
            f.write(f"@{rid}\n{seq}\n+\n{qual}\n")
    return len(pr.reads1)


def batches_equal(a, b):
    assert a.ids == b.ids
    np.testing.assert_array_equal(a.lengths, b.lengths)
    np.testing.assert_array_equal(a.codes, b.codes)


@pytest.mark.parametrize("gz", [False, True])
def test_parity_with_python_reader(tmp_path, gz):
    path = str(tmp_path / ("r.fq" + (".gz" if gz else "")))
    write_test_fastq(path, seed=7, gz=gz)
    py = list(fastx.read_batches(path, batch_size=64, max_len=128))
    nat = list(native_fastx.read_batches(path, batch_size=64, max_len=128))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        batches_equal(a, b)


def test_fasta_and_multiline(tmp_path):
    path = str(tmp_path / "x.fa")
    with open(path, "w") as f:
        f.write(">a desc\nACGT\nACGT\n>b\nTTTTT\n")
    nat = list(native_fastx.read_batches(path, batch_size=4, max_len=32))
    assert nat[0].ids == ["a", "b"]
    assert nat[0].lengths[0] == 8 and nat[0].lengths[1] == 5


def test_quality_trim_parity(tmp_path):
    path = str(tmp_path / "q.fq")
    with open(path, "w") as f:
        f.write("@r1\nNNACGTNN\n+\n!!IIII!!\n")
    py = list(fastx.read_batches(path, batch_size=4, max_len=32, q=3))
    nat = list(native_fastx.read_batches(path, batch_size=4, max_len=32,
                                         q=3))
    batches_equal(py[0], nat[0])
    assert py[0].lengths[0] == 4


def test_chastity_parity(tmp_path):
    path = str(tmp_path / "c.fq")
    with open(path, "w") as f:
        f.write("@r1 1:Y:0:AT\nACGT\n+\nIIII\n@r2 1:N:0:AT\nGGGG\n+\nIIII\n")
    nat = list(native_fastx.read_batches(path, batch_size=4, max_len=32))
    assert nat[0].ids == ["r2"]
    nat2 = list(native_fastx.read_batches(path, batch_size=4, max_len=32,
                                          chastity=False))
    assert nat2[0].ids == ["r1", "r2"]


def test_long_read_split_parity(tmp_path):
    path = str(tmp_path / "long.fa")
    seq = sim.random_genome(1000, seed=9)
    fastx.write_fasta(path, [("g", seq)])
    py = list(fastx.read_batches(path, batch_size=64, max_len=200))
    nat = list(native_fastx.read_batches(path, batch_size=64, max_len=200))
    assert sum(b.num_reads for b in py) == sum(b.num_reads for b in nat)
    for a, b in zip(py, nat):
        batches_equal(a, b)


def test_throughput_sanity(tmp_path):
    """The native reader should beat the Python one (best-of-3 timing
    with slack, so CPU contention from parallel jobs can't flake it)."""
    import time
    path = str(tmp_path / "big.fq")
    write_test_fastq(path, n=20000, L=100, seed=11)

    def best_of(fn, reps=3):
        best = float("inf")
        count = None
        for _ in range(reps):
            t0 = time.perf_counter()
            count = sum(b.num_reads for b in fn())
            best = min(best, time.perf_counter() - t0)
        return best, count

    t_py, n_py = best_of(lambda: fastx.read_batches(
        path, batch_size=4096, max_len=128))
    t_nat, n_nat = best_of(lambda: native_fastx.read_batches(
        path, batch_size=4096, max_len=128))
    assert n_py == n_nat
    # regression guard, not a strict race: the native reader must stay
    # within striking distance even under load (it wins ~3-5x idle)
    assert t_nat < 1.5 * t_py, (t_nat, t_py)
