"""RResolver: reads disambiguate repeat-crossing paths."""

import numpy as np

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.graph import adjlist, rresolver
from abyss_tpu.graph.contig_graph import node


def test_resolve_two_path_repeat():
    # genome: A-R-B and C-R-D (repeat R shared). True paths: A->R->B,
    # C->R->D; false paths A->R->D, C->R->B.
    rng = np.random.default_rng(200)
    k = 21
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    A, B, C, D = mk(150), mk(150), mk(150), mk(150)
    R = mk(60)  # repeat longer than k, shorter than r
    chrom1 = A + R + B
    chrom2 = C + R + D
    r = 100
    reads = []
    for chrom in (chrom1, chrom2):
        reads += [chrom[i:i + r] for i in range(0, len(chrom) - r + 1, 3)]
    codes = np.full((len(reads), r), 4, np.uint8)
    for i, s in enumerate(reads):
        codes[i, :] = alphabet.encode(s)

    # unitigs as the DBG would produce them: A+R[:k-1]... simply use the
    # five pieces with k-1 overlaps
    o = k - 1
    contigs = [("A", A + R[:o]), ("B", R[-o:] + B), ("C", C + R[:o]),
               ("D", R[-o:] + D), ("R", R)]
    g = adjlist.build_overlap_graph(contigs, k)
    seqs = dict(contigs)
    vR = node(g.id_of("R"), 0)
    assert g.in_degree(vR) == 2 and g.out_degree(vR) == 2

    f = rresolver.build_rmer_filter([codes], r=r, size=1 << 20)
    stats = rresolver.resolve_repeats(g, seqs, f, k,
                                      support_threshold=4)
    # no edge should be cut: all 4 edges participate in supported paths
    # (the repeat is a real shared vertex); but the unsupported paths
    # are known internally
    # both orientations of the junction are tested (R+ and R-)
    assert stats.paths_tested == 8
    assert stats.paths_supported == 4
    assert stats.edges_cut == 0


def test_cut_false_edge():
    # junction created by a k-scale coincidence: contig X's end equals
    # contig Y's start by construction, but no read supports X->Y
    rng = np.random.default_rng(201)
    k = 21
    o = k - 1
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    glue = mk(o)
    X = mk(120) + glue
    Y = glue + mk(120)
    Z = glue + mk(120)  # real continuation
    r = 80
    genome = X + Z[o:]  # reads only cover X->Z
    reads = [genome[i:i + r] for i in range(0, len(genome) - r + 1, 2)]
    codes = np.full((len(reads), r), 4, np.uint8)
    for i, s in enumerate(reads):
        codes[i, :] = alphabet.encode(s)
    contigs = [("X", X), ("Y", Y), ("Z", Z)]
    g = adjlist.build_overlap_graph(contigs, k)
    seqs = dict(contigs)
    vX = node(g.id_of("X"), 0)
    assert g.out_degree(vX) == 2  # X -> Y (false) and X -> Z (true)
    f = rresolver.build_rmer_filter([codes], r=r, size=1 << 20)
    stats = rresolver.resolve_repeats(g, seqs, f, k, support_threshold=4)
    assert stats.edges_cut >= 1
    assert not g.has_edge(vX, node(g.id_of("Y"), 0))
    assert g.has_edge(vX, node(g.id_of("Z"), 0))


def test_read_size_batches_and_default_r():
    """Read-size batching (>=10% fraction) + the reference r heuristic
    min(k+60, size, size-extract+1) (RAlgorithmsShort.cpp:266)."""
    from abyss_tpu.graph.rresolver import default_r, read_size_batches
    lengths = np.array([100] * 80 + [150] * 15 + [75] * 5)
    assert read_size_batches(lengths) == [100, 150]  # 75 is < 10%
    assert default_r(100, 40) == 97   # size - extract + 1
    assert default_r(250, 40) == 100  # k + 60
    assert default_r(100, 96) == 97


def test_resolve_repeats_multi_subiterations():
    """The multi-batch driver runs per-size r values and subiterates
    until no new cuts (resolveShort, RAlgorithmsShort.cpp:1258): a
    false edge from k-scale ambiguity is cut, the true edges stay."""
    rng = np.random.default_rng(321)
    k = 21
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    A, B, D = mk(150), mk(150), mk(150)
    R = mk(60)
    chrom = A + R + B   # only A-R-B exists in the genome
    read_len = 100
    reads = [chrom[i:i + read_len]
             for i in range(0, len(chrom) - read_len + 1, 3)]
    codes = np.full((len(reads), read_len), 4, np.uint8)
    for i, s in enumerate(reads):
        codes[i, :] = alphabet.encode(s)
    o = k - 1
    contigs = [("A", A + R[:o]), ("B", R[-o:] + B), ("D", R[-o:] + D),
               ("R", R)]
    g = adjlist.build_overlap_graph(contigs, k)
    seqs = dict(contigs)
    # D looks graph-adjacent to R (k-1 overlap) but no read supports it
    vR, vD = node(g.id_of("R"), 0), node(g.id_of("D"), 0)
    assert g.has_edge(vR, vD)
    lengths = np.full(len(reads), read_len)
    stats = rresolver.resolve_repeats_multi(
        g, seqs, lambda: iter([codes]), lengths, k=k,
        filter_size=1 << 20, support_threshold=4)
    assert stats.edges_cut > 0
    assert not g.has_edge(vR, vD)
    assert g.has_edge(node(g.id_of("A"), 0), vR)
    assert g.has_edge(vR, node(g.id_of("B"), 0))
