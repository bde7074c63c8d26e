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
    # both orientations of the junction are tested (R+ and R-)
    assert stats.paths_tested == 8
    assert stats.paths_supported == 4
    # the tangle RESOLVES: the repeat splits into one instance per
    # supported context (A->R->B keeps R, C->D threads a copy) —
    # RAlgorithmsShort.cpp's RepeatInstance machinery
    assert stats.repeats_split == 1
    vA, vC = node(g.id_of("A"), 0), node(g.id_of("C"), 0)
    vB, vD = node(g.id_of("B"), 0), node(g.id_of("D"), 0)
    mids_a = g.successors(vA)
    mids_c = g.successors(vC)
    assert len(mids_a) == 1 and len(mids_c) == 1
    assert mids_a != mids_c
    assert g.successors(mids_a[0]) == [vB]
    assert g.successors(mids_c[0]) == [vD]


def test_cut_false_edge():
    # the reference formulation tests (in, repeat, out) triples: a
    # short repeat contig R joins X to both Y (false) and Z (true);
    # reads only ever cross X-R-Z
    rng = np.random.default_rng(201)
    k = 21
    o = k - 1
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    R = mk(40)
    X, Y, Z = mk(120), mk(120), mk(120)
    genome = X + R + Z  # reads only cover X-R-Z
    r = 80
    reads = [genome[i:i + r] for i in range(0, len(genome) - r + 1, 2)]
    codes = np.full((len(reads), r), 4, np.uint8)
    for i, s in enumerate(reads):
        codes[i, :] = alphabet.encode(s)
    contigs = [("X", X + R[:o]), ("R", R), ("Y", R[-o:] + Y),
               ("Z", R[-o:] + Z)]
    g = adjlist.build_overlap_graph(contigs, k)
    seqs = dict(contigs)
    vR = node(g.id_of("R"), 0)
    assert g.out_degree(vR) == 2  # R -> Y (false) and R -> Z (true)
    f = rresolver.build_rmer_filter([codes], r=r, size=1 << 20)
    stats = rresolver.resolve_repeats(g, seqs, f, k, support_threshold=4)
    assert stats.edges_cut >= 1
    assert not g.has_edge(vR, node(g.id_of("Y"), 0))
    assert g.has_edge(vR, node(g.id_of("Z"), 0))


def test_unknown_paths_never_cut():
    """A junction whose margins do not fit (head shorter than the
    margin) is UNKNOWN: the reference keeps such paths
    (Support::good() is true for unknown,  RAlgorithmsShort.h:152) —
    cutting a true join on missing evidence is the failure mode the
    margin rules exist to prevent."""
    rng = np.random.default_rng(77)
    k = 21
    o = k - 1
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    R = mk(40)
    X, Y, Z = mk(10), mk(120), mk(120)   # X far too short for margins
    r = 80
    contigs = [("X", X + R[:o]), ("R", R), ("Y", R[-o:] + Y),
               ("Z", R[-o:] + Z)]
    g = adjlist.build_overlap_graph(contigs, k)
    seqs = dict(contigs)
    # an EMPTY filter: nothing is supported by evidence, yet nothing
    # may be cut because every path is unknown
    f = rresolver.build_rmer_filter([], r=r, size=1 << 20)
    stats = rresolver.resolve_repeats(g, seqs, f, k, support_threshold=4)
    assert stats.edges_cut == 0


def test_window_battery_margins():
    """_path_windows returns the margin-confined battery: ~min_tests
    windows, each straddling the repeat by construction
    (getMargin, RAlgorithmsShort.cpp:88-96)."""
    rng = np.random.default_rng(5)
    k = 21
    o = k - 1
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    R = mk(40)
    X, Z = mk(120), mk(120)
    contigs = [("X", X + R[:o]), ("R", R), ("Z", R[-o:] + Z)]
    g = adjlist.build_overlap_graph(contigs, k)
    seqs = dict(contigs)
    vX, vR, vZ = (node(g.id_of(n), 0) for n in ("X", "R", "Z"))
    r = 80
    wins = rresolver._path_windows(g, seqs, (vX, vR, vZ), k, r,
                                   min_tests=18, max_tests=40)
    # possibleTests in {tests, tests+1}
    assert len(wins) in (18, 19)
    assert all(len(w) == r for w in wins)
    # every window straddles the full repeat (margin construction)
    merged = (X + R + Z)
    for w in wins:
        pos = merged.find(w)
        assert pos >= 0
        assert pos <= len(X) and pos + r >= len(X) + len(R)


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


def test_resolved_repeat_duplication():
    """A repeat in two read-supported contexts (A-R-B and C-R-D) is
    SPLIT into instance copies (RAlgorithmsShort.cpp:1002-1060): the
    original keeps one context, a copy takes the other, and the cross
    pairings disappear."""
    rng = np.random.default_rng(7)
    k = 21
    o = k - 1
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    R = mk(40)
    A, B, C, D = (mk(120) for _ in range(4))
    gen1 = A + R + B
    gen2 = C + R + D
    r = 80
    reads = []
    for gen in (gen1, gen2):
        reads += [gen[i:i + r] for i in range(0, len(gen) - r + 1, 2)]
    codes = np.full((len(reads), r), 4, np.uint8)
    for i, s in enumerate(reads):
        codes[i, :] = alphabet.encode(s)
    contigs = [("A", A + R[:o]), ("C", C + R[:o]), ("R", R),
               ("B", R[-o:] + B), ("D", R[-o:] + D)]
    g = adjlist.build_overlap_graph(contigs, k)
    seqs = dict(contigs)
    f = rresolver.build_rmer_filter([codes], r=r, size=1 << 20)
    stats = rresolver.resolve_repeats(g, seqs, f, k, support_threshold=4)
    assert stats.repeats_split == 1
    vA, vC = node(g.id_of("A"), 0), node(g.id_of("C"), 0)
    vB, vD = node(g.id_of("B"), 0), node(g.id_of("D"), 0)
    vR = node(g.id_of("R"), 0)
    copy_name = [g.names[c] for c in g.contigs()
                 if g.names[c].startswith("Rr")]
    assert len(copy_name) == 1
    vRc = node(g.id_of(copy_name[0]), 0)
    assert seqs[copy_name[0]] == R
    # each context threads its own repeat copy, no cross wiring
    succ_of = {}
    for vin, vout in ((vA, vB), (vC, vD)):
        mids = [m for m in g.successors(vin) if m in (vR, vRc)]
        assert len(mids) == 1
        assert g.successors(mids[0]) == [vout]
        succ_of[vin] = mids[0]
    assert succ_of[vA] != succ_of[vC]
