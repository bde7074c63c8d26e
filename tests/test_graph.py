"""Contig graph, IO, AdjList, and graph-algorithm tests (the style of
Unittest/Graph/*)."""

import io

import numpy as np

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.graph import adjlist, algorithms, graphio
from abyss_tpu.graph.contig_graph import ContigGraph, flip, node


def simple_graph():
    g = ContigGraph()
    for i, L in enumerate([100, 200, 300]):
        g.add_contig(str(i), L, 10 * (i + 1))
    # 0+ -> 1+ -> 2+
    g.add_edge(node(0, 0), node(1, 0), {"d": -24})
    g.add_edge(node(1, 0), node(2, 0), {"d": -24})
    return g


def test_skew_symmetry():
    g = simple_graph()
    assert g.has_edge(node(0, 0), node(1, 0))
    assert g.has_edge(node(1, 1), node(0, 1))  # complement edge
    assert g.predecessors(node(1, 0)) == [node(0, 0)]
    assert g.in_degree(node(2, 0)) == 1
    g.remove_edge(node(0, 0), node(1, 0))
    assert not g.has_edge(node(1, 1), node(0, 1))


def test_remove_contig():
    g = simple_graph()
    g.remove_contig(1)
    assert not g.has_edge(node(0, 0), node(1, 0))
    assert g.out_degree(node(0, 0)) == 0
    assert list(g.contigs()) == [0, 2]


def test_dot_roundtrip():
    g = simple_graph()
    buf = io.StringIO()
    graphio.write_dot(g, buf, k=25)
    text = buf.getvalue()
    assert 'digraph adj {' in text
    assert '"0+" -> "1+"' in text
    assert 'l=100' in text
    g2, k = graphio.read_dot(io.StringIO(text))
    assert k == 25
    assert g2.has_edge(node(g2.id_of("0"), 0), node(g2.id_of("1"), 0))
    assert g2.lengths[g2.id_of("2")] == 300
    assert g2.out[node(g2.id_of("0"), 0)][node(g2.id_of("1"), 0)]["d"] == -24


def test_adj_roundtrip():
    g = simple_graph()
    buf = io.StringIO()
    graphio.write_adj(g, buf)
    text = buf.getvalue()
    g2 = graphio.read_adj(io.StringIO(text))
    assert g2.has_edge(node(g2.id_of("0"), 0), node(g2.id_of("1"), 0))
    assert g2.has_edge(node(g2.id_of("1"), 0), node(g2.id_of("2"), 0))
    assert g2.lengths[g2.id_of("1")] == 200


def test_gfa2_output():
    g = simple_graph()
    buf = io.StringIO()
    graphio.write_gfa2(g, buf, k=25)
    lines = buf.getvalue().splitlines()
    assert lines[0].startswith("H\tVN:Z:2.0")
    assert sum(1 for l in lines if l.startswith("S\t")) == 3
    assert sum(1 for l in lines if l.startswith("E\t")) == 2


def test_adjlist_overlap_graph():
    k = 11
    # a -> b with k-1 overlap; c reverse-complement overlaps b's end
    rng = np.random.default_rng(1)
    a = "".join("ACGT"[i] for i in rng.integers(0, 4, 40))
    b = a[-(k - 1):] + "".join("ACGT"[i] for i in rng.integers(0, 4, 30))
    c = alphabet.revcomp(b[-(k - 1):] +
                         "".join("ACGT"[i] for i in rng.integers(0, 4, 20)))
    g = adjlist.build_overlap_graph([("a", a), ("b", b), ("c", c)], k)
    assert g.has_edge(node(0, 0), node(1, 0))       # a+ -> b+
    assert g.has_edge(node(1, 0), node(2, 1))       # b+ -> c-
    assert g.out[node(0, 0)][node(1, 0)]["d"] == -(k - 1)
    # complements exist
    assert g.has_edge(node(1, 1), node(0, 1))


def test_assemble_chains_and_merge():
    k = 11
    rng = np.random.default_rng(2)
    full = "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
    # split into 3 overlapping pieces
    a, b, c = full[:40], full[30:70], full[60:]
    o = k - 1
    pieces = [("0", full[:40]), ("1", full[40 - o:70]),
              ("2", full[70 - o:])]
    g = adjlist.build_overlap_graph(pieces, k)
    seqs = dict(pieces)
    g2, seqs2, chains = algorithms.merge_linear_chains(g, seqs)
    assert len(chains) == 1 and len(chains[0]) == 3
    merged = [s for s in seqs2.values() if len(s) == 100]
    assert merged and (merged[0] == full or
                       merged[0] == alphabet.revcomp(full))


def test_prune_tips():
    g = ContigGraph()
    for i, L in enumerate([500, 30, 500]):
        g.add_contig(str(i), L, 10)
    # 0+ -> 1+ (short tip), 0+ -> 2+ (real continuation)
    g.add_edge(node(0, 0), node(1, 0), None)
    g.add_edge(node(0, 0), node(2, 0), None)
    removed = algorithms.prune_tips(g, max_len=100)
    assert removed == [1]
    assert g.out_degree(node(0, 0)) == 1


def test_remove_islands():
    g = ContigGraph()
    g.add_contig("0", 1000, 1)
    g.add_contig("1", 50, 1)
    removed = algorithms.remove_islands(g, min_len=200)
    assert removed == [1]
    assert list(g.contigs()) == [0]


def test_pop_bubbles():
    g = ContigGraph()
    for i, (L, C) in enumerate([(500, 50), (49, 40), (49, 3), (500, 50)]):
        g.add_contig(str(i), L, C)
    # 0+ -> {1+, 2+} -> 3+
    g.add_edge(node(0, 0), node(1, 0), None)
    g.add_edge(node(0, 0), node(2, 0), None)
    g.add_edge(node(1, 0), node(3, 0), None)
    g.add_edge(node(2, 0), node(3, 0), None)
    bubbles = algorithms.find_bubbles(g)
    assert len(bubbles) >= 1
    removed = algorithms.pop_bubbles(g)
    assert removed == [2]  # low-coverage branch removed
    # now the graph is a clean chain
    chains = algorithms.assemble_chains(g)
    assert len(chains) == 1 and len(chains[0]) == 3


def test_dist_text_format():
    from abyss_tpu.align.distance_est import DistanceEstimate
    from abyss_tpu.io import formats
    est = {("0", 0, "1", 0): DistanceEstimate(100, 20, 3.5),
           ("0", 1, "2", 0): DistanceEstimate(50, 8, 2.0)}
    buf = io.StringIO()
    formats.write_dist_text(est, buf)
    text = buf.getvalue()
    # sense-1 edges print with the target flipped (DistIO.h: `v ^ sense`)
    assert "0 1+,100,20,3.5 ; 2-,50,8,2.0" in text.replace("  ", " ")


def test_fa_to_agp():
    from abyss_tpu.io import formats
    agp, tigs = formats.fa_to_agp([("s0", "ACGT" * 30 + "N" * 20 +
                                    "TTTT" * 30)])
    assert len(tigs) == 2
    gap_rows = [l for l in agp if "\tN\t" in l]
    assert len(gap_rows) == 1 and "\t20\t" in gap_rows[0]
    w_rows = [l for l in agp if "\tW\t" in l]
    assert len(w_rows) == 2


def test_asqg_writer():
    from abyss_tpu.io import formats
    g = simple_graph()
    buf = io.StringIO()
    formats.write_asqg(g, {"0": "A" * 100, "1": "C" * 200, "2": "G" * 300},
                       buf)
    text = buf.getvalue()
    assert text.startswith("HT\t")
    assert sum(1 for l in text.splitlines() if l.startswith("VT")) == 3
    assert sum(1 for l in text.splitlines() if l.startswith("ED")) == 2


# --- search primitives + snapshot + sub-(k-1) overlaps (round-1 adds) ------

def test_bfs_and_all_paths():
    from abyss_tpu.graph.contig_graph import ContigGraph, node
    from abyss_tpu.graph import algorithms as alg
    g = ContigGraph()
    for i in range(5):
        g.add_contig(str(i), 100)
    for a, b in [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]:
        g.add_edge(node(a, 0), node(b, 0), None)
    d = alg.bfs(g, node(0, 0))
    assert d[node(4, 0)] == 3
    paths = alg.all_paths_search(g, node(0, 0), node(3, 0))
    assert len(paths) == 2
    assert alg.bidirectional_bfs(g, node(0, 0), node(4, 0)) == 3
    assert alg.bidirectional_bfs(g, node(4, 0), node(0, 0)) is None


def test_kmer_snapshot_roundtrip(tmp_path):
    import numpy as np
    from abyss_tpu import sim
    from abyss_tpu.core import alphabet as _a
    from abyss_tpu.dbg import hash_dbg
    g = sim.random_genome(400, seed=31)
    reads = [g[i:i + 60] for i in range(0, 340, 6)]
    arr = np.full((len(reads), 60), 4, np.uint8)
    for i, r in enumerate(reads):
        arr[i, :len(r)] = _a.encode(r)
    t = hash_dbg.count_kmers([arr], 25)
    path = str(tmp_path / "state.kmer")
    hash_dbg.save_snapshot(t, path)
    t2 = hash_dbg.load_snapshot(path)
    assert t2.k == 25
    assert np.array_equal(t.kmers, t2.kmers)
    assert np.array_equal(t.counts, t2.counts)
    # phases on the restored table produce the same contigs
    c1 = hash_dbg.assemble_table(t, kc=1, erode_cov=0, tip_len=0)
    c2 = hash_dbg.assemble_table(t2, kc=1, erode_cov=0, tip_len=0)
    assert c1 == c2


def test_adjlist_sub_k_overlaps():
    from abyss_tpu import sim
    from abyss_tpu.graph import adjlist
    from abyss_tpu.graph.contig_graph import node
    g0 = sim.random_genome(300, seed=32)
    k = 25
    # contigs overlapping by only 15 bases (< k-1)
    contigs = [("a", g0[:150]), ("b", g0[135:])]
    g = adjlist.build_overlap_graph(contigs, k)
    assert g.num_edges() == 0
    g = adjlist.build_overlap_graph(contigs, k, min_overlap=10)
    assert node(1, 0) in g.out[node(0, 0)]
    assert g.out[node(0, 0)][node(1, 0)]["d"] == -15


def test_assemble_stranded():
    """ss= mode: chains keep their own orientation, no rc canonical
    flip (ContigGraphAlgorithms.h assemble_stranded)."""
    from abyss_tpu.graph.contig_graph import ContigGraph, node
    from abyss_tpu.graph import algorithms as alg
    g = ContigGraph()
    for i in range(3):
        g.add_contig(str(i), 100)
    g.add_edge(node(0, 0), node(1, 0), None)
    g.add_edge(node(1, 0), node(2, 0), None)
    chains = alg.assemble_stranded(g)
    # round-4 correction: the IsPositive predicate
    # (ContigGraphAlgorithms.h:228-253) merges only edges whose BOTH
    # endpoints are forward-sense, so the chain is reported ONCE in
    # its forward orientation; the rc mirror (all sense-1 vertices)
    # fails the predicate and is not merged separately
    assert chains == [[node(0, 0), node(1, 0), node(2, 0)]]
    # a mixed-orientation edge never merges in ss mode
    g2 = ContigGraph()
    for i in range(2):
        g2.add_contig(str(i), 100)
    g2.add_edge(node(0, 0), node(1, 1), None)
    assert alg.assemble_stranded(g2) == []


def test_native_adjacency_matches_python():
    """The C++ overlap join and the Python hash join must agree."""
    from abyss_tpu import sim
    from abyss_tpu.graph import adjlist
    g0 = sim.random_genome(3000, seed=41)
    k = 25
    contigs = []
    pos = 0
    i = 0
    while pos + 200 <= len(g0):
        seq = g0[pos:pos + 200]
        from abyss_tpu.core.alphabet import revcomp
        contigs.append((str(i), seq if i % 2 == 0 else revcomp(seq)))
        pos += 200 - (k - 1)
        i += 1
    quads = adjlist._native_overlaps(contigs, k - 1)
    g_native = adjlist.build_overlap_graph(contigs, k)
    # force the python path
    g_py = adjlist.build_overlap_graph(contigs, k, min_overlap=k - 1)
    def edge_set(g):
        out = set()
        for u in g.vertices():
            for v, _ in g.out_edges(u):
                out.add((u, v))
        return out
    assert edge_set(g_native) == edge_set(g_py)
    assert len(edge_set(g_native)) >= 2 * (len(contigs) - 1)
    if quads is not None:
        assert len(quads) >= len(contigs) - 1
