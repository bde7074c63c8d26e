"""Path algebra + MergePaths consensus merging (MergePaths.cpp parity)."""

import pytest

from abyss_tpu.scaffold import path_algebra as pa
from abyss_tpu.graph.contig_graph import node


def V(cid, sense=0):
    return node(cid, sense)


class TestAlignPair:
    # lengths in k-mers, indexed by contig id
    L = [10, 5, 7, 3, 8, 4]

    def test_identical(self):
        p = [V(0), V(1), V(2)]
        c, d = pa.align_pair(self.L, p, list(p), V(1))
        assert d == pa.DIR_B and c == p

    def test_suffix_prefix_overlap(self):
        p1 = [V(0), V(1), V(2)]
        p2 = [V(1), V(2), V(3)]
        c, d = pa.align_pair(self.L, p1, p2, V(1))
        assert d == pa.DIR_F
        assert c == [V(0), V(1), V(2), V(3)]

    def test_subsumed(self):
        p1 = [V(0), V(1), V(2), V(3)]
        p2 = [V(1), V(2)]
        c, d = pa.align_pair(self.L, p1, p2, V(1))
        assert c == p1 and d == pa.DIR_B

    def test_conflict_returns_dir_x(self):
        p1 = [V(0), V(1), V(2)]
        p2 = [V(4), V(1), V(3)]  # disagree on both sides of the pivot
        c, d = pa.align_pair(self.L, p1, p2, V(1))
        assert d == pa.DIR_X and c == []

    def test_gap_filled_by_concrete_path(self):
        # p1 has a 12-kmer gap between 0 and 3; p2 provides 1,2
        # (5+7=12 k-mers) through it -> gap resolved, no N left
        p1 = [V(0), pa.amb(12), V(3)]
        p2 = [V(0), V(1), V(2), V(3)]
        c, d = pa.align_pair(self.L, p1, p2, V(0))
        assert d != pa.DIR_X
        assert c == [V(0), V(1), V(2), V(3)]

    def test_gap_partially_filled_keeps_remainder(self):
        # 10-kmer gap, p2 walks 5 k-mers of it from the left ->
        # consensus keeps contig 1 and a shrunken gap
        p1 = [V(0), pa.amb(10), V(3)]
        p2 = [V(0), V(1)]
        c, d = pa.align_pair(self.L, p1, p2, V(0))
        assert d != pa.DIR_X
        assert c[0] == V(0) and c[1] == V(1)
        assert pa.is_amb(c[2]) and pa.amb_len(c[2]) == 5
        assert c[3] == V(3)

    def test_reverse_complement_symmetry(self):
        p1 = [V(0), V(1), V(2)]
        p2 = pa.path_rc([V(1), V(2), V(3)])
        # p2 as given shares no orientation with p1; align uses the rc
        c, d = pa.align_pair(self.L, p1, pa.path_rc(p2), V(1))
        assert d == pa.DIR_F

    def test_gap_estimate_overridden_by_concrete_walk(self):
        # a gap that directly abuts the alignment seed is filled by the
        # concrete walk regardless of the (estimated) gap length
        # (buildConsensus's it1b==it1e branch trusts the graph walk
        # over the distance estimate)
        p1 = [V(0), pa.amb(3), V(3)]
        p2 = [V(0), V(1), V(2), V(3)]
        c, d = pa.align_pair(self.L, p1, p2, V(0))
        assert d != pa.DIR_X
        assert c == [V(0), V(1), V(2), V(3)]

    def test_incompatible_gap_interior_fails(self):
        # gap followed by concrete interior that p2 contradicts: the
        # seeded fill fails (p2 region does not end with a gap) and the
        # coordinate fill overshoots -> no alignment
        p1 = [V(0), pa.amb(3), V(1), V(3)]
        p2 = [V(0), V(2), V(3)]
        c, d = pa.align_pair(self.L, p1, p2, V(0))
        assert d == pa.DIR_X


class TestMergePaths:
    L = [10, 5, 7, 3, 8, 4]

    def test_chain_merges_to_one(self):
        paths = {
            0: [V(0), V(1)],
            1: [V(0), V(1), V(2)],
            2: [V(1), V(2)],
        }
        out = pa.merge_paths(self.L, paths)
        assert len(out) == 1
        got = out[0]
        want = [V(0), V(1), V(2)]
        assert got == want or got == pa.path_rc(want)

    def test_conflicting_paths_stay_separate(self):
        # seeds 0 and 4 claim different successors of 1: conflict
        paths = {
            0: [V(0), V(1), V(2)],
            4: [V(4), V(1), V(3)],
        }
        out = pa.merge_paths(self.L, paths)
        assert len(out) == 2

    def test_consensus_resolves_greedy_conflict(self):
        # VERDICT #6 regression: seed 1's short path [1,3] conflicts
        # with the longer consistent chain 0-1-2-3; the non-greedy
        # path-graph merge keeps one merged path where greedy
        # first-come order could emit two.
        paths = {
            0: [V(0), V(1), V(2)],
            1: [V(1), V(2), V(3)],
            2: [V(0), V(1), V(2), V(3)],
        }
        out = pa.merge_paths(self.L, paths, greedy=False)
        assert len(out) == 1
        want = [V(0), V(1), V(2), V(3)]
        assert out[0] == want or out[0] == pa.path_rc(want)

    def test_repeat_seed_dropped(self):
        paths = {
            0: [V(0), V(1), V(0)],   # contig 0 twice: tandem repeat
            2: [V(2), V(3)],
        }
        out = pa.merge_paths(self.L, paths)
        flat = {e >> 1 for p in out for e in p if not pa.is_amb(e)}
        assert 0 not in flat
        assert {2, 3} <= flat

    def test_gap_paths_merge_via_coordinates(self):
        # two scaffold-style gap paths over the same span reconcile
        # their gap lengths (alignCoordinates)
        paths = {
            0: [V(0), pa.amb(12), V(3)],
            3: [V(0), V(1), V(2), V(3)],
        }
        out = pa.merge_paths(self.L, paths)
        assert len(out) == 1
        want = [V(0), V(1), V(2), V(3)]
        assert out[0] == want or out[0] == pa.path_rc(want)


class TestPathHelpers:
    def test_rc_involution(self):
        p = [V(0), pa.amb(5), V(3, 1)]
        assert pa.path_rc(pa.path_rc(p)) == p

    def test_amb_roundtrip(self):
        for n in (0, 1, 5, 1000):
            assert pa.is_amb(pa.amb(n))
            assert pa.amb_len(pa.amb(n)) == n
        assert not pa.is_amb(V(3))

    def test_cycle_detection(self):
        L = [10, 5, 7]
        assert pa.path_is_cycle(L, [V(0), V(1), V(0), V(1)])
        assert not pa.path_is_cycle(L, [V(0), V(1), V(2)])
