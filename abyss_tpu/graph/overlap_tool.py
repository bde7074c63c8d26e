"""Overlap: connect blunt contigs whose distance estimates imply overlap.

Reimplements Overlap/Overlap.cpp:44-60: for each distance-graph edge
with a negative estimated distance between contigs that are *not*
already connected in the overlap graph, check whether the sequences
actually overlap by about |d| bases (allowing small error and a few
mismatches); add the found edge so path search can walk through it.
"""

from __future__ import annotations

import numpy as np

from ..core import alphabet
from .contig_graph import ContigGraph, node


def _oriented_seq(g: ContigGraph, seqs: dict[str, str], v: int) -> str:
    s = seqs[g.names[v >> 1]]
    return s if (v & 1) == 0 else alphabet.revcomp(s)


def find_overlap(sa: str, sb: str, expected: int, err: int,
                 max_mismatch_frac: float = 0.05) -> int:
    """Actual suffix(sa)/prefix(sb) overlap length near `expected`
    (within +-err); 0 if none acceptable."""
    lo = max(1, expected - err)
    hi = min(len(sa), len(sb), expected + err)
    best, best_mism = 0, 1e9
    for o in range(hi, lo - 1, -1):
        a = np.frombuffer(sa[-o:].encode(), np.uint8)
        b = np.frombuffer(sb[:o].encode(), np.uint8)
        mism = int((a != b).sum())
        if mism <= max_mismatch_frac * o and mism < best_mism:
            best, best_mism = o, mism
            if mism == 0:
                break
    return best


def add_overlap_edges(g: ContigGraph, seqs: dict[str, str],
                      estimates: dict, err_scale: float = 3.0,
                      min_overlap: int = 5) -> int:
    """Add overlap edges implied by negative distance estimates.

    estimates: {(u_name, su, v_name, sv): DistanceEstimate}.  Returns
    number of edges added.
    """
    added = 0
    for (un, su, vn, sv), e in estimates.items():
        if e.distance >= 0:
            continue
        if un not in g._index or vn not in g._index:
            continue
        u = node(g.id_of(un), su)
        v = node(g.id_of(vn), sv)
        if g.has_edge(u, v):
            continue
        err = max(6, int(err_scale * e.std_dev + 0.5))
        o = find_overlap(_oriented_seq(g, seqs, u),
                         _oriented_seq(g, seqs, v), -e.distance, err)
        if o >= min_overlap:
            g.add_edge(u, v, {"d": -o})
            added += 1
    return added
