"""Small format converters: .dist text, AGP, ASQG.

Reference: Graph/DistIO.h (write_dist), bin/abyss-fatoagp (Perl,
scaffolds -> AGP 2.0 + scaftigs), Graph/AsqgIO.h (SGA's ASQG overlap
graph format).
"""

from __future__ import annotations

import os
import re


def write_dist_text(estimates: dict, out):
    """The `.dist` text format (DistIO.h): one line per contig,
    `<name> <v>,<d>,<n>,<sd> ... ; <reverse-sense edges>`."""
    own = isinstance(out, (str, os.PathLike))
    f = open(out, "w") if own else out
    ss = "+-"
    try:
        by_contig: dict[str, dict[int, list]] = {}
        for (un, su, vn, sv), e in estimates.items():
            by_contig.setdefault(un, {0: [], 1: []})[su].append(
                (vn, sv, e))
        for name in sorted(by_contig, key=str):
            f.write(name)
            for sense in (0, 1):
                if sense == 1:
                    f.write(" ;")
                for vn, sv, e in by_contig[name][sense]:
                    f.write(f" {vn}{ss[sv ^ sense]},{e.distance},"
                            f"{e.num_pairs},{e.std_dev:.1f}")
            f.write("\n")
    finally:
        if own:
            f.close()


def fa_to_agp(scaffolds: list[tuple[str, str]], min_gap: int = 1,
              min_contig: int = 50):
    """Scaffold FASTA -> (AGP 2.0 lines, scaftigs) like abyss-fatoagp:
    each N-run >= min_gap becomes a gap row; flanking runs become W rows
    referencing extracted scaftigs."""
    agp_lines = []
    scaftigs = []
    for name, seq in scaffolds:
        part = 1
        pos = 0
        idx = 0
        for m in re.finditer(rf"N{{{min_gap},}}|[^N]+", seq):
            s, e = m.span()
            if m.group(0).startswith("N"):
                agp_lines.append(
                    f"{name}\t{s + 1}\t{e}\t{part}\tN\t{e - s}\t"
                    f"scaffold\tyes\tpaired-ends")
            else:
                tig_name = f"{name}_{idx}"
                scaftigs.append((tig_name, m.group(0)))
                agp_lines.append(
                    f"{name}\t{s + 1}\t{e}\t{part}\tW\t{tig_name}\t1\t"
                    f"{e - s}\t+")
                idx += 1
            part += 1
    scaftigs = [(n, s) for n, s in scaftigs if len(s) >= min_contig]
    return agp_lines, scaftigs


def write_asqg(g, seqs: dict[str, str], out):
    """ASQG overlap graph (Graph/AsqgIO.h): HT header, VT vertices,
    ED edges with overlap coordinates."""
    own = isinstance(out, (str, os.PathLike))
    f = open(out, "w") if own else out
    try:
        f.write("HT\tVN:i:1\tER:f:0\tOL:i:0\tIN:Z:abyss_tpu\n")
        for cid in g.contigs():
            name = g.names[cid]
            f.write(f"VT\t{name}\t{seqs.get(name, '*')}\n")
        seen = set()
        for u in g.vertices():
            for v, prop in g.out_edges(u):
                if ((v ^ 1), (u ^ 1)) in seen:
                    continue
                seen.add((u, v))
                d = (prop or {}).get("d", 0)
                o = max(-d, 0)
                lu = g.length(u)
                lv = g.length(v)
                su = 1 if (u & 1) else 0
                sv = 1 if (v & 1) else 0
                # ED: u v ustart uend ulen vstart vend vlen rc numdiff
                rc = 1 if su != sv else 0
                f.write(
                    f"ED\t{g.names[u >> 1]} {g.names[v >> 1]} "
                    f"{lu - o} {lu - 1} {lu} 0 {o - 1} {lv} {rc} 0\n")
    finally:
        if own:
            f.close()
