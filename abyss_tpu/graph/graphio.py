"""Contig-graph file IO: .dot (abyss dialect), .adj, .gfa2, .dist.

Format references:
  .dot  Graph/DotIO.h:75-140 (write), :250-330 (read)
  .adj  Graph/AdjIO.h:29-60
  .gfa2 Graph/GfaIO.h
  .dist Graph/DistIO.h / Common/Estimate.h ("d,n,sd" DIST format)
"""

from __future__ import annotations

import io
import os
import re
from typing import Iterable

from .contig_graph import ContigGraph, flip, node, parse_vertex_name


def _vprop_str(g: ContigGraph, cid: int) -> str:
    return f"l={g.lengths[cid]} C={g.coverages[cid]}"


def _eprop_str(prop: dict | None) -> str:
    if not prop:
        return ""
    if "n" in prop and "sd" in prop:  # DistanceEst edge
        return f"d={prop.get('d', 0)} e={prop['sd']:.1f} n={prop['n']}"
    if "d" in prop:
        return f"d={prop['d']}"
    return ""


def write_dot(g: ContigGraph, out, k: int = 0, graph_name: str = "adj"):
    """GraphViz dot in the reference dialect (DotIO.h:82-115)."""
    own = isinstance(out, (str, os.PathLike))
    f = open(out, "w") if own else out
    try:
        f.write(f"digraph {graph_name} {{\n")
        if k > 0:
            f.write(f"graph [k={k}]\n")
            f.write(f"edge [d={-(k - 1)}]\n")
        for v in g.vertices():
            if v & 1 == 0:
                f.write(f'"{g.name(v)}" [{_vprop_str(g, v >> 1)}]\n')
                f.write(f'"{g.name(flip(v))}" [{_vprop_str(g, v >> 1)}]\n')
        default_d = -(k - 1) if k > 0 else None
        for u in g.vertices():
            edges = g.out_edges(u)
            if not edges:
                continue
            # edges with non-default properties are written one per line
            plain = [v for v, p in edges
                     if not p or (len(p) == 1 and p.get("d") == default_d)]
            special = [(v, p) for v, p in edges
                       if p and not (len(p) == 1 and p.get("d") == default_d)]
            if plain:
                f.write(f'"{g.name(u)}" ->')
                if len(plain) > 1:
                    f.write(" {")
                for v in plain:
                    f.write(f' "{g.name(v)}"')
                if len(plain) > 1:
                    f.write(" }")
                f.write("\n")
            for v, p in special:
                f.write(f'"{g.name(u)}" -> "{g.name(v)}" [{_eprop_str(p)}]\n')
        f.write("}\n")
    finally:
        if own:
            f.close()


_DOT_VERTEX = re.compile(r'^"([^"]+)"\s*(?:\[(.*)\])?\s*$')
_DOT_EDGE = re.compile(r'^"([^"]+)"\s*->\s*(.*)$')
_PROP = re.compile(r'(\w+)\s*=\s*("[^"]*"|[-\w.,]+)')


def _parse_props(s: str) -> dict:
    out = {}
    for m in _PROP.finditer(s or ""):
        key, val = m.group(1), m.group(2).strip('"')
        try:
            out[key] = int(val)
        except ValueError:
            try:
                out[key] = float(val)
            except ValueError:
                out[key] = val
    return out


def read_dot(path_or_file) -> tuple[ContigGraph, int]:
    """Read the abyss dot dialect. Returns (graph, k)."""
    own = isinstance(path_or_file, (str, os.PathLike))
    f = open(path_or_file) if own else path_or_file
    g = ContigGraph()
    k = 0
    default_edge: dict = {}
    try:
        for line in f:
            line = line.strip().rstrip(";")
            if not line or line.startswith(("digraph", "}")):
                continue
            if line.startswith("graph ["):
                k = _parse_props(line).get("k", 0)
                continue
            if line.startswith("edge ["):
                default_edge = _parse_props(line)
                continue
            m = _DOT_EDGE.match(line)
            if m:
                uname = m.group(1)
                rest = m.group(2).strip()
                prop = default_edge.copy()
                pm = re.search(r'\[(.*)\]\s*$', rest)
                if pm:
                    prop.update(_parse_props(pm.group(1)))
                    rest = rest[:pm.start()].strip()
                targets = re.findall(r'"([^"]+)"', rest)
                u = _ensure_vertex(g, uname)
                for tname in targets:
                    v = _ensure_vertex(g, tname)
                    g.out[u][v] = dict(prop) if prop else None
                    g.out[flip(v)][flip(u)] = dict(prop) if prop else None
                continue
            m = _DOT_VERTEX.match(line)
            if m:
                vname = m.group(1)
                props = _parse_props(m.group(2) or "")
                v = _ensure_vertex(g, vname)
                if "l" in props:
                    g.lengths[v >> 1] = int(props["l"])
                if "C" in props:
                    g.coverages[v >> 1] = int(props["C"])
    finally:
        if own:
            f.close()
    return g, k


def _ensure_vertex(g: ContigGraph, vname: str) -> int:
    base = vname[:-1]
    if base not in g._index:
        g.add_contig(base)
    return parse_vertex_name(vname, g._index)


def write_adj(g: ContigGraph, out, with_props: bool = True):
    """The .adj adjacency format (AdjIO.h:29-60): one line per contig:
    `<name> l=<len> C=<cov>\\t; <fwd neighbours>\\t; <rev neighbours>`
    where rev neighbours are printed flipped."""
    own = isinstance(out, (str, os.PathLike))
    f = open(out, "w") if own else out
    try:
        for cid in g.contigs():
            f.write(g.names[cid])
            if with_props:
                f.write(f" {_vprop_str(g, cid)}")
            for sense_ in (0, 1):
                f.write("\t;")
                u = node(cid, sense_)
                for v in g.successors(u):
                    f.write(f" {g.name(v ^ sense_)}")
            f.write("\n")
    finally:
        if own:
            f.close()


def read_adj(path_or_file) -> ContigGraph:
    own = isinstance(path_or_file, (str, os.PathLike))
    f = open(path_or_file) if own else path_or_file
    g = ContigGraph()
    lines = []
    try:
        for line in f:
            if not line.strip():
                continue
            lines.append(line.rstrip("\n"))
        # first pass: create contigs
        for line in lines:
            head = line.split("\t")[0]
            parts = head.split()
            name = parts[0]
            props = _parse_props(" ".join(parts[1:]))
            g.add_contig(name, props.get("l", 0), props.get("C", 0))
        # second pass: edges
        for line in lines:
            fields = line.split("\t")
            name = fields[0].split()[0]
            cid = g.id_of(name)
            for sense_, fld in enumerate(fields[1:3]):
                fld = fld.lstrip(";").strip()
                u = node(cid, sense_)
                for vname in fld.split():
                    v = parse_vertex_name(vname, g._index) ^ sense_
                    g.out[u][v] = None
                    g.out[flip(v)][flip(u)] = None
    finally:
        if own:
            f.close()
    return g


def write_gfa2(g: ContigGraph, out, k: int, seqs: dict[str, str] | None = None):
    """GFA2 (Graph/GfaIO.h): S lines per contig, E lines per edge with
    k-1 overlap alignments."""
    own = isinstance(out, (str, os.PathLike))
    f = open(out, "w") if own else out
    try:
        f.write("H\tVN:Z:2.0\n")
        for cid in g.contigs():
            seq = (seqs or {}).get(g.names[cid], "*")
            f.write(f"S\t{g.names[cid]}\t{g.lengths[cid]}\t{seq}\n")
        seen = set()
        for u in g.vertices():
            for v, p in g.out_edges(u):
                if (flip(v), flip(u)) in seen:
                    continue
                seen.add((u, v))
                d = (p or {}).get("d", -(k - 1))
                o = -d
                lu, lv = g.length(u), g.length(v)
                f.write(
                    f"E\t*\t{g.name(u)}\t{g.name(v)}\t"
                    f"{lu - o}\t{lu}$\t0\t{o}\t{o}M\n")
    finally:
        if own:
            f.close()


def write_graph(g: ContigGraph, path: str, k: int = 0,
                fmt: str | None = None, **kw):
    """Dispatch on extension like GraphIO.h:102."""
    fmt = fmt or os.path.splitext(path)[1].lstrip(".")
    if fmt in ("dot", "gv"):
        write_dot(g, path, k=k)
    elif fmt == "adj":
        write_adj(g, path)
    elif fmt in ("gfa", "gfa2"):
        write_gfa2(g, path, k=k, **kw)
    else:
        raise ValueError(f"unknown graph format: {fmt}")


def read_graph(path: str) -> tuple[ContigGraph, int]:
    ext = os.path.splitext(path)[1].lstrip(".")
    if ext in ("dot", "gv"):
        return read_dot(path)
    if ext == "adj":
        return read_adj(path), 0
    raise ValueError(f"unknown graph format: {ext}")
