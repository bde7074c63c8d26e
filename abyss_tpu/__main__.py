"""`python -m abyss_tpu <tool>` — dispatcher over the tool suite,
mirroring the reference's one-binary-per-stage layout (SURVEY.md §2)."""

import sys


TOOLS = {
    "pe": ("abyss-pe pipeline driver", "abyss_tpu.pipeline.pe", "main"),
    "bloom-dbg": ("Bloom-filter de Bruijn graph assembler",
                  "abyss_tpu.cli.tools", "bloom_dbg_main"),
    "assemble": ("exact hash-DBG assembler (ABYSS engine)",
                 "abyss_tpu.cli.tools", "abyss_main"),
    "adjlist": ("contig overlap graph builder (AdjList)",
                "abyss_tpu.cli.tools", "adjlist_main"),
    "fac": ("assembly contiguity statistics (abyss-fac)",
            "abyss_tpu.stats.fac", "main"),
    "tofastq": ("format conversion (abyss-tofastq)",
                "abyss_tpu.cli.tools", "tofastq_main"),
    "todot": ("graph format conversion (abyss-todot)",
              "abyss_tpu.cli.tools", "todot_main"),
    "gc": ("graph statistics (abyss-gc)",
           "abyss_tpu.cli.tools", "gc_main"),
    "konnector": ("connect read pairs through the Bloom DBG (konnector)",
                  "abyss_tpu.cli.tools", "konnector_main"),
    "sealer": ("close scaffold gaps (abyss-sealer)",
               "abyss_tpu.cli.tools", "sealer_main"),
    "db-txt": ("export telemetry database as text (abyss-db-txt)",
               "abyss_tpu.cli.tools", "db_txt_main"),
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m abyss_tpu <tool> [args...]\n\ntools:")
        for name, (desc, _, _) in TOOLS.items():
            print(f"  {name:12s} {desc}")
        return 0
    tool = sys.argv[1]
    if tool not in TOOLS:
        print(f"unknown tool: {tool}", file=sys.stderr)
        return 1
    _, module, fn = TOOLS[tool]
    import importlib
    m = importlib.import_module(module)
    return getattr(m, fn)(sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main() or 0)
