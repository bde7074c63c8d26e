#!/bin/sh
# Build the reference ABySS binaries (abyss-bloom-dbg, ABYSS) from
# /root/reference for output-parity testing (VERDICT round-1 item #3).
#
# The image has no autotools and no boost, so this drives g++ directly
# with a hand-written config.h and a minimal clean-room boost stub
# (scripts/refbuild/stub/ — SFINAE-friendly graph_traits, property-map
# tags, tuple/tie, shared_array, multi_index-as-vector).  ABySS only
# uses boost for trait scaffolding (it specializes graph_traits for its
# own graph types, Assembly/DBG.h:437), which is why ~300 lines of stub
# suffice.  sqlite is disabled (-D_SQL=0, no sqlite3.h in image).
#
# Usage: scripts/refbuild/build_reference.sh [outdir]   (default /tmp/refbuild)
set -e
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${1:-/tmp/refbuild}
mkdir -p "$OUT"

if [ -x "$OUT/abyss-bloom-dbg" ] && [ -x "$OUT/ABYSS" ] \
   && [ -x "$OUT/konnector" ] && [ -x "$OUT/abyss-map" ] \
   && [ -x "$OUT/DistanceEst" ] && [ -x "$OUT/abyss-paired-dbg" ]; then
    echo "reference binaries already built in $OUT"
    exit 0
fi

CXXFLAGS="-std=c++17 -O2 -fopenmp -include getopt.h -D_SQL=0 \
 -I$HERE -I$HERE/stub -I$REF -I$REF/Common -I$REF/DataLayer -I$REF/vendor"

cd "$OUT"
for f in "$REF"/Common/Fcontrol.cpp "$REF"/Common/Histogram.cpp \
         "$REF"/Common/Kmer.cpp "$REF"/Common/Log.cpp \
         "$REF"/Common/Options.cpp "$REF"/Common/Sequence.cpp \
         "$REF"/Common/SignalHandler.cpp "$REF"/Common/Timer.cpp \
         "$REF"/Common/Uncompress.cpp "$REF"/Common/city.cc \
         "$REF"/Common/ContigID.cpp "$REF"/DataLayer/FastaReader.cpp \
         "$REF"/DataLayer/FastaWriter.cpp; do
    o="lib_$(basename "$f" | sed 's/\.[^.]*$/.o/')"
    [ -f "$o" ] || g++ $CXXFLAGS -c "$f" -o "$o"
done

g++ $CXXFLAGS -c "$REF"/BloomDBG/bloom-dbg.cc -o bloom-dbg.o
g++ $CXXFLAGS -o abyss-bloom-dbg bloom-dbg.o lib_*.o -lz

for f in "$REF"/ABYSS/abyss.cc "$REF"/Assembly/AssemblyAlgorithms.cc \
         "$REF"/Assembly/Options.cc "$REF"/DataBase/DB.cc; do
    o="abyss_$(basename "$f" | sed 's/\.[^.]*$/.o/')"
    [ -f "$o" ] || g++ $CXXFLAGS -c "$f" -o "$o"
done
g++ $CXXFLAGS -o ABYSS abyss_abyss.o abyss_AssemblyAlgorithms.o \
    abyss_Options.o abyss_DB.o lib_*.o -lz

# ---- stage-2..8 contig-graph tools (round-3 verdict #4: prove
# stage-chain parity against the reference's own binaries) ----
CXXFLAGS="$CXXFLAGS -I$REF/Align -I$REF/dialign"

for f in "$REF"/Align/alignGlobal.cc "$REF"/Align/smith_waterman.cpp \
         "$REF"/Align/dialign.cpp "$REF"/Align/dna_diag_prob.cc; do
    o="align_$(basename "$f" | sed 's/\.[^.]*$/.o/')"
    [ -f "$o" ] || g++ $CXXFLAGS -c "$f" -o "$o"
done
for f in "$REF"/dialign/*.c; do
    case "$f" in *museq.c) continue;; esac   # has its own main()
    o="dialign_$(basename "$f" .c).o"
    [ -f "$o" ] || gcc -O2 -I"$REF"/dialign -c "$f" -o "$o"
done
# opt globals minus `verbose` for tools that define their own
[ -f opt_noverbose.o ] || {
    printf 'namespace opt {\nbool colourSpace;\nint rank = -1;\nint numProc = 1;\n}\n' > opt_noverbose.cpp
    g++ $CXXFLAGS -c opt_noverbose.cpp -o opt_noverbose.o
}

build_tool() {  # build_tool <binary> <source> [extra objects...]
    bin=$1; src=$2; shift 2
    [ -x "$bin" ] && return 0
    o="tool_$(basename "$src" | sed 's/\.[^.]*$/.o/')"
    [ -f "$o" ] || g++ $CXXFLAGS -c "$src" -o "$o"
    g++ $CXXFLAGS -o "$bin" "$o" "$@" abyss_DB.o -lz -lm
}

LIBS_NOOPT=$(ls lib_*.o | grep -v Options)
build_tool AdjList          "$REF"/AdjList/AdjList.cpp        lib_*.o
build_tool abyss-filtergraph "$REF"/FilterGraph/FilterGraph.cc lib_*.o
build_tool MergeContigs     "$REF"/MergePaths/MergeContigs.cpp align_alignGlobal.o align_smith_waterman.o lib_*.o
build_tool PopBubbles       "$REF"/PopBubbles/PopBubbles.cpp  align_alignGlobal.o align_smith_waterman.o lib_*.o
build_tool Overlap          "$REF"/Overlap/Overlap.cpp        align_alignGlobal.o align_smith_waterman.o lib_*.o
build_tool SimpleGraph      "$REF"/SimpleGraph/SimpleGraph.cpp lib_*.o
build_tool MergePaths       "$REF"/MergePaths/MergePaths.cpp  lib_*.o
build_tool PathOverlap      "$REF"/PathOverlap/PathOverlap.cpp lib_*.o
build_tool abyss-scaffold   "$REF"/Scaffold/scaffold.cc       $LIBS_NOOPT opt_noverbose.o
build_tool PathConsensus    "$REF"/MergePaths/PathConsensus.cpp align_*.o dialign_*.o lib_*.o

# ---- alignment stack (round-3 verdict #2: stages 4-5 parity + the
# full-pipeline head-to-head need abyss-map/fixmate/DistanceEst) ----
CXXFLAGS="$CXXFLAGS -I$REF/FMIndex"
[ -f fm_bit_array.o ] || g++ $CXXFLAGS -c "$REF"/FMIndex/bit_array.cc -o fm_bit_array.o
build_tool abyss-map        "$REF"/Map/map.cc                 fm_bit_array.o lib_*.o
build_tool abyss-index      "$REF"/Map/index.cc               fm_bit_array.o lib_*.o
build_tool abyss-fixmate    "$REF"/ParseAligns/abyss-fixmate.cc lib_*.o
[ -f tool_MLE.o ] || g++ $CXXFLAGS -c "$REF"/DistanceEst/MLE.cpp -o tool_MLE.o
build_tool DistanceEst      "$REF"/DistanceEst/DistanceEst.cpp tool_MLE.o lib_*.o

# ---- konnector (round-3 verdict #4: engine parity) ----
build_tool konnector        "$REF"/Konnector/konnector.cc     align_alignGlobal.o align_smith_waterman.o lib_*.o

# ---- paired DBG (round-3 verdict #5: BASELINE config #4) ----
if [ ! -x abyss-paired-dbg ]; then
    # -include iterator: PairedDBG/BranchRecord.h uses
    # std::ostream_iterator without including <iterator>
    for f in "$REF"/ABYSS/abyss.cc "$REF"/Assembly/AssemblyAlgorithms.cc \
             "$REF"/Assembly/Options.cc "$REF"/PairedDBG/KmerPair.cc; do
        o="pdbg_$(basename "$f" | sed 's/\.[^.]*$/.o/')"
        [ -f "$o" ] || g++ $CXXFLAGS -DPAIRED_DBG -include iterator \
            -c "$f" -o "$o"
    done
    g++ $CXXFLAGS -DPAIRED_DBG -o abyss-paired-dbg pdbg_*.o abyss_DB.o lib_*.o -lz
fi

./abyss-bloom-dbg --version | head -1
./ABYSS --version | head -1
for b in AdjList abyss-filtergraph MergeContigs PopBubbles Overlap \
         SimpleGraph MergePaths PathOverlap abyss-scaffold PathConsensus \
         abyss-map abyss-fixmate DistanceEst konnector abyss-paired-dbg; do
    ./$b --version | head -1
done
echo "built into $OUT"
