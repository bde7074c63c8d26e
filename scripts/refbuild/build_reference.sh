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

if [ -x "$OUT/abyss-bloom-dbg" ] && [ -x "$OUT/ABYSS" ]; then
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

./abyss-bloom-dbg --version | head -1
./ABYSS --version | head -1
echo "built into $OUT"
