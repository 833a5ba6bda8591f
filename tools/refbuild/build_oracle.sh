#!/bin/bash
# Build the reference-engine oracle binary (VERDICT r1 #9).
#
# The reference's own CMake build is unusable here (no cmake; FetchContent of
# janet/mimalloc/capnproto/bzip2/unordered_dense needs network). This script
# compiles the reference's *reasoning core* sources VERBATIM from
# /root/reference/src/lib with plain g++:
#
#   - ankerl/unordered_dense.h is replaced by an API-compatible std-container
#     shim (tools/refbuild/ankerl/unordered_dense.h) — the only third-party
#     header the core needs.
#   - The Cap'n Proto binary save/load implementation (zelph_impl.hpp:117-1334
#     and the Zelph::save_to_file/load_from_file wrappers) is compiled OUT by
#     renaming its __EMSCRIPTEN__ guard macro in a BUILD-DIRECTORY COPY — the
#     same mechanism the reference's own wasm build uses to exclude native
#     I/O. No reference file is modified in place and no reference code is
#     copied into this repository; the build tree lives in /tmp.
#   - Everything the oracle exercises (zelph.cpp fact/node/merge machinery,
#     unification.cpp, reasoning*.cpp semi-naive fixpoint, zelph_names.cpp)
#     is byte-identical reference code.
#
# Usage: tools/refbuild/build_oracle.sh [build_dir]
# Produces <build_dir>/zelph_oracle. Exits non-zero on failure.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference/src/lib
B="${1:-/tmp/zelph_oracle_build}"

if [ ! -d "$REF" ]; then
    echo "reference sources not found at $REF" >&2
    exit 3
fi

rm -rf "$B"
mkdir -p "$B/src"
cp -r "$REF/network" "$REF/string" "$REF/chrono" "$REF/platform" \
      "$REF/concurrency" "$REF/io" "$REF/wikidata" "$B/src/"
cp "$REF/zelph_export.h" "$B/src/"

python3 - "$B" <<'EOF'
import pathlib, sys
b = pathlib.Path(sys.argv[1])
# Rename the native-I/O guard macro in exactly the two files that guard the
# Cap'n Proto dependency with it; with the macro defined, the wasm-style
# serial/no-binary-IO paths compile instead (pure std C++).
for rel in ("src/network/zelph_impl.hpp", "src/network/zelph_maintenance.cpp"):
    p = b / rel
    t = p.read_text()
    assert "__EMSCRIPTEN__" in t, rel
    p.write_text(t.replace("__EMSCRIPTEN__", "ZELPH_ORACLE_NO_NATIVE_IO"))

# string_utils.hpp uses std::ranges::find_if without including <algorithm>
# (the reference's toolchain pulls it in transitively; g++ 12 does not).
p = b / "src/string/string_utils.hpp"
t = p.read_text()
p.write_text(t.replace("#include <cstdint>", "#include <algorithm>\n#include <cstdint>", 1))

# wikidata.cpp includes the capnp headers but uses no capnp API (the cache
# save it calls goes through Zelph::save_to_file, stubbed in
# oracle_stubs.cpp); drop the two includes so the importer compiles.
p = b / "src/wikidata/wikidata.cpp"
t = p.read_text()
for inc in ("#include <capnp/message.h>", "#include <capnp/serialize-packed.h>", "#include <kj/io.h>"):
    t = t.replace(inc, "")
p.write_text(t)
EOF

cat > "$B/src/network/zelph_version.hpp" <<'EOF'
#pragma once
#include <string>
namespace zelph::network { inline std::string get_zelph_version() { return "oracle"; } }
EOF

SRCS=(
    network/answer.cpp network/neural.cpp network/reasoning.cpp
    network/reasoning_deduce.cpp network/reasoning_evaluate.cpp
    network/reasoning_neural.cpp network/reasoning_pruning.cpp
    network/reasoning_seminaive.cpp network/unification.cpp
    network/zelph.cpp network/zelph_maintenance.cpp network/zelph_names.cpp
    string/node_to_string.cpp string/string_utils.cpp
    chrono/stopwatch.cpp platform/platform_utils.cpp
    io/output.cpp io/markdown.cpp io/mermaid.cpp
    io/data_manager.cpp io/read_async.cpp wikidata/wikidata.cpp
)
OBJS=()
mkdir -p "$B/obj"
for s in "${SRCS[@]}"; do
    o="$B/obj/$(basename "${s%.cpp}").o"
    g++ -std=c++20 -O2 -DNDEBUG -DZELPH_ORACLE_NO_NATIVE_IO \
        -I"$B/src" -I"$B/src/network" -I"$HERE" \
        -c "$B/src/$s" -o "$o" &
    OBJS+=("$o")
done
wait

for extra in oracle_main oracle_stubs; do
    g++ -std=c++20 -O2 -DNDEBUG -DZELPH_ORACLE_NO_NATIVE_IO \
        -I"$B/src" -I"$B/src/network" -I"$HERE" \
        -c "$HERE/$extra.cpp" -o "$B/obj/$extra.o" &
done
wait

g++ "${OBJS[@]}" "$B/obj/oracle_main.o" "$B/obj/oracle_stubs.o" \
    -o "$B/zelph_oracle" -lpthread -lbz2
echo "built $B/zelph_oracle"
