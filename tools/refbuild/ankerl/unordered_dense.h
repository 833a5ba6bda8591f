// Build-shim for the reference oracle build ONLY (tools/refbuild).
//
// The reference (/root/reference) depends on the header-only library
// ankerl::unordered_dense (martinus/unordered_dense v4.8.1), which its CMake
// build FetchContents from GitHub at configure time. This sandbox has no
// network, so the oracle build substitutes this shim: the reference code uses
// only the std-compatible subset of the API (find/end/begin/operator[]/
// insert/erase/contains/size/clear — verified by grep, no .values()/.replace()
// or other dense-specific calls), so plain std containers are drop-in
// API-compatible. Performance differs (that library is a faster flat map);
// semantics do not — which is all an oracle needs.
//
// This file is original shim code, not derived from the upstream library.
#pragma once

#include <unordered_map>
#include <unordered_set>

namespace ankerl::unordered_dense
{
    template <class K, class V, class H = std::hash<K>, class E = std::equal_to<K>>
    using map = std::unordered_map<K, V, H, E>;

    template <class K, class H = std::hash<K>, class E = std::equal_to<K>>
    using set = std::unordered_set<K, H, E>;

    // The reference uses segmented_map only as the adjacency-map type
    // (network.hpp:43); segmentation is a memory-layout optimization with
    // identical observable behavior.
    template <class K, class V, class H = std::hash<K>, class E = std::equal_to<K>>
    using segmented_map = std::unordered_map<K, V, H, E>;
}
