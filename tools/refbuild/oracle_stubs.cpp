/*
Link stubs for the oracle build (original code; see build_oracle.sh).

The Cap'n Proto-backed binary save/load implementation is compiled out of
the oracle build (no capnproto offline). These definitions satisfy the
linker for call sites that reference the API — e.g. the importer's
post-import cache save, which wraps the call in try/catch and proceeds on
failure (wikidata.cpp:346-357) — by throwing instead of serializing.
*/

#include "network/zelph.hpp"

#include <stdexcept>

namespace zelph::network
{
    namespace
    {
        [[noreturn]] void disabled()
        {
            throw std::runtime_error(
                "binary save/load is disabled in the oracle build");
        }
    }

    void Zelph::save_to_file(const std::string&) const { disabled(); }

    void Zelph::load_from_file(const std::string&) const { disabled(); }

    void Zelph::load_from_file(const std::string&,
                               const BinChunkSelection&,
                               bool) const { disabled(); }

    void Zelph::load_from_manifest(const std::string&,
                                   const BinChunkSelection&,
                                   const std::string&,
                                   const std::string&,
                                   bool) const { disabled(); }
}
