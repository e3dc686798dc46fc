/* Minimal TGD I/O shim — parity-harness-only code (see array.hpp header note).
 *
 * TGD::save / TGD::load use a private binary container format ("TGDS") no
 * matter what extension the caller asks for; the Python reader/writer lives in
 * parity/tgdshim.py. Format (little-endian):
 *   magic  8 bytes  "TGDSHIM1"
 *   u32    type     (TGD::Type enum value)
 *   u32    comps
 *   u32    ndims
 *   u64    dims[ndims]          (dims[0] fastest-varying, e.g. width)
 *   u32    ntags; ntags * (u32 klen, bytes key, u32 vlen, bytes value)  [global tags]
 *   raw    elementCount*comps*typeSize bytes, element-major
 */

#pragma once

#include <cstdio>
#include <string>

#include "array.hpp"

namespace TGD {

enum Error {
    ErrorNone = 0,
    ErrorFormatUnsupported = 1,
    ErrorSysErrno = 2,
    ErrorInvalidData = 3
};

inline const char* strerror(Error e)
{
    switch (e) {
    case ErrorNone: return "success";
    case ErrorFormatUnsupported: return "format not supported by TGD shim";
    case ErrorSysErrno: return "I/O error";
    default: return "invalid data";
    }
}

inline bool save(const ArrayContainer& a, const std::string& fileName,
                 bool /*append*/ = false, Error* error = nullptr,
                 const TagList& /*hints*/ = TagList())
{
    FILE* f = std::fopen(fileName.c_str(), "wb");
    if (!f) {
        if (error)
            *error = ErrorSysErrno;
        return false;
    }
    auto w32 = [&](uint32_t v) { std::fwrite(&v, 4, 1, f); };
    auto w64 = [&](uint64_t v) { std::fwrite(&v, 8, 1, f); };
    std::fwrite("TGDSHIM1", 8, 1, f);
    w32(static_cast<uint32_t>(a.componentType()));
    w32(static_cast<uint32_t>(a.componentCount()));
    w32(static_cast<uint32_t>(a.dimensionCount()));
    for (size_t d = 0; d < a.dimensionCount(); d++)
        w64(a.dimension(d));
    const auto& tags = a.globalTagList()._tags;
    w32(static_cast<uint32_t>(tags.size()));
    for (const auto& kv : tags) {
        w32(static_cast<uint32_t>(kv.first.size()));
        std::fwrite(kv.first.data(), 1, kv.first.size(), f);
        w32(static_cast<uint32_t>(kv.second.size()));
        std::fwrite(kv.second.data(), 1, kv.second.size(), f);
    }
    std::fwrite(a.data(), 1, a.dataSize(), f);
    std::fclose(f);
    if (error)
        *error = ErrorNone;
    return true;
}

inline ArrayContainer load(const std::string& fileName,
                           const TagList& /*hints*/ = TagList(),
                           Error* error = nullptr)
{
    /* Loads only the shim format. For reference scenes whose MTL references
     * ordinary image files, the harness pre-converts them with
     * parity/tgdshim.py and this loader transparently retries with the
     * ".tgdshim" suffix. */
    FILE* f = std::fopen(fileName.c_str(), "rb");
    char magic[8] = {0};
    if (f) {
        if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "TGDSHIM1", 8) != 0) {
            std::fclose(f);
            f = nullptr;
        }
    }
    if (!f) {
        f = std::fopen((fileName + ".tgdshim").c_str(), "rb");
        if (f && (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "TGDSHIM1", 8) != 0)) {
            std::fclose(f);
            f = nullptr;
        }
    }
    if (!f) {
        if (error)
            *error = ErrorFormatUnsupported;
        return ArrayContainer();
    }
    auto r32 = [&]() { uint32_t v = 0; if (std::fread(&v, 4, 1, f) != 1) v = 0; return v; };
    auto r64 = [&]() { uint64_t v = 0; if (std::fread(&v, 8, 1, f) != 1) v = 0; return v; };
    Type type = static_cast<Type>(r32());
    size_t comps = r32();
    size_t ndims = r32();
    std::vector<size_t> dims(ndims);
    for (size_t d = 0; d < ndims; d++)
        dims[d] = r64();
    ArrayContainer a(dims, comps, type);
    uint32_t ntags = r32();
    for (uint32_t i = 0; i < ntags; i++) {
        uint32_t kl = r32();
        std::string k(kl, '\0');
        if (std::fread(k.data(), 1, kl, f) != kl) break;
        uint32_t vl = r32();
        std::string v(vl, '\0');
        if (std::fread(v.data(), 1, vl, f) != vl) break;
        a.globalTagList().set(k, v);
    }
    size_t got = std::fread(a.data(), 1, a.dataSize(), f);
    std::fclose(f);
    if (error)
        *error = (got == a.dataSize()) ? ErrorNone : ErrorInvalidData;
    return a;
}

} // namespace TGD
