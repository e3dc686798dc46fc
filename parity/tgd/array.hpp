/* Minimal TGD (libtgd) API shim — parity-harness-only code.
 *
 * The reference (marlam/wurblpt) depends on the external libtgd library for
 * N-dimensional tagged arrays (SURVEY.md section 2.1 "libtgd"). libtgd is not
 * available in this environment, so this header re-implements, from the call
 * sites visible in the reference headers, exactly the subset of the TGD API
 * the reference uses: Array<T>/ArrayContainer with per-global/dimension/
 * component tag lists, element and {x,y} indexing, and save/load of a simple
 * private binary format (see io.hpp; the Python side reads it with
 * parity/tgdshim.py). This is original code written for the parity harness —
 * NOT a copy of libtgd — and is not part of the wurblpt_tpu framework.
 */

#pragma once

#include <cassert>
#include <cstdint>
#include <cstring>
#include <initializer_list>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace TGD {

enum Type {
    int8 = 0,
    uint8 = 1,
    int16 = 2,
    uint16 = 3,
    int32 = 4,
    uint32 = 5,
    int64 = 6,
    uint64 = 7,
    float32 = 8,
    float64 = 9
};

inline size_t typeSize(Type t)
{
    switch (t) {
    case int8: case uint8: return 1;
    case int16: case uint16: return 2;
    case int32: case uint32: case float32: return 4;
    default: return 8;
    }
}

template <typename T> struct TypeOf;
template <> struct TypeOf<int8_t>   { static constexpr Type value = int8; };
template <> struct TypeOf<uint8_t>  { static constexpr Type value = uint8; };
template <> struct TypeOf<int16_t>  { static constexpr Type value = int16; };
template <> struct TypeOf<uint16_t> { static constexpr Type value = uint16; };
template <> struct TypeOf<int>      { static constexpr Type value = int32; };
template <> struct TypeOf<unsigned int> { static constexpr Type value = uint32; };
template <> struct TypeOf<long long> { static constexpr Type value = int64; };
template <> struct TypeOf<unsigned long long> { static constexpr Type value = uint64; };
template <> struct TypeOf<float>    { static constexpr Type value = float32; };
template <> struct TypeOf<double>   { static constexpr Type value = float64; };

class TagList
{
public:
    std::map<std::string, std::string> _tags;

    void set(const std::string& name, const std::string& value) { _tags[name] = value; }
    void set(const std::string& name, const char* value) { _tags[name] = value; }
    bool contains(const std::string& name) const { return _tags.count(name) != 0; }
    std::string value(const std::string& name, const std::string& def = std::string()) const
    {
        auto it = _tags.find(name);
        return it == _tags.end() ? def : it->second;
    }
    void unset(const std::string& name) { _tags.erase(name); }
    size_t size() const { return _tags.size(); }
};

class ArrayDescription
{
public:
    std::vector<size_t> _dims;
    size_t _comps = 0;
    Type _type = uint8;
    TagList _globalTags;
    std::vector<TagList> _dimTags;
    std::vector<TagList> _compTags;

    ArrayDescription() = default;
    ArrayDescription(const std::vector<size_t>& dims, size_t comps, Type type)
        : _dims(dims), _comps(comps), _type(type), _dimTags(dims.size()), _compTags(comps)
    {
    }

    size_t dimensionCount() const { return _dims.size(); }
    size_t dimension(size_t d) const { return _dims[d]; }
    const std::vector<size_t>& dimensions() const { return _dims; }
    size_t componentCount() const { return _comps; }
    Type componentType() const { return _type; }
    size_t elementCount() const
    {
        if (_dims.empty())
            return 0;
        size_t n = 1;
        for (size_t d : _dims)
            n *= d;
        return n;
    }
    size_t componentSize() const { return typeSize(_type); }
    size_t elementSize() const { return _comps * typeSize(_type); }
    size_t dataSize() const { return elementCount() * elementSize(); }

    TagList& globalTagList() { return _globalTags; }
    const TagList& globalTagList() const { return _globalTags; }
    TagList& dimensionTagList(size_t d) { return _dimTags[d]; }
    const TagList& dimensionTagList(size_t d) const { return _dimTags[d]; }
    TagList& componentTagList(size_t c) { return _compTags[c]; }
    const TagList& componentTagList(size_t c) const { return _compTags[c]; }
};

/* Type-erased N-D array: shared data blob + description (libtgd semantics:
 * copies share data; the reference treats arrays as value types). */
class ArrayContainer : public ArrayDescription
{
public:
    std::shared_ptr<std::vector<unsigned char>> _data;

    ArrayContainer() = default;
    explicit ArrayContainer(const ArrayDescription& desc)
        : ArrayDescription(desc),
          _data(std::make_shared<std::vector<unsigned char>>(desc.dataSize()))
    {
    }
    ArrayContainer(const std::vector<size_t>& dims, size_t comps, Type type)
        : ArrayContainer(ArrayDescription(dims, comps, type))
    {
    }
    ArrayContainer(std::initializer_list<size_t> dims, size_t comps, Type type)
        : ArrayContainer(std::vector<size_t>(dims), comps, type)
    {
    }

    const ArrayDescription& description() const { return *this; }

    void* data() { return _data ? _data->data() : nullptr; }
    const void* data() const { return _data ? _data->data() : nullptr; }

    size_t toIndex(std::initializer_list<size_t> idx) const
    {
        /* Row-major over reversed dims: element ({x, y}) of a {w, h} array is
         * y * w + x (libtgd convention; matches pixelIndex = y*w+x writes in
         * wurblpt.hpp:339-368). */
        size_t index = 0;
        size_t stride = 1;
        size_t d = 0;
        for (size_t v : idx) {
            index += v * stride;
            stride *= _dims[d++];
        }
        return index;
    }

    void* get(size_t e)
    {
        return _data->data() + e * elementSize();
    }
    const void* get(size_t e) const
    {
        return _data->data() + e * elementSize();
    }
    void* get(std::initializer_list<size_t> idx) { return get(toIndex(idx)); }
    const void* get(std::initializer_list<size_t> idx) const { return get(toIndex(idx)); }

    template <typename T> T* get(size_t e)
    {
        return reinterpret_cast<T*>(_data->data() + e * elementSize());
    }
    template <typename T> const T* get(size_t e) const
    {
        return reinterpret_cast<const T*>(_data->data() + e * elementSize());
    }
    template <typename T> T* get(std::initializer_list<size_t> idx) { return get<T>(toIndex(idx)); }
    template <typename T> const T* get(std::initializer_list<size_t> idx) const { return get<T>(toIndex(idx)); }
    template <typename T> T get(size_t e, size_t c) const { return get<T>(e)[c]; }
    template <typename T> void set(size_t e, size_t c, T v) { get<T>(e)[c] = v; }
    template <typename T> void set(size_t e, std::initializer_list<T> vals)
    {
        T* p = get<T>(e);
        size_t c = 0;
        for (T v : vals)
            p[c++] = v;
    }
};

template <typename T>
class Array : public ArrayContainer
{
public:
    Array() = default;
    explicit Array(const ArrayDescription& desc) : ArrayContainer(desc)
    {
        assert(desc.componentType() == TypeOf<T>::value || desc.dataSize() == 0);
        _type = TypeOf<T>::value;
    }
    Array(const std::vector<size_t>& dims, size_t comps)
        : ArrayContainer(dims, comps, TypeOf<T>::value)
    {
    }
    Array(std::initializer_list<size_t> dims, size_t comps)
        : ArrayContainer(std::vector<size_t>(dims), comps, TypeOf<T>::value)
    {
    }
    Array(const ArrayContainer& c) : ArrayContainer(c)
    {
        assert(c.componentType() == TypeOf<T>::value || c.elementCount() == 0);
    }

    T* operator[](size_t e) { return this->template get<T>(e); }
    const T* operator[](size_t e) const { return this->template get<T>(e); }
    T* operator[](std::initializer_list<size_t> idx) { return this->template get<T>(toIndex(idx)); }
    const T* operator[](std::initializer_list<size_t> idx) const { return this->template get<T>(toIndex(idx)); }

    void set(size_t e, std::initializer_list<T> vals) { ArrayContainer::template set<T>(e, vals); }
    void set(std::initializer_list<size_t> idx, std::initializer_list<T> vals)
    {
        ArrayContainer::template set<T>(toIndex(idx), vals);
    }
    // Re-expose the base's explicit-template form (a.set<float>(i, {...}));
    // the non-template overloads above would otherwise hide it.
    template <typename U> void set(size_t e, std::initializer_list<U> vals)
    {
        ArrayContainer::template set<U>(e, vals);
    }
};

} // namespace TGD
