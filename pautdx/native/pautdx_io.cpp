// pautdx native IO: fast PAUT raw-data parsing.
//
// The reference's dataset-build hot loop parses thousands of small
// whitespace-separated A-scan .txt files with np.loadtxt and large JSON
// volumes with json.load (SURVEY.md §3.1) — both slow, pure-Python paths.
// This library provides:
//   - parse_floats_file: one .txt A-scan -> float32 buffer
//   - parse_json_volume_floats: extract every numeric array from the
//     {beam: {scan: [floats...]}} JSON volume schema in one pass
//
// Exposed with a plain C ABI for ctypes (no pybind11 in the image).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// Parse a whitespace/newline-separated float file.
// Returns number of floats written (<= capacity), or -1 on open failure.
int64_t parse_floats_file(const char* path, float* out, int64_t capacity) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::string buf;
    buf.resize(static_cast<size_t>(size));
    size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
    std::fclose(f);
    buf.resize(got);

    int64_t n = 0;
    const char* p = buf.c_str();
    const char* end = p + buf.size();
    while (p < end && n < capacity) {
        while (p < end && std::isspace(static_cast<unsigned char>(*p))) ++p;
        if (p >= end) break;
        char* next = nullptr;
        float v = std::strtof(p, &next);
        if (next == p) { ++p; continue; }  // skip junk byte
        out[n++] = v;
        p = next;
    }
    return n;
}

// One-pass scanner for the JSON volume schema {beam: {scan: [numbers]}}.
// Collects, in document order:
//   values  — all numbers inside arrays (flattened)
//   lengths — per-array element counts
//   keys    — '\n'-joined key strings in order: beam key, then its scan
//             keys (each scan key owns the next array)
// Returns 0 on success, -1 on open failure, -2 on capacity overflow.
int64_t parse_json_volume_floats(const char* path,
                                 float* values, int64_t value_capacity,
                                 int64_t* lengths, int64_t length_capacity,
                                 char* keys, int64_t key_capacity,
                                 int64_t* n_values, int64_t* n_arrays,
                                 int64_t* n_key_bytes) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::string buf;
    buf.resize(static_cast<size_t>(size));
    size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
    std::fclose(f);
    buf.resize(got);

    const char* p = buf.c_str();
    const char* end = p + buf.size();
    int64_t vi = 0, ai = 0, ki = 0;
    int depth = 0;          // object nesting depth
    bool in_array = false;
    int64_t arr_start = 0;

    while (p < end) {
        char c = *p;
        if (c == '"') {
            // scan the string
            const char* s = ++p;
            std::string key;
            while (p < end && *p != '"') {
                if (*p == '\\' && p + 1 < end) { key.push_back(p[1]); p += 2; }
                else { key.push_back(*p); ++p; }
            }
            ++p;  // closing quote
            // lookahead: a key iff followed by ':'
            const char* q = p;
            while (q < end && std::isspace(static_cast<unsigned char>(*q))) ++q;
            if (q < end && *q == ':' && !in_array) {
                int64_t need = static_cast<int64_t>(key.size()) + 1;
                if (ki + need > key_capacity) return -2;
                std::memcpy(keys + ki, key.c_str(), key.size());
                ki += key.size();
                keys[ki++] = '\n';
            }
            continue;
        }
        if (c == '{') { ++depth; ++p; continue; }
        if (c == '}') { --depth; ++p; continue; }
        if (c == '[') {
            in_array = true;
            arr_start = vi;
            ++p;
            continue;
        }
        if (c == ']') {
            in_array = false;
            if (ai >= length_capacity) return -2;
            lengths[ai++] = vi - arr_start;
            ++p;
            continue;
        }
        if (in_array && (c == '-' || c == '+' ||
                         std::isdigit(static_cast<unsigned char>(c)))) {
            char* next = nullptr;
            float v = std::strtof(p, &next);
            if (next != p) {
                if (vi >= value_capacity) return -2;
                values[vi++] = v;
                p = next;
                continue;
            }
        }
        ++p;
    }
    *n_values = vi;
    *n_arrays = ai;
    *n_key_bytes = ki;
    return 0;
}

}  // extern "C"
