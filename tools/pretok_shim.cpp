// Differential oracle shim over the reference's pre-tokenizer splitter.
//
// Compiles the reference's own unicode_regex_split
// (/root/reference/src/unicode.cpp:670) + its unicode tables into a tiny
// stdin/stdout filter so tools/pretok_diff.py can fuzz OUR Python
// regex-set translations (ggml_hexagon_tpu/tokenizer/pretok.py) against
// the reference byte-for-byte, per regex set.
//
// Wire protocol (binary, little-endian u32 lengths):
//   request:  u32 n_regex; n_regex x { u32 len; bytes };
//             u32 text_len; bytes        (repeated until EOF)
//   response: u32 n_pieces; n_pieces x { u32 len; bytes }
//
// Build (tools/pretok_diff.py does this automatically):
//   g++ -O1 -std=c++17 -I/root/reference/src tools/pretok_shim.cpp \
//       /root/reference/src/unicode.cpp /root/reference/src/unicode-data.cpp \
//       -o /tmp/pretok_shim
#include "unicode.h"

#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

static bool read_u32(uint32_t & v) {
    return std::fread(&v, 4, 1, stdin) == 1;
}

static bool read_blob(std::string & s) {
    uint32_t n;
    if (!read_u32(n)) return false;
    s.resize(n);
    return n == 0 || std::fread(s.data(), 1, n, stdin) == n;
}

static void write_blob(const std::string & s) {
    uint32_t n = (uint32_t) s.size();
    std::fwrite(&n, 4, 1, stdout);
    std::fwrite(s.data(), 1, s.size(), stdout);
}

int main() {
    uint32_t n_regex;
    while (read_u32(n_regex)) {
        std::vector<std::string> regexes(n_regex);
        for (auto & r : regexes) {
            if (!read_blob(r)) return 1;
        }
        std::string text;
        if (!read_blob(text)) return 1;
        const auto pieces = unicode_regex_split(text, regexes);
        uint32_t np = (uint32_t) pieces.size();
        std::fwrite(&np, 4, 1, stdout);
        for (const auto & p : pieces) write_blob(p);
        std::fflush(stdout);
    }
    return 0;
}
