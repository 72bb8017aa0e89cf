// Fast numeric-token parser for the framework's ASCII ingestion path.
//
// The reference reads large ASCII scene/property files with Fortran
// list-directed IO (LWC particle files, SHDOM tabulated property files,
// radar/Landsat field dumps — Tools/PhysicalPropertiesToDomain.f95:373-456,
// Tools/OpticalPropertiesToDomain.f95:107-156, I3RC-Examples/*.f95).  The
// Python tokenizer costs ~1 us per token; LES-scale property files carry
// tens of millions of tokens.  This translation unit parses a whole buffer
// of whitespace-separated numbers in one pass with strtod (~20-40x faster),
// exposed through ctypes (no pybind11 in this toolchain).
//
// Build: scripts/build_native.sh  ->  i3rc_tpu/native/_fastparse.so
// A pure-Python fallback keeps everything working without the .so.

#include <cstdlib>
#include <cctype>
#include <cstdint>

extern "C" {

// Parse up to max_out whitespace-separated floating point tokens from
// buf[0:n].  Returns the number parsed, or -(offset+1) of the first
// unparseable non-space token.  Fortran 'D' exponents are accepted.
long long parse_float_tokens(const char* buf, long long n, double* out,
                             long long max_out) {
    const char* p = buf;
    const char* end = buf + n;
    long long count = 0;
    // strtod needs NUL-terminated-ish input; callers append a trailing
    // NUL byte (numpy buffer), so reading past `end` is never needed.
    while (p < end && count < max_out) {
        while (p < end && std::isspace(static_cast<unsigned char>(*p))) ++p;
        if (p >= end) break;
        char* next = nullptr;
        double v = std::strtod(p, &next);
        if (next != p && next < end && (*next == 'D' || *next == 'd')) {
            next = const_cast<char*>(p);  // Fortran D exponent: manual path
        }
        if (next == p) {
            // Retry with a Fortran D-exponent ("1.5D+03") by scanning the
            // token manually.
            const char* q = p;
            while (q < end && !std::isspace(static_cast<unsigned char>(*q))) ++q;
            char tmp[64];
            long long len = q - p;
            if (len <= 0 || len >= 63) return -static_cast<long long>(p - buf) - 1;
            for (long long i = 0; i < len; ++i) {
                char ch = p[i];
                tmp[i] = (ch == 'D' || ch == 'd') ? 'e' : ch;
            }
            tmp[len] = '\0';
            char* next2 = nullptr;
            v = std::strtod(tmp, &next2);
            if (next2 == tmp) return -static_cast<long long>(p - buf) - 1;
            p = q;
        } else {
            p = next;
        }
        out[count++] = v;
    }
    return count;
}

// Count whitespace-separated tokens in buf[0:n] (for presizing).
long long count_tokens(const char* buf, long long n) {
    long long count = 0;
    bool in_tok = false;
    for (long long i = 0; i < n; ++i) {
        bool space = std::isspace(static_cast<unsigned char>(buf[i])) != 0;
        if (!space && !in_tok) ++count;
        in_tok = !space;
    }
    return count;
}

}  // extern "C"
