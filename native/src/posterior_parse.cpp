// Fast parser for the reference-format posterior dump files
// ("([(id value) ...] log_w)" per line, state.cpp:250-267) — the native
// counterpart of StatsPrinter's parsing stage (stats_printer.hpp:88-120).
// ~50x faster than the Python s-expression parser on multi-GB dumps.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Parsed {
    std::vector<double> log_weights;
    std::vector<int64_t> offsets;   // per-particle start into ids/values
    std::vector<int32_t> ids;
    std::vector<double> values;
};

const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

}  // namespace

extern "C" {

// Parse a .real/.int posterior file.  Returns opaque handle or nullptr.
void* cpprob_posterior_parse(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    if (fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
        fclose(f);
        return nullptr;
    }
    fclose(f);
    buf[size] = 0;

    auto* out = new Parsed();
    const char* p = buf.data();
    const char* end = buf.data() + size;
    while (p < end) {
        // line: ( [ ( id v ) ( id v ) ... ] logw )
        p = skip_ws(p, end);
        if (p >= end || *p == '\n') {
            if (p < end) ++p;
            continue;
        }
        if (*p != '(') {  // malformed line; skip it
            while (p < end && *p != '\n') ++p;
            continue;
        }
        ++p;
        p = skip_ws(p, end);
        if (p < end && *p == '[') ++p;
        out->offsets.push_back(static_cast<int64_t>(out->ids.size()));
        while (true) {
            p = skip_ws(p, end);
            if (p >= end || *p == ']') {
                if (p < end) ++p;
                break;
            }
            if (*p == '(') {
                ++p;
                char* next = nullptr;
                long id = strtol(p, &next, 10);
                p = next;
                double v = strtod(p, &next);
                p = next;
                p = skip_ws(p, end);
                if (p < end && *p == ')') ++p;
                out->ids.push_back(static_cast<int32_t>(id));
                out->values.push_back(v);
            } else {
                ++p;  // defensive: unknown token
            }
        }
        p = skip_ws(p, end);
        char* next = nullptr;
        double lw = strtod(p, &next);
        p = next;
        out->log_weights.push_back(lw);
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
    }
    out->offsets.push_back(static_cast<int64_t>(out->ids.size()));
    return out;
}

int64_t cpprob_posterior_n_particles(void* h) {
    return static_cast<int64_t>(static_cast<Parsed*>(h)->log_weights.size());
}

int64_t cpprob_posterior_n_entries(void* h) {
    return static_cast<int64_t>(static_cast<Parsed*>(h)->ids.size());
}

const double* cpprob_posterior_log_weights(void* h) {
    return static_cast<Parsed*>(h)->log_weights.data();
}

const int64_t* cpprob_posterior_offsets(void* h) {
    return static_cast<Parsed*>(h)->offsets.data();
}

const int32_t* cpprob_posterior_ids(void* h) {
    return static_cast<Parsed*>(h)->ids.data();
}

const double* cpprob_posterior_values(void* h) {
    return static_cast<Parsed*>(h)->values.data();
}

void cpprob_posterior_free(void* h) { delete static_cast<Parsed*>(h); }

}  // extern "C"
