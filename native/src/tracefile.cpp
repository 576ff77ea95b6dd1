// Native trace-shard loader for offline inference-compilation training.
//
// Counterpart of the reference's native runtime around trace generation: the
// C++ side dumps UUID-named trace batches to disk for offline training
// (src/cpprob/socket.cpp:79-98) and the Python trainer samples random files
// (infcomp/client.py:60-91, RequesterFile).  Here the shard format is a dense
// binary matrix (one row per trace: observation vector + flattened site
// values) and this loader memory-maps shards and assembles random minibatches
// on background threads, so the accelerator never waits on host-side IO or
// the Python GIL.
//
// Shard layout (little endian):
//   magic   u32   0x43505454 ("CPTT")
//   version u32   1
//   n_sites u32
//   obs_dim u32
//   n_traces u64
//   site names:  n_sites x { u32 len; bytes }
//   site sizes:  n_sites x u32   (f32 elements per site)
//   data: n_traces x row_len f32, row_len = obs_dim + sum(site sizes)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x43505454u;

struct Shard {
    void* map = nullptr;
    size_t map_size = 0;
    const float* data = nullptr;  // n_traces x row_len
    uint64_t n_traces = 0;
};

struct Loader {
    std::vector<Shard> shards;
    std::vector<std::string> site_names;   // from the first shard
    std::vector<uint32_t> site_sizes;
    uint32_t obs_dim = 0;
    uint64_t row_len = 0;
    uint64_t total_traces = 0;

    // prefetch machinery
    uint32_t batch_size = 0;
    std::deque<float*> ready;
    std::mutex mu;
    std::condition_variable cv_ready, cv_space;
    std::vector<std::thread> workers;
    std::atomic<bool> stop{false};
    size_t max_queue = 4;
    uint64_t seed = 0;

    ~Loader() {
        stop.store(true);
        cv_space.notify_all();
        cv_ready.notify_all();
        for (auto& t : workers) {
            if (t.joinable()) t.join();
        }
        std::lock_guard<std::mutex> lock(mu);
        for (auto* b : ready) delete[] b;
        for (auto& s : shards) {
            if (s.map) munmap(s.map, s.map_size);
        }
    }
};

bool read_header(const uint8_t* p, size_t size, Loader* loader, Shard* shard,
                 bool first) {
    if (size < 24) return false;
    uint32_t magic, version, n_sites, obs_dim;
    uint64_t n_traces;
    std::memcpy(&magic, p, 4);
    std::memcpy(&version, p + 4, 4);
    std::memcpy(&n_sites, p + 8, 4);
    std::memcpy(&obs_dim, p + 12, 4);
    std::memcpy(&n_traces, p + 16, 8);
    if (magic != kMagic || version != 1) return false;
    size_t off = 24;
    std::vector<std::string> names;
    names.reserve(n_sites);
    for (uint32_t i = 0; i < n_sites; ++i) {
        if (off + 4 > size) return false;
        uint32_t len;
        std::memcpy(&len, p + off, 4);
        off += 4;
        if (off + len > size) return false;
        names.emplace_back(reinterpret_cast<const char*>(p + off), len);
        off += len;
    }
    std::vector<uint32_t> sizes(n_sites);
    if (off + 4ull * n_sites > size) return false;
    std::memcpy(sizes.data(), p + off, 4ull * n_sites);
    off += 4ull * n_sites;

    uint64_t row_len = obs_dim;
    for (auto s : sizes) row_len += s;
    if (off + row_len * n_traces * 4 > size) return false;

    if (first) {
        loader->site_names = names;
        loader->site_sizes = sizes;
        loader->obs_dim = obs_dim;
        loader->row_len = row_len;
    } else {
        if (names != loader->site_names || sizes != loader->site_sizes ||
            obs_dim != loader->obs_dim) {
            return false;  // incompatible shard (different model structure)
        }
    }
    shard->data = reinterpret_cast<const float*>(p + off);
    shard->n_traces = n_traces;
    return true;
}

void fill_batch(Loader* L, float* out, std::mt19937_64& rng) {
    // RequesterFile semantics: random shard, random rows (client.py:60-91)
    std::uniform_int_distribution<size_t> pick_shard(0, L->shards.size() - 1);
    for (uint32_t b = 0; b < L->batch_size; ++b) {
        const Shard& s = L->shards[pick_shard(rng)];
        std::uniform_int_distribution<uint64_t> pick_row(0, s.n_traces - 1);
        const float* row = s.data + pick_row(rng) * L->row_len;
        std::memcpy(out + uint64_t(b) * L->row_len, row, L->row_len * 4);
    }
}

void worker_main(Loader* L, uint64_t worker_seed) {
    std::mt19937_64 rng(worker_seed);
    while (!L->stop.load()) {
        float* buf = new float[uint64_t(L->batch_size) * L->row_len];
        fill_batch(L, buf, rng);
        std::unique_lock<std::mutex> lock(L->mu);
        L->cv_space.wait(lock, [L] {
            return L->ready.size() < L->max_queue || L->stop.load();
        });
        if (L->stop.load()) {
            delete[] buf;
            return;
        }
        L->ready.push_back(buf);
        L->cv_ready.notify_one();
    }
}

}  // namespace

extern "C" {

// Open shards; returns an opaque loader (nullptr on failure).
void* cpprob_loader_open(const char** paths, int n_paths, uint32_t batch_size,
                         int n_threads, uint64_t seed) {
    if (n_paths <= 0) return nullptr;
    auto* L = new Loader();
    L->batch_size = batch_size;
    L->seed = seed;
    for (int i = 0; i < n_paths; ++i) {
        int fd = open(paths[i], O_RDONLY);
        if (fd < 0) {
            delete L;
            return nullptr;
        }
        struct stat st;
        fstat(fd, &st);
        void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
        close(fd);
        if (map == MAP_FAILED) {
            delete L;
            return nullptr;
        }
        Shard shard;
        shard.map = map;
        shard.map_size = st.st_size;
        if (!read_header(static_cast<const uint8_t*>(map), st.st_size, L,
                         &shard, i == 0)) {
            munmap(map, st.st_size);
            delete L;
            return nullptr;
        }
        L->total_traces += shard.n_traces;
        L->shards.push_back(shard);
    }
    if (n_threads < 1) n_threads = 1;
    for (int t = 0; t < n_threads; ++t) {
        L->workers.emplace_back(worker_main, L, seed + 0x9e3779b97f4a7c15ull * (t + 1));
    }
    return L;
}

uint64_t cpprob_loader_row_len(void* handle) {
    return static_cast<Loader*>(handle)->row_len;
}

uint32_t cpprob_loader_obs_dim(void* handle) {
    return static_cast<Loader*>(handle)->obs_dim;
}

uint64_t cpprob_loader_total_traces(void* handle) {
    return static_cast<Loader*>(handle)->total_traces;
}

int cpprob_loader_n_sites(void* handle) {
    return static_cast<int>(static_cast<Loader*>(handle)->site_names.size());
}

int cpprob_loader_site_name(void* handle, int i, char* out, int cap) {
    auto* L = static_cast<Loader*>(handle);
    if (i < 0 || i >= static_cast<int>(L->site_names.size())) return -1;
    const auto& s = L->site_names[i];
    int n = static_cast<int>(s.size());
    if (n + 1 > cap) return -1;
    std::memcpy(out, s.data(), n);
    out[n] = 0;
    return n;
}

uint32_t cpprob_loader_site_size(void* handle, int i) {
    return static_cast<Loader*>(handle)->site_sizes[i];
}

// Blocking: copy the next prefetched minibatch (batch_size x row_len f32)
// into `out`. Returns 0 on success.
int cpprob_loader_next_batch(void* handle, float* out) {
    auto* L = static_cast<Loader*>(handle);
    float* buf = nullptr;
    {
        std::unique_lock<std::mutex> lock(L->mu);
        L->cv_ready.wait(lock, [L] { return !L->ready.empty() || L->stop.load(); });
        if (L->stop.load() && L->ready.empty()) return -1;
        buf = L->ready.front();
        L->ready.pop_front();
        L->cv_space.notify_one();
    }
    std::memcpy(out, buf, uint64_t(L->batch_size) * L->row_len * 4);
    delete[] buf;
    return 0;
}

void cpprob_loader_close(void* handle) {
    delete static_cast<Loader*>(handle);
}

}  // extern "C"
