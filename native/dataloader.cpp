// Native data pipeline: shuffled batch assembly with worker threads.
//
// TPU-native equivalent of the reference's C++ data stack
// (tools/train/source/data/DataLoader.cpp, RandomSampler.cpp,
// BlockingQueue.hpp and datasets/MnistDataset.cpp): a pool of worker
// threads gathers shuffled samples into pinned staging buffers ahead of the
// accelerator, plus an idx-file parser for MNIST. Exposed as a C ABI for
// ctypes (no pybind11 in this image).
//
// Batch layout: images float32 (B, H, W, C) in [0, 255]; labels int32 (B,).
// Normalization/quantization happens on-device inside the jitted step
// (train_step.quantize_batch), so the host pipeline stays dtype-simple.

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batch {
    int64_t index = 0;  // batches are delivered in index order (reproducible)
    std::vector<float> x;
    std::vector<int32_t> y;
};

struct Loader {
    const uint8_t* images = nullptr;  // (N, H, W, C) uint8, borrowed
    const int32_t* labels = nullptr;  // (N,), borrowed
    int64_t n = 0;
    int64_t sample_elems = 0;  // H*W*C

    int batch = 0;
    int64_t num_batches = 0;
    int64_t h = 0, w = 0, c = 0;

    // augmentation (reference ImageDataset random-crop / flip transforms):
    // zero-pad by aug_pad then random-crop back to (h, w); mirror with
    // probability 1/2. Deterministic per (seed, batch, sample).
    int aug_pad = 0;
    int aug_flip = 0;
    uint64_t seed = 0;

    // epoch state
    std::vector<int64_t> order;
    std::atomic<int64_t> next_batch_idx{0};

    // bounded queue of prepared batches (the reference's BlockingQueue)
    std::deque<Batch> queue;
    size_t capacity = 4;
    std::mutex mu;
    std::condition_variable cv_push, cv_pop;
    int64_t produced = 0;  // batches pushed this epoch
    int64_t consumed = 0;
    bool epoch_active = false;
    std::vector<std::thread> workers;
    std::atomic<bool> stop{false};

    ~Loader() { join_workers(); }

    void join_workers() {
        stop.store(true);
        cv_push.notify_all();
        cv_pop.notify_all();
        for (auto& t : workers)
            if (t.joinable()) t.join();
        workers.clear();
        stop.store(false);
    }

    void worker_main() {
        for (;;) {
            int64_t b = next_batch_idx.fetch_add(1);
            if (b >= num_batches || stop.load()) return;
            Batch out;
            out.index = b;
            out.x.resize((size_t)batch * sample_elems);
            out.y.resize(batch);
            std::mt19937_64 rng(seed ^ (0x9e3779b97f4a7c15ULL * (uint64_t)(b + 1)));
            for (int i = 0; i < batch; i++) {
                int64_t idx = order[b * batch + i];
                const uint8_t* src = images + idx * sample_elems;
                float* dst = out.x.data() + (size_t)i * sample_elems;
                if (aug_pad == 0 && aug_flip == 0) {
                    for (int64_t j = 0; j < sample_elems; j++)
                        dst[j] = (float)src[j];
                } else {
                    int dy = 0, dx = 0, flip = 0;
                    if (aug_pad > 0) {
                        std::uniform_int_distribution<int> d(0, 2 * aug_pad);
                        dy = d(rng) - aug_pad;
                        dx = d(rng) - aug_pad;
                    }
                    if (aug_flip) {
                        std::uniform_int_distribution<int> d(0, 1);
                        flip = d(rng);
                    }
                    for (int64_t y = 0; y < h; y++) {
                        int64_t sy = y + dy;
                        for (int64_t x = 0; x < w; x++) {
                            int64_t sx = (flip ? w - 1 - x : x) + dx;
                            float* px = dst + (y * w + x) * c;
                            if (sy < 0 || sy >= h || sx < 0 || sx >= w) {
                                for (int64_t ch = 0; ch < c; ch++) px[ch] = 0.0f;
                            } else {
                                const uint8_t* sp = src + (sy * w + sx) * c;
                                for (int64_t ch = 0; ch < c; ch++)
                                    px[ch] = (float)sp[ch];
                            }
                        }
                    }
                }
                out.y[i] = labels[idx];
            }
            std::unique_lock<std::mutex> lk(mu);
            // block until this batch is within the delivery window, so the
            // consumer always sees batches in index order regardless of
            // worker completion order
            cv_push.wait(lk, [&] {
                return (out.index < consumed + (int64_t)capacity) || stop.load();
            });
            if (stop.load()) return;
            queue.push_back(std::move(out));
            produced++;
            cv_pop.notify_all();
        }
    }
};

}  // namespace

extern "C" {

void* mdl_create(const uint8_t* images, const int32_t* labels, int64_t n,
                 int64_t h, int64_t w, int64_t c) {
    auto* l = new Loader();
    l->images = images;
    l->labels = labels;
    l->n = n;
    l->sample_elems = h * w * c;
    l->h = h;
    l->w = w;
    l->c = c;
    return l;
}

void mdl_destroy(void* handle) { delete (Loader*)handle; }

// Optional augmentation for subsequent epochs (0, 0 disables).
void mdl_set_augment(void* handle, int pad, int flip) {
    auto* l = (Loader*)handle;
    l->aug_pad = pad;
    l->aug_flip = flip;
}

int64_t mdl_epoch_start(void* handle, int batch, int shuffle, uint64_t seed,
                        int num_workers, int prefetch) {
    auto* l = (Loader*)handle;
    l->seed = seed;
    l->join_workers();
    {
        std::lock_guard<std::mutex> lk(l->mu);
        l->queue.clear();
        l->produced = l->consumed = 0;
    }
    l->batch = batch;
    l->num_batches = l->n / batch;
    l->order.resize(l->num_batches * batch);
    for (int64_t i = 0; i < (int64_t)l->order.size(); i++) l->order[i] = i;
    if (shuffle) {
        std::mt19937_64 rng(seed);
        // Fisher-Yates over the full index range (matches RandomSampler)
        std::vector<int64_t> full(l->n);
        for (int64_t i = 0; i < l->n; i++) full[i] = i;
        for (int64_t i = l->n - 1; i > 0; i--) {
            std::uniform_int_distribution<int64_t> d(0, i);
            std::swap(full[i], full[d(rng)]);
        }
        std::copy(full.begin(), full.begin() + l->order.size(), l->order.begin());
    }
    l->next_batch_idx.store(0);
    l->capacity = prefetch > 0 ? (size_t)prefetch : 4;
    l->epoch_active = true;
    int nw = num_workers > 0 ? num_workers : 1;
    for (int i = 0; i < nw; i++)
        l->workers.emplace_back([l] { l->worker_main(); });
    return l->num_batches;
}

// Returns 1 and fills out_x/out_y, or 0 at epoch end.
int mdl_next(void* handle, float* out_x, int32_t* out_y) {
    auto* l = (Loader*)handle;
    std::unique_lock<std::mutex> lk(l->mu);
    auto find_expected = [&]() -> int {
        for (size_t i = 0; i < l->queue.size(); i++)
            if (l->queue[i].index == l->consumed) return (int)i;
        return -1;
    };
    int pos;
    for (;;) {
        pos = find_expected();
        if (pos >= 0) break;
        if (l->consumed >= l->num_batches) return 0;
        l->cv_pop.wait_for(lk, std::chrono::milliseconds(50));
        if (l->stop.load()) return 0;
        if (find_expected() < 0 && l->consumed >= l->num_batches) return 0;
    }
    Batch b = std::move(l->queue[pos]);
    l->queue.erase(l->queue.begin() + pos);
    l->consumed++;
    l->cv_push.notify_all();
    lk.unlock();
    std::memcpy(out_x, b.x.data(), b.x.size() * sizeof(float));
    std::memcpy(out_y, b.y.data(), b.y.size() * sizeof(int32_t));
    return 1;
}

// ---- idx-file parsing (MnistDataset.cpp:17-70 equivalent) ----

static uint32_t read_be32(FILE* f) {
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) return 0;
    return ((uint32_t)b[0] << 24) | ((uint32_t)b[1] << 16) |
           ((uint32_t)b[2] << 8) | (uint32_t)b[3];
}

// Parses an idx ubyte file; returns element count (product of dims) and
// writes up to max_dims dims into dims_out. Data is written into `out`
// (caller allocates; query size first with out == nullptr).
int64_t mdl_read_idx(const char* path, uint8_t* out, int64_t out_cap,
                     int64_t* dims_out, int max_dims) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint32_t magic = read_be32(f);
    int ndim = magic & 0xFF;
    if (((magic >> 8) & 0xFF) != 0x08 || ndim > max_dims) {
        fclose(f);
        return -1;
    }
    int64_t total = 1;
    for (int i = 0; i < ndim; i++) {
        dims_out[i] = read_be32(f);
        total *= dims_out[i];
    }
    for (int i = ndim; i < max_dims; i++) dims_out[i] = 0;
    if (out) {
        if (out_cap < total) {
            fclose(f);
            return -1;
        }
        if ((int64_t)fread(out, 1, total, f) != total) {
            fclose(f);
            return -1;
        }
    }
    fclose(f);
    return total;
}

}  // extern "C"
