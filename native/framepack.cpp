// framepack — native IO runtime for dieselfluid_tpu.
//
// Bulk trajectory export: the Python layer hands over one contiguous
// (frames, particles, 3) float32 buffer and this library streams it to disk
// without per-frame Python overhead — the native-runtime analog of the
// reference's cgo-backed buffer plumbing (ref: compute/gpu/gpu.go buffer
// up/downloads), applied to the IO path where this framework actually needs
// native code (device compute lives in Pallas kernels).
//
// Formats:
//   * PLY sequence: one binary little-endian PLY point cloud per frame.
//   * DFC ("dieselfluid cache"): a single packed file
//       magic 'DFC1' | int64 frames | int64 particles | payload f32[]
//     for fast load of large trajectories.
//
// Streaming: framepack_stream_* runs a writer THREAD with a bounded frame
// queue, so disk IO overlaps the simulation instead of stalling it — the
// executor/runtime role the reference fills with goroutines
// (ref: render/rendersystem.go's channel-driven loops), done natively.
//
// Build: c++ -O3 -std=c++17 -pthread -shared -fPIC framepack.cpp -o libframepack.so

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Write one binary PLY point cloud. Returns 0 on success.
int framepack_write_ply(const char* path, const float* positions,
                        int64_t n_particles) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    char header[256];
    int len = std::snprintf(
        header, sizeof(header),
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex %lld\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n",
        static_cast<long long>(n_particles));
    if (std::fwrite(header, 1, len, f) != static_cast<size_t>(len)) {
        std::fclose(f);
        return -2;
    }
    size_t count = static_cast<size_t>(n_particles) * 3;
    if (std::fwrite(positions, sizeof(float), count, f) != count) {
        std::fclose(f);
        return -3;
    }
    std::fclose(f);
    return 0;
}

// Write a whole trajectory as a numbered PLY sequence. Returns frames written.
int framepack_write_ply_sequence(const char* dir, const char* name,
                                 const float* positions, int64_t n_frames,
                                 int64_t n_particles) {
    int written = 0;
    for (int64_t t = 0; t < n_frames; ++t) {
        char path[1024];
        std::snprintf(path, sizeof(path), "%s/%s_%05lld.ply", dir, name,
                      static_cast<long long>(t));
        const float* frame = positions + t * n_particles * 3;
        if (framepack_write_ply(path, frame, n_particles) != 0) return written;
        ++written;
    }
    return written;
}

// Packed trajectory cache. Returns 0 on success.
int framepack_write_dfc(const char* path, const float* positions,
                        int64_t n_frames, int64_t n_particles) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    const char magic[4] = {'D', 'F', 'C', '1'};
    std::fwrite(magic, 1, 4, f);
    std::fwrite(&n_frames, sizeof(int64_t), 1, f);
    std::fwrite(&n_particles, sizeof(int64_t), 1, f);
    size_t count = static_cast<size_t>(n_frames) * n_particles * 3;
    size_t done = std::fwrite(positions, sizeof(float), count, f);
    std::fclose(f);
    return done == count ? 0 : -2;
}

// Read header of a DFC file into frames/particles. Returns 0 on success.
int framepack_read_dfc_header(const char* path, int64_t* n_frames,
                              int64_t* n_particles) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    char magic[4];
    if (std::fread(magic, 1, 4, f) != 4 || std::memcmp(magic, "DFC1", 4) != 0) {
        std::fclose(f);
        return -2;
    }
    if (std::fread(n_frames, sizeof(int64_t), 1, f) != 1 ||
        std::fread(n_particles, sizeof(int64_t), 1, f) != 1) {
        std::fclose(f);
        return -3;
    }
    std::fclose(f);
    return 0;
}

// Read DFC payload into a caller-allocated buffer. Returns 0 on success.
int framepack_read_dfc(const char* path, float* out, int64_t capacity_floats) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 4 + 2 * sizeof(int64_t), SEEK_SET);
    size_t got = std::fread(out, sizeof(float),
                            static_cast<size_t>(capacity_floats), f);
    std::fclose(f);
    return got == static_cast<size_t>(capacity_floats) ? 0 : -2;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Async stream writer: bounded queue + worker thread.
// ---------------------------------------------------------------------------

namespace {

struct Stream {
    std::string dir, name;
    int64_t n_particles = 0;
    int mode = 0;                      // 0 = PLY sequence, 1 = DFC stream
    FILE* dfc = nullptr;
    std::thread worker;
    std::mutex mu;
    std::condition_variable not_full, not_empty;
    std::deque<std::vector<float>> queue;
    size_t max_queue = 4;
    bool closing = false;
    int64_t frames = 0;
    int error = 0;

    void run() {
        for (;;) {
            std::vector<float> frame;
            {
                std::unique_lock<std::mutex> lk(mu);
                not_empty.wait(lk, [&] { return closing || !queue.empty(); });
                if (queue.empty()) return;   // closing and drained
                frame = std::move(queue.front());
                queue.pop_front();
            }
            not_full.notify_one();
            int rc = 0;
            if (mode == 1) {
                size_t count = frame.size();
                if (std::fwrite(frame.data(), sizeof(float), count, dfc)
                    != count) rc = -2;
                // Flush per frame: live consumers (app/serve.py Range
                // tailing) see the file grow frame-aligned, not in stdio
                // buffer chunks.
                std::fflush(dfc);
            } else {
                char path[1024];
                std::snprintf(path, sizeof(path), "%s/%s_%05lld.ply",
                              dir.c_str(), name.c_str(),
                              static_cast<long long>(frames));
                rc = framepack_write_ply(path, frame.data(), n_particles);
            }
            std::lock_guard<std::mutex> lk(mu);
            if (rc != 0 && error == 0) error = rc;
            ++frames;
        }
    }
};

}  // namespace

extern "C" {

// Open an async frame stream. mode 0 = PLY sequence in `dir`, mode 1 = one
// DFC file at `dir/name.dfc` (frame count patched at close). Returns an
// opaque handle, or 0 on failure.
void* framepack_stream_open(const char* dir, const char* name,
                            int64_t n_particles, int mode,
                            int64_t max_queue) {
    auto* s = new Stream();
    s->dir = dir;
    s->name = name;
    s->n_particles = n_particles;
    s->mode = mode;
    s->max_queue = max_queue > 0 ? static_cast<size_t>(max_queue) : 4;
    if (mode == 1) {
        std::string path = s->dir + "/" + s->name + ".dfc";
        s->dfc = std::fopen(path.c_str(), "wb");
        if (!s->dfc) { delete s; return nullptr; }
        const char magic[4] = {'D', 'F', 'C', '1'};
        int64_t zero = 0;
        std::fwrite(magic, 1, 4, s->dfc);
        std::fwrite(&zero, sizeof(int64_t), 1, s->dfc);  // frames: patched
        std::fwrite(&n_particles, sizeof(int64_t), 1, s->dfc);
    }
    s->worker = std::thread(&Stream::run, s);
    return s;
}

// Enqueue one (n_particles, 3) frame; copies the data. Blocks when the
// queue is full (backpressure instead of unbounded memory). Returns 0, or
// the first writer error seen so far.
int framepack_stream_append(void* handle, const float* positions) {
    auto* s = static_cast<Stream*>(handle);
    std::vector<float> frame(positions,
                             positions + s->n_particles * 3);
    {
        std::unique_lock<std::mutex> lk(s->mu);
        s->not_full.wait(lk, [&] { return s->queue.size() < s->max_queue; });
        if (s->error) return s->error;
        s->queue.push_back(std::move(frame));
    }
    s->not_empty.notify_one();
    return 0;
}

// Drain, join, patch headers, free. Returns frames written or negative error.
int64_t framepack_stream_close(void* handle) {
    auto* s = static_cast<Stream*>(handle);
    {
        std::lock_guard<std::mutex> lk(s->mu);
        s->closing = true;
    }
    s->not_empty.notify_all();
    s->worker.join();
    int64_t frames = s->frames;
    int error = s->error;
    if (s->dfc) {
        std::fseek(s->dfc, 4, SEEK_SET);
        std::fwrite(&frames, sizeof(int64_t), 1, s->dfc);
        std::fclose(s->dfc);
    }
    delete s;
    return error ? error : frames;
}

}  // extern "C"
