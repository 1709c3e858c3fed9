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
// Build: cc -O3 -shared -fPIC framepack.cpp -o libframepack.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

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
