// tensorio — native checkpoint I/O for asvd4llm_tpu.
//
// The reference loads checkpoints through torch (asvd.py:25-27). Our
// torch-free load path mmaps safetensors files and does the hot dtype
// conversions (bf16/f16 -> f32) in native code; Python (ctypes) only
// parses the JSON header and wraps the returned buffers with numpy.
//
// Build: make -C native   (produces libtensorio.so)

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

struct TsFile {
    int fd;
    void* base;
    uint64_t size;
};

// Open + mmap a file read-only. Returns nullptr on failure.
TsFile* ts_open(const char* path) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
    void* base = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (base == MAP_FAILED) { ::close(fd); return nullptr; }
    // the header + tensors are read once sequentially on load
    madvise(base, (size_t)st.st_size, MADV_SEQUENTIAL);
    TsFile* f = new TsFile{fd, base, (uint64_t)st.st_size};
    return f;
}

uint64_t ts_size(TsFile* f) { return f ? f->size : 0; }

// Raw pointer at byte offset (bounds-checked).
const void* ts_ptr(TsFile* f, uint64_t offset) {
    if (!f || offset >= f->size) return nullptr;
    return (const char*)f->base + offset;
}

void ts_close(TsFile* f) {
    if (!f) return;
    munmap(f->base, (size_t)f->size);
    ::close(f->fd);
    delete f;
}

// ---- dtype conversions (the CPU hotspot when loading bf16 checkpoints
// into f32 host buffers; numpy has no native bf16) ----

void bf16_to_f32(const uint16_t* src, float* dst, uint64_t n) {
    uint64_t i = 0;
    // unrolled scalar loop; the shift-widen pattern auto-vectorizes
    for (; i + 8 <= n; i += 8) {
        for (int k = 0; k < 8; ++k) {
            uint32_t v = (uint32_t)src[i + k] << 16;
            std::memcpy(&dst[i + k], &v, 4);
        }
    }
    for (; i < n; ++i) {
        uint32_t v = (uint32_t)src[i] << 16;
        std::memcpy(&dst[i], &v, 4);
    }
}

void f32_to_bf16(const float* src, uint16_t* dst, uint64_t n) {
    // round-to-nearest-even, matching XLA/torch semantics
    for (uint64_t i = 0; i < n; ++i) {
        uint32_t bits;
        std::memcpy(&bits, &src[i], 4);
        if ((bits & 0x7fffffffu) > 0x7f800000u) {  // NaN: keep quiet
            dst[i] = (uint16_t)((bits >> 16) | 0x0040);
            continue;
        }
        uint32_t lsb = (bits >> 16) & 1u;
        bits += 0x7fffu + lsb;
        dst[i] = (uint16_t)(bits >> 16);
    }
}

static inline float half_bits_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1fu;
    uint32_t man = h & 0x3ffu;
    uint32_t out;
    if (exp == 0) {
        if (man == 0) {
            out = sign;
        } else {  // subnormal: value = man * 2^-24 -> normalize
            int shift = 0;
            while (!(man & 0x400u)) { man <<= 1; ++shift; }
            man &= 0x3ffu;
            out = sign | ((uint32_t)(127 - 15 + 1 - shift) << 23) | (man << 13);
        }
    } else if (exp == 31) {
        out = sign | 0x7f800000u | (man << 13);
    } else {
        out = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &out, 4);
    return f;
}

void f16_to_f32(const uint16_t* src, float* dst, uint64_t n) {
    for (uint64_t i = 0; i < n; ++i) dst[i] = half_bits_to_f32(src[i]);
}

// Bulk copy helper (mmap'd source -> caller buffer).
void ts_copy(const void* src, void* dst, uint64_t n) {
    std::memcpy(dst, src, n);
}

}  // extern "C"
