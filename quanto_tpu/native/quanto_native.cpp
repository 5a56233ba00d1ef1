// Native runtime helpers for quanto_tpu.
//
// TPU-native analogue of the reference's native (non-kernel) layer: the
// reference leans on the Rust safetensors crate for checkpoint IO and on C++
// host glue for weight repacking (`gptq_marlin_repack.cu`,
// `library/extensions/cpp/unpack.cpp`). Here the same roles are filled by:
//
//  - mmap-based safetensors payload access (zero-copy views into the file,
//    so multi-GB checkpoints load at page-cache speed without a Python-level
//    read() of the whole file);
//  - single-pass sub-byte repacking from the serialized (kernel-agnostic,
//    quanto-compatible) grouped layout to the TPU kernel's split-half layout
//    (see ops/pallas/qbits_mm.py) without materializing the unpacked codes.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cstdio>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

struct MappedFile {
    int fd;
    uint8_t* data;
    uint64_t size;
};

// Open + mmap a file read-only. Returns nullptr on failure.
MappedFile* qt_mmap_open(const char* path) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0) {
        ::close(fd);
        return nullptr;
    }
    void* p = ::mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) {
        ::close(fd);
        return nullptr;
    }
    ::madvise(p, (size_t)st.st_size, MADV_SEQUENTIAL);
    MappedFile* mf = new MappedFile{fd, (uint8_t*)p, (uint64_t)st.st_size};
    return mf;
}

uint64_t qt_mmap_size(MappedFile* mf) { return mf ? mf->size : 0; }

// Pointer to payload bytes at [offset, offset+len). Returns nullptr if OOB.
const uint8_t* qt_mmap_ptr(MappedFile* mf, uint64_t offset, uint64_t len) {
    if (!mf || offset + len > mf->size) return nullptr;
    return mf->data + offset;
}

void qt_mmap_close(MappedFile* mf) {
    if (!mf) return;
    ::munmap(mf->data, (size_t)mf->size);
    ::close(mf->fd);
    delete mf;
}

// ---------------------------------------------------------------------------
// Sub-byte repacking.
//
// Serialized layout (quanto PackedTensor, reference tensor/packed.py:24-69):
// grouped codes of logical shape [R, gs] (R = N*K/gs rows when grouped along
// axis 0, or [N, K] ungrouped) are bit-packed along axis 0 into
// [ceil(R/vals), gs] bytes, where value r sits in bits
// [bits*(r / rowdim) ...] of byte (r % rowdim): plane i of the byte holds
// row i*rowdim + r.
//
// TPU layout (split-half along K): packed[n][j] has code(n, j) in the low
// nibble and code(n, j + K/2) in the high nibble (4-bit; quarters for 2-bit).
//
// This routine goes serialized -> TPU in one pass. Grouped rows map to
// (n, k): row r = n*(K/gs) + k/gs, col = k%gs.
// ---------------------------------------------------------------------------

static inline uint8_t get_code_grouped(
    const uint8_t* packed_in, uint64_t rows, uint64_t cols, int bits,
    uint64_t r, uint64_t c) {
    int vals = 8 / bits;
    uint64_t rowdim = (rows + vals - 1) / vals;
    uint64_t byte_row = r % rowdim;
    int plane = (int)(r / rowdim);
    uint8_t b = packed_in[byte_row * cols + c];
    return (uint8_t)((b >> (bits * plane)) & ((1u << bits) - 1));
}

// packed_in:  serialized bytes [ceil(R/vals), gs_cols] for grouped codes
//             of logical shape [R=rows, gs_cols]
// out:        [N, K*bits/8] split-half packed bytes
// N, K:       logical weight shape; gs: group size (gs == K for per-axis).
// Returns 0 on success.
int qt_repack_grouped_to_splithalf(
    const uint8_t* packed_in, uint8_t* out,
    uint64_t N, uint64_t K, uint64_t gs, int bits) {
    if (bits != 4 && bits != 2) return 1;
    if (gs == 0 || K % gs != 0) return 2;
    uint64_t rows = (N * K) / gs;  // grouped rows
    uint64_t cols = gs;
    int vals = 8 / bits;
    uint64_t part = K / vals;  // codes per nibble-part
    uint64_t out_stride = K * bits / 8;
    uint64_t groups_per_row = K / gs;
    for (uint64_t n = 0; n < N; n++) {
        uint8_t* out_row = out + n * out_stride;
        for (uint64_t j = 0; j < out_stride; j++) {
            uint8_t byte = 0;
            for (int p = 0; p < vals; p++) {
                uint64_t k = (uint64_t)p * part + j;
                uint64_t r = n * groups_per_row + k / gs;
                uint64_t c = k % gs;
                uint8_t code = get_code_grouped(packed_in, rows, cols, bits, r, c);
                byte |= (uint8_t)(code << (bits * p));
            }
            out_row[j] = byte;
        }
    }
    return 0;
}

// Plain unpack of the serialized layout to one byte per code (the analogue of
// the reference's cpp extension unpack, `extensions/cpp/unpack.cpp:37-47`).
int qt_unpack(
    const uint8_t* packed_in, uint8_t* out,
    uint64_t rows, uint64_t cols, int bits) {
    if (bits != 4 && bits != 2) return 1;
    for (uint64_t r = 0; r < rows; r++) {
        for (uint64_t c = 0; c < cols; c++) {
            out[r * cols + c] = get_code_grouped(packed_in, rows, cols, bits, r, c);
        }
    }
    return 0;
}

}  // extern "C"
