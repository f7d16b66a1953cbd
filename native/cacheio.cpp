// Native cache I/O hot paths for novic_tpu.
//
// The embedding-cache writer performs a writer-side global shuffle: every row
// of a batch lands at a random position in the preallocated file (the same
// design as reference embedding_cache.py:356-363, which issues one Python
// os.pwrite per row). At paper scale that is 40M+ Python-level syscall
// round-trips per cache build; this C++ implementation does the scatter loop
// without the interpreter in it, releases the GIL, and coalesces runs of
// consecutive destination rows into single pwrite calls.
//
// Compiled on demand by novic_tpu/data/native.py (cc -O2 -shared -fPIC);
// loaded via ctypes. No Python.h dependency — plain C ABI.

#include <cerrno>
#include <cstdint>
#include <unistd.h>

extern "C" {

// Scatter-write n rows of `stride` bytes from buf to fd.
// Row i goes to file offset: section_offset + indices[i] * stride.
// Consecutive destination indices are coalesced into one pwrite.
// Returns total bytes written, or -1 on error (errno preserved).
long long novic_scatter_pwrite(int fd, const char* buf, long long n, long long stride,
                               long long section_offset, const long long* indices) {
    long long total = 0;
    long long i = 0;
    while (i < n) {
        long long run = 1;
        while (i + run < n && indices[i + run] == indices[i] + run) {
            run++;
        }
        const char* src = buf + i * stride;
        long long remaining = run * stride;
        long long off = section_offset + indices[i] * stride;
        while (remaining > 0) {
            ssize_t w = pwrite(fd, src, (size_t)remaining, (off_t)off);
            if (w < 0) {
                if (errno == EINTR) continue;
                return -1;
            }
            src += w;
            off += w;
            remaining -= w;
            total += w;
        }
        i += run;
    }
    return total;
}

// Gather n rows of `stride` bytes from a memory-mapped base pointer into a
// contiguous output buffer: out[i] = base[section_offset + indices[i]*stride].
// (The reader-side analog: batch assembly from a shuffled on-disk order.)
void novic_gather_rows(const char* base, long long section_offset, long long stride,
                       const long long* indices, long long n, char* out) {
    for (long long i = 0; i < n; i++) {
        const char* src = base + section_offset + indices[i] * stride;
        char* dst = out + i * stride;
        __builtin_memcpy(dst, src, (size_t)stride);
    }
}

}  // extern "C"
