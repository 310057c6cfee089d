// jckx native IO core — memory-mapped dataset cache + batch assembly.
//
// The reference has no native code (its data path is torchvision's Python
// loader). jckx's host-side data plane is this small C++ library:
//
//  - a flat binary cache format (header + uint8 NHWC images + int32 labels)
//    written once after archive parsing; subsequent runs mmap it with
//    zero-copy numpy views (no pickle parse, no heap copy, O(1) startup),
//  - Fisher–Yates epoch shuffling (xorshift64*, seeded, reproducible),
//  - contiguous shuffled-batch gather into a caller buffer (the host→TPU
//    transfer wants one contiguous block).
//
// Exposed as a C ABI consumed through ctypes (jckx/data/native_io.py),
// which carries a pure-Python fallback when the .so is absent.

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0x4A434B58494F3031ULL;  // "JCKXIO01"

struct Header {
  uint64_t magic;
  int64_t n;
  int32_t h, w, c;
  int32_t reserved;
};

struct Handle {
  void* map = nullptr;
  size_t map_size = 0;
  Header hdr{};
  const uint8_t* images = nullptr;
  const int32_t* labels = nullptr;
};

inline uint64_t xorshift64star(uint64_t& s) {
  s ^= s >> 12;
  s ^= s << 25;
  s ^= s >> 27;
  return s * 0x2545F4914F6CDD1DULL;
}

}  // namespace

extern "C" {

// Write a cache file. Returns 0 on success.
int jckx_cache_write(const char* path, const uint8_t* images, int64_t n,
                     int32_t h, int32_t w, int32_t c, const int32_t* labels) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  Header hdr{kMagic, n, h, w, c, 0};
  size_t img_bytes = static_cast<size_t>(n) * h * w * c;
  int ok = fwrite(&hdr, sizeof(hdr), 1, f) == 1 &&
           fwrite(images, 1, img_bytes, f) == img_bytes &&
           fwrite(labels, sizeof(int32_t), n, f) == static_cast<size_t>(n);
  fclose(f);
  return ok ? 0 : -2;
}

// mmap a cache file. Fills dims; returns an opaque handle or nullptr.
void* jckx_cache_open(const char* path, int64_t* n, int32_t* h, int32_t* w,
                      int32_t* c) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < sizeof(Header)) {
    close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (map == MAP_FAILED) return nullptr;

  auto* hd = new Handle();
  hd->map = map;
  hd->map_size = st.st_size;
  std::memcpy(&hd->hdr, map, sizeof(Header));
  if (hd->hdr.magic != kMagic) {
    munmap(map, st.st_size);
    delete hd;
    return nullptr;
  }
  // Validate header dims BEFORE sizing: a corrupted header (bit-flip, torn
  // rewrite, foreign writer) with negative or huge n/h/w/c would overflow
  // the size_t product, pass the bounds check, and hand out-of-mapping
  // pointers to the numpy views upstairs.
  const int64_t n64 = hd->hdr.n;
  const int32_t h32 = hd->hdr.h, w32 = hd->hdr.w, c32 = hd->hdr.c;
  constexpr int64_t kDimMax = 1 << 20;           // 1M px per axis: absurd cap
  constexpr int64_t kNMax = int64_t{1} << 40;    // 1T rows: absurd cap
  if (n64 <= 0 || n64 > kNMax || h32 <= 0 || h32 > kDimMax || w32 <= 0 ||
      w32 > kDimMax || c32 <= 0 || c32 > kDimMax) {
    munmap(map, st.st_size);
    delete hd;
    return nullptr;
  }
  const size_t row_bytes = static_cast<size_t>(h32) * w32 * c32;  // ≤2^63
  if (row_bytes != 0 &&
      static_cast<size_t>(n64) > (SIZE_MAX - sizeof(Header)) / row_bytes) {
    munmap(map, st.st_size);
    delete hd;
    return nullptr;
  }
  size_t img_bytes = static_cast<size_t>(n64) * row_bytes;
  size_t lab_bytes = static_cast<size_t>(n64) * sizeof(int32_t);
  if (hd->map_size < sizeof(Header) + img_bytes ||
      hd->map_size - sizeof(Header) - img_bytes < lab_bytes) {
    munmap(map, st.st_size);
    delete hd;
    return nullptr;
  }
  hd->images = static_cast<const uint8_t*>(map) + sizeof(Header);
  hd->labels = reinterpret_cast<const int32_t*>(hd->images + img_bytes);
  *n = hd->hdr.n;
  *h = hd->hdr.h;
  *w = hd->hdr.w;
  *c = hd->hdr.c;
  return hd;
}

const uint8_t* jckx_cache_images(void* handle) {
  return static_cast<Handle*>(handle)->images;
}

const int32_t* jckx_cache_labels(void* handle) {
  return static_cast<Handle*>(handle)->labels;
}

void jckx_cache_close(void* handle) {
  auto* hd = static_cast<Handle*>(handle);
  if (hd->map) munmap(hd->map, hd->map_size);
  delete hd;
}

// Seeded in-place Fisher–Yates over an int32 index array.
void jckx_shuffle(int32_t* idx, int64_t nidx, uint64_t seed) {
  uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ULL;
  for (int64_t i = nidx - 1; i > 0; --i) {
    uint64_t r = xorshift64star(s) % static_cast<uint64_t>(i + 1);
    int32_t tmp = idx[i];
    idx[i] = idx[r];
    idx[r] = tmp;
  }
}

// Gather rows (row_bytes each) at the given indices into one contiguous
// output buffer (batch assembly for the host→device transfer).
void jckx_gather(const uint8_t* images, int64_t row_bytes, const int32_t* idx,
                 int64_t nidx, uint8_t* out) {
  for (int64_t i = 0; i < nidx; ++i) {
    std::memcpy(out + i * row_bytes, images + static_cast<int64_t>(idx[i]) * row_bytes,
                row_bytes);
  }
}

}  // extern "C"
