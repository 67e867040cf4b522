// SIDPack native reader — the data-loading hot path in C++.
//
// The reference framework's below-Python layer is its CUDA autograd kernels;
// this TPU rebuild's native layer sits where the host actually spends time:
// record decompression, crop extraction, and uint16 -> float32 conversion
// feeding the device. Index parsing stays in Python (cold path); this
// library does:
//
//   - mmap-backed zero-copy access to pack payloads,
//   - zlib inflate of compressed records into caller buffers,
//   - fused decode+crop+convert: uint16 HWC record -> float32 crop,
//     optionally exposure-scaled and clipped (producing `lq` directly),
//   - a pthread batch API decoding N records in parallel.
//
// Built as libsidpack.so (see native/Makefile); bound via ctypes in
// lowlight_image_enhancement_tpu/data/native_loader.py with a pure-Python
// fallback when the library is absent.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

extern "C" {

struct SpHandle {
  int fd;
  const uint8_t* base;
  uint64_t size;
};

// Open a pack file and mmap it read-only. Returns nullptr on failure.
SpHandle* sp_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  // advise the kernel we'll read records at random offsets
  madvise(base, st.st_size, MADV_RANDOM);
  auto* h = new SpHandle();
  h->fd = fd;
  h->base = static_cast<const uint8_t*>(base);
  h->size = static_cast<uint64_t>(st.st_size);
  return h;
}

void sp_close(SpHandle* h) {
  if (!h) return;
  munmap(const_cast<uint8_t*>(h->base), h->size);
  close(h->fd);
  delete h;
}

// Read a raw (comp=0) or zlib (comp=1) payload into `out`.
// Returns decompressed size, or -1 on error.
int64_t sp_read(const SpHandle* h, uint64_t offset, uint64_t nbytes,
                int comp, uint8_t* out, uint64_t out_capacity) {
  if (!h || offset + nbytes > h->size) return -1;
  const uint8_t* src = h->base + offset;
  if (comp == 0) {
    if (nbytes > out_capacity) return -1;
    memcpy(out, src, nbytes);
    return static_cast<int64_t>(nbytes);
  }
  uLongf dest_len = out_capacity;
  int rc = uncompress(out, &dest_len, src, nbytes);
  if (rc != Z_OK) return -1;
  return static_cast<int64_t>(dest_len);
}

// Decode a uint16 HWC record, crop [top:top+ph, left:left+pw], convert to
// float32 * scale (typically 1/65535), optionally multiply by expo and
// clip to [0, 1] (producing the exposure-aligned `lq` in one pass).
// scratch must hold h*w*c uint16 when comp=1 (inflate target); may be
// nullptr when comp=0 (cropping reads directly from the mmap — only the
// cropped rows are touched).
// Returns 0 on success.
int sp_decode_crop_f32(const SpHandle* h, uint64_t offset, uint64_t nbytes,
                       int comp, int64_t height, int64_t width,
                       int64_t channels, int64_t top, int64_t left,
                       int64_t ph, int64_t pw, float scale, float expo,
                       int apply_expo_clip, uint16_t* scratch, float* out) {
  if (!h || top < 0 || left < 0 || top + ph > height || left + pw > width)
    return -1;
  const uint16_t* img;
  if (comp == 0) {
    if (offset + nbytes > h->size) return -1;
    img = reinterpret_cast<const uint16_t*>(h->base + offset);
  } else {
    if (!scratch) return -1;
    uLongf dest_len = static_cast<uLongf>(height * width * channels * 2);
    if (uncompress(reinterpret_cast<uint8_t*>(scratch), &dest_len,
                   h->base + offset, nbytes) != Z_OK)
      return -1;
    img = scratch;
  }
  const int64_t row_elems = width * channels;
  for (int64_t r = 0; r < ph; ++r) {
    const uint16_t* src_row = img + (top + r) * row_elems + left * channels;
    float* dst_row = out + r * pw * channels;
    const int64_t n = pw * channels;
    if (apply_expo_clip) {
      for (int64_t i = 0; i < n; ++i) {
        float v = static_cast<float>(src_row[i]) * scale * expo;
        dst_row[i] = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
      }
    } else {
      for (int64_t i = 0; i < n; ++i)
        dst_row[i] = static_cast<float>(src_row[i]) * scale;
    }
  }
  return 0;
}

// Banded payload (comp="zlib_band"): rows are compressed in independent
// stripes so a crop only inflates the overlapping stripes. Header layout
// (little-endian): uint32 band_rows | uint32 n_bands | uint64 ends[n] |
// concatenated zlib streams. Returns 0 on success.
int sp_decode_crop_banded_f32(const SpHandle* h, uint64_t offset,
                              uint64_t nbytes, int64_t height,
                              int64_t width, int64_t channels, int64_t top,
                              int64_t left, int64_t ph, int64_t pw,
                              float scale, float expo, int apply_expo_clip,
                              uint16_t* scratch, float* out) {
  if (!h || !scratch || top < 0 || left < 0 || top + ph > height ||
      left + pw > width || offset + nbytes > h->size)
    return -1;
  const uint8_t* base = h->base + offset;
  uint32_t band_rows, n_bands;
  memcpy(&band_rows, base, 4);
  memcpy(&n_bands, base + 4, 4);
  if (band_rows == 0 || n_bands == 0) return -1;
  const uint8_t* ends_raw = base + 8;
  const uint8_t* data0 = base + 8 + 8ull * n_bands;

  const int64_t b0 = top / band_rows;
  const int64_t b1 = (top + ph - 1) / band_rows;
  if (b1 >= (int64_t)n_bands) return -1;
  const int64_t row_elems = width * channels;

  // inflate bands b0..b1 contiguously into scratch
  uint8_t* dst = reinterpret_cast<uint8_t*>(scratch);
  for (int64_t b = b0; b <= b1; ++b) {
    uint64_t start = 0, end = 0;
    memcpy(&end, ends_raw + 8 * b, 8);
    if (b > 0) memcpy(&start, ends_raw + 8 * (b - 1), 8);
    const int64_t rows_here =
        (b == (int64_t)n_bands - 1) ? (height - b * band_rows) : band_rows;
    uLongf dest_len = static_cast<uLongf>(rows_here * row_elems * 2);
    if (uncompress(dst, &dest_len, data0 + start,
                   static_cast<uLong>(end - start)) != Z_OK)
      return -1;
    dst += dest_len;
  }

  const int64_t local_top = top - b0 * band_rows;
  for (int64_t r = 0; r < ph; ++r) {
    const uint16_t* src_row =
        scratch + (local_top + r) * row_elems + left * channels;
    float* dst_row = out + r * pw * channels;
    const int64_t n = pw * channels;
    if (apply_expo_clip) {
      for (int64_t i = 0; i < n; ++i) {
        float v = static_cast<float>(src_row[i]) * scale * expo;
        dst_row[i] = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
      }
    } else {
      for (int64_t i = 0; i < n; ++i)
        dst_row[i] = static_cast<float>(src_row[i]) * scale;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Parallel batch decode: N independent records -> N float32 crops.
// ---------------------------------------------------------------------------

struct SpJob {
  const SpHandle* handle;
  uint64_t offset, nbytes;
  int comp;
  int64_t height, width, channels, top, left, ph, pw;
  float scale, expo;
  int apply_expo_clip;
  uint16_t* scratch;
  float* out;
  int rc;
};

static void* sp_worker(void* arg) {
  SpJob* job = static_cast<SpJob*>(arg);
  job->rc = sp_decode_crop_f32(
      job->handle, job->offset, job->nbytes, job->comp, job->height,
      job->width, job->channels, job->top, job->left, job->ph, job->pw,
      job->scale, job->expo, job->apply_expo_clip, job->scratch, job->out);
  return nullptr;
}

// Arrays of length n for each per-record field. scratch is one buffer of
// n * max_elems uint16 (sliced per job). Returns 0 iff all jobs succeed.
int sp_decode_crop_batch_f32(const SpHandle** handles, int64_t n,
                             const uint64_t* offsets, const uint64_t* nbytes,
                             const int* comps, const int64_t* heights,
                             const int64_t* widths, const int64_t* channels,
                             const int64_t* tops, const int64_t* lefts,
                             int64_t ph, int64_t pw, float scale,
                             const float* expos, int apply_expo_clip,
                             uint16_t* scratch, int64_t max_elems,
                             float* out) {
  if (n <= 0) return -1;
  SpJob* jobs = new SpJob[n];
  pthread_t* threads = new pthread_t[n];
  for (int64_t i = 0; i < n; ++i) {
    jobs[i] = SpJob{handles[i],
                    offsets[i],
                    nbytes[i],
                    comps[i],
                    heights[i],
                    widths[i],
                    channels[i],
                    tops[i],
                    lefts[i],
                    ph,
                    pw,
                    scale,
                    expos ? expos[i] : 1.0f,
                    apply_expo_clip,
                    scratch ? scratch + i * max_elems : nullptr,
                    out + i * ph * pw * channels[i],
                    0};
    pthread_create(&threads[i], nullptr, sp_worker, &jobs[i]);
  }
  int rc = 0;
  for (int64_t i = 0; i < n; ++i) {
    pthread_join(threads[i], nullptr);
    if (jobs[i].rc != 0) rc = -1;
  }
  delete[] jobs;
  delete[] threads;
  return rc;
}

}  // extern "C"
