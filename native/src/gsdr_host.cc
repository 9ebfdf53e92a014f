/* gsdr_host implementation. See gsdr_host.h for the design rationale. */

#include "gsdr_host.h"

#include <atomic>
#include <cstring>
#include <new>
#include <vector>

/* ---------------------------------------------------------------------- */
/* SPSC ring buffer: interleaved complex float32, power-of-two capacity.  */
/* Single producer / single consumer, lock-free via acquire/release       */
/* atomics on head/tail sample counters (monotonic, wrapped by mask).     */
/* ---------------------------------------------------------------------- */

struct GsdrRing {
  std::vector<float> data;      /* 2 * capacity floats, interleaved */
  size_t capacity;              /* samples, power of two */
  size_t mask;
  std::atomic<uint64_t> head{0};  /* samples written (producer) */
  std::atomic<uint64_t> tail{0};  /* samples consumed (consumer) */
};

static size_t next_pow2(size_t v) {
  size_t p = 1;
  while (p < v) p <<= 1;
  return p;
}

extern "C" GsdrRing* gsdr_ring_create(size_t capacity_samples) {
  if (capacity_samples == 0) return nullptr;
  auto* r = new (std::nothrow) GsdrRing();
  if (!r) return nullptr;
  r->capacity = next_pow2(capacity_samples);
  r->mask = r->capacity - 1;
  r->data.resize(2 * r->capacity);
  return r;
}

extern "C" void gsdr_ring_destroy(GsdrRing* r) { delete r; }

extern "C" size_t gsdr_ring_capacity(const GsdrRing* r) {
  return r ? r->capacity : 0;
}

extern "C" size_t gsdr_ring_readable(const GsdrRing* r) {
  if (!r) return 0;
  return (size_t)(r->head.load(std::memory_order_acquire) -
                  r->tail.load(std::memory_order_acquire));
}

extern "C" size_t gsdr_ring_writable(const GsdrRing* r) {
  return r ? r->capacity - gsdr_ring_readable(r) : 0;
}

extern "C" size_t gsdr_ring_write(GsdrRing* r, const float* interleaved,
                                  size_t n) {
  if (!r || !interleaved) return 0;
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  size_t space = r->capacity - (size_t)(head - tail);
  if (n > space) n = space;
  for (size_t i = 0; i < n; ++i) {
    size_t slot = (size_t)((head + i) & r->mask);
    r->data[2 * slot] = interleaved[2 * i];
    r->data[2 * slot + 1] = interleaved[2 * i + 1];
  }
  r->head.store(head + n, std::memory_order_release);
  return n;
}

extern "C" size_t gsdr_ring_read_planar(GsdrRing* r, float* re, float* im,
                                        size_t n) {
  if (!r || !re || !im) return 0;
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  uint64_t head = r->head.load(std::memory_order_acquire);
  size_t avail = (size_t)(head - tail);
  if (n > avail) n = avail;
  for (size_t i = 0; i < n; ++i) {
    size_t slot = (size_t)((tail + i) & r->mask);
    re[i] = r->data[2 * slot];
    im[i] = r->data[2 * slot + 1];
  }
  r->tail.store(tail + n, std::memory_order_release);
  return n;
}

/* ---------------------------------------------------------------------- */
/* Overlap-save framer                                                    */
/* ---------------------------------------------------------------------- */

struct GsdrFramer {
  size_t block_len;
  size_t history;
  uint64_t next_first_index = 0;    /* global index of next new sample */
  std::vector<float> tail_re, tail_im;  /* `history` carried samples */
};

extern "C" GsdrFramer* gsdr_framer_create(size_t block_len, size_t history) {
  if (block_len == 0) return nullptr;
  auto* f = new (std::nothrow) GsdrFramer();
  if (!f) return nullptr;
  f->block_len = block_len;
  f->history = history;
  f->tail_re.assign(history, 0.0f);
  f->tail_im.assign(history, 0.0f);
  return f;
}

extern "C" void gsdr_framer_destroy(GsdrFramer* f) { delete f; }

extern "C" int gsdr_framer_next(GsdrFramer* f, GsdrRing* ring, float* re,
                                float* im, uint64_t* first_sample_index) {
  if (!f || !ring || !re || !im) return GSDR_HOST_EINVAL;
  if (gsdr_ring_readable(ring) < f->block_len) return GSDR_HOST_EAGAIN;
  std::memcpy(re, f->tail_re.data(), f->history * sizeof(float));
  std::memcpy(im, f->tail_im.data(), f->history * sizeof(float));
  size_t got = gsdr_ring_read_planar(ring, re + f->history, im + f->history,
                                     f->block_len);
  if (got != f->block_len) return GSDR_HOST_EAGAIN;  /* unreachable (SPSC) */
  if (first_sample_index) *first_sample_index = f->next_first_index;
  f->next_first_index += f->block_len;
  if (f->history > 0) {
    const float* endr = re + f->history + f->block_len - f->history;
    const float* endi = im + f->history + f->block_len - f->history;
    std::memcpy(f->tail_re.data(), endr, f->history * sizeof(float));
    std::memcpy(f->tail_im.data(), endi, f->history * sizeof(float));
  }
  return GSDR_HOST_OK;
}

/* ---------------------------------------------------------------------- */
/* Sample staging                                                         */
/* ---------------------------------------------------------------------- */

extern "C" void gsdr_int8_iq_to_planar_f32(const int8_t* in, size_t n,
                                           float* re, float* im) {
  /* out = max(-1, x/127): -128/-127 -> -1.0, 127 -> 1.0, 0 -> 0.0
   * (include/gsdr/conversion.h:24-29). Table lookup beats per-sample
   * divide and vectorizes cleanly. */
  struct Lut {
    float v[256];
    Lut() {
      for (int s = -128; s < 128; ++s) {
        float x = (float)s / 127.0f;
        v[(uint8_t)(int8_t)s] = x < -1.0f ? -1.0f : x;
      }
    }
  };
  /* C++11 function-local static: thread-safe one-time construction. */
  static const Lut lut;
  for (size_t i = 0; i < n; ++i) {
    re[i] = lut.v[(uint8_t)in[2 * i]];
    im[i] = lut.v[(uint8_t)in[2 * i + 1]];
  }
}

extern "C" void gsdr_int16_iq_to_planar_f32(const int16_t* in, size_t n,
                                            float* re, float* im) {
  const float s = 1.0f / 32767.0f;
  for (size_t i = 0; i < n; ++i) {
    float r = (float)in[2 * i] * s;
    float q = (float)in[2 * i + 1] * s;
    re[i] = r < -1.0f ? -1.0f : r;
    im[i] = q < -1.0f ? -1.0f : q;
  }
}

extern "C" void gsdr_f32_iq_to_planar(const float* in, size_t n, float* re,
                                      float* im) {
  for (size_t i = 0; i < n; ++i) {
    re[i] = in[2 * i];
    im[i] = in[2 * i + 1];
  }
}

extern "C" void gsdr_planar_to_f32_iq(const float* re, const float* im,
                                      size_t n, float* out) {
  for (size_t i = 0; i < n; ++i) {
    out[2 * i] = re[i];
    out[2 * i + 1] = im[i];
  }
}

/* ---------------------------------------------------------------------- */
/* QPSK byte packing (LSB-first 2-bit fields, src/qpsk.cu:121-123)        */
/* ---------------------------------------------------------------------- */

extern "C" void gsdr_unpack_2bit(const uint8_t* bytes, size_t num_symbols,
                                 uint8_t* symbols) {
  for (size_t i = 0; i < num_symbols; ++i) {
    symbols[i] = (uint8_t)((bytes[i >> 2] >> ((i & 3) * 2)) & 0x3);
  }
}

extern "C" void gsdr_pack_2bit(const uint8_t* symbols, size_t num_symbols,
                               uint8_t* bytes) {
  size_t nbytes = (num_symbols + 3) / 4;
  std::memset(bytes, 0, nbytes);
  for (size_t i = 0; i < num_symbols; ++i) {
    bytes[i >> 2] =
        (uint8_t)(bytes[i >> 2] | ((symbols[i] & 0x3) << ((i & 3) * 2)));
  }
}
