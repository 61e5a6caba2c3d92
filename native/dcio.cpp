// densecap_tpu native IO runtime.
//
// Host-side counterpart of the reference's native data path (torch-hdf5
// partial reads + torch/image C decoders, DataLoader.lua:27,172): a
// multithreaded JPEG decode -> bilinear resize -> BGR -> VGG-mean
// subtract -> canvas pad pipeline that feeds device batches without
// touching Python on the per-pixel path. Exposed as a C ABI consumed via
// ctypes (densecap_tpu/data/native.py).
//
// Build: make -C native (produces libdcio.so).

#include <csetjmp>
#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

// AVX-512 resampler kernels (bit-identical integer arithmetic to the
// scalar path; enabled by -march=native on hosts with BW+VL+VBMI,
// e.g. Skylake-SP VBMI-less hosts fall back to scalar).
#if defined(__AVX512F__) && defined(__AVX512BW__) && \
    defined(__AVX512VL__) && defined(__AVX512VBMI__)
#include <immintrin.h>
#define DCIO_AVX512 1
#endif

namespace {

struct DecodedImage {
  std::vector<uint8_t> rgb;  // H*W*3 (decoded-at-scale dims)
  int h = 0, w = 0;          // decoded dims (== full unless DCT-scaled)
  int full_h = 0, full_w = 0;  // the file's true dims
  bool ok = false;
};

// libjpeg's default fatal-error handler exit()s the process — fatal
// for a serving path fed untrusted bytes. Replace it with longjmp back
// into the decoder, which then reports ok=false.
struct JmpErrorMgr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jmp_error_exit(j_common_ptr cinfo) {
  JmpErrorMgr* err = reinterpret_cast<JmpErrorMgr*>(cinfo->err);
  longjmp(err->jb, 1);
}

DecodedImage decode_jpeg_common(jpeg_decompress_struct* cinfo,
                                JmpErrorMgr* err,
                                int scale_longest_to = 0,
                                std::vector<uint8_t>* reuse = nullptr) {
  DecodedImage out;
  if (reuse) out.rgb = std::move(*reuse);  // recycle capacity
  if (setjmp(err->jb)) {
    // fatal decode error: bail with ok=false (buffers are owned by
    // `out` and freed normally; cinfo is destroyed by the caller)
    out.ok = false;
    return out;
  }
  if (jpeg_read_header(cinfo, TRUE) != JPEG_HEADER_OK) return out;
  cinfo->out_color_space = JCS_RGB;
  if (scale_longest_to > 0) {
    // DCT-domain downscale (fast path): decode at the smallest M/8
    // scale whose longest edge still covers the target, so the
    // bilinear pass only closes the last <= 2x. IDCT work drops
    // ~(M/8)^2. NOT bit-identical to full decode + resize — callers
    // opt in explicitly (load_batch fast_dct).
    const long edge = std::max(cinfo->image_width, cinfo->image_height);
    for (int m = 1; m <= 8; ++m) {
      if (edge * m / 8 >= long(scale_longest_to) || m == 8) {
        cinfo->scale_num = m;
        cinfo->scale_denom = 8;
        break;
      }
    }
  }
  jpeg_start_decompress(cinfo);
  out.w = cinfo->output_width;
  out.h = cinfo->output_height;
  out.full_w = cinfo->image_width;
  out.full_h = cinfo->image_height;
  if (out.w <= 0 || out.h <= 0 || int64_t(out.w) * out.h > 100000000)
    return out;
  out.rgb.resize(size_t(out.w) * out.h * 3);
  while (cinfo->output_scanline < cinfo->output_height) {
    uint8_t* row =
        out.rgb.data() + size_t(cinfo->output_scanline) * out.w * 3;
    jpeg_read_scanlines(cinfo, &row, 1);
  }
  jpeg_finish_decompress(cinfo);
  out.ok = true;
  return out;
}

DecodedImage decode_jpeg_file(const char* path, int scale_longest_to = 0,
                              std::vector<uint8_t>* reuse = nullptr) {
  DecodedImage out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;

  jpeg_decompress_struct cinfo;
  JmpErrorMgr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jmp_error_exit;
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  out = decode_jpeg_common(&cinfo, &err, scale_longest_to, reuse);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return out;
}

DecodedImage decode_jpeg_mem(const uint8_t* data, size_t len) {
  jpeg_decompress_struct cinfo;
  JmpErrorMgr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jmp_error_exit;
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  DecodedImage out = decode_jpeg_common(&cinfo, &err);
  jpeg_destroy_decompress(&cinfo);
  return out;
}

// PIL-parity BILINEAR resample. Mirrors Pillow's Resample.c 8bpc path
// algorithm-for-algorithm: a triangle filter whose support scales with
// the downscale factor (area-style weighting — the old 2-tap
// point-sampled bilinear matched PIL only "to a few pixels" when
// downscaling), double-precision normalized coefficients quantized to
// 22-bit fixed point, horizontal pass then vertical pass with uint8
// intermediates. Output is bit-identical to
// PIL.Image.resize(..., Image.BILINEAR) (tests/test_native_io.py).
constexpr int kPrecisionBits = 32 - 8 - 2;

inline uint8_t clip8(int in) {
  if (in >= (1 << (kPrecisionBits + 8))) return 255;
  if (in <= 0) return 0;
  return uint8_t(in >> kPrecisionBits);
}

// Per-output-pixel tap windows [xmin, xmin+xmax) and fixed-point
// weights (ksize per pixel, zero-padded).
void precompute_coeffs(int in_size, int out_size, std::vector<int>& bounds,
                       std::vector<int>& kk, int* ksize_out) {
  const double scale = double(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = filterscale;  // bilinear filter support = 1.0
  const int ksize = int(std::ceil(support)) * 2 + 1;
  bounds.assign(size_t(out_size) * 2, 0);
  std::vector<double> prekk(size_t(out_size) * ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    const double ss = 1.0 / filterscale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &prekk[size_t(xx) * ksize];
    double ww = 0.0;
    int x = 0;
    for (; x < xmax; ++x) {
      const double arg = std::fabs((x + xmin - center + 0.5) * ss);
      const double w = arg < 1.0 ? 1.0 - arg : 0.0;  // triangle filter
      k[x] = w;
      ww += w;
    }
    for (x = 0; x < xmax; ++x)
      if (ww != 0.0) k[x] /= ww;
    for (; x < ksize; ++x) k[x] = 0.0;
    bounds[xx * 2 + 0] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
  kk.resize(prekk.size());
  for (size_t i = 0; i < prekk.size(); ++i)
    kk[i] = int(prekk[i] < 0 ? prekk[i] * (1 << kPrecisionBits) - 0.5
                             : prekk[i] * (1 << kPrecisionBits) + 0.5);
  *ksize_out = ksize;
}

// One output row of the horizontal pass, scalar (also the tail/fallback
// for the SIMD path below — arithmetic is identical).
void hpass_scalar_row(const uint8_t* row, uint8_t* orow, int dw,
                      const std::vector<int>& boundsx,
                      const std::vector<int>& kkx, int kszx) {
  for (int x = 0; x < dw; ++x) {
    const int xmin = boundsx[x * 2], xmax = boundsx[x * 2 + 1];
    const int* k = &kkx[size_t(x) * kszx];
    for (int c = 0; c < 3; ++c) {
      int acc = 1 << (kPrecisionBits - 1);
      for (int ix = 0; ix < xmax; ++ix)
        acc += row[size_t(xmin + ix) * 3 + c] * k[ix];
      orow[size_t(x) * 3 + c] = clip8(acc);
    }
  }
}

#ifdef DCIO_AVX512

// clip8 over 16 lanes: clamp to [0, 2^(P+8)-1] then >>P — identical to
// the scalar branch structure (any in-range value shifts to <= 255).
inline __m512i clip8_vec(__m512i acc) {
  const __m512i lim = _mm512_set1_epi32((1 << (kPrecisionBits + 8)) - 1);
  acc = _mm512_max_epi32(acc, _mm512_setzero_si512());
  acc = _mm512_min_epi32(acc, lim);
  return _mm512_srli_epi32(acc, kPrecisionBits);
}

// Horizontal pass vectorized over 16 OUTPUT pixels per iteration: one
// dword gather per tap fetches bytes [(xmin+ix)*3 .. +4) — all three
// interleaved channels of that tap pixel — for 16 output pixels at
// once. Coefficients are pre-transposed to [tap][lane]. The gathered
// dword's 4th byte can read one byte past the row end, which for
// y < sh-1 lands in the next row of the same buffer; the LAST source
// row is done scalar so no read leaves `src`.
void hpass_avx512(const uint8_t* src, int sh, int sw, uint8_t* tmp,
                  int dw, const std::vector<int>& boundsx,
                  const std::vector<int>& kkx, int ksize) {
  const size_t rin = size_t(sw) * 3, rout = size_t(dw) * 3;
  const __m512i half = _mm512_set1_epi32(1 << (kPrecisionBits - 1));
  const __m512i maxoff = _mm512_set1_epi32((sw - 1) * 3);
  const __m512i ff = _mm512_set1_epi32(0xFF);
  // byte shuffle: dword lane i holds (b|g<<8|r<<16); pull 3 bytes per
  // lane into a contiguous 48-byte RGB run
  alignas(64) uint8_t pat[64] = {0};
  for (int i = 0; i < 16; ++i)
    for (int c = 0; c < 3; ++c) pat[i * 3 + c] = uint8_t(i * 4 + c);
  const __m512i perm = _mm512_loadu_si512(pat);

  const int nblk = (dw + 15) / 16;
  thread_local std::vector<int32_t> xoff, kt;
  xoff.assign(size_t(nblk) * 16, 0);
  kt.assign(size_t(nblk) * 16 * ksize, 0);
  for (int x = 0; x < dw; ++x) {
    const int b = x / 16, l = x % 16;
    xoff[size_t(b) * 16 + l] = boundsx[x * 2] * 3;
    for (int i = 0; i < ksize; ++i)
      kt[(size_t(b) * ksize + i) * 16 + l] = kkx[size_t(x) * ksize + i];
  }
  for (int y = 0; y + 1 < sh; ++y) {
    const uint8_t* row = src + size_t(y) * rin;
    uint8_t* orow = tmp + size_t(y) * rout;
    for (int b = 0; b < nblk; ++b) {
      const int x0 = b * 16;
      const int nlan = std::min(16, dw - x0);
      const __mmask16 m =
          __mmask16(nlan == 16 ? 0xFFFFu : ((1u << nlan) - 1));
      const __m512i base = _mm512_loadu_si512(&xoff[size_t(b) * 16]);
      __m512i a0 = half, a1 = half, a2 = half;
      for (int i = 0; i < ksize; ++i) {
        // clamp padded taps (coeff 0) into bounds; value is irrelevant
        const __m512i off = _mm512_min_epi32(
            _mm512_add_epi32(base, _mm512_set1_epi32(i * 3)), maxoff);
        const __m512i d = _mm512_mask_i32gather_epi32(
            _mm512_setzero_si512(), m, off, row, 1);
        const __m512i kv =
            _mm512_loadu_si512(&kt[(size_t(b) * ksize + i) * 16]);
        a0 = _mm512_add_epi32(
            a0, _mm512_mullo_epi32(_mm512_and_si512(d, ff), kv));
        a1 = _mm512_add_epi32(
            a1, _mm512_mullo_epi32(
                    _mm512_and_si512(_mm512_srli_epi32(d, 8), ff), kv));
        a2 = _mm512_add_epi32(
            a2, _mm512_mullo_epi32(
                    _mm512_and_si512(_mm512_srli_epi32(d, 16), ff), kv));
      }
      const __m512i packed = _mm512_or_si512(
          clip8_vec(a0),
          _mm512_or_si512(_mm512_slli_epi32(clip8_vec(a1), 8),
                          _mm512_slli_epi32(clip8_vec(a2), 16)));
      const __m512i bytes = _mm512_permutexvar_epi8(perm, packed);
      const __mmask64 sm = nlan == 16 ? 0xFFFFFFFFFFFFull
                                      : ((1ull << (nlan * 3)) - 1);
      _mm512_mask_storeu_epi8(orow + size_t(x0) * 3, sm, bytes);
    }
  }
  if (sh > 0)
    hpass_scalar_row(src + size_t(sh - 1) * rin, tmp + size_t(sh - 1) * rout,
                     dw, boundsx, kkx, ksize);
}

// Vertical pass: contiguous along the row axis — 16 bytes of each tap
// row widen to one zmm of dwords, FMA-style accumulate, narrow, store.
void vpass_avx512(const uint8_t* tmp, uint8_t* dst, int dh, size_t rowlen,
                  const std::vector<int>& boundsy,
                  const std::vector<int>& kky, int ksize) {
  const __m512i half = _mm512_set1_epi32(1 << (kPrecisionBits - 1));
  for (int y = 0; y < dh; ++y) {
    const int ymin = boundsy[y * 2], ymax = boundsy[y * 2 + 1];
    const int* k = &kky[size_t(y) * ksize];
    uint8_t* orow = dst + size_t(y) * rowlen;
    for (size_t j = 0; j < rowlen; j += 16) {
      const int nb = int(std::min<size_t>(16, rowlen - j));
      const __mmask16 m =
          __mmask16(nb == 16 ? 0xFFFFu : ((1u << nb) - 1));
      __m512i acc = half;
      for (int iy = 0; iy < ymax; ++iy) {
        const __m128i b = _mm_maskz_loadu_epi8(
            m, tmp + size_t(ymin + iy) * rowlen + j);
        acc = _mm512_add_epi32(
            acc, _mm512_mullo_epi32(_mm512_cvtepu8_epi32(b),
                                    _mm512_set1_epi32(k[iy])));
      }
      _mm_mask_storeu_epi8(orow + j, m, _mm512_cvtepi32_epi8(clip8_vec(acc)));
    }
  }
}

#endif  // DCIO_AVX512

// RGB uint8 row -> BGR float32 row minus per-channel mean (the canvas
// write of load_batch). IEEE-exact same arithmetic scalar or SIMD.
void bgr_meansub_image(const uint8_t* p, float* canvas, int H, int W,
                       int S, const float* mean_bgr) {
#ifdef DCIO_AVX512
  alignas(64) float mbuf[48];
  for (int j = 0; j < 48; ++j) mbuf[j] = mean_bgr[j % 3];
  const __m512 m0 = _mm512_loadu_ps(mbuf);
  const __m512 m1 = _mm512_loadu_ps(mbuf + 16);
  const __m512 m2 = _mm512_loadu_ps(mbuf + 32);
  alignas(64) uint8_t pat[64] = {0};
  for (int t = 0; t < 16; ++t) {  // swap R<->B within each triple
    pat[t * 3 + 0] = uint8_t(t * 3 + 2);
    pat[t * 3 + 1] = uint8_t(t * 3 + 1);
    pat[t * 3 + 2] = uint8_t(t * 3 + 0);
  }
  const __m512i perm = _mm512_loadu_si512(pat);
  const __mmask64 lm = 0xFFFFFFFFFFFFull;  // 48 bytes = 16 pixels
#endif
  for (int y = 0; y < H; ++y) {
    const uint8_t* row = p + size_t(y) * W * 3;
    float* q = canvas + size_t(y) * S * 3;
    int x = 0;
#ifdef DCIO_AVX512
    for (; x + 16 <= W; x += 16) {
      __m512i b = _mm512_maskz_loadu_epi8(lm, row + size_t(x) * 3);
      b = _mm512_permutexvar_epi8(perm, b);
      const __m128i b0 = _mm512_castsi512_si128(b);
      const __m128i b1 = _mm512_extracti32x4_epi32(b, 1);
      const __m128i b2 = _mm512_extracti32x4_epi32(b, 2);
      float* o = q + size_t(x) * 3;
      _mm512_storeu_ps(
          o, _mm512_sub_ps(
                 _mm512_cvtepi32_ps(_mm512_cvtepu8_epi32(b0)), m0));
      _mm512_storeu_ps(
          o + 16, _mm512_sub_ps(
                      _mm512_cvtepi32_ps(_mm512_cvtepu8_epi32(b1)), m1));
      _mm512_storeu_ps(
          o + 32, _mm512_sub_ps(
                      _mm512_cvtepi32_ps(_mm512_cvtepu8_epi32(b2)), m2));
    }
#endif
    for (; x < W; ++x) {
      const uint8_t* pp = row + size_t(x) * 3;
      float* qq = q + size_t(x) * 3;
      qq[0] = float(pp[2]) - mean_bgr[0];
      qq[1] = float(pp[1]) - mean_bgr[1];
      qq[2] = float(pp[0]) - mean_bgr[2];
    }
  }
}

void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw) {
  // thread_local scratch: capacity persists across images so the batch
  // loop doesn't page-fault fresh multi-MB allocations per image
  thread_local std::vector<int> boundsx, kkx, boundsy, kky;
  thread_local std::vector<uint8_t> tmp;
  int kszx = 0, kszy = 0;
  precompute_coeffs(sw, dw, boundsx, kkx, &kszx);
  precompute_coeffs(sh, dh, boundsy, kky, &kszy);

  // horizontal pass: (sh, sw) -> (sh, dw), uint8 intermediate like PIL
  tmp.resize(size_t(sh) * dw * 3);
#ifdef DCIO_AVX512
  hpass_avx512(src, sh, sw, tmp.data(), dw, boundsx, kkx, kszx);
#else
  for (int y = 0; y < sh; ++y)
    hpass_scalar_row(src + size_t(y) * sw * 3, tmp.data() + size_t(y) * dw * 3,
                     dw, boundsx, kkx, kszx);
#endif
  // vertical pass: (sh, dw) -> (dh, dw)
#ifdef DCIO_AVX512
  vpass_avx512(tmp.data(), dst, dh, size_t(dw) * 3, boundsy, kky, kszy);
#else
  for (int y = 0; y < dh; ++y) {
    const int ymin = boundsy[y * 2], ymax = boundsy[y * 2 + 1];
    const int* k = &kky[size_t(y) * kszy];
    for (int x = 0; x < dw; ++x) {
      for (int c = 0; c < 3; ++c) {
        int acc = 1 << (kPrecisionBits - 1);
        for (int iy = 0; iy < ymax; ++iy)
          acc += tmp[(size_t(ymin + iy) * dw + x) * 3 + c] * k[iy];
        dst[(size_t(y) * dw + x) * 3 + c] = clip8(acc);
      }
    }
  }
#endif
}

struct ThreadPool {
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i)
      workers.emplace_back([this] { run(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu);
      done = true;
    }
    cv.notify_all();
    for (auto& t : workers) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu);
      q.push(std::move(fn));
    }
    cv.notify_one();
  }
  void run() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return done || !q.empty(); });
        if (done && q.empty()) return;
        fn = std::move(q.front());
        q.pop();
      }
      fn();
    }
  }
  std::vector<std::thread> workers;
  std::queue<std::function<void()>> q;
  std::mutex mu;
  std::condition_variable cv;
  bool done = false;
};

}  // namespace

extern "C" {

// Bump whenever any exported signature changes; the ctypes loader
// refuses (and rebuilds) a stale .so instead of calling it with a
// mismatched argument list. v2: dcio_load_batch grew
// orig_heights/orig_widths outputs. v3: PIL-parity triangle-filter
// resampler (replaces the approximate 2-tap bilinear) + dcio_resize.
// v4: dcio_load_batch grew fast_dct (DCT-domain decode downscale).
int dcio_abi_version() { return 4; }

// Direct resize entry (PIL BILINEAR parity — the parity test hook).
void dcio_resize(const uint8_t* src, int sh, int sw, uint8_t* dst,
                 int dh, int dw) {
  resize_bilinear(src, sh, sw, dst, dh, dw);
}

// Decode + resize-longest-edge + BGR + mean-subtract + pad onto a
// canvas_size^2 float32 HWC canvas. Batched over `n` paths with
// `num_threads` workers. Outputs:
//   canvases: n * S * S * 3 float32 (HWC, BGR, mean-subtracted)
//   heights/widths: n float32 true extents on the canvas
// Returns number of successfully decoded images.
int dcio_load_batch(const char** paths, int n, int canvas_size,
                    const float* mean_bgr, float* canvases, float* heights,
                    float* widths, float* orig_heights, float* orig_widths,
                    int num_threads, int fast_dct) {
  std::atomic<int> ok_count{0};
  ThreadPool pool(std::max(1, num_threads));
  std::atomic<int> remaining{n};
  std::mutex done_mu;
  std::condition_variable done_cv;

  const int S = canvas_size;
  for (int i = 0; i < n; ++i) {
    pool.submit([&, i] {
      float* canvas = canvases + size_t(i) * S * S * 3;
      heights[i] = 0;
      widths[i] = 0;
      if (orig_heights) orig_heights[i] = 0;
      if (orig_widths) orig_widths[i] = 0;
      thread_local std::vector<uint8_t> rgb_scratch, resized;
      DecodedImage img =
          decode_jpeg_file(paths[i], fast_dct ? S : 0, &rgb_scratch);
      if (img.ok) {
        // Canvas extents come from the FILE's dims (identical between
        // exact and fast_dct paths, so box rescaling is unaffected).
        // double + round-half-even to match the Python path's
        // round(H0 * scale) exactly (utils/image.py:preprocess_for_model)
        double scale = double(S) / std::max(img.full_h, img.full_w);
        int H = int(std::nearbyint(img.full_h * scale));
        int W = int(std::nearbyint(img.full_w * scale));
        H = std::min(H, S);
        W = std::min(W, S);
        resized.resize(size_t(H) * W * 3);
        resize_bilinear(img.rgb.data(), img.h, img.w, resized.data(), H, W);
        rgb_scratch = std::move(img.rgb);
        bgr_meansub_image(resized.data(), canvas, H, W, S, mean_bgr);
        // zero only the padding (content rows were just written)
        for (int y = 0; y < H; ++y)
          if (W < S)
            std::memset(canvas + (size_t(y) * S + W) * 3, 0,
                        sizeof(float) * size_t(S - W) * 3);
        if (H < S)
          std::memset(canvas + size_t(H) * S * 3, 0,
                      sizeof(float) * size_t(S - H) * S * 3);
        heights[i] = float(H);
        widths[i] = float(W);
        if (orig_heights) orig_heights[i] = float(img.full_h);
        if (orig_widths) orig_widths[i] = float(img.full_w);
        ok_count.fetch_add(1);
      } else {
        std::memset(canvas, 0, sizeof(float) * size_t(S) * S * 3);
      }
      if (remaining.fetch_sub(1) == 1) {
        std::unique_lock<std::mutex> lk(done_mu);
        done_cv.notify_all();
      }
    });
  }
  {
    std::unique_lock<std::mutex> lk(done_mu);
    done_cv.wait(lk, [&] { return remaining.load() == 0; });
  }
  return ok_count.load();
}

// Decode a single JPEG to RGB uint8; caller provides a buffer of
// max_bytes. Returns 0 on failure, else writes h/w and returns 1.
int dcio_decode_jpeg(const char* path, uint8_t* out, long max_bytes,
                     int* h, int* w) {
  DecodedImage img = decode_jpeg_file(path);
  if (!img.ok) return 0;
  long need = long(img.h) * img.w * 3;
  if (need > max_bytes) return 0;
  std::memcpy(out, img.rgb.data(), size_t(need));
  *h = img.h;
  *w = img.w;
  return 1;
}

// In-memory variant (serving ingest: decode POSTed JPEG bytes without
// touching the filesystem).
int dcio_decode_jpeg_mem(const uint8_t* data, long len, uint8_t* out,
                         long max_bytes, int* h, int* w) {
  DecodedImage img = decode_jpeg_mem(data, size_t(len));
  if (!img.ok) return 0;
  long need = long(img.h) * img.w * 3;
  if (need > max_bytes) return 0;
  std::memcpy(out, img.rgb.data(), size_t(need));
  *h = img.h;
  *w = img.w;
  return 1;
}

}  // extern "C"
