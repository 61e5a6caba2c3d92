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

namespace {

struct DecodedImage {
  std::vector<uint8_t> rgb;  // H*W*3
  int h = 0, w = 0;
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
                                JmpErrorMgr* err) {
  DecodedImage out;
  if (setjmp(err->jb)) {
    // fatal decode error: bail with ok=false (buffers are owned by
    // `out` and freed normally; cinfo is destroyed by the caller)
    out.ok = false;
    return out;
  }
  if (jpeg_read_header(cinfo, TRUE) != JPEG_HEADER_OK) return out;
  cinfo->out_color_space = JCS_RGB;
  jpeg_start_decompress(cinfo);
  out.w = cinfo->output_width;
  out.h = cinfo->output_height;
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

DecodedImage decode_jpeg_file(const char* path) {
  DecodedImage out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;

  jpeg_decompress_struct cinfo;
  JmpErrorMgr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jmp_error_exit;
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  out = decode_jpeg_common(&cinfo, &err);
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

void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw) {
  std::vector<int> boundsx, kkx, boundsy, kky;
  int kszx = 0, kszy = 0;
  precompute_coeffs(sw, dw, boundsx, kkx, &kszx);
  precompute_coeffs(sh, dh, boundsy, kky, &kszy);

  // horizontal pass: (sh, sw) -> (sh, dw), uint8 intermediate like PIL
  std::vector<uint8_t> tmp(size_t(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + size_t(y) * sw * 3;
    for (int x = 0; x < dw; ++x) {
      const int xmin = boundsx[x * 2], xmax = boundsx[x * 2 + 1];
      const int* k = &kkx[size_t(x) * kszx];
      for (int c = 0; c < 3; ++c) {
        int acc = 1 << (kPrecisionBits - 1);
        for (int ix = 0; ix < xmax; ++ix)
          acc += row[size_t(xmin + ix) * 3 + c] * k[ix];
        tmp[(size_t(y) * dw + x) * 3 + c] = clip8(acc);
      }
    }
  }
  // vertical pass: (sh, dw) -> (dh, dw)
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
int dcio_abi_version() { return 3; }

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
                    int num_threads) {
  std::atomic<int> ok_count{0};
  ThreadPool pool(std::max(1, num_threads));
  std::atomic<int> remaining{n};
  std::mutex done_mu;
  std::condition_variable done_cv;

  const int S = canvas_size;
  for (int i = 0; i < n; ++i) {
    pool.submit([&, i] {
      float* canvas = canvases + size_t(i) * S * S * 3;
      std::memset(canvas, 0, sizeof(float) * size_t(S) * S * 3);
      heights[i] = 0;
      widths[i] = 0;
      if (orig_heights) orig_heights[i] = 0;
      if (orig_widths) orig_widths[i] = 0;
      DecodedImage img = decode_jpeg_file(paths[i]);
      if (img.ok) {
        // double + round-half-even to match the Python path's
        // round(H0 * scale) exactly (utils/image.py:preprocess_for_model)
        double scale = double(S) / std::max(img.h, img.w);
        int H = int(std::nearbyint(img.h * scale));
        int W = int(std::nearbyint(img.w * scale));
        H = std::min(H, S);
        W = std::min(W, S);
        std::vector<uint8_t> resized(size_t(H) * W * 3);
        resize_bilinear(img.rgb.data(), img.h, img.w, resized.data(), H, W);
        for (int y = 0; y < H; ++y) {
          for (int x = 0; x < W; ++x) {
            const uint8_t* p = &resized[(size_t(y) * W + x) * 3];
            float* q = canvas + (size_t(y) * S + x) * 3;
            // RGB -> BGR with per-channel mean subtraction
            q[0] = float(p[2]) - mean_bgr[0];
            q[1] = float(p[1]) - mean_bgr[1];
            q[2] = float(p[0]) - mean_bgr[2];
          }
        }
        heights[i] = float(H);
        widths[i] = float(W);
        if (orig_heights) orig_heights[i] = float(img.h);
        if (orig_widths) orig_widths[i] = float(img.w);
        ok_count.fetch_add(1);
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
