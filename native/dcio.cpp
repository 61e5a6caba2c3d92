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

// Bilinear resize RGB uint8 (align_corners=false, PIL-like box centers).
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw) {
  const float sy = float(sh) / dh;
  const float sx = float(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.f, std::min(fy, float(sh - 1)));
    int y0 = int(fy);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.f, std::min(fx, float(sw - 1)));
      int x0 = int(fx);
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(size_t(y0) * sw + x0) * 3 + c];
        float v01 = src[(size_t(y0) * sw + x1) * 3 + c];
        float v10 = src[(size_t(y1) * sw + x0) * 3 + c];
        float v11 = src[(size_t(y1) * sw + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(size_t(y) * dw + x) * 3 + c] = uint8_t(v + 0.5f);
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
// orig_heights/orig_widths outputs.
int dcio_abi_version() { return 2; }

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
        float scale = float(S) / std::max(img.h, img.w);
        int H = int(std::lround(img.h * scale));
        int W = int(std::lround(img.w * scale));
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
