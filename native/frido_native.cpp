// Native data-loading core for frido_tpu.
//
// The reference's input pipeline is PIL inside torch DataLoader workers
// (taming/data/annotated_objects_dataset.py + image_transforms.py). Feeding
// a TPU chip at training batch sizes from Python is CPU-bound on JPEG
// decode + resampling, so the pixel path lives here: libjpeg decode,
// PIL-compatible antialiased bilinear (triangle-filter) resampling, crop,
// horizontal flip, [-1, 1] float32 normalization, and a persistent thread
// pool that fills whole batches in parallel. Exposed as a C ABI for
// ctypes (no pybind11 in this image).
//
// Randomness (crop rects, flip coins) stays in Python — the same draws the
// reference makes — so annotation remapping logic is unchanged; this layer
// only does deterministic pixel work.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// JPEG decode (classic libjpeg API with longjmp error trap)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG byte buffer to tightly-packed RGB8. Returns 0 on success.
int decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  rgb->resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *width = w;
  *height = h;
  return 0;
}

// ---------------------------------------------------------------------------
// PIL-compatible separable triangle-filter ("bilinear with antialias")
// resampling. For each output coordinate the source window has radius
// support = filterscale (= max(in/out, 1)); weights are the triangle kernel
// normalized over the window — the algorithm Pillow uses for
// Image.resize(..., BILINEAR).
// ---------------------------------------------------------------------------

struct ResampleCoeffs {
  std::vector<int> bounds;      // [out] first source index
  std::vector<int> counts;      // [out] window length
  std::vector<float> weights;   // [out * kmax]
  int kmax = 0;
};

ResampleCoeffs triangle_coeffs(int in_size, int out_size, float offset = 0.f,
                               float span = -1.f) {
  // span < 0 -> whole axis; otherwise resample the window [offset,
  // offset+span) (used for fused crop+resize).
  if (span < 0) span = static_cast<float>(in_size);
  const float scale = span / out_size;
  const float filterscale = std::max(scale, 1.0f);
  const float support = filterscale;  // triangle filter radius 1.0
  ResampleCoeffs rc;
  rc.kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  rc.bounds.resize(out_size);
  rc.counts.resize(out_size);
  rc.weights.assign(static_cast<size_t>(out_size) * rc.kmax, 0.f);
  for (int i = 0; i < out_size; ++i) {
    const float center = offset + (i + 0.5f) * scale;
    int xmin = static_cast<int>(center - support + 0.5f);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5f);
    if (xmax > in_size) xmax = in_size;
    const int n = xmax - xmin;
    float* w = rc.weights.data() + static_cast<size_t>(i) * rc.kmax;
    float total = 0.f;
    for (int j = 0; j < n; ++j) {
      const float x = (xmin + j + 0.5f - center) / filterscale;
      const float t = 1.0f - std::fabs(x);
      w[j] = t > 0.f ? t : 0.f;
      total += w[j];
    }
    if (total > 0.f)
      for (int j = 0; j < n; ++j) w[j] /= total;
    rc.bounds[i] = xmin;
    rc.counts[i] = n;
  }
  return rc;
}

// Resample an RGB8 image region to float32 RGB [dw, dh]. The region is
// [cx, cx+cw) x [cy, cy+ch) in source pixels (fused crop+resize).
void resample_region(const uint8_t* src, int sw, int sh, int cx, int cy,
                     int cw, int ch, float* dst, int dw, int dh) {
  const ResampleCoeffs rx = triangle_coeffs(sw, dw, (float)cx, (float)cw);
  const ResampleCoeffs ry = triangle_coeffs(sh, dh, (float)cy, (float)ch);
  // horizontal pass over the needed source rows
  const int ry_min = ry.bounds[0];
  const int ry_max = ry.bounds[dh - 1] + ry.counts[dh - 1];
  const int nrows = ry_max - ry_min;
  std::vector<float> tmp(static_cast<size_t>(nrows) * dw * 3);
  for (int y = 0; y < nrows; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(ry_min + y) * sw * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = rx.weights.data() + static_cast<size_t>(x) * rx.kmax;
      const int b = rx.bounds[x];
      const int n = rx.counts[x];
      float r = 0.f, g = 0.f, bl = 0.f;
      for (int j = 0; j < n; ++j) {
        const uint8_t* p = srow + static_cast<size_t>(b + j) * 3;
        r += w[j] * p[0];
        g += w[j] * p[1];
        bl += w[j] * p[2];
      }
      trow[x * 3 + 0] = r;
      trow[x * 3 + 1] = g;
      trow[x * 3 + 2] = bl;
    }
  }
  // vertical pass
  for (int y = 0; y < dh; ++y) {
    const float* w = ry.weights.data() + static_cast<size_t>(y) * ry.kmax;
    const int b = ry.bounds[y] - ry_min;
    const int n = ry.counts[y];
    float* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw * 3; ++x) {
      float acc = 0.f;
      for (int j = 0; j < n; ++j)
        acc += w[j] * tmp[static_cast<size_t>(b + j) * dw * 3 + x];
      drow[x] = acc;
    }
  }
}

// float RGB image -> float RGB via the same filter (for two-stage resizes)
void resample_float(const float* src, int sw, int sh, float* dst, int dw,
                    int dh) {
  const ResampleCoeffs rx = triangle_coeffs(sw, dw);
  const ResampleCoeffs ry = triangle_coeffs(sh, dh);
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const float* srow = src + static_cast<size_t>(y) * sw * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = rx.weights.data() + static_cast<size_t>(x) * rx.kmax;
      const int b = rx.bounds[x];
      const int n = rx.counts[x];
      float r = 0.f, g = 0.f, bl = 0.f;
      for (int j = 0; j < n; ++j) {
        const float* p = srow + static_cast<size_t>(b + j) * 3;
        r += w[j] * p[0];
        g += w[j] * p[1];
        bl += w[j] * p[2];
      }
      trow[x * 3 + 0] = r;
      trow[x * 3 + 1] = g;
      trow[x * 3 + 2] = bl;
    }
  }
  for (int y = 0; y < dh; ++y) {
    const float* w = ry.weights.data() + static_cast<size_t>(y) * ry.kmax;
    const int b = ry.bounds[y];
    const int n = ry.counts[y];
    float* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw * 3; ++x) {
      float acc = 0.f;
      for (int j = 0; j < n; ++j)
        acc += w[j] * tmp[static_cast<size_t>(b + j) * dw * 3 + x];
      drow[x] = acc;
    }
  }
}

void hflip_inplace(float* img, int w, int h) {
  for (int y = 0; y < h; ++y) {
    float* row = img + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w / 2; ++x) {
      for (int c = 0; c < 3; ++c)
        std::swap(row[x * 3 + c], row[(w - 1 - x) * 3 + c]);
    }
  }
}

void normalize_inplace(float* img, size_t n) {
  for (size_t i = 0; i < n; ++i) img[i] = img[i] / 127.5f - 1.0f;
}

// One sample spec. Stages mirror frido_tpu.data.transforms.ImagePipeline:
//   1. optional pre-resize to (rw, rh)      (shorter-side resize)
//   2. crop rect (cx, cy, cw, ch) in the pre-resized (or original) space;
//      cw <= 0 means no crop (whole image)
//   3. resize to (out, out) unless the crop is already that size
//   4. optional horizontal flip
//   5. /127.5 - 1 normalization
struct SampleSpec {
  const char* path;
  int rw, rh;
  int cx, cy, cw, ch;
  int flip;
};

int load_one(const SampleSpec& s, int out_size, float* dst) {
  // read file
  FILE* f = std::fopen(s.path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  const long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(fsize);
  if (std::fread(buf.data(), 1, fsize, f) != static_cast<size_t>(fsize)) {
    std::fclose(f);
    return 1;
  }
  std::fclose(f);

  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (decode_jpeg(buf.data(), buf.size(), &rgb, &w, &h)) return 2;

  const int out = out_size;
  if (s.rw > 0) {
    // pre-resize then crop: resize region = whole image to (rw, rh), then
    // the crop rect lives in resized space; then final resize if needed.
    std::vector<float> resized(static_cast<size_t>(s.rw) * s.rh * 3);
    resample_region(rgb.data(), w, h, 0, 0, w, h, resized.data(), s.rw, s.rh);
    int cx = s.cx, cy = s.cy, cw = s.cw, ch = s.ch;
    if (cw <= 0) { cx = 0; cy = 0; cw = s.rw; ch = s.rh; }
    if (cw == out && ch == out) {
      for (int y = 0; y < out; ++y)
        std::memcpy(dst + static_cast<size_t>(y) * out * 3,
                    resized.data() + ((static_cast<size_t>(cy + y) * s.rw)
                                      + cx) * 3,
                    sizeof(float) * out * 3);
    } else {
      // crop then resize (float path)
      std::vector<float> crop(static_cast<size_t>(cw) * ch * 3);
      for (int y = 0; y < ch; ++y)
        std::memcpy(crop.data() + static_cast<size_t>(y) * cw * 3,
                    resized.data() + ((static_cast<size_t>(cy + y) * s.rw)
                                      + cx) * 3,
                    sizeof(float) * cw * 3);
      resample_float(crop.data(), cw, ch, dst, out, out);
    }
  } else {
    // crop in original space fused with the resize
    int cx = s.cx, cy = s.cy, cw = s.cw, ch = s.ch;
    if (cw <= 0) { cx = 0; cy = 0; cw = w; ch = h; }
    resample_region(rgb.data(), w, h, cx, cy, cw, ch, dst, out, out);
  }
  if (s.flip) hflip_inplace(dst, out, out);
  normalize_inplace(dst, static_cast<size_t>(out) * out * 3);
  return 0;
}

// ---------------------------------------------------------------------------
// persistent thread pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { worker(); });
  }
  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void worker() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

Pool* pool = nullptr;
int pool_size = 0;
std::mutex pool_mu;

Pool* get_pool(int threads) {
  std::lock_guard<std::mutex> lk(pool_mu);
  if (pool == nullptr || pool_size != threads) {
    delete pool;
    pool = new Pool(threads);
    pool_size = threads;
  }
  return pool;
}

}  // namespace

extern "C" {

// Decode + process one image. Returns 0 ok, 1 io error, 2 decode error.
int ft_load_one(const char* path, int rw, int rh, int cx, int cy, int cw,
                int ch, int flip, int out_size, float* dst) {
  SampleSpec s{path, rw, rh, cx, cy, cw, ch, flip};
  return load_one(s, out_size, dst);
}

// Fill a whole [n, out, out, 3] float32 batch in parallel.
// specs: flat int array [n, 7] of (rw, rh, cx, cy, cw, ch, flip).
// Returns the number of failed samples (their slots are zeroed).
int ft_load_batch(const char** paths, const int* specs, int n, int out_size,
                  float* dst, int threads) {
  Pool* p = get_pool(threads > 0 ? threads : 8);
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = static_cast<size_t>(out_size) * out_size * 3;
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      const int* sp = specs + i * 7;
      SampleSpec s{paths[i], sp[0], sp[1], sp[2], sp[3], sp[4], sp[5], sp[6]};
      if (load_one(s, out_size, dst + stride * i) != 0) {
        std::memset(dst + stride * i, 0, stride * sizeof(float));
        failures.fetch_add(1);
      }
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

// Header-only dimension read (no pixel decode).
int ft_jpeg_dims(const char* path, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  // headers live in the first few KB; read up to 64K to be safe
  std::vector<uint8_t> buf(65536);
  const size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf.data(), got);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
