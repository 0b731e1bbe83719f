// cara_tpu native data loader: threaded JPEG/PNG decode + antialiased
// bicubic resize + ImageNet normalization, exposed through a C ABI for
// ctypes.
//
// Replaces the reference's PIL/torchvision host pipeline
// (image_classification/vtab.py:36-50,79-82: PIL decode -> bicubic 224x224 ->
// ToTensor -> Normalize) with a C++ implementation: libjpeg/libpng decode on
// a thread pool, separable bicubic resampling with PIL-style scaled kernel
// support (antialiasing on downscale), fused [0,1]-scale + mean/std
// normalization, float32 NHWC output.
//
// Build: g++ -O3 -march=native -shared -fPIC dataloader.cc -ojpeg -lpng
// (see cara_tpu/data/native.py for the exact command / lazy build).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <setjmp.h>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Decoding
// ---------------------------------------------------------------------------

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // Drop alpha (PIL .convert('RGB') composites on black for plain strip).
  if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->w = int(w);
  out->h = int(h);
  out->rgb.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 i = 0; i < h; ++i)
    rows[i] = out->rgb.data() + size_t(i) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);
  } else if (got >= 2) {  // try jpeg as a fallback
    ok = decode_jpeg(f, out);
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// PIL-style separable bicubic resize (Keys a=-0.5, antialiased)
// ---------------------------------------------------------------------------

double bicubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Weights {
  int in_size;
  int ksize;                 // max taps per output pixel
  std::vector<int> bounds;   // out_size*2: (xmin, xcount)
  std::vector<double> coefs; // out_size*ksize
};

// Precompute PIL ImagingResampleHorizontal-style coefficients: kernel support
// scales with the downscale factor (antialias).
Weights precompute(int in_size, int out_size) {
  Weights w;
  w.in_size = in_size;
  double scale = double(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 2.0 * filterscale;  // bicubic support = 2
  w.ksize = int(std::ceil(support)) * 2 + 1;
  w.bounds.resize(size_t(out_size) * 2);
  w.coefs.assign(size_t(out_size) * w.ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &w.coefs[size_t(xx) * w.ksize];
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      double c = bicubic((x + xmin - center + 0.5) / filterscale);
      k[x] = c;
      ww += c;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax; ++x) k[x] /= ww;
    w.bounds[xx * 2] = xmin;
    w.bounds[xx * 2 + 1] = xmax;
  }
  return w;
}

inline uint8_t clip8(double v) {
  long r = lround(v);
  if (r < 0) return 0;
  if (r > 255) return 255;
  return uint8_t(r);
}

// Resize a (cw, ch) crop at (x0, y0) of h*w*3 uint8 -> out*out*3 uint8.
// Identical to PIL crop(box).resize(bicubic): the kernels are computed in
// crop-local coordinates, so clamping happens at the crop edges.  Matches
// PIL semantics: separable passes with the intermediate image
// rounded+clipped back to uint8 (PIL resamples 8bpc pass-by-pass in fixed
// point).
void resize_bicubic_box(const Image& img, int x0, int y0, int cw, int ch,
                        int out_size, std::vector<uint8_t>* out) {
  Weights wx = precompute(cw, out_size);
  Weights wy = precompute(ch, out_size);
  // Horizontal pass: (ch, cw, 3) -> (ch, out, 3), clipped to uint8 like PIL.
  std::vector<uint8_t> tmp(size_t(ch) * out_size * 3);
  for (int y = 0; y < ch; ++y) {
    const uint8_t* row =
        img.rgb.data() + size_t(y0 + y) * img.w * 3 + size_t(x0) * 3;
    uint8_t* trow = tmp.data() + size_t(y) * out_size * 3;
    for (int xx = 0; xx < out_size; ++xx) {
      int xmin = wx.bounds[xx * 2], xcount = wx.bounds[xx * 2 + 1];
      const double* k = &wx.coefs[size_t(xx) * wx.ksize];
      double acc[3] = {0, 0, 0};
      for (int x = 0; x < xcount; ++x) {
        const uint8_t* px = row + size_t(xmin + x) * 3;
        acc[0] += px[0] * k[x];
        acc[1] += px[1] * k[x];
        acc[2] += px[2] * k[x];
      }
      trow[xx * 3 + 0] = clip8(acc[0]);
      trow[xx * 3 + 1] = clip8(acc[1]);
      trow[xx * 3 + 2] = clip8(acc[2]);
    }
  }
  // Vertical pass: (ch, out, 3) -> (out, out, 3).
  out->assign(size_t(out_size) * out_size * 3, 0);
  std::vector<double> acc(size_t(out_size) * 3);
  for (int yy = 0; yy < out_size; ++yy) {
    int ymin = wy.bounds[yy * 2], ycount = wy.bounds[yy * 2 + 1];
    const double* k = &wy.coefs[size_t(yy) * wy.ksize];
    std::fill(acc.begin(), acc.end(), 0.0);
    for (int y = 0; y < ycount; ++y) {
      const uint8_t* trow = tmp.data() + size_t(ymin + y) * out_size * 3;
      double c = k[y];
      for (int x = 0; x < out_size * 3; ++x) acc[x] += trow[x] * c;
    }
    uint8_t* orow = out->data() + size_t(yy) * out_size * 3;
    for (int x = 0; x < out_size * 3; ++x) orow[x] = clip8(acc[x]);
  }
}

void resize_bicubic(const Image& img, int out_size, std::vector<uint8_t>* out) {
  resize_bicubic_box(img, 0, 0, img.w, img.h, out_size, out);
}

// ---------------------------------------------------------------------------
// Random resized crop (FGVC train augmentation)
// ---------------------------------------------------------------------------

// Deterministic counter-free generator (splitmix64): chosen over std::mt19937
// so the Python test suite can replicate the exact draw sequence and verify
// the sampled crop against a PIL crop+resize reference.
struct SplitMix64 {
  uint64_t s;
  explicit SplitMix64(uint64_t seed) : s(seed) {}
  uint64_t next_u64() {
    s += 0x9E3779B97F4A7C15ULL;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
  double next_double() {  // uniform [0, 1)
    return double(next_u64() >> 11) * 0x1.0p-53;
  }
};

// torchvision RandomResizedCrop.get_params semantics: 10 attempts at
// scale U(0.08, 1.0) of the area and log-uniform aspect in [3/4, 4/3];
// after 10 failed attempts, torchvision's ratio-clamped CENTER-crop
// fallback (matching the PIL path in data/fgvc.py).
// A final draw decides the horizontal flip (applied after the resize).
void sample_rrc(SplitMix64* rng, int w, int h, int* x0, int* y0, int* cw,
                int* ch, bool* flip) {
  double area = double(w) * h;
  const double log_lo = std::log(3.0 / 4.0), log_hi = std::log(4.0 / 3.0);
  bool found = false;
  for (int i = 0; i < 10; ++i) {
    double target = (0.08 + rng->next_double() * (1.0 - 0.08)) * area;
    double ar = std::exp(log_lo + rng->next_double() * (log_hi - log_lo));
    int tw = int(lround(std::sqrt(target * ar)));
    int th = int(lround(std::sqrt(target / ar)));
    if (tw > 0 && tw <= w && th > 0 && th <= h) {
      *x0 = int(rng->next_double() * (w - tw + 1));
      *y0 = int(rng->next_double() * (h - th + 1));
      *cw = tw;
      *ch = th;
      found = true;
      break;
    }
  }
  if (!found) {
    double in_ratio = double(w) / double(h);
    if (in_ratio < 3.0 / 4.0) {
      *cw = w;
      *ch = int(lround(w / (3.0 / 4.0)));
    } else if (in_ratio > 4.0 / 3.0) {
      *ch = h;
      *cw = int(lround(h * (4.0 / 3.0)));
    } else {
      *cw = w;
      *ch = h;
    }
    *x0 = (w - *cw) / 2;
    *y0 = (h - *ch) / 2;
  }
  *flip = rng->next_double() < 0.5;
}

void hflip_u8(std::vector<uint8_t>* img, int size) {
  for (int y = 0; y < size; ++y) {
    uint8_t* row = img->data() + size_t(y) * size * 3;
    for (int x = 0; x < size / 2; ++x) {
      for (int c = 0; c < 3; ++c)
        std::swap(row[x * 3 + c], row[(size - 1 - x) * 3 + c]);
    }
  }
}

// ---------------------------------------------------------------------------
// Thread pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      threads_.emplace_back([this] { worker(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> g(mu_);
      done_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> g(mu_);
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
        cv_.wait(lk, [this] { return done_ || !q_.empty(); });
        if (done_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> threads_;
  bool done_ = false;
};

struct Loader {
  Pool pool;
  int image_size;
  float mean[3], std[3];
  Loader(int threads, int size, const float* m, const float* s)
      : pool(threads), image_size(size) {
    for (int i = 0; i < 3; ++i) {
      mean[i] = m[i];
      std[i] = s[i];
    }
  }
};

bool decode_resize(Loader* L, const char* path, std::vector<uint8_t>* out) {
  Image img;
  if (!decode_file(path, &img) || img.w < 1 || img.h < 1) return false;
  resize_bicubic(img, L->image_size, out);
  return true;
}

void normalize_to(const Loader* L, const std::vector<uint8_t>& resized,
                  float* dst);

void process_one(Loader* L, const char* path, float* dst, int* status) {
  std::vector<uint8_t> resized;
  if (!decode_resize(L, path, &resized)) {
    *status = 1;
    std::memset(dst, 0, sizeof(float) * size_t(L->image_size) * L->image_size * 3);
    return;
  }
  normalize_to(L, resized, dst);
  *status = 0;
}

void normalize_to(const Loader* L, const std::vector<uint8_t>& resized,
                  float* dst) {
  // Fused ToTensor + Normalize via a per-channel 256-entry LUT.
  float lut[3][256];
  for (int c = 0; c < 3; ++c)
    for (int v = 0; v < 256; ++v)
      lut[c][v] = (v / 255.0f - L->mean[c]) / L->std[c];
  size_t n = size_t(L->image_size) * L->image_size;
  for (size_t i = 0; i < n; ++i) {
    dst[i * 3 + 0] = lut[0][resized[i * 3 + 0]];
    dst[i * 3 + 1] = lut[1][resized[i * 3 + 1]];
    dst[i * 3 + 2] = lut[2][resized[i * 3 + 2]];
  }
}

void process_one_rrc(Loader* L, const char* path, uint64_t seed, float* dst,
                     int* status) {
  Image img;
  if (!decode_file(path, &img) || img.w < 1 || img.h < 1) {
    *status = 1;
    std::memset(dst, 0,
                sizeof(float) * size_t(L->image_size) * L->image_size * 3);
    return;
  }
  SplitMix64 rng(seed);
  int x0, y0, cw, ch;
  bool flip;
  sample_rrc(&rng, img.w, img.h, &x0, &y0, &cw, &ch, &flip);
  std::vector<uint8_t> resized;
  resize_bicubic_box(img, x0, y0, cw, ch, L->image_size, &resized);
  if (flip) hflip_u8(&resized, L->image_size);
  normalize_to(L, resized, dst);
  *status = 0;
}

void process_one_u8(Loader* L, const char* path, uint8_t* dst, int* status) {
  std::vector<uint8_t> resized;
  size_t bytes = size_t(L->image_size) * L->image_size * 3;
  if (!decode_resize(L, path, &resized)) {
    *status = 1;
    std::memset(dst, 0, bytes);
    return;
  }
  std::memcpy(dst, resized.data(), bytes);
  *status = 0;
}

}  // namespace

extern "C" {

void* cara_loader_create(int num_threads, int image_size, const float* mean,
                         const float* stdv) {
  return new Loader(num_threads, image_size, mean, stdv);
}

void cara_loader_destroy(void* p) { delete static_cast<Loader*>(p); }

// paths: n C strings; out: n*S*S*3 floats (NHWC); statuses: n ints
// (0 ok, 1 decode failure -> zero image). Returns count of failures.
int cara_loader_decode_batch(void* p, const char** paths, int n, float* out,
                             int* statuses) {
  auto* L = static_cast<Loader*>(p);
  std::atomic<int> remaining(n);
  std::mutex mu;
  std::condition_variable cv;
  size_t stride = size_t(L->image_size) * L->image_size * 3;
  for (int i = 0; i < n; ++i) {
    L->pool.submit([L, path = std::string(paths[i]), dst = out + i * stride,
                    st = statuses + i, &remaining, &mu, &cv] {
      process_one(L, path.c_str(), dst, st);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> g(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return remaining.load() == 0; });
  int fails = 0;
  for (int i = 0; i < n; ++i) fails += statuses[i];
  return fails;
}

// Random-resized-crop + horizontal-flip train augmentation (FGVC suite):
// per-image crop sampled in C++ from splitmix64(seeds[i]) with torchvision
// RandomResizedCrop parameters (scale 0.08-1.0, aspect 3/4-4/3, 10
// attempts, full-image fallback), PIL-parity bicubic resize of the crop,
// flip after resize, fused normalization.  seeds: n uint64s.
int cara_loader_decode_batch_rrc(void* p, const char** paths, int n,
                                 const uint64_t* seeds, float* out,
                                 int* statuses) {
  auto* L = static_cast<Loader*>(p);
  std::atomic<int> remaining(n);
  std::mutex mu;
  std::condition_variable cv;
  size_t stride = size_t(L->image_size) * L->image_size * 3;
  for (int i = 0; i < n; ++i) {
    L->pool.submit([L, path = std::string(paths[i]), seed = seeds[i],
                    dst = out + i * stride, st = statuses + i, &remaining,
                    &mu, &cv] {
      process_one_rrc(L, path.c_str(), seed, dst, st);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> g(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return remaining.load() == 0; });
  int fails = 0;
  for (int i = 0; i < n; ++i) fails += statuses[i];
  return fails;
}

// uint8 variant: resized RGB bytes, no normalization (for host-side caches
// with on-device normalization).
int cara_loader_decode_batch_u8(void* p, const char** paths, int n,
                                uint8_t* out, int* statuses) {
  auto* L = static_cast<Loader*>(p);
  std::atomic<int> remaining(n);
  std::mutex mu;
  std::condition_variable cv;
  size_t stride = size_t(L->image_size) * L->image_size * 3;
  for (int i = 0; i < n; ++i) {
    L->pool.submit([L, path = std::string(paths[i]), dst = out + i * stride,
                    st = statuses + i, &remaining, &mu, &cv] {
      process_one_u8(L, path.c_str(), dst, st);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> g(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return remaining.load() == 0; });
  int fails = 0;
  for (int i = 0; i < n; ++i) fails += statuses[i];
  return fails;
}

}  // extern "C"
