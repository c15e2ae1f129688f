// Native slice-cache builder for the unet_tpu data pipeline.
//
// Decodes paired grayscale PNG slices (CT image + binary mask) with
// libpng, resizes to the training resolution (bilinear for images,
// nearest for masks — the same conventions as the Python path), and
// writes one contiguous uint8 blob that Python memory-maps for
// zero-decode epoch streaming:
//
//   [ 'U''S''C''1' | int32 n | int32 img_size |
//     n * img_size^2 bytes images | n * img_size^2 bytes masks ]
//
// The reference project decodes PNGs per sample per epoch inside torch
// DataLoader workers (reference unet/data/dataset.py:146-150); on a TPU
// host the decode cost starves the chip, so we pay it once at cache
// build time, multithreaded. Exposed through a plain C ABI for ctypes
// (no pybind11 dependency).

#include <png.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Gray8 {
  std::vector<uint8_t> data;
  int w = 0, h = 0;
};

// Decompression-bomb guard, matching the PIL fallback path: Pillow's
// MAX_IMAGE_PIXELS is 89,478,485 and it raises DecompressionBombError
// at 2x that. A ~120-byte PNG can declare a 10^6 x 10^6 IHDR; without
// this cap the pixel-plane allocation below throws std::bad_alloc,
// which must never escape (this code runs on the serving request path
// behind ctypes — an uncaught exception aborts the whole process).
constexpr uint64_t kMaxPixels = 2ull * 89478485ull;

// Scratch row buffers owned by the frame that holds the libpng setjmp.
// png_error longjmps PAST read_gray8_body's frame, skipping its
// destructors — any heap the body needs must live up here so corrupt
// input can't leak it.
struct RowScratch {
  std::vector<png_bytep> rows;
  std::vector<uint8_t> row;
};

// libpng's default error handler prints to stderr before longjmp'ing;
// on the serving path that lets any client spam the server log with
// one corrupt upload per line. Capture the message instead (the
// callers' *err strings surface it) and stay silent on warnings.
void quiet_png_error(png_structp png, png_const_charp msg);
void quiet_png_warning(png_structp png, png_const_charp msg) {
  (void)png;
  (void)msg;
}

// Shared decode body, called after png_read_info under the caller's
// setjmp context. Registers only the transforms this image needs —
// unconditional registration routes every row through libpng's
// transform pass. `needs_pil` (optional) reports inputs whose 8-bit
// reduction differs from Pillow's: color->gray (libpng's fixed-point
// luma rounding can be 1 LSB off Pillow's) and 16-bit gray (libpng
// chops the high byte, Pillow's convert('L') from mode I;16 CLIPS at
// 255). Callers that promise PIL bit-exactness (decode_resize_batch /
// decode_resize_mem) must fall back to PIL for these.
void read_gray8_body(png_structp png, png_infop info, Gray8* out,
                     bool* needs_pil, RowScratch* scratch) {
  png_read_info(png, info);
  {
    uint64_t w = png_get_image_width(png, info);
    uint64_t h = png_get_image_height(png, info);
    if (w == 0 || h == 0 || w * h > kMaxPixels) {
      // longjmps to the caller's setjmp before any pixel allocation
      png_error(png, "image exceeds pixel limit (decompression bomb?)");
    }
  }
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  bool is_color = color == PNG_COLOR_TYPE_RGB ||
                  color == PNG_COLOR_TYPE_RGB_ALPHA ||
                  color == PNG_COLOR_TYPE_PALETTE;
  if (needs_pil) *needs_pil = is_color || depth == 16;
  if (depth == 16) png_set_strip_16(png);
  if (depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (is_color) {
    // ITU-R 601 luma, the same weights PIL uses for convert('L')
    png_set_rgb_to_gray(png, PNG_ERROR_ACTION_NONE, 0.299, 0.587);
  }
  if (png_get_interlace_type(png, info) != PNG_INTERLACE_NONE) {
    png_set_interlace_handling(png);
  }
  png_read_update_info(png, info);

  out->w = static_cast<int>(png_get_image_width(png, info));
  out->h = static_cast<int>(png_get_image_height(png, info));
  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.assign(static_cast<size_t>(out->h) * out->w, 0);
  if (rowbytes == static_cast<size_t>(out->w)) {
    // gray8 fast path: decode rows straight into the output plane
    scratch->rows.assign(out->h, nullptr);
    for (int y = 0; y < out->h; ++y) {
      scratch->rows[y] = out->data.data() + static_cast<size_t>(y) * out->w;
    }
    png_read_image(png, scratch->rows.data());
  } else {
    scratch->row.assign(rowbytes, 0);
    for (int y = 0; y < out->h; ++y) {
      png_read_row(png, scratch->row.data(), nullptr);
      std::memcpy(out->data.data() + static_cast<size_t>(y) * out->w,
                  scratch->row.data(), out->w);
    }
  }
}

// Decode a PNG file to 8-bit grayscale (see read_gray8_body).
bool decode_png_gray(const char* path, Gray8* out, std::string* err,
                     bool* needs_pil = nullptr) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    *err = std::string("cannot open ") + path;
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                             quiet_png_error, quiet_png_warning);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    *err = "libpng init failed";
    return false;
  }
  RowScratch scratch;  // owned here: png_error longjmps past the body
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    *err = std::string("png decode error in ") + path;
    return false;
  }
  png_init_io(png, fp);
  try {
    read_gray8_body(png, info, out, needs_pil, &scratch);
  } catch (...) {
    // bad_alloc etc. — free the raw libpng structs before unwinding
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    throw;
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

// In-memory PNG source for decode_png_gray_mem (the serving path
// decodes request bodies, never files).
struct MemSource {
  const uint8_t* p;
  size_t left;
};

void mem_read_fn(png_structp png, png_bytep dst, png_size_t n) {
  MemSource* s = static_cast<MemSource*>(png_get_io_ptr(png));
  if (n > s->left) png_error(png, "unexpected end of PNG buffer");
  std::memcpy(dst, s->p, n);
  s->p += n;
  s->left -= n;
}

// Decode an in-memory PNG to 8-bit grayscale (see read_gray8_body).
bool decode_png_gray_mem(const uint8_t* data, size_t len, Gray8* out,
                         std::string* err, bool* needs_pil = nullptr) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                             quiet_png_error, quiet_png_warning);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    *err = "libpng init failed";
    return false;
  }
  RowScratch scratch;  // owned here: png_error longjmps past the body
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    *err = "png decode error in memory buffer";
    return false;
  }
  MemSource src{data, len};
  png_set_read_fn(png, &src, mem_read_fn);
  try {
    read_gray8_body(png, info, out, needs_pil, &scratch);
  } catch (...) {
    // bad_alloc etc. — free the raw libpng structs before unwinding
    png_destroy_read_struct(&png, &info, nullptr);
    throw;
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// PIL-EXACT bilinear resize: Pillow's two-pass triangle-filter
// resampling (Resample.c) reproduced bit-for-bit for 8-bit grayscale —
// adaptive filter support (support widens to `scale` taps on
// downscale), per-window double-precision coefficient normalization,
// 22-bit fixed-point accumulation with half-up rounding, and clip8
// after EACH pass (horizontal first into a temp image, then vertical).
// Bit-exactness lets CachedSliceDataset serve identical pixels whether
// the cache was built natively or by the PIL fallback, at any size
// (asserted in tests/test_data.py).
constexpr int kPrecisionBits = 32 - 8 - 2;

inline uint8_t clip8(int in) {
  if (in >= (1 << (kPrecisionBits + 8))) return 255;
  if (in <= 0) return 0;
  return static_cast<uint8_t>(in >> kPrecisionBits);
}

inline double triangle_filter(double x) {
  if (x < 0.0) x = -x;
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Pillow precompute_coeffs + normalize_coeffs_8bpc for one axis.
void pil_coeffs(int in_size, int out_size, std::vector<int>* bounds,
                std::vector<int>* kk, int* ksize_out) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // bilinear support = 1.0
  const int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  *ksize_out = ksize;
  bounds->assign(static_cast<size_t>(out_size) * 2, 0);
  kk->assign(static_cast<size_t>(out_size) * ksize, 0);
  std::vector<double> k(ksize);
  const double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      const double w = triangle_filter((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    for (int x = 0; x < xmax; ++x) {
      if (ww != 0.0) k[x] /= ww;
    }
    int* ki = kk->data() + static_cast<size_t>(xx) * ksize;
    for (int x = 0; x < xmax; ++x) {
      // Pillow normalize_coeffs_8bpc: round-half-away-from-zero into
      // fixed point
      ki[x] = k[x] < 0
                  ? static_cast<int>(-0.5 + k[x] * (1 << kPrecisionBits))
                  : static_cast<int>(0.5 + k[x] * (1 << kPrecisionBits));
    }
    (*bounds)[static_cast<size_t>(xx) * 2] = xmin;
    (*bounds)[static_cast<size_t>(xx) * 2 + 1] = xmax;
  }
}

void resize_bilinear(const Gray8& src, uint8_t* dst, int size) {
  std::vector<int> xb, xk, yb, yk;
  int xks = 0, yks = 0;
  pil_coeffs(src.w, size, &xb, &xk, &xks);
  pil_coeffs(src.h, size, &yb, &yk, &yks);

  // horizontal pass: (src.h, src.w) -> (src.h, size)
  std::vector<uint8_t> tmp(static_cast<size_t>(src.h) * size);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* row = src.data.data() + static_cast<size_t>(y) * src.w;
    for (int xx = 0; xx < size; ++xx) {
      const int xmin = xb[static_cast<size_t>(xx) * 2];
      const int xmax = xb[static_cast<size_t>(xx) * 2 + 1];
      const int* k = xk.data() + static_cast<size_t>(xx) * xks;
      int ss0 = 1 << (kPrecisionBits - 1);
      for (int x = 0; x < xmax; ++x) ss0 += row[x + xmin] * k[x];
      tmp[static_cast<size_t>(y) * size + xx] = clip8(ss0);
    }
  }
  // vertical pass: (src.h, size) -> (size, size)
  for (int yy = 0; yy < size; ++yy) {
    const int ymin = yb[static_cast<size_t>(yy) * 2];
    const int ymax = yb[static_cast<size_t>(yy) * 2 + 1];
    const int* k = yk.data() + static_cast<size_t>(yy) * yks;
    for (int x = 0; x < size; ++x) {
      int ss0 = 1 << (kPrecisionBits - 1);
      for (int y = 0; y < ymax; ++y)
        ss0 += tmp[static_cast<size_t>(y + ymin) * size + x] * k[y];
      dst[static_cast<size_t>(yy) * size + x] = clip8(ss0);
    }
  }
}

// PIL-EXACT nearest resize. Pillow routes resize(NEAREST) through
// Geometry.c ImagingScaleAffine, which walks the source coordinate by
// REPEATED double addition (`xx = a0*0.5; ...; xx += a0`) and
// truncates — the accumulated IEEE rounding drift flips the pick at
// exact integer boundaries in either direction (e.g. 512->200 picks
// source 31 at output 12 but 96 at output 37, both ideal-exact
// boundaries). Reproducing the same accumulation makes the mask plane
// land on identical pixels as the PIL fallback (bitwise cache parity,
// verified against Pillow across up/downscales in tests/test_data.py).
void resize_nearest(const Gray8& src, uint8_t* dst, int size) {
  const double a0 = static_cast<double>(src.w) / size;
  const double a4 = static_cast<double>(src.h) / size;
  std::vector<int> xin(size);
  double xx = a0 * 0.5;
  for (int x = 0; x < size; ++x) {
    int v = static_cast<int>(xx);
    xin[x] = v > src.w - 1 ? src.w - 1 : v;
    xx += a0;
  }
  double yy = a4 * 0.5;
  for (int y = 0; y < size; ++y) {
    int syi = static_cast<int>(yy);
    if (syi > src.h - 1) syi = src.h - 1;
    yy += a4;
    const uint8_t* row = src.data.data() + static_cast<size_t>(syi) * src.w;
    for (int x = 0; x < size; ++x) dst[y * size + x] = row[xin[x]];
  }
}

char g_error[1024];
// set_error runs concurrently from decode worker threads
// (decode_resize_batch / build_slice_cache); without the lock,
// simultaneous failures interleave snprintf's into the shared buffer
// and garble slice_cache_last_error() output.
std::mutex g_error_mu;

void set_error_parts(const char* a, const char* b) {
  std::lock_guard<std::mutex> lock(g_error_mu);
  std::snprintf(g_error, sizeof(g_error), "%s%s", a, b ? b : "");
}

void set_error(const std::string& e) { set_error_parts(e.c_str(), ""); }

void quiet_png_error(png_structp png, png_const_charp msg) {
  // Allocation-free on purpose: this is a libpng error callback, and a
  // std::string built here could throw bad_alloc under the same memory
  // pressure that triggered the error — an exception unwinding through
  // libpng's C frames before png_longjmp is undefined behavior.
  set_error_parts("libpng: ", msg ? msg : "unknown error");
  png_longjmp(png, 1);  // must not return
}

// Convert any escaping C++ exception (std::bad_alloc from a
// huge-but-under-cap input, OOM in the resize scratch, ...) to the
// C-ABI error contract. An exception crossing a std::thread start
// function or the extern-C/ctypes boundary calls std::terminate and
// aborts the embedding Python process — on the serving path that means
// one bad request kills the server.
template <typename F>
bool run_guarded(const char* where, F&& f) {
  try {
    f();
    return true;
  } catch (const std::exception& e) {
    set_error(std::string(where) + ": " + e.what());
    return false;
  } catch (...) {
    set_error(std::string(where) + ": unknown C++ exception");
    return false;
  }
}

// Spawn nt copies of worker and join them all, exception-safely: if a
// std::thread construction throws partway through (resource limit),
// the already-started threads are joined BEFORE the exception
// propagates — unwinding a vector of joinable std::threads calls
// std::terminate, and the callers' function-try-blocks only run after
// locals are destroyed, so they cannot cover that path themselves.
// Workers are noexcept and exit on their own (they drain a shared
// atomic counter past n), so the rescue join cannot deadlock.
template <typename F>
void run_workers(int nt, F&& worker) {
  std::vector<std::thread> threads;
  threads.reserve(nt);
  try {
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  } catch (...) {
    for (auto& t : threads) t.join();
    throw;  // reported by the caller's function-level handler
  }
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

const char* slice_cache_last_error() { return g_error; }

// Build the cache blob. image_paths/label_paths: n C strings.
// Returns 0 on success.
int build_slice_cache(const char** image_paths, const char** label_paths,
                      int n, int img_size, const char* out_path,
                      int num_threads) try {
  const size_t plane = static_cast<size_t>(img_size) * img_size;
  std::vector<uint8_t> images(static_cast<size_t>(n) * plane);
  std::vector<uint8_t> masks(static_cast<size_t>(n) * plane);
  std::atomic<int> next{0};
  std::atomic<bool> failed{false};

  auto worker_inner = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      Gray8 img, msk;
      std::string err;
      if (!decode_png_gray(image_paths[i], &img, &err) ||
          !decode_png_gray(label_paths[i], &msk, &err)) {
        set_error(err);
        failed.store(true);
        return;
      }
      uint8_t* ip = images.data() + static_cast<size_t>(i) * plane;
      uint8_t* mp = masks.data() + static_cast<size_t>(i) * plane;
      if (img.w == img_size && img.h == img_size) {
        std::memcpy(ip, img.data.data(), plane);
      } else {
        resize_bilinear(img, ip, img_size);
      }
      if (msk.w == img_size && msk.h == img_size) {
        std::memcpy(mp, msk.data.data(), plane);
      } else {
        resize_nearest(msk, mp, img_size);
      }
      // binarize mask (>127 like ref dataset.py:150)
      for (size_t k = 0; k < plane; ++k) mp[k] = mp[k] > 127 ? 1 : 0;
    }
  };
  auto worker = [&]() noexcept {
    if (!run_guarded("native cache worker", worker_inner)) {
      failed.store(true);
    }
  };

  int nt = num_threads > 0 ? num_threads
                           : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  run_workers(nt, worker);
  if (failed.load()) return 1;

  FILE* fp = std::fopen(out_path, "wb");
  if (!fp) {
    set_error(std::string("cannot write ") + out_path);
    return 2;
  }
  const char magic[4] = {'U', 'S', 'C', '1'};
  int32_t n32 = n, s32 = img_size;
  bool ok = std::fwrite(magic, 1, 4, fp) == 4 &&
            std::fwrite(&n32, 4, 1, fp) == 1 &&
            std::fwrite(&s32, 4, 1, fp) == 1 &&
            std::fwrite(images.data(), 1, images.size(), fp) ==
                images.size() &&
            std::fwrite(masks.data(), 1, masks.size(), fp) == masks.size();
  std::fclose(fp);
  if (!ok) {
    set_error("short write building cache");
    return 3;
  }
  return 0;
} catch (const std::exception& e) {
  set_error(std::string("build_slice_cache: ") + e.what());
  return 4;
} catch (...) {
  set_error("build_slice_cache: unknown C++ exception");
  return 4;
}

// Inference decode stage (unet_tpu/cli/predict.py): decode n PNGs to
// 8-bit grayscale and PIL-exact bilinear-resize each to
// img_size x img_size (identity memcpy when the size already matches,
// mirroring preprocess_image). out: caller buffer of n*img_size^2
// bytes. meta: 2n int32s — on success meta[2i]=orig_w,
// meta[2i+1]=orig_h; per-image failures do NOT fail the batch:
// meta[2i] = -1 (decode error; caller skips or retries via PIL for the
// error message) or -2 (color or 16-bit input; caller falls back to PIL
// whose convert('L') reduction we don't reproduce bit-exactly — luma
// rounding for color, clip-at-255 vs high-byte chop for 16-bit).
// Multithreaded like build_slice_cache. Returns the number of images
// decoded natively.
int decode_resize_batch(const char** image_paths, int n, int img_size,
                        uint8_t* out, int32_t* meta, int num_threads) try {
  const size_t plane = static_cast<size_t>(img_size) * img_size;
  std::atomic<int> next{0};
  std::atomic<int> ok_count{0};
  // pre-mark every slot failed: a per-item exception below leaves the
  // slot in the documented "decode error, retry via PIL" state
  for (int i = 0; i < n; ++i) {
    meta[2 * i] = -1;
    meta[2 * i + 1] = 0;
  }

  auto decode_one = [&](int i) {
    Gray8 img;
    std::string err;
    bool needs_pil = false;
    if (!decode_png_gray(image_paths[i], &img, &err, &needs_pil)) {
      return;  // slot stays -1
    }
    if (needs_pil) {
      meta[2 * i] = -2;
      return;
    }
    uint8_t* dst = out + static_cast<size_t>(i) * plane;
    if (img.w == img_size && img.h == img_size) {
      std::memcpy(dst, img.data.data(), plane);
    } else {
      resize_bilinear(img, dst, img_size);
    }
    meta[2 * i] = img.w;
    meta[2 * i + 1] = img.h;
    ok_count.fetch_add(1);
  };
  auto worker = [&]() noexcept {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      run_guarded("native decode worker", [&] { decode_one(i); });
    }
  };

  int nt = num_threads > 0 ? num_threads
                           : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > n) nt = n;
  run_workers(nt, worker);
  return ok_count.load();
} catch (const std::exception& e) {
  set_error(std::string("decode_resize_batch: ") + e.what());
  return 0;
} catch (...) {
  set_error("decode_resize_batch: unknown C++ exception");
  return 0;
}

// Serving decode stage (unet_tpu/cli/serve.py): decode ONE in-memory
// PNG (an HTTP request body) to 8-bit grayscale and PIL-exact
// bilinear-resize to img_size x img_size. Same contract as one row of
// decode_resize_batch: out is a caller buffer of img_size^2 bytes; on
// success meta[0]=orig_w, meta[1]=orig_h and 1 is returned; meta[0] is
// -1 (decode error) or -2 (color/16-bit input — caller falls back to
// PIL, see read_gray8_body) with 0 returned.
int decode_resize_mem(const uint8_t* data, int64_t len, int img_size,
                      uint8_t* out, int32_t* meta) try {
  Gray8 img;
  std::string err;
  bool needs_pil = false;
  if (len < 0 ||
      !decode_png_gray_mem(data, static_cast<size_t>(len), &img, &err,
                           &needs_pil)) {
    meta[0] = -1;
    meta[1] = 0;
    return 0;
  }
  if (needs_pil) {
    meta[0] = -2;
    meta[1] = 0;
    return 0;
  }
  const size_t plane = static_cast<size_t>(img_size) * img_size;
  if (img.w == img_size && img.h == img_size) {
    std::memcpy(out, img.data.data(), plane);
  } else {
    resize_bilinear(img, out, img_size);
  }
  meta[0] = img.w;
  meta[1] = img.h;
  return 1;
} catch (const std::exception& e) {
  set_error(std::string("decode_resize_mem: ") + e.what());
  meta[0] = -1;
  meta[1] = 0;
  return 0;
} catch (...) {
  set_error("decode_resize_mem: unknown C++ exception");
  meta[0] = -1;
  meta[1] = 0;
  return 0;
}

}  // extern "C"
