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
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Gray8 {
  std::vector<uint8_t> data;
  int w = 0, h = 0;
};

// Decode any PNG to 8-bit grayscale (libpng handles palette/rgb/16-bit
// inputs; we fold color to luminance like PIL's convert('L')).
bool decode_png_gray(const char* path, Gray8* out, std::string* err) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    *err = std::string("cannot open ") + path;
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    *err = "libpng init failed";
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    *err = std::string("png decode error in ") + path;
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  int color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE) {
    // ITU-R 601 luma, the same weights PIL uses for convert('L')
    png_set_rgb_to_gray(png, PNG_ERROR_ACTION_NONE, 0.299, 0.587);
  }
  png_read_update_info(png, info);

  out->w = static_cast<int>(png_get_image_width(png, info));
  out->h = static_cast<int>(png_get_image_height(png, info));
  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.assign(static_cast<size_t>(out->h) * out->w, 0);
  std::vector<uint8_t> row(rowbytes);
  for (int y = 0; y < out->h; ++y) {
    png_read_row(png, row.data(), nullptr);
    std::memcpy(out->data.data() + static_cast<size_t>(y) * out->w,
                row.data(), out->w);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

// PIL-convention bilinear resize (pixel centers at half-integers).
void resize_bilinear(const Gray8& src, uint8_t* dst, int size) {
  const float sx = static_cast<float>(src.w) / size;
  const float sy = static_cast<float>(src.h) / size;
  for (int y = 0; y < size; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > src.h - 1) y0 = src.h - 1;
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    float wy = fy - y0;
    for (int x = 0; x < size; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      if (x0 > src.w - 1) x0 = src.w - 1;
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      float wx = fx - x0;
      float v = (1 - wy) * ((1 - wx) * src.data[y0 * src.w + x0] +
                            wx * src.data[y0 * src.w + x1]) +
                wy * ((1 - wx) * src.data[y1 * src.w + x0] +
                      wx * src.data[y1 * src.w + x1]);
      dst[y * size + x] = static_cast<uint8_t>(v + 0.5f);
    }
  }
}

// PIL NEAREST convention: floor((i + 0.5) * in / out).
void resize_nearest(const Gray8& src, uint8_t* dst, int size) {
  for (int y = 0; y < size; ++y) {
    int sy = static_cast<int>((y + 0.5f) * src.h / size);
    if (sy > src.h - 1) sy = src.h - 1;
    for (int x = 0; x < size; ++x) {
      int sx = static_cast<int>((x + 0.5f) * src.w / size);
      if (sx > src.w - 1) sx = src.w - 1;
      dst[y * size + x] = src.data[sy * src.w + sx];
    }
  }
}

char g_error[1024];

void set_error(const std::string& e) {
  std::snprintf(g_error, sizeof(g_error), "%s", e.c_str());
}

}  // namespace

extern "C" {

const char* slice_cache_last_error() { return g_error; }

// Build the cache blob. image_paths/label_paths: n C strings.
// Returns 0 on success.
int build_slice_cache(const char** image_paths, const char** label_paths,
                      int n, int img_size, const char* out_path,
                      int num_threads) {
  const size_t plane = static_cast<size_t>(img_size) * img_size;
  std::vector<uint8_t> images(static_cast<size_t>(n) * plane);
  std::vector<uint8_t> masks(static_cast<size_t>(n) * plane);
  std::atomic<int> next{0};
  std::atomic<bool> failed{false};

  auto worker = [&]() {
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

  int nt = num_threads > 0 ? num_threads
                           : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
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
}

}  // extern "C"
