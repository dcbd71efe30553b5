// Native dataset loader for adanerf_tpu.
//
// The reference's only host-side parallelism is its 8-worker torch DataLoader
// (train_data.py:208-239) decoding PNGs per batch; the TPU rebuild loads each
// split once into pinned host memory instead, and this library makes that
// load fast: a thread pool decodes PNGs with libpng and box-downsamples
// (cv2.INTER_AREA semantics for integer factors) straight into the caller's
// float32 buffer.
//
// Built by native/build.py into libadanerf_native.so (links -lpng -lz).

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Decode one PNG into float32 RGB [0,1], box-downsampled by `scale`.
// Returns 0 on success, nonzero on failure.
int decode_png_rgb(const char *path, float *out, int out_h, int out_w,
                   int scale) {
  FILE *fp = std::fopen(path, "rb");
  if (!fp) return 1;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return 2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return 2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 3;
  }

  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);

  // normalize to 8-bit RGBA
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_RGB || color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_PALETTE)
    png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
  png_read_update_info(png, info);

  if ((int)(width / scale) != out_w || (int)(height / scale) != out_h) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 4;
  }

  std::vector<png_byte> rows((size_t)width * height * 4);
  std::vector<png_bytep> row_ptrs(height);
  for (png_uint_32 y = 0; y < height; ++y)
    row_ptrs[y] = rows.data() + (size_t)y * width * 4;
  png_read_image(png, row_ptrs.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);

  const float inv = 1.0f / (255.0f * scale * scale);
  if (scale == 1) {
    for (size_t i = 0; i < (size_t)out_h * out_w; ++i) {
      out[i * 3 + 0] = rows[i * 4 + 0] * (1.0f / 255.0f);
      out[i * 3 + 1] = rows[i * 4 + 1] * (1.0f / 255.0f);
      out[i * 3 + 2] = rows[i * 4 + 2] * (1.0f / 255.0f);
    }
  } else {
    // box average over scale x scale blocks (cv2.INTER_AREA for int factors)
    for (int oy = 0; oy < out_h; ++oy) {
      for (int ox = 0; ox < out_w; ++ox) {
        float acc[3] = {0, 0, 0};
        for (int dy = 0; dy < scale; ++dy) {
          const png_byte *row =
              rows.data() + ((size_t)(oy * scale + dy) * width) * 4;
          for (int dx = 0; dx < scale; ++dx) {
            const png_byte *px = row + (size_t)(ox * scale + dx) * 4;
            acc[0] += px[0];
            acc[1] += px[1];
            acc[2] += px[2];
          }
        }
        float *o = out + ((size_t)oy * out_w + ox) * 3;
        o[0] = acc[0] * inv;
        o[1] = acc[1] * inv;
        o[2] = acc[2] * inv;
      }
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Decode `n` PNGs in parallel into out (n, out_h, out_w, 3) float32.
// paths: array of n C strings. Returns number of failures.
int load_images_parallel(const char **paths, int n, float *out, int out_h,
                         int out_w, int scale, int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  std::atomic<int> next(0), failures(0);
  const size_t stride = (size_t)out_h * out_w * 3;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      if (decode_png_rgb(paths[i], out + stride * i, out_h, out_w, scale) != 0)
        failures.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  int nt = n_threads < n ? n_threads : n;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto &t : threads) t.join();
  return failures.load();
}

// Gather pixel colors + ray dirs for a training batch:
//  images (n_images, h*w, 3), dirs (h*w, 3), pix (n_sel, samples) int64
//  -> colors (n_sel, samples, 3), out_dirs (n_sel, samples, 3)
void gather_batch(const float *images, const float *dirs,
                  const int64_t *image_indices, const int64_t *pix, int n_sel,
                  int samples, int64_t hw, float *colors, float *out_dirs) {
  for (int k = 0; k < n_sel; ++k) {
    const float *img = images + (size_t)image_indices[k] * hw * 3;
    const int64_t *p = pix + (size_t)k * samples;
    float *c = colors + (size_t)k * samples * 3;
    float *d = out_dirs + (size_t)k * samples * 3;
    for (int s = 0; s < samples; ++s) {
      const int64_t q = p[s];
      std::memcpy(c + (size_t)s * 3, img + (size_t)q * 3, 3 * sizeof(float));
      std::memcpy(d + (size_t)s * 3, dirs + (size_t)q * 3, 3 * sizeof(float));
    }
  }
}

}  // extern "C"
