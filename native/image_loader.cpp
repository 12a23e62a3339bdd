// Native host-side image loader: threaded JPEG/PNG decode + shorter-side
// bilinear resize + center crop -> float32 [0,1] HWC.
//
// This is the TPU-native replacement for the reference's DataLoader worker
// processes (ref: train.py:449-459): the input pipeline must sustain
// thousands of decoded images/sec per host to keep a pod compute-bound
// (SURVEY.md §7 hard part f). Python threads can't do the pixel math fast
// enough without torchvision; this does decode+resize in C++ and releases the
// GIL via ctypes.
//
// C ABI (see deepl_project_tpu/data/native_loader.py):
//   int dt_decode_file(const char* path, int resolution, float* out);
//     -> 1 on success (out filled with [res, res, 3] floats), 0 on failure.
//   int dt_decode_batch(const char** paths, int n, int resolution,
//                       int num_threads, float* out, unsigned char* ok);
//     -> number of successes; out is [n, res, res, 3]; ok[i] in {0,1}.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> pixels;  // HWC, RGB
  int w = 0, h = 0;
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, Image* img) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->pixels.resize(size_t(img->w) * img->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img->pixels.data() + size_t(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG ----
bool decode_png(FILE* f, Image* img) {
  png_byte header[8];
  if (fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
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
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img->w = png_get_image_width(png, info);
  img->h = png_get_image_height(png, info);
  img->pixels.resize(size_t(img->w) * img->h * 3);
  std::vector<png_bytep> rows(img->h);
  for (int y = 0; y < img->h; ++y)
    rows[y] = img->pixels.data() + size_t(y) * img->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_any(const char* path, Image* img) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  int c0 = fgetc(f);
  int c1 = fgetc(f);
  rewind(f);
  bool ok = false;
  if (c0 == 0xFF && c1 == 0xD8) ok = decode_jpeg(f, img);
  else if (c0 == 0x89 && c1 == 'P') ok = decode_png(f, img);
  else ok = decode_jpeg(f, img);  // let libjpeg try (it error-exits cleanly)
  fclose(f);
  return ok && img->w > 0 && img->h > 0;
}

// ------------------------------------------------------------- resample ----
// Pillow-exact antialiased bilinear (triangle filter with support scaled by
// the downscale factor; see Pillow's ImageResample.c), separable H then V,
// matching torchvision Resize(res) + CenterCrop(res) semantics.

struct FilterTaps {
  std::vector<int> xmin;          // first source index per output pixel
  std::vector<int> count;         // taps per output pixel
  std::vector<double> weights;    // flattened [out][max_taps]
  int max_taps = 0;
};

FilterTaps build_taps(int in_size, int out_size, int out_lo, int out_hi) {
  // Output pixels [out_lo, out_hi) of a virtual out_size-wide resize.
  const double scale = double(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // bilinear support = 1
  const int span = out_hi - out_lo;
  FilterTaps t;
  t.max_taps = int(support * 2.0 + 2.0);
  t.xmin.resize(span);
  t.count.resize(span);
  t.weights.assign(size_t(span) * t.max_taps, 0.0);
  for (int i = 0; i < span; ++i) {
    const double center = (out_lo + i + 0.5) * scale;
    int lo = int(center - support + 0.5);
    int hi = int(center + support + 0.5);
    if (lo < 0) lo = 0;
    if (hi > in_size) hi = in_size;
    double sum = 0.0;
    for (int x = lo; x < hi; ++x) {
      double arg = (x - center + 0.5) / filterscale;
      if (arg < 0) arg = -arg;
      const double wgt = arg < 1.0 ? 1.0 - arg : 0.0;
      t.weights[size_t(i) * t.max_taps + (x - lo)] = wgt;
      sum += wgt;
    }
    if (sum > 0)
      for (int k = 0; k < hi - lo; ++k)
        t.weights[size_t(i) * t.max_taps + k] /= sum;
    t.xmin[i] = lo;
    t.count[i] = hi - lo;
  }
  return t;
}

void resize_crop_normalize(const Image& img, int res, float* out) {
  const int w = img.w, h = img.h;
  int new_w, new_h;
  if (w <= h) {
    new_w = res;
    new_h = std::max(1, int(double(h) * res / w + 0.5));
  } else {
    new_h = res;
    new_w = std::max(1, int(double(w) * res / h + 0.5));
  }
  const int left = (new_w - res) / 2;
  const int top = (new_h - res) / 2;
  const FilterTaps tx = build_taps(w, new_w, left, left + res);
  const FilterTaps ty = build_taps(h, new_h, top, top + res);

  // Horizontal pass: [h, res, 3] floats.
  std::vector<float> tmp(size_t(h) * res * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = img.pixels.data() + size_t(y) * w * 3;
    float* trow = tmp.data() + size_t(y) * res * 3;
    for (int ox = 0; ox < res; ++ox) {
      const double* wts = &tx.weights[size_t(ox) * tx.max_taps];
      const int x0 = tx.xmin[ox];
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < tx.count[ox]; ++k) {
        const uint8_t* p = row + size_t(x0 + k) * 3;
        const double wgt = wts[k];
        acc[0] += wgt * p[0];
        acc[1] += wgt * p[1];
        acc[2] += wgt * p[2];
      }
      trow[ox * 3 + 0] = float(acc[0]);
      trow[ox * 3 + 1] = float(acc[1]);
      trow[ox * 3 + 2] = float(acc[2]);
    }
  }
  // Vertical pass + normalize.
  for (int oy = 0; oy < res; ++oy) {
    const double* wts = &ty.weights[size_t(oy) * ty.max_taps];
    const int y0 = ty.xmin[oy];
    float* drow = out + size_t(oy) * res * 3;
    for (int ox = 0; ox < res * 3; ++ox) {
      double acc = 0;
      for (int k = 0; k < ty.count[oy]; ++k)
        acc += wts[k] * tmp[size_t(y0 + k) * res * 3 + ox];
      // Pillow rounds to uint8 between resize and ToTensor; replicate.
      double v = acc + 0.5;
      if (v < 0) v = 0;
      if (v > 255) v = 255;
      drow[ox] = float(int(v) / 255.0);
    }
  }
}

}  // namespace

extern "C" {

int dt_decode_file(const char* path, int resolution, float* out) {
  Image img;
  if (!decode_any(path, &img)) return 0;
  resize_crop_normalize(img, resolution, out);
  return 1;
}

int dt_decode_batch(const char** paths, int n, int resolution, int num_threads,
                    float* out, unsigned char* ok) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0), successes(0);
  const size_t stride = size_t(resolution) * resolution * 3;
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      int r = dt_decode_file(paths[i], resolution, out + stride * i);
      ok[i] = static_cast<unsigned char>(r);
      if (r) successes.fetch_add(1);
      else memset(out + stride * i, 0, stride * sizeof(float));
    }
  };
  std::vector<std::thread> threads;
  const int nt = std::min(num_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return successes.load();
}

}  // extern "C"
