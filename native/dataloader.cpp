// Native data loader: image decode, OpenCV-parity bilinear resize, and a
// threaded prefetch queue.
//
// TPU-native replacement for the reference's host-side IO path (reference:
// source/main.cu:483-522 — OpenCV imread + INTER_LINEAR resize per pair,
// serial on the driver thread; Caffe's analogous machinery is
// DataReader/BlockingQueue + InternalThread, src/caffe/util/blocking_queue.cpp).
// Here decode+resize run on a std::thread pool ahead of the accelerator so
// the next pair is host-ready while the TPU works on the current one.
//
// Exposed as a C ABI consumed from Python via ctypes (no pybind11 in the
// image).  All images are uint8 BGR, row-major, matching the pipeline's
// internal convention.

#include <png.h>
#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // BGR, h*w*3
  int h = 0;
  int w = 0;
  bool ok = false;
};

// ---------------------------------------------------------------- decode

Image decode_png(FILE* fp) {
  Image img;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);

  // Normalize every variant to 8-bit RGB.
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img.h = static_cast<int>(h);
  img.w = static_cast<int>(w);
  img.data.resize(size_t(h) * w * 3);
  std::vector<uint8_t> row(size_t(w) * 3);
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    uint8_t* dst = img.data.data() + size_t(y) * w * 3;
    for (png_uint_32 x = 0; x < w; ++x) {  // RGB -> BGR
      dst[x * 3 + 0] = row[x * 3 + 2];
      dst[x * 3 + 1] = row[x * 3 + 1];
      dst[x * 3 + 2] = row[x * 3 + 0];
    }
  }
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

Image decode_jpeg(FILE* fp) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  img.h = cinfo.output_height;
  img.w = cinfo.output_width;
  img.data.resize(size_t(img.h) * img.w * 3);
  std::vector<uint8_t> row(size_t(img.w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst =
        img.data.data() + size_t(cinfo.output_scanline - 1) * img.w * 3;
    for (int x = 0; x < img.w; ++x) {
      dst[x * 3 + 0] = row[x * 3 + 2];
      dst[x * 3 + 1] = row[x * 3 + 1];
      dst[x * 3 + 2] = row[x * 3 + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

Image decode_file(const char* path) {
  Image img;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return img;
  unsigned char magic[4] = {0, 0, 0, 0};
  size_t got = std::fread(magic, 1, 4, fp);
  std::rewind(fp);
  if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P') {
    img = decode_png(fp);
  } else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    img = decode_jpeg(fp);
  }
  std::fclose(fp);
  return img;
}

// ---------------------------------------------------------------- resize

// OpenCV INTER_LINEAR semantics: src = (dst + 0.5) * scale - 0.5, border
// clamp, round-to-nearest on store (main.cu:106-107; matches
// nct_tpu/ops/resize.py bit-for-bit on uint8).
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  std::vector<int> xlo(dw), xhi(dw);
  std::vector<float> xf(dw);
  const float sx = float(sw) / dw;
  for (int x = 0; x < dw; ++x) {
    float c = (x + 0.5f) * sx - 0.5f;
    float lo = std::floor(c);
    float f = c - lo;
    int l = std::min(std::max(int(lo), 0), sw - 1);
    xlo[x] = l;
    xhi[x] = std::min(l + 1, sw - 1);
    xf[x] = (c < 0 || c > sw - 1) ? 0.f : f;
  }
  const float sy = float(sh) / dh;
  std::vector<float> rowbuf(size_t(dw) * 3);
  for (int y = 0; y < dh; ++y) {
    float c = (y + 0.5f) * sy - 0.5f;
    float lo = std::floor(c);
    float f = c - lo;
    int yl = std::min(std::max(int(lo), 0), sh - 1);
    int yh = std::min(yl + 1, sh - 1);
    float fy = (c < 0 || c > sh - 1) ? 0.f : f;
    const uint8_t* r0 = src + size_t(yl) * sw * 3;
    const uint8_t* r1 = src + size_t(yh) * sw * 3;
    uint8_t* out = dst + size_t(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      for (int ch = 0; ch < 3; ++ch) {
        float a0 = r0[xlo[x] * 3 + ch] * (1.f - xf[x]) +
                   r0[xhi[x] * 3 + ch] * xf[x];
        float a1 = r1[xlo[x] * 3 + ch] * (1.f - xf[x]) +
                   r1[xhi[x] * 3 + ch] * xf[x];
        float v = a0 * (1.f - fy) + a1 * fy;
        out[x * 3 + ch] = uint8_t(std::min(255.f, std::max(0.f, std::round(v))));
      }
    }
  }
}

void cap_max_size(Image& img, int max_size) {
  if (max_size <= 0 || (img.w <= max_size && img.h <= max_size)) return;
  int nh, nw;  // reference integer math, main.cu:499-522
  if (img.w >= img.h) {
    nw = max_size;
    nh = int(nw / float(img.w) * img.h);
  } else {
    nh = max_size;
    nw = int(nh / float(img.h) * img.w);
  }
  std::vector<uint8_t> out(size_t(nh) * nw * 3);
  resize_bilinear(img.data.data(), img.h, img.w, out.data(), nh, nw);
  img.data.swap(out);
  img.h = nh;
  img.w = nw;
}

// ------------------------------------------------------------- prefetcher

struct Loader {
  std::vector<std::string> paths;
  int max_size = 0;
  std::vector<Image> results;
  std::vector<std::atomic<int>> done_flags;  // 0 pending, 1 done
  std::atomic<size_t> next_job{0};
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv;

  Loader(const char** p, int n, int max_sz, int threads)
      : paths(p, p + n), max_size(max_sz), results(n), done_flags(n) {
    for (auto& f : done_flags) f.store(0);
    int t = std::max(1, threads);
    for (int i = 0; i < t; ++i) {
      workers.emplace_back([this] { run(); });
    }
  }

  void run() {
    for (;;) {
      size_t j = next_job.fetch_add(1);
      if (j >= paths.size()) return;
      Image img = decode_file(paths[j].c_str());
      if (img.ok) cap_max_size(img, max_size);
      {
        std::lock_guard<std::mutex> lk(mu);
        results[j] = std::move(img);
        done_flags[j].store(1);
      }
      cv.notify_all();
    }
  }

  Image* wait(int idx) {
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [&] { return done_flags[idx].load() == 1; });
    return &results[idx];
  }

  ~Loader() {
    for (auto& w : workers) w.join();
  }
};

}  // namespace

extern "C" {

// One-shot decode (+ optional longer-side cap). Returns 0 on success and
// fills *out_h/*out_w; caller then calls nct_copy_free with a destination
// buffer of h*w*3 bytes.
void* nct_decode(const char* path, int max_size, int* out_h, int* out_w) {
  Image* img = new Image(decode_file(path));
  if (!img->ok) {
    delete img;
    return nullptr;
  }
  cap_max_size(*img, max_size);
  *out_h = img->h;
  *out_w = img->w;
  return img;
}

void nct_copy_free(void* handle, uint8_t* dst) {
  Image* img = static_cast<Image*>(handle);
  std::memcpy(dst, img->data.data(), img->data.size());
  delete img;
}

void nct_resize_u8(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                   int dw) {
  resize_bilinear(src, sh, sw, dst, dh, dw);
}

// PNG writer (BGR input), reference imwrite equivalent.
int nct_write_png(const char* path, const uint8_t* bgr, int h, int w) {
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return -1;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(fp);
    return -1;
  }
  png_init_io(png, fp);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<uint8_t> row(size_t(w) * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = bgr + size_t(y) * w * 3;
    for (int x = 0; x < w; ++x) {
      row[x * 3 + 0] = src[x * 3 + 2];
      row[x * 3 + 1] = src[x * 3 + 1];
      row[x * 3 + 2] = src[x * 3 + 0];
    }
    png_write_row(png, row.data());
  }
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return 0;
}

// Threaded prefetch loader over a path list.
void* nct_loader_create(const char** paths, int n, int max_size, int threads) {
  return new Loader(paths, n, max_size, threads);
}

// Blocks until item idx is decoded; returns 0 and its dims, or -1 on a
// decode failure (the caller skips the pair like the reference does).
int nct_loader_dims(void* handle, int idx, int* out_h, int* out_w) {
  Loader* l = static_cast<Loader*>(handle);
  Image* img = l->wait(idx);
  if (!img->ok) return -1;
  *out_h = img->h;
  *out_w = img->w;
  return 0;
}

void nct_loader_copy(void* handle, int idx, uint8_t* dst) {
  Loader* l = static_cast<Loader*>(handle);
  Image* img = l->wait(idx);
  std::memcpy(dst, img->data.data(), img->data.size());
  img->data.clear();
  img->data.shrink_to_fit();
}

void nct_loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
