// Native data loader: multithreaded JPEG decode + bilinear resize to uint8.
//
// TPU-native replacement for the reference's native decode path
// (jpeg4py -> libjpeg-turbo at data_process.py:26, torchvision transform C
// kernels, OpenCV resize — SURVEY §2.8). The host's only job in this
// framework is producing compact wire-format uint8 arrays; all float math
// runs on device. This library turns a batch of JPEG paths into a packed
// [N, size, size, C] uint8 buffer using a std::thread pool, one libjpeg
// decompress per worker.
//
// C ABI (ctypes-friendly):
//   int sv_decode_resize_batch(const char** paths, int n, int out_size,
//                              int channels, unsigned char* out, int n_threads)
//     -> number of failed images (their slots are zero-filled)
//   const char* sv_version()
//
// Build: g++ -O3 -fPIC -shared loader.cpp -o libsvloader.so -ljpeg -lpthread

#include <atomic>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file into an RGB or grayscale buffer (malloc'd by caller
// logic below). Returns true on success; fills width/height.
bool decode_jpeg(const char* path, int channels, std::vector<unsigned char>& pixels,
                 int* width, int* height) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = (channels == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int W = cinfo.output_width;
  const int H = cinfo.output_height;
  const int C = cinfo.output_components;
  pixels.resize(static_cast<size_t>(W) * H * C);
  JSAMPROW row;
  while (cinfo.output_scanline < cinfo.output_height) {
    row = pixels.data() + static_cast<size_t>(cinfo.output_scanline) * W * C;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  *width = W;
  *height = H;
  return true;
}

// Antialiased separable triangle (bilinear) resampling — PIL's BILINEAR
// semantics: the filter support scales with the downscale factor, so
// downscaling averages all covered source pixels instead of point-sampling.
struct FilterTaps {
  std::vector<int> first;     // first source index per output pixel
  std::vector<int> count;     // taps per output pixel
  std::vector<float> weight;  // packed weights, max_taps stride
  int max_taps = 0;
};

FilterTaps build_taps(int src_n, int dst_n) {
  FilterTaps t;
  const float scale = static_cast<float>(src_n) / dst_n;
  const float support = scale > 1.0f ? scale : 1.0f;  // triangle half-width
  t.max_taps = static_cast<int>(2 * support + 2);
  t.first.resize(dst_n);
  t.count.resize(dst_n);
  t.weight.assign(static_cast<size_t>(dst_n) * t.max_taps, 0.0f);
  for (int i = 0; i < dst_n; ++i) {
    const float center = (i + 0.5f) * scale - 0.5f;
    int lo = static_cast<int>(center - support + 0.5f);
    int hi = static_cast<int>(center + support + 0.5f);
    if (lo < 0) lo = 0;
    if (hi >= src_n) hi = src_n - 1;
    float total = 0.0f;
    for (int j = lo; j <= hi; ++j) {
      float w = 1.0f - std::abs((j - center) / support);
      if (w < 0) w = 0;
      t.weight[static_cast<size_t>(i) * t.max_taps + (j - lo)] = w;
      total += w;
    }
    if (total <= 0) {  // degenerate: nearest
      t.weight[static_cast<size_t>(i) * t.max_taps] = 1.0f;
      total = 1.0f;
      hi = lo;
    }
    for (int j = 0; j <= hi - lo; ++j)
      t.weight[static_cast<size_t>(i) * t.max_taps + j] /= total;
    t.first[i] = lo;
    t.count[i] = hi - lo + 1;
  }
  return t;
}

void resize_bilinear(const unsigned char* src, int sw, int sh, int c,
                     unsigned char* dst, int dw, int dh) {
  const FilterTaps tx = build_taps(sw, dw);
  const FilterTaps ty = build_taps(sh, dh);
  // horizontal pass: [sh, dw, c] float
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * c);
  for (int y = 0; y < sh; ++y) {
    const unsigned char* row = src + static_cast<size_t>(y) * sw * c;
    float* orow = tmp.data() + static_cast<size_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      const int lo = tx.first[x], n = tx.count[x];
      const float* w = tx.weight.data() + static_cast<size_t>(x) * tx.max_taps;
      for (int k = 0; k < c; ++k) {
        float acc = 0.0f;
        for (int j = 0; j < n; ++j) acc += w[j] * row[(lo + j) * c + k];
        orow[x * c + k] = acc;
      }
    }
  }
  // vertical pass
  for (int y = 0; y < dh; ++y) {
    const int lo = ty.first[y], n = ty.count[y];
    const float* w = ty.weight.data() + static_cast<size_t>(y) * ty.max_taps;
    unsigned char* orow = dst + static_cast<size_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      for (int k = 0; k < c; ++k) {
        float acc = 0.0f;
        for (int j = 0; j < n; ++j)
          acc += w[j] * tmp[(static_cast<size_t>(lo + j) * dw + x) * c + k];
        int v = static_cast<int>(acc + 0.5f);
        orow[x * c + k] =
            static_cast<unsigned char>(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

}  // namespace

extern "C" {

const char* sv_version() { return "svloader 0.1.0 (libjpeg)"; }

int sv_decode_resize_batch(const char** paths, int n, int out_size,
                           int channels, unsigned char* out, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  std::atomic<int> next(0), failures(0);
  const size_t frame_bytes =
      static_cast<size_t>(out_size) * out_size * channels;

  auto worker = [&]() {
    std::vector<unsigned char> pixels;
    int w = 0, h = 0;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      unsigned char* dst = out + frame_bytes * i;
      if (decode_jpeg(paths[i], channels, pixels, &w, &h)) {
        resize_bilinear(pixels.data(), w, h, channels, dst, out_size, out_size);
      } else {
        std::memset(dst, 0, frame_bytes);
        failures.fetch_add(1);
      }
    }
  };

  std::vector<std::thread> threads;
  const int workers = n_threads < n ? n_threads : (n > 0 ? n : 1);
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
