// gcssl_tpu native data loader: JPEG decode + letterbox resize in C++.
//
// The host-side image pipeline (decode -> pad-to-square -> antialiased
// resize) is the data-prep bottleneck for detector/calibrator runs.  This
// library does it natively: libjpeg decode plus a separable triangle-filter
// (antialiased bilinear) resampler, exposed through a C ABI consumed via
// ctypes (gcssl_tpu/data/native_loader.py).  No Python objects cross the
// boundary; callers pass preallocated output buffers.
//
// Build: make -C native   (produces libgcssl_loader.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to RGB8. Returns true on success.
bool decode_jpeg(const char* path, std::vector<unsigned char>* pixels,
                 int* width, int* height) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *width = cinfo.output_width;
  *height = cinfo.output_height;
  pixels->resize(size_t(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = pixels->data() + size_t(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Separable triangle-filter resampler (antialiased bilinear, PIL-style):
// kernel support scales with the reduction ratio; per-output-pixel weights
// are normalized over in-range taps.
struct Weights {
  std::vector<int> start;    // first source index per output pixel
  std::vector<int> count;    // taps per output pixel
  std::vector<float> w;      // flattened weights, max_taps stride
  int max_taps;
};

Weights compute_weights(int in_size, int out_size) {
  Weights ws;
  const double scale = double(in_size) / out_size;
  const double support = std::max(1.0, scale);  // triangle radius
  ws.max_taps = int(std::ceil(support * 2)) + 2;
  ws.start.resize(out_size);
  ws.count.resize(out_size);
  ws.w.assign(size_t(out_size) * ws.max_taps, 0.f);
  for (int o = 0; o < out_size; ++o) {
    const double center = (o + 0.5) * scale;
    int lo = std::max(0, int(std::floor(center - support)));
    int hi = std::min(in_size, int(std::ceil(center + support)));
    double total = 0.0;
    std::vector<double> tmp(hi - lo);
    for (int i = lo; i < hi; ++i) {
      double x = std::abs((i + 0.5) - center) / std::max(1.0, scale);
      double t = x < 1.0 ? 1.0 - x : 0.0;
      tmp[i - lo] = t;
      total += t;
    }
    if (total <= 0.0) {  // degenerate: nearest
      lo = std::min(std::max(0, int(center)), in_size - 1);
      hi = lo + 1;
      tmp.assign(1, 1.0);
      total = 1.0;
    }
    ws.start[o] = lo;
    ws.count[o] = hi - lo;
    for (int k = 0; k < hi - lo; ++k)
      ws.w[size_t(o) * ws.max_taps + k] = float(tmp[k] / total);
  }
  return ws;
}

// Resize RGB8 (h_in x w_in) into float intermediate then back to u8.
void resize_rgb(const unsigned char* src, int w_in, int h_in,
                unsigned char* dst, int w_out, int h_out) {
  Weights wx = compute_weights(w_in, w_out);
  Weights wy = compute_weights(h_in, h_out);
  // horizontal pass: (h_in, w_out, 3) floats
  std::vector<float> mid(size_t(h_in) * w_out * 3);
  for (int y = 0; y < h_in; ++y) {
    const unsigned char* row = src + size_t(y) * w_in * 3;
    float* orow = mid.data() + size_t(y) * w_out * 3;
    for (int o = 0; o < w_out; ++o) {
      float acc[3] = {0.f, 0.f, 0.f};
      const int s = wx.start[o], n = wx.count[o];
      const float* wp = wx.w.data() + size_t(o) * wx.max_taps;
      for (int k = 0; k < n; ++k) {
        const unsigned char* px = row + size_t(s + k) * 3;
        const float wv = wp[k];
        acc[0] += wv * px[0];
        acc[1] += wv * px[1];
        acc[2] += wv * px[2];
      }
      orow[o * 3 + 0] = acc[0];
      orow[o * 3 + 1] = acc[1];
      orow[o * 3 + 2] = acc[2];
    }
  }
  // vertical pass
  for (int o = 0; o < h_out; ++o) {
    unsigned char* orow = dst + size_t(o) * w_out * 3;
    const int s = wy.start[o], n = wy.count[o];
    const float* wp = wy.w.data() + size_t(o) * wy.max_taps;
    for (int x = 0; x < w_out * 3; ++x) {
      float acc = 0.f;
      for (int k = 0; k < n; ++k)
        acc += wp[k] * mid[size_t(s + k) * w_out * 3 + x];
      orow[x] = (unsigned char)std::min(255.f, std::max(0.f, acc + 0.5f));
    }
  }
}

}  // namespace

extern "C" {

// Decode `path`, pad to square with `fill`, resize to out_size^2 RGB8.
// out: preallocated out_size*out_size*3 buffer; wh: float[2] = (W, H).
// Returns 0 on success, nonzero on decode failure.
int gcssl_decode_letterbox(const char* path, int out_size, int fill,
                           unsigned char* out, float* wh) {
  std::vector<unsigned char> pixels;
  int w = 0, h = 0;
  if (!decode_jpeg(path, &pixels, &w, &h)) return 1;
  wh[0] = float(w);
  wh[1] = float(h);

  const int side = std::max(w, h);
  const int pad_x = (side - w) / 2;
  const int pad_y = (side - h) / 2;
  if (side == out_size) {
    // identity resize: pad straight into the output buffer
    std::memset(out, fill, size_t(out_size) * out_size * 3);
    for (int y = 0; y < h; ++y) {
      std::memcpy(out + (size_t(y + pad_y) * out_size + pad_x) * 3,
                  pixels.data() + size_t(y) * w * 3, size_t(w) * 3);
    }
    return 0;
  }
  std::vector<unsigned char> square(size_t(side) * side * 3,
                                    (unsigned char)fill);
  for (int y = 0; y < h; ++y) {
    std::memcpy(square.data() + (size_t(y + pad_y) * side + pad_x) * 3,
                pixels.data() + size_t(y) * w * 3, size_t(w) * 3);
  }
  resize_rgb(square.data(), side, side, out, out_size, out_size);
  return 0;
}

// Batch variant: `paths` is n C strings; outputs are packed contiguously.
// Returns the number of failed decodes.
int gcssl_decode_letterbox_batch(const char** paths, int n, int out_size,
                                 int fill, unsigned char* out, float* wh) {
  int failures = 0;
  const size_t stride = size_t(out_size) * out_size * 3;
  for (int i = 0; i < n; ++i) {
    if (gcssl_decode_letterbox(paths[i], out_size, fill, out + stride * i,
                               wh + 2 * i) != 0) {
      std::memset(out + stride * i, fill, stride);
      wh[2 * i] = wh[2 * i + 1] = 0.f;
      ++failures;
    }
  }
  return failures;
}

}  // extern "C"
