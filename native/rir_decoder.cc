// Native JPEG decode core for the input pipeline.
//
// TPU-native replacement for the reference's per-worker PIL decode
// (reference: dataset/configdataset.py:294-302): libjpeg(-turbo) decode
// with DCT-domain prescaling (scale_denom picks 1/1..1/8 before IDCT, so
// decoding a 1024px JPEG to <=512px costs a fraction of a full decode),
// plus a std::thread batch API that decodes outside the Python GIL.
//
// C ABI only (loaded via ctypes; no pybind11 in this image).
//
// Build: g++ -O3 -fPIC -shared -o librir_decoder.so rir_decoder.cc -ljpeg -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG into caller-provided RGB buffer. Returns 0 on success.
// If max_side > 0, picks the largest libjpeg scale_denom (1,2,4,8) that
// keeps max(h, w) >= max_side (never scaling below the target), so the
// caller's final resize is cheap and high-quality.
int decode_one(const uint8_t* data, size_t len, uint8_t* out,
               int out_capacity, int* out_h, int* out_w, int max_side) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;

  if (max_side > 0) {
    const int full = cinfo.image_width > cinfo.image_height
                         ? cinfo.image_width
                         : cinfo.image_height;
    int denom = 1;
    while (denom < 8 && full / (denom * 2) >= max_side) denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }

  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  const int row_stride = w * cinfo.output_components;
  if (cinfo.output_components != 3 ||
      static_cast<long>(h) * row_stride > out_capacity) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<long>(cinfo.output_scanline) * row_stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return 0;
}

}  // namespace

extern "C" {

// Probe the decoded dimensions (after DCT prescale) without full decode.
int rir_jpeg_dims(const uint8_t* data, size_t len, int max_side, int* h,
                  int* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  if (max_side > 0) {
    const int full = cinfo.image_width > cinfo.image_height
                         ? cinfo.image_width
                         : cinfo.image_height;
    int denom = 1;
    while (denom < 8 && full / (denom * 2) >= max_side) denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_calc_output_dimensions(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int rir_decode_jpeg(const uint8_t* data, size_t len, uint8_t* out,
                    int out_capacity, int* out_h, int* out_w, int max_side) {
  return decode_one(data, len, out, out_capacity, out_h, out_w, max_side);
}

// Batch decode with a thread pool. Each image i reads (datas[i], lens[i])
// and writes into outs[i] (capacity caps[i]); hs/ws/status are per-image.
void rir_decode_batch(const uint8_t** datas, const size_t* lens,
                      uint8_t** outs, const int* caps, int* hs, int* ws,
                      int* status, int n, int max_side, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> pool;
  std::atomic_int next(0);
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      status[i] = decode_one(datas[i], lens[i], outs[i], caps[i], &hs[i],
                             &ws[i], max_side);
    }
  };
  const int t = num_threads < n ? num_threads : n;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
