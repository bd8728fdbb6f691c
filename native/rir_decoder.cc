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

}  // extern "C"

// ---------------------------------------------------------------------------
// DCT-coefficient extraction for DEVICE-side decode.
//
// The wire bottleneck on a tunnel-attached TPU is decoded RGB bytes
// (H*W*3); the JPEG's quantized DCT coefficients truncated to the
// top-left k x k of each 8x8 block are (k*k/64)*1.5 int16 per pixel —
// 4x fewer bytes at k=4, 16x fewer at k=2.  The host does ONLY the
// entropy decode (Huffman), the TPU does dequant + iDCT + chroma
// upsample + YCbCr->RGB inside the extraction program
// (ops/jpeg_decode.py).  Replaces the host-decode surface of the
// reference (dataset/configdataset.py:294-302) with a split
// host-entropy/device-inverse-transform decode.
//
// Supported layouts: 3-component 4:2:0 (subsamp=2), 4:4:4 (subsamp=1),
// and grayscale (subsamp=0, no chroma written).  Anything else returns
// -4 and the caller falls back to host RGB decode.

namespace {

int subsamp_code(jpeg_decompress_struct* cinfo) {
  if (cinfo->num_components == 1) return 0;
  if (cinfo->num_components != 3) return -1;
  const jpeg_component_info* ci = cinfo->comp_info;
  if (ci[1].h_samp_factor != 1 || ci[1].v_samp_factor != 1 ||
      ci[2].h_samp_factor != 1 || ci[2].v_samp_factor != 1)
    return -1;
  if (ci[0].h_samp_factor == 2 && ci[0].v_samp_factor == 2) return 2;
  if (ci[0].h_samp_factor == 1 && ci[0].v_samp_factor == 1) return 1;
  return -1;
}

}  // namespace

extern "C" {

// Probe coefficient-layout dims. by/bx = Y blocks, cby/cbx = chroma blocks
// (0 for grayscale). Returns 0 on success, -4 for unsupported layouts.
int rir_jpeg_coeff_dims(const uint8_t* data, size_t len, int* h, int* w,
                        int* by, int* bx, int* cby, int* cbx, int* subsamp) {
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
  const int ss = subsamp_code(&cinfo);
  if (ss < 0) {
    jpeg_destroy_decompress(&cinfo);
    return -4;
  }
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  *by = (cinfo.image_height + (ss == 2 ? 15 : 7)) / (ss == 2 ? 16 : 8) *
        (ss == 2 ? 2 : 1);
  *bx = (cinfo.image_width + (ss == 2 ? 15 : 7)) / (ss == 2 ? 16 : 8) *
        (ss == 2 ? 2 : 1);
  if (ss == 0) {
    *cby = *cbx = 0;
  } else if (ss == 2) {
    *cby = *by / 2;
    *cbx = *bx / 2;
  } else {
    *cby = *by;
    *cbx = *bx;
  }
  *subsamp = ss;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Entropy-decode and emit quantized coefficients truncated to the
// top-left k x k of each block (natural order; libjpeg stores blocks in
// natural order after entropy decode).  coef_y is [by, bx, k, k] int16;
// coef_c is [2, cby, cbx, k, k] int16 (untouched for grayscale).
// quant_y / quant_c are k*k float32 dequant tables (natural order).
int rir_jpeg_coeffs(const uint8_t* data, size_t len, int k, int16_t* coef_y,
                    long cap_y, int16_t* coef_c, long cap_c, float* quant_y,
                    float* quant_c, int* out_h, int* out_w, int* out_by,
                    int* out_bx, int* out_cby, int* out_cbx,
                    int* out_subsamp) {
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
  const int ss = subsamp_code(&cinfo);
  if (ss < 0 || k < 1 || k > 8) {
    jpeg_destroy_decompress(&cinfo);
    return -4;
  }
  jvirt_barray_ptr* coef_arrays = jpeg_read_coefficients(&cinfo);
  if (coef_arrays == nullptr) {
    jpeg_destroy_decompress(&cinfo);
    return -5;
  }

  const int ncomp = cinfo.num_components;
  // padded block dims per component (iMCU-aligned, what the virtual
  // arrays actually hold); we emit the iMCU-padded grid so Y and chroma
  // stay 2:1 aligned for 4:2:0
  int want_by[3], want_bx[3];
  {
    int yb = (cinfo.image_height + (ss == 2 ? 15 : 7)) / (ss == 2 ? 16 : 8) *
             (ss == 2 ? 2 : 1);
    int xb = (cinfo.image_width + (ss == 2 ? 15 : 7)) / (ss == 2 ? 16 : 8) *
             (ss == 2 ? 2 : 1);
    want_by[0] = yb;
    want_bx[0] = xb;
    want_by[1] = want_by[2] = (ss == 2) ? yb / 2 : yb;
    want_bx[1] = want_bx[2] = (ss == 2) ? xb / 2 : xb;
  }
  const long need_y = static_cast<long>(want_by[0]) * want_bx[0] * k * k;
  const long need_c =
      ncomp == 3 ? 2L * want_by[1] * want_bx[1] * k * k : 0;
  if (need_y * 2 > cap_y || need_c * 2 > cap_c) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }

  for (int c = 0; c < ncomp; ++c) {
    const jpeg_component_info* ci = &cinfo.comp_info[c];
    const JQUANT_TBL* qtbl = cinfo.quant_tbl_ptrs[ci->quant_tbl_no];
    if (qtbl == nullptr) {
      jpeg_destroy_decompress(&cinfo);
      return -6;
    }
    float* qout = (c == 0) ? quant_y : quant_c;
    if (c < 2) {  // Cb/Cr share a table in all supported layouts
      for (int r = 0; r < k; ++r)
        for (int cc = 0; cc < k; ++cc)
          qout[r * k + cc] = static_cast<float>(qtbl->quantval[r * 8 + cc]);
    }
    int16_t* out = (c == 0) ? coef_y : coef_c + (c - 1) *
                                           static_cast<long>(want_by[1]) *
                                           want_bx[1] * k * k;
    const int hb = ci->height_in_blocks;
    const int wb = ci->width_in_blocks;
    for (int row = 0; row < want_by[c]; ++row) {
      JBLOCKARRAY rows = nullptr;
      if (row < hb)
        rows = (cinfo.mem->access_virt_barray)(
            reinterpret_cast<j_common_ptr>(&cinfo), coef_arrays[c], row, 1,
            FALSE);
      for (int col = 0; col < want_bx[c]; ++col) {
        int16_t* dst =
            out + (static_cast<long>(row) * want_bx[c] + col) * k * k;
        if (rows != nullptr && col < wb) {
          const JCOEF* blk = rows[0][col];
          for (int r = 0; r < k; ++r)
            for (int cc = 0; cc < k; ++cc)
              dst[r * k + cc] = static_cast<int16_t>(blk[r * 8 + cc]);
        } else {
          memset(dst, 0, sizeof(int16_t) * k * k);
        }
      }
    }
  }

  *out_h = cinfo.image_height;
  *out_w = cinfo.image_width;
  *out_by = want_by[0];
  *out_bx = want_bx[0];
  *out_cby = ncomp == 3 ? want_by[1] : 0;
  *out_cbx = ncomp == 3 ? want_bx[1] : 0;
  *out_subsamp = ss;
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
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
