// zss_loader — native data-path runtime for zeroshotsemanticsegmentation_tpu.
//
// The reference leans on torch's C++ DataLoader workers for its input
// pipeline (train.py:81-84); this library is the TPU framework's native
// equivalent: JPEG/PNG decode (libjpeg/libpng), the BGR mean-subtraction
// transform (reference pascal_dataset.py:39,138-145), label remaps
// (255 -> -1 pascal, value-1 context), and pad-to-bucket static-shape
// assembly — all fused in C++ so a batch materializes directly into the
// final float32/int32 buffers the device feed consumes, decoded by a
// pthread pool without touching the Python GIL.
//
// C ABI (see data/native.py for the ctypes binding):
//   zss_decode_image : one JPEG -> transformed float32 HWC into a bucket
//   zss_decode_label : one PNG  -> remapped int32 HW into a bucket
//   zss_load_batch   : N (image,label) pairs, decoded in parallel
// All functions return 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

constexpr double kMeanBGR[3] = {104.00698793, 116.66876762, 122.67891434};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG into RGB8; returns empty on failure.
bool decode_jpeg_rgb(const char* path, std::vector<uint8_t>* out,
                     int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out->resize(size_t(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Decode a (possibly palettized) PNG into 8/16-bit gray; returns false on failure.
bool decode_png_gray(const char* path, std::vector<uint16_t>* out,
                     int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  // VOC label PNGs are palette images where the palette INDEX is the class
  // id — read raw indices, do NOT expand to RGB. 16-bit depth unsupported.
  bool ok = depth <= 8;
  if (color == PNG_COLOR_TYPE_PALETTE) {
    if (depth < 8) png_set_packing(png);
  } else if (color == PNG_COLOR_TYPE_GRAY && depth < 8) {
    png_set_expand_gray_1_2_4_to_8(png);
  } else if (color != PNG_COLOR_TYPE_GRAY) {
    ok = false;
  }
  if (!ok) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_read_update_info(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> raw(size_t(*h) * rowbytes);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = raw.data() + size_t(y) * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);

  out->resize(size_t(*h) * *w);
  for (int y = 0; y < *h; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * rowbytes;
    for (int x = 0; x < *w; ++x) (*out)[size_t(y) * *w + x] = src[x];
  }
  return true;
}

int decode_image_impl(const char* path, float* out, int bucket_h,
                      int bucket_w, int* size_hw) {
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (!decode_jpeg_rgb(path, &rgb, &h, &w)) return -1;
  if (h > bucket_h || w > bucket_w) return -2;
  // zero-fill bucket, then RGB->BGR + mean-subtract into the top-left corner
  std::memset(out, 0, sizeof(float) * size_t(bucket_h) * bucket_w * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = rgb.data() + size_t(y) * w * 3;
    float* dst = out + size_t(y) * bucket_w * 3;
    for (int x = 0; x < w; ++x) {
      dst[x * 3 + 0] = float(src[x * 3 + 2] - kMeanBGR[0]);  // B
      dst[x * 3 + 1] = float(src[x * 3 + 1] - kMeanBGR[1]);  // G
      dst[x * 3 + 2] = float(src[x * 3 + 0] - kMeanBGR[2]);  // R
    }
  }
  if (size_hw) { size_hw[0] = h; size_hw[1] = w; }
  return 0;
}

int decode_label_impl(const char* path, int32_t* out, int bucket_h,
                      int bucket_w, int value_offset, int map255_to_ignore,
                      int* size_hw) {
  std::vector<uint16_t> gray;
  int h = 0, w = 0;
  if (!decode_png_gray(path, &gray, &h, &w)) return -1;
  if (h > bucket_h || w > bucket_w) return -2;
  for (int i = 0; i < bucket_h * bucket_w; ++i) out[i] = -1;  // pad = ignore
  for (int y = 0; y < h; ++y) {
    int32_t* dst = out + size_t(y) * bucket_w;
    const uint16_t* src = gray.data() + size_t(y) * w;
    for (int x = 0; x < w; ++x) {
      int32_t v = int32_t(src[x]);
      if (map255_to_ignore && v == 255) v = -1;    // pascal 255 -> -1
      else v += value_offset;                      // context 1-indexed -> -1
      dst[x] = v;
    }
  }
  if (size_hw) { size_hw[0] = h; size_hw[1] = w; }
  return 0;
}

}  // namespace

extern "C" {

int zss_decode_image(const char* path, float* out, int bucket_h, int bucket_w,
                     int* size_hw) {
  return decode_image_impl(path, out, bucket_h, bucket_w, size_hw);
}

int zss_decode_label(const char* path, int32_t* out, int bucket_h,
                     int bucket_w, int value_offset, int map255_to_ignore,
                     int* size_hw) {
  return decode_label_impl(path, out, bucket_h, bucket_w, value_offset,
                           map255_to_ignore, size_hw);
}

// Decode a whole batch in parallel. images/labels are contiguous
// (n, bucket_h, bucket_w, 3) float32 / (n, bucket_h, bucket_w) int32 buffers;
// sizes is (n, 2) int32. A null label path skips the label slot.
int zss_load_batch(const char** image_paths, const char** label_paths, int n,
                   float* images, int32_t* labels, int* sizes, int bucket_h,
                   int bucket_w, int value_offset, int map255_to_ignore,
                   int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<int> status(n, 0);
  std::vector<std::thread> pool;
  std::atomic_int next_idx{0};
  auto worker = [&]() {
    for (int i = next_idx.fetch_add(1); i < n; i = next_idx.fetch_add(1)) {
      int rc = zss_decode_image(
          image_paths[i], images + size_t(i) * bucket_h * bucket_w * 3,
          bucket_h, bucket_w, sizes + 2 * i);
      if (rc == 0 && label_paths && label_paths[i]) {
        rc = zss_decode_label(
            label_paths[i], labels + size_t(i) * bucket_h * bucket_w,
            bucket_h, bucket_w, value_offset, map255_to_ignore, nullptr);
      }
      status[i] = rc;
    }
  };
  int threads = std::min(num_threads, n);
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  for (int rc : status) if (rc != 0) return rc;
  return 0;
}

}  // extern "C"
