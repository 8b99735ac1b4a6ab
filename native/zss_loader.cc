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
#include <zlib.h>

namespace {

constexpr double kMeanBGR[3] = {104.00698793, 116.66876762, 122.67891434};
// dimension sanity bound for decoded rasters: hostile/corrupt headers can
// claim exabyte-scale dims; anything past ~134 M pixels is not a dataset
// image and must fail with an error code, not an allocation attempt
constexpr size_t kMaxPixels = size_t(1) << 27;

// Exceptions must never cross the extern "C" / thread boundary (they would
// std::terminate the host process mid-epoch). bad_alloc from a corrupt
// header's resize maps to -6, anything else to -7.
template <typename F>
int guarded(F&& f) noexcept {
  try {
    return f();
  } catch (const std::bad_alloc&) {
    return -6;
  } catch (...) {
    return -7;
  }
}

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
  if (*h <= 0 || *w <= 0 || size_t(*h) * *w > kMaxPixels) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
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

// libpng reports errors by longjmp; keep every setjmp region free of C++
// objects (locals modified between setjmp and longjmp are indeterminate
// after the jump — the classic skipped-destructor/stale-vector UB), so the
// guarded regions below touch only libpng state and caller-owned outputs.
bool png_header_guarded(png_structp png, png_infop info, FILE* f,
                        int* h, int* w, size_t* rowbytes) {
  if (setjmp(png_jmpbuf(png))) return false;
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  // VOC label PNGs are palette images where the palette INDEX is the class
  // id — read raw indices, do NOT expand to RGB. 16-bit depth unsupported.
  if (depth > 8) return false;
  if (color == PNG_COLOR_TYPE_PALETTE) {
    if (depth < 8) png_set_packing(png);
  } else if (color == PNG_COLOR_TYPE_GRAY && depth < 8) {
    png_set_expand_gray_1_2_4_to_8(png);
  } else if (color != PNG_COLOR_TYPE_GRAY) {
    return false;
  }
  png_read_update_info(png, info);
  *rowbytes = png_get_rowbytes(png, info);
  return true;
}

bool png_image_guarded(png_structp png, png_bytep* rows) {
  if (setjmp(png_jmpbuf(png))) return false;
  png_read_image(png, rows);
  return true;
}

// Decode a (possibly palettized) PNG into 8/16-bit gray; returns false on failure.
bool decode_png_gray(const char* path, std::vector<uint16_t>* out,
                     int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) {
    fclose(f);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(f);
    return false;
  }
  size_t rowbytes = 0;
  bool ok = png_header_guarded(png, info, f, h, w, &rowbytes) &&
            *h > 0 && *w > 0 && size_t(*h) * *w <= kMaxPixels;
  std::vector<uint8_t> raw;
  std::vector<png_bytep> rows;
  if (ok) {
    raw.resize(size_t(*h) * rowbytes);
    rows.resize(size_t(*h));
    for (int y = 0; y < *h; ++y) rows[y] = raw.data() + size_t(y) * rowbytes;
    ok = png_image_guarded(png, rows.data());
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  if (!ok) return false;

  out->resize(size_t(*h) * *w);
  for (int y = 0; y < *h; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * rowbytes;
    for (int x = 0; x < *w; ++x) (*out)[size_t(y) * *w + x] = src[x];
  }
  return true;
}

// ---------------------------------------------------------------------------
// MATLAB v5 .mat reader — just enough for SBD GTcls segmentation labels
// (reference pascal_dataset.py:70-71: mat['GTcls'][0]['Segmentation'][0]).
// Supports little-endian files, miCOMPRESSED top elements (zlib), struct
// arrays, and uint8/int8/uint16/int16/int32/double numeric matrices stored
// column-major.
// ---------------------------------------------------------------------------

constexpr uint32_t miINT32 = 5, miUINT32 = 6, miMATRIX = 14, miCOMPRESSED = 15;

struct Cursor {
  const uint8_t* p;
  size_t n;
};

uint32_t rd32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

// Reads one data element (handles the small-element format); advances cur.
bool next_element(Cursor* cur, uint32_t* type, uint32_t* bytes,
                  const uint8_t** data) {
  if (cur->n < 8) return false;
  uint32_t t = rd32(cur->p);
  if (t >> 16) {  // small element: size in upper 16 bits, data inline
    *type = t & 0xffff;
    *bytes = t >> 16;
    *data = cur->p + 4;
    cur->p += 8;
    cur->n -= 8;
    return *bytes <= 4;
  }
  *type = t;
  *bytes = rd32(cur->p + 4);
  *data = cur->p + 8;
  if (cur->n < 8 + size_t(*bytes)) return false;
  // the final element may omit its 8-byte alignment padding at EOF
  size_t padded = (*bytes + 7) & ~size_t(7);
  size_t adv = 8 + padded < cur->n ? 8 + padded : cur->n;
  cur->p += adv;
  cur->n -= adv;
  return true;
}

// Parse a numeric miMATRIX payload into int32 row-major; returns false if not
// a 2-D numeric matrix.
bool parse_numeric_matrix(Cursor body, std::vector<int32_t>* out,
                          int* h, int* w) {
  uint32_t type, bytes;
  const uint8_t* data;
  if (!next_element(&body, &type, &bytes, &data) || type != miUINT32)
    return false;  // array flags
  if (!next_element(&body, &type, &bytes, &data) || type != miINT32 ||
      bytes != 8)
    return false;  // dims (2-D only)
  int rows = int(rd32(data)), cols = int(rd32(data + 4));
  // corrupt dims must fail here, not as an exabyte resize
  if (rows <= 0 || cols <= 0 || size_t(rows) * size_t(cols) > kMaxPixels)
    return false;
  if (!next_element(&body, &type, &bytes, &data)) return false;  // name
  if (!next_element(&body, &type, &bytes, &data)) return false;  // real part
  size_t count = size_t(rows) * cols;
  out->resize(count);
  auto fill = [&](auto get, size_t elem) {
    if (bytes < count * elem) return false;
    for (int c = 0; c < cols; ++c)
      for (int r = 0; r < rows; ++r)  // column-major -> row-major
        (*out)[size_t(r) * cols + c] = get(data + (size_t(c) * rows + r) * elem);
    return true;
  };
  bool ok;
  switch (type) {
    case 1:  // miINT8
      ok = fill([](const uint8_t* p) { return int32_t(int8_t(*p)); }, 1);
      break;
    case 2:  // miUINT8
      ok = fill([](const uint8_t* p) { return int32_t(*p); }, 1);
      break;
    case 3:  // miINT16
      ok = fill([](const uint8_t* p) { int16_t v; std::memcpy(&v, p, 2);
                                       return int32_t(v); }, 2);
      break;
    case 4:  // miUINT16
      ok = fill([](const uint8_t* p) { uint16_t v; std::memcpy(&v, p, 2);
                                       return int32_t(v); }, 2);
      break;
    case miINT32:
      ok = fill([](const uint8_t* p) { int32_t v; std::memcpy(&v, p, 4);
                                       return v; }, 4);
      break;
    case 9:  // miDOUBLE
      ok = fill([](const uint8_t* p) { double v; std::memcpy(&v, p, 8);
                                       return int32_t(v); }, 8);
      break;
    default:
      return false;
  }
  if (!ok) return false;
  *h = rows;
  *w = cols;
  return true;
}

// Walk a struct miMATRIX payload and extract the named field's numeric matrix.
bool parse_struct_field(Cursor body, const char* want_field,
                        std::vector<int32_t>* out, int* h, int* w) {
  uint32_t type, bytes;
  const uint8_t* data;
  if (!next_element(&body, &type, &bytes, &data) || type != miUINT32 ||
      bytes < 8)
    return false;
  uint32_t array_class = rd32(data) & 0xff;
  if (array_class != 2) return false;  // mxSTRUCT_CLASS
  if (!next_element(&body, &type, &bytes, &data)) return false;  // dims
  if (!next_element(&body, &type, &bytes, &data)) return false;  // name
  if (!next_element(&body, &type, &bytes, &data) || bytes < 4)
    return false;  // field name length
  int fnlen = int(rd32(data));
  if (fnlen <= 0 || fnlen > 256) return false;
  if (!next_element(&body, &type, &bytes, &data)) return false;  // field names
  int n_fields = int(bytes) / fnlen;
  int want = -1;
  for (int i = 0; i < n_fields; ++i) {
    const char* name = reinterpret_cast<const char*>(data) + size_t(i) * fnlen;
    if (std::strncmp(name, want_field, fnlen) == 0) want = i;
  }
  if (want < 0) return false;
  for (int i = 0; i <= want; ++i) {  // fields follow in declaration order
    if (!next_element(&body, &type, &bytes, &data) || type != miMATRIX)
      return false;
    if (i == want)
      return parse_numeric_matrix(Cursor{data, bytes}, out, h, w);
  }
  return false;
}

bool decode_mat_label(const char* path, std::vector<int32_t>* out,
                      int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (fsize < 136) { fclose(f); return false; }
  std::vector<uint8_t> buf(static_cast<size_t>(fsize));
  bool read_ok = fread(buf.data(), 1, size_t(fsize), f) == size_t(fsize);
  fclose(f);
  if (!read_ok) return false;
  // 128-byte header; bytes 126-127 are the endian indicator "IM" (LE)
  if (!(buf[126] == 'I' && buf[127] == 'M')) return false;

  Cursor cur{buf.data() + 128, size_t(fsize) - 128};
  uint32_t type, bytes;
  const uint8_t* data;
  std::vector<uint8_t> inflated;
  while (next_element(&cur, &type, &bytes, &data)) {
    Cursor body{data, bytes};
    if (type == miCOMPRESSED) {
      // inflate; SBD GTcls elements are a few hundred KB uncompressed
      inflated.resize(size_t(bytes) * 8 + (1 << 16));
      uLongf dst_len = uLongf(inflated.size());
      for (int attempt = 0; attempt < 4; ++attempt) {
        int rc = uncompress(inflated.data(), &dst_len, data, bytes);
        if (rc == Z_OK) break;
        if (rc != Z_BUF_ERROR) return false;
        inflated.resize(inflated.size() * 4);
        dst_len = uLongf(inflated.size());
      }
      Cursor icur{inflated.data(), size_t(dst_len)};
      uint32_t itype, ibytes;
      const uint8_t* idata;
      if (!next_element(&icur, &itype, &ibytes, &idata) || itype != miMATRIX)
        continue;
      body = Cursor{idata, ibytes};
    } else if (type != miMATRIX) {
      continue;
    }
    if (parse_struct_field(body, "Segmentation", out, h, w)) return true;
  }
  return false;
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
  // dispatch by magic bytes: PNG label maps or MATLAB v5 (SBD GTcls)
  uint8_t magic[8] = {0};
  {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    size_t got = fread(magic, 1, sizeof magic, f);
    fclose(f);
    if (got < sizeof magic) return -1;
  }
  std::vector<int32_t> vals;
  int h = 0, w = 0;
  if (magic[0] == 0x89 && magic[1] == 'P') {
    std::vector<uint16_t> gray;
    if (!decode_png_gray(path, &gray, &h, &w)) return -1;
    vals.assign(gray.begin(), gray.end());
  } else if (std::memcmp(magic, "MATLAB", 6) == 0) {
    if (!decode_mat_label(path, &vals, &h, &w)) return -3;
  } else {
    return -4;  // unsupported label format
  }
  if (h > bucket_h || w > bucket_w) return -2;
  for (int i = 0; i < bucket_h * bucket_w; ++i) out[i] = -1;  // pad = ignore
  for (int y = 0; y < h; ++y) {
    int32_t* dst = out + size_t(y) * bucket_w;
    const int32_t* src = vals.data() + size_t(y) * w;
    for (int x = 0; x < w; ++x) {
      int32_t v = src[x];
      if (map255_to_ignore && v == 255) v = -1;    // pascal 255 -> -1
      else v += value_offset;                      // context 1-indexed -> -1
      dst[x] = v;
    }
  }
  if (size_hw) { size_hw[0] = h; size_hw[1] = w; }
  return 0;
}

int decode_image_u8_impl(const char* path, uint8_t* out, int bucket_h,
                         int bucket_w, int* size_hw) {
  // compact feed: raw RGB uint8 into the bucket (device-side normalization)
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (!decode_jpeg_rgb(path, &rgb, &h, &w)) return -1;
  if (h > bucket_h || w > bucket_w) return -2;
  std::memset(out, 0, size_t(bucket_h) * bucket_w * 3);
  for (int y = 0; y < h; ++y) {
    std::memcpy(out + size_t(y) * bucket_w * 3,
                rgb.data() + size_t(y) * w * 3, size_t(w) * 3);
  }
  if (size_hw) { size_hw[0] = h; size_hw[1] = w; }
  return 0;
}

int decode_label_i8_impl(const char* path, int8_t* out, int bucket_h,
                         int bucket_w, int value_offset, int map255_to_ignore,
                         int* size_hw) {
  // compact feed: int8 labels (class ids < 128 for every dataset; -1=ignore)
  std::vector<int32_t> wide(size_t(bucket_h) * bucket_w);
  int rc = decode_label_impl(path, wide.data(), bucket_h, bucket_w,
                             value_offset, map255_to_ignore, size_hw);
  if (rc != 0) return rc;
  for (size_t i = 0; i < wide.size(); ++i) {
    int32_t v = wide[i];
    if (v < -128 || v > 127) return -5;  // would not survive narrowing
    out[i] = int8_t(v);
  }
  return 0;
}

}  // namespace

extern "C" {

int zss_decode_image(const char* path, float* out, int bucket_h, int bucket_w,
                     int* size_hw) {
  return guarded([&] {
    return decode_image_impl(path, out, bucket_h, bucket_w, size_hw);
  });
}

int zss_decode_label(const char* path, int32_t* out, int bucket_h,
                     int bucket_w, int value_offset, int map255_to_ignore,
                     int* size_hw) {
  return guarded([&] {
    return decode_label_impl(path, out, bucket_h, bucket_w, value_offset,
                             map255_to_ignore, size_hw);
  });
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

// Compact-feed batch: (n, bh, bw, 3) uint8 RGB + (n, bh, bw) int8 labels —
// 4x fewer bytes than the float32/int32 batch; normalization happens on
// device (transforms.prepare_images).
int zss_load_batch_compact(const char** image_paths, const char** label_paths,
                           int n, uint8_t* images, int8_t* labels, int* sizes,
                           int bucket_h, int bucket_w, int value_offset,
                           int map255_to_ignore, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<int> status(n, 0);
  std::vector<std::thread> pool;
  std::atomic_int next_idx{0};
  auto worker = [&]() {
    for (int i = next_idx.fetch_add(1); i < n; i = next_idx.fetch_add(1)) {
      // guarded: an exception escaping a std::thread terminates the process
      status[i] = guarded([&] {
        int rc = decode_image_u8_impl(
            image_paths[i], images + size_t(i) * bucket_h * bucket_w * 3,
            bucket_h, bucket_w, sizes + 2 * i);
        if (rc == 0 && label_paths && label_paths[i]) {
          rc = decode_label_i8_impl(
              label_paths[i], labels + size_t(i) * bucket_h * bucket_w,
              bucket_h, bucket_w, value_offset, map255_to_ignore, nullptr);
        }
        return rc;
      });
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
