// Kaldi-compatible binary ark/scp table I/O.
//
// Replaces the reference's serialization substrate (SURVEY.md §2.2
// "Serialization": ark/scp table I/O with binary matrices, compressed
// feature matrices, int-vectors) so existing Kaldi artifacts (feats.scp,
// vad.scp, ali archives, ivector arks) interoperate with the TPU
// framework, and features/embeddings written here can be consumed by
// Kaldi tooling.
//
// Formats implemented (matching kaldi/src/matrix + base/io-funcs):
//   read : "FM" float matrix, "DM" double matrix, "CM" compressed matrix
//          (format 1, uint8 per element), "FV"/"DV" float/double vector,
//          bare binary int32 vectors (alignments, VAD as int vector)
//   write: "FM" float matrix, "FV" float vector, int32 vectors
//
// Each ark entry is:  <key> ' ' '\0' 'B' <object>
// scp lines are:      <key> ' ' <ark_path> ':' <byte_offset>
// where offset points at the '\0' of the binary marker.
//
// Exposed as a C ABI for ctypes (sepi_tpu/utils/kaldi_io.py).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

bool read_exact(FILE* f, void* p, size_t n) { return fread(p, 1, n, f) == n; }

// Kaldi WriteBasicType<int32>: size byte (4) then raw little-endian int32.
bool read_basic_int32(FILE* f, int32_t* out) {
  char sz;
  if (!read_exact(f, &sz, 1) || sz != 4) return false;
  return read_exact(f, out, 4);
}

void write_basic_int32(FILE* f, int32_t v) {
  char sz = 4;
  fwrite(&sz, 1, 1, f);
  fwrite(&v, 4, 1, f);
}

// Kaldi ReadToken: up to the next space.
bool read_token(FILE* f, std::string* tok) {
  tok->clear();
  int c;
  while ((c = fgetc(f)) != EOF && c != ' ') tok->push_back((char)c);
  return c == ' ' && !tok->empty();
}

bool expect_binary_marker(FILE* f) {
  char m[2];
  if (!read_exact(f, m, 2)) return false;
  return m[0] == '\0' && m[1] == 'B';
}

// CompressedMatrix format 1 helpers (kaldi CharToFloat).
struct CmGlobalHeader {
  float min_value;
  float range;
  int32_t num_rows;
  int32_t num_cols;
};
struct CmPerColHeader {
  uint16_t p0, p25, p75, p100;
};

inline float cm_uint16_to_float(const CmGlobalHeader& h, uint16_t v) {
  return h.min_value + h.range * 1.52590218966964e-05f * v;  // range/65535
}

inline float cm_char_to_float(float p0, float p25, float p75, float p100,
                              uint8_t value) {
  if (value <= 64)
    return p0 + (p25 - p0) * value * (1 / 64.0f);
  else if (value <= 192)
    return p25 + (p75 - p25) * (value - 64) * (1 / 128.0f);
  else
    return p75 + (p100 - p75) * (value - 192) * (1 / 63.0f);
}

}  // namespace

extern "C" {

void ki_free(void* p) { free(p); }

// Returns 0 on success.  *out is malloc'd rows*cols floats (row-major).
int ki_read_matrix(const char* path, long offset, int32_t* rows,
                   int32_t* cols, float** out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  int rc = 2;
  std::string tok;
  *out = nullptr;
  do {
    if (fseek(f, offset, SEEK_SET) != 0) break;
    if (!expect_binary_marker(f)) break;
    if (!read_token(f, &tok)) break;
    if (tok == "FM" || tok == "DM") {
      int32_t r, c;
      if (!read_basic_int32(f, &r) || !read_basic_int32(f, &c)) break;
      if (r < 0 || c < 0 || (int64_t)r * c > (int64_t)1 << 31) break;
      float* data = (float*)malloc(sizeof(float) * (size_t)r * c);
      if (!data) break;
      if (tok == "FM") {
        if (!read_exact(f, data, sizeof(float) * (size_t)r * c)) {
          free(data);
          break;
        }
      } else {
        std::vector<double> tmp((size_t)r * c);
        if (!read_exact(f, tmp.data(), sizeof(double) * tmp.size())) {
          free(data);
          break;
        }
        for (size_t i = 0; i < tmp.size(); i++) data[i] = (float)tmp[i];
      }
      *rows = r;
      *cols = c;
      *out = data;
      rc = 0;
    } else if (tok == "CM") {
      CmGlobalHeader h;
      if (!read_exact(f, &h, sizeof(h))) break;
      if (h.num_rows < 0 || h.num_cols < 0) break;
      std::vector<CmPerColHeader> colh(h.num_cols);
      if (!read_exact(f, colh.data(), sizeof(CmPerColHeader) * h.num_cols))
        break;
      std::vector<uint8_t> bytes((size_t)h.num_rows * h.num_cols);
      if (!read_exact(f, bytes.data(), bytes.size())) break;
      float* data = (float*)malloc(sizeof(float) * bytes.size());
      if (!data) break;
      // data stored column-major (all rows of col 0, then col 1, ...)
      for (int32_t c = 0; c < h.num_cols; c++) {
        float p0 = cm_uint16_to_float(h, colh[c].p0);
        float p25 = cm_uint16_to_float(h, colh[c].p25);
        float p75 = cm_uint16_to_float(h, colh[c].p75);
        float p100 = cm_uint16_to_float(h, colh[c].p100);
        const uint8_t* colp = &bytes[(size_t)c * h.num_rows];
        for (int32_t r = 0; r < h.num_rows; r++)
          data[(size_t)r * h.num_cols + c] =
              cm_char_to_float(p0, p25, p75, p100, colp[r]);
      }
      *rows = h.num_rows;
      *cols = h.num_cols;
      *out = data;
      rc = 0;
    } else if (tok == "CM2" || tok == "CM3") {
      // CompressedMatrix formats 2 (uint16/elem) and 3 (uint8/elem):
      // global header only, row-major data, linear dequantization
      // (kaldi compressed-matrix DataFormat kTwoByte / kOneByte).
      CmGlobalHeader h;
      if (!read_exact(f, &h, sizeof(h))) break;
      if (h.num_rows < 0 || h.num_cols < 0) break;
      size_t n = (size_t)h.num_rows * h.num_cols;
      float* data = (float*)malloc(sizeof(float) * n);
      if (!data) break;
      bool ok = true;
      if (tok == "CM2") {
        std::vector<uint16_t> v(n);
        ok = read_exact(f, v.data(), 2 * n);
        if (ok)
          for (size_t i = 0; i < n; i++)
            data[i] = h.min_value + h.range * 1.52590218966964e-05f * v[i];
      } else {
        std::vector<uint8_t> v(n);
        ok = read_exact(f, v.data(), n);
        if (ok)
          for (size_t i = 0; i < n; i++)
            data[i] = h.min_value + h.range * (1.0f / 255.0f) * v[i];
      }
      if (!ok) {
        free(data);
        break;
      }
      *rows = h.num_rows;
      *cols = h.num_cols;
      *out = data;
      rc = 0;
    }
  } while (0);
  fclose(f);
  return rc;
}

// Float/double vector ("FV"/"DV").  *out is malloc'd n floats.
int ki_read_vector(const char* path, long offset, int32_t* n, float** out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  int rc = 2;
  std::string tok;
  *out = nullptr;
  do {
    if (fseek(f, offset, SEEK_SET) != 0) break;
    if (!expect_binary_marker(f)) break;
    if (!read_token(f, &tok)) break;
    if (tok != "FV" && tok != "DV") break;
    int32_t dim;
    if (!read_basic_int32(f, &dim) || dim < 0) break;
    float* data = (float*)malloc(sizeof(float) * (size_t)dim);
    if (!data) break;
    if (tok == "FV") {
      if (!read_exact(f, data, sizeof(float) * (size_t)dim)) {
        free(data);
        break;
      }
    } else {
      std::vector<double> tmp(dim);
      if (!read_exact(f, tmp.data(), sizeof(double) * dim)) {
        free(data);
        break;
      }
      for (int32_t i = 0; i < dim; i++) data[i] = (float)tmp[i];
    }
    *n = dim;
    *out = data;
    rc = 0;
  } while (0);
  fclose(f);
  return rc;
}

// Kaldi WriteIntegerVector format: size byte (4), int32 count, raw data.
int ki_read_int_vector(const char* path, long offset, int32_t* n,
                       int32_t** out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  int rc = 2;
  *out = nullptr;
  do {
    if (fseek(f, offset, SEEK_SET) != 0) break;
    if (!expect_binary_marker(f)) break;
    int32_t count;
    if (!read_basic_int32(f, &count) || count < 0) break;
    int32_t* data = (int32_t*)malloc(sizeof(int32_t) * (size_t)count);
    if (!data) break;
    if (count && !read_exact(f, data, sizeof(int32_t) * (size_t)count)) {
      free(data);
      break;
    }
    *n = count;
    *out = data;
    rc = 0;
  } while (0);
  fclose(f);
  return rc;
}

typedef struct {
  FILE* ark;
  FILE* scp;  // may be null
  char* ark_path;
} KiWriter;

KiWriter* ki_writer_open(const char* ark_path, const char* scp_path) {
  FILE* ark = fopen(ark_path, "wb");
  if (!ark) return nullptr;
  FILE* scp = nullptr;
  if (scp_path && scp_path[0]) {
    scp = fopen(scp_path, "w");
    if (!scp) {
      fclose(ark);
      return nullptr;
    }
  }
  KiWriter* w = (KiWriter*)malloc(sizeof(KiWriter));
  w->ark = ark;
  w->scp = scp;
  w->ark_path = strdup(ark_path);
  return w;
}

static long ki_begin_entry(KiWriter* w, const char* key) {
  fwrite(key, 1, strlen(key), w->ark);
  fputc(' ', w->ark);
  long offset = ftell(w->ark);
  fputc('\0', w->ark);
  fputc('B', w->ark);
  if (w->scp) fprintf(w->scp, "%s %s:%ld\n", key, w->ark_path, offset);
  return offset;
}

int ki_writer_put_matrix(KiWriter* w, const char* key, const float* data,
                         int32_t rows, int32_t cols) {
  if (!w) return 1;
  ki_begin_entry(w, key);
  fwrite("FM ", 1, 3, w->ark);
  write_basic_int32(w->ark, rows);
  write_basic_int32(w->ark, cols);
  fwrite(data, sizeof(float), (size_t)rows * cols, w->ark);
  return ferror(w->ark) ? 2 : 0;
}

namespace {

inline uint16_t cm_float_to_uint16(const CmGlobalHeader& h, float v) {
  float f = (v - h.min_value) / (h.range > 0 ? h.range : 1.0f);
  if (f < 0) f = 0;
  if (f > 1) f = 1;
  return (uint16_t)(f * 65535.0f + 0.499f);
}

inline uint8_t cm_float_to_char(float p0, float p25, float p75, float p100,
                                float value) {
  if (value < p25) {
    if (p25 <= p0) return 0;
    float f = (value - p0) / (p25 - p0) * 64.0f + 0.5f;
    if (f < 0) f = 0;
    if (f > 64) f = 64;
    return (uint8_t)f;
  } else if (value < p75) {
    float f = (value - p25) / (p75 - p25) * 128.0f + 64.5f;
    if (f < 64) f = 64;
    if (f > 192) f = 192;
    return (uint8_t)f;
  } else {
    if (p100 <= p75) return 192;
    float f = (value - p75) / (p100 - p75) * 63.0f + 192.5f;
    if (f < 192) f = 192;
    if (f > 255) f = 255;
    return (uint8_t)f;
  }
}

}  // namespace

// CompressedMatrix format 1 writer (uint8 per element, per-column
// percentile headers).  Readable by Kaldi's CompressedMatrix and by
// ki_read_matrix above; quantization error is ~range/256 per band.
int ki_writer_put_compressed_matrix(KiWriter* w, const char* key,
                                    const float* data, int32_t rows,
                                    int32_t cols) {
  if (!w) return 1;
  ki_begin_entry(w, key);
  fwrite("CM ", 1, 3, w->ark);
  CmGlobalHeader h;
  float mn = data[0], mx = data[0];
  for (int64_t i = 0; i < (int64_t)rows * cols; i++) {
    if (data[i] < mn) mn = data[i];
    if (data[i] > mx) mx = data[i];
  }
  h.min_value = mn;
  h.range = (mx > mn) ? (mx - mn) : 1.0f;
  h.num_rows = rows;
  h.num_cols = cols;
  fwrite(&h, sizeof(h), 1, w->ark);

  std::vector<CmPerColHeader> headers(cols);
  std::vector<float> col(rows);
  std::vector<uint8_t> bytes((size_t)rows * cols);
  for (int32_t c = 0; c < cols; c++) {
    for (int32_t r = 0; r < rows; r++) col[r] = data[(size_t)r * cols + c];
    std::vector<float> sorted(col);
    std::sort(sorted.begin(), sorted.end());
    uint16_t q0 = cm_float_to_uint16(h, sorted[0]);
    uint16_t q25 = cm_float_to_uint16(h, sorted[rows / 4]);
    uint16_t q75 = cm_float_to_uint16(h, sorted[(3 * rows) / 4]);
    uint16_t q100 = cm_float_to_uint16(h, sorted[rows - 1]);
    // enforce strictly increasing like Kaldi (degenerate columns)
    if (q25 <= q0) q25 = q0 + 1;
    if (q75 <= q25) q75 = q25 + 1;
    if (q100 <= q75) q100 = q75 + 1;
    headers[c] = {q0, q25, q75, q100};
    float p0 = cm_uint16_to_float(h, q0);
    float p25 = cm_uint16_to_float(h, q25);
    float p75 = cm_uint16_to_float(h, q75);
    float p100 = cm_uint16_to_float(h, q100);
    uint8_t* out = &bytes[(size_t)c * rows];
    for (int32_t r = 0; r < rows; r++)
      out[r] = cm_float_to_char(p0, p25, p75, p100, col[r]);
  }
  fwrite(headers.data(), sizeof(CmPerColHeader), cols, w->ark);
  fwrite(bytes.data(), 1, bytes.size(), w->ark);
  return ferror(w->ark) ? 2 : 0;
}

// CompressedMatrix format 2 writer (uint16 per element, row-major,
// global-header linear quantization — kaldi kTwoByte).  ~range/65535
// absolute error; the format modern Kaldi picks for small matrices.
int ki_writer_put_compressed_matrix2(KiWriter* w, const char* key,
                                     const float* data, int32_t rows,
                                     int32_t cols) {
  if (!w) return 1;
  ki_begin_entry(w, key);
  fwrite("CM2 ", 1, 4, w->ark);
  CmGlobalHeader h;
  float mn = data[0], mx = data[0];
  for (int64_t i = 0; i < (int64_t)rows * cols; i++) {
    if (data[i] < mn) mn = data[i];
    if (data[i] > mx) mx = data[i];
  }
  h.min_value = mn;
  h.range = (mx > mn) ? (mx - mn) : 1.0f;
  h.num_rows = rows;
  h.num_cols = cols;
  fwrite(&h, sizeof(h), 1, w->ark);
  size_t n = (size_t)rows * cols;
  std::vector<uint16_t> v(n);
  for (size_t i = 0; i < n; i++) v[i] = cm_float_to_uint16(h, data[i]);
  fwrite(v.data(), 2, n, w->ark);
  return ferror(w->ark) ? 2 : 0;
}

int ki_writer_put_vector(KiWriter* w, const char* key, const float* data,
                         int32_t n) {
  if (!w) return 1;
  ki_begin_entry(w, key);
  fwrite("FV ", 1, 3, w->ark);
  write_basic_int32(w->ark, n);
  fwrite(data, sizeof(float), (size_t)n, w->ark);
  return ferror(w->ark) ? 2 : 0;
}

int ki_writer_put_int_vector(KiWriter* w, const char* key,
                             const int32_t* data, int32_t n) {
  if (!w) return 1;
  ki_begin_entry(w, key);
  write_basic_int32(w->ark, n);
  fwrite(data, sizeof(int32_t), (size_t)n, w->ark);
  return ferror(w->ark) ? 2 : 0;
}

void ki_writer_close(KiWriter* w) {
  if (!w) return;
  fclose(w->ark);
  if (w->scp) fclose(w->scp);
  free(w->ark_path);
  free(w);
}

}  // extern "C"
