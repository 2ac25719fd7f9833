// fastload: native data-path for the ShapeNet reader.
//
// The training host is data-bound at large batch sizes (the reference leans
// on 8 torch DataLoader worker *processes*, reference configs/thousand/
// special.py:31 + datasets.py:263); this library replaces that with an
// in-process C++ thread pool that decodes 16-bit RGBA PNGs (zlib inflate +
// scanline unfilter), box-resizes, and writes normalized float32 tensors
// straight into the caller's batch buffer — no Python in the per-image path.
//
// Exposed C ABI (ctypes-friendly):
//   int fastload_png16(const char* path, float* out, int out_size,
//                      float scale, float shift);
//   int fastload_batch(const char** paths, int n, float* out, int out_size,
//                      float scale, float shift, int n_threads);
//   int fastload_exr_depth(const char* path, float* out, int out_size);
//   int fastload_exr_depth_batch(const char** paths, int n, float* out,
//                                int out_size, int n_threads);
// Returns 0 on success; negative error codes otherwise. PNG `out` is
// (n, out_size, out_size, 3) float32, value = pixel/65535 * scale + shift.
// EXR `out` is (n, out_size, out_size) float32 z-depth with the reference's
// background convention (datasets.py:183-216): 65504 (half max) -> inf
// before the area resize, non-finite zeroed after — matching
// data/exr.py::read_exr_depth. Supports single-part scanline files with
// HALF/FLOAT channels and NONE/RLE/ZIPS/ZIP compression.
//
// Build: g++ -O3 -shared -fPIC -o libfastload.so fastload.cc -lz -lpthread

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdlib>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrInflate = -3;
constexpr int kErrUnsupported = -4;

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;     // 3 (RGB) or 4 (RGBA)
  int bit_depth = 0;    // 8 or 16
  std::vector<uint8_t> pixels;  // unfiltered raw scanline bytes
};

uint32_t ReadBE32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int PaethPredictor(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode a PNG file into raw unfiltered scanlines.
int DecodePng(const char* path, Image* img) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(size);
  if (fread(data.data(), 1, size, f) != size_t(size)) {
    fclose(f);
    return kErrOpen;
  }
  fclose(f);

  static const uint8_t kMagic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (size < 8 || memcmp(data.data(), kMagic, 8) != 0) return kErrFormat;

  std::vector<uint8_t> idat;
  size_t pos = 8;
  int color_type = -1;
  while (pos + 12 <= data.size()) {
    const uint32_t len = ReadBE32(&data[pos]);
    // the chunk length is file-controlled: payload + 4-byte CRC must fit
    // inside the buffer before anything dereferences it
    if (len > data.size() - pos - 12) return kErrFormat;
    const char* type = reinterpret_cast<const char*>(&data[pos + 4]);
    const uint8_t* payload = &data[pos + 8];
    if (memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return kErrFormat;
      img->width = ReadBE32(payload);
      img->height = ReadBE32(payload + 4);
      img->bit_depth = payload[8];
      color_type = payload[9];
      if (payload[10] != 0 || payload[11] != 0 || payload[12] != 0)
        return kErrUnsupported;  // non-deflate / interlaced
      if (color_type == 2) img->channels = 3;
      else if (color_type == 6) img->channels = 4;
      else return kErrUnsupported;
      if (img->bit_depth != 8 && img->bit_depth != 16) return kErrUnsupported;
      // dataset images are ≤ a few k²; reject absurd dims before the
      // (stride+1)*height allocation can be attacker-sized
      if (img->width <= 0 || img->height <= 0 || img->width > (1 << 16) ||
          img->height > (1 << 16))
        return kErrFormat;
    } else if (memcmp(type, "IDAT", 4) == 0) {
      if (color_type < 0) return kErrFormat;  // IDAT before IHDR
      idat.insert(idat.end(), payload, payload + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + size_t(len);
  }
  if (img->width <= 0 || img->height <= 0 || idat.empty()) return kErrFormat;

  const int bytes_per_px = img->channels * img->bit_depth / 8;
  const size_t stride = size_t(img->width) * bytes_per_px;
  std::vector<uint8_t> raw((stride + 1) * img->height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
    return kErrInflate;
  // a truncated-but-valid deflate stream inflates short: the unfilter pass
  // would read uninitialized scanlines
  if (raw_len != raw.size()) return kErrFormat;

  // undo per-scanline filters
  img->pixels.resize(stride * img->height);
  const int bpp = bytes_per_px;
  for (int y = 0; y < img->height; ++y) {
    const uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = &raw[(stride + 1) * y + 1];
    uint8_t* dst = &img->pixels[stride * y];
    const uint8_t* prev = y > 0 ? &img->pixels[stride * (y - 1)] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      const int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
      const int b = prev ? prev[x] : 0;
      const int c = (prev && x >= size_t(bpp)) ? prev[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += PaethPredictor(a, b, c); break;
        default: return kErrFormat;
      }
      dst[x] = uint8_t(v);
    }
  }
  return 0;
}

inline float PixelValue(const Image& img, int y, int x, int c) {
  const int bytes_per_px = img.channels * img.bit_depth / 8;
  const size_t stride = size_t(img.width) * bytes_per_px;
  if (img.bit_depth == 16) {
    const uint8_t* p =
        &img.pixels[stride * y + size_t(x) * bytes_per_px + c * 2];
    return float((uint32_t(p[0]) << 8) | p[1]) / 65535.0f;
  }
  return float(img.pixels[stride * y + size_t(x) * bytes_per_px + c]) / 255.0f;
}

// cv2-matched single-channel resample, mirroring the python loaders'
// mode selection (data/shapenet.py:41, data/exr.py:168):
//   out_size > src height  -> INTER_LINEAR (half-pixel-center bilinear,
//                             replicated borders)
//   otherwise              -> INTER_AREA (exact fractional-area average;
//                             reduces to box averaging at integer ratios,
//                             identity at equal size)
// Float arithmetic throughout — cv2's fixed-point path for integer images
// differs by <1 LSB of the source type.
template <typename GetPixel, typename PutPixel>
void ResizeCv2(int w, int h, int out_size, const GetPixel& get,
               const PutPixel& put) {
  if (out_size > h) {  // INTER_LINEAR
    const float fy = float(h) / out_size;
    const float fx = float(w) / out_size;
    for (int oy = 0; oy < out_size; ++oy) {
      const float sy = (oy + 0.5f) * fy - 0.5f;
      const int yf = int(std::floor(sy));
      const float dy = sy - yf;
      const int y0 = std::min(std::max(yf, 0), h - 1);
      const int y1 = std::min(std::max(yf + 1, 0), h - 1);
      for (int ox = 0; ox < out_size; ++ox) {
        const float sx = (ox + 0.5f) * fx - 0.5f;
        const int xf = int(std::floor(sx));
        const float dx = sx - xf;
        const int x0 = std::min(std::max(xf, 0), w - 1);
        const int x1 = std::min(std::max(xf + 1, 0), w - 1);
        const float top = (1.0f - dx) * get(y0, x0) + dx * get(y0, x1);
        const float bot = (1.0f - dx) * get(y1, x0) + dx * get(y1, x1);
        put(oy, ox, (1.0f - dy) * top + dy * bot);
      }
    }
    return;
  }
  // INTER_AREA: average over the exact source rectangle
  // [ox·fx, (ox+1)·fx) × [oy·fy, (oy+1)·fy) with fractional edge weights.
  const double fy = double(h) / out_size;
  const double fx = double(w) / out_size;
  for (int oy = 0; oy < out_size; ++oy) {
    const double sy0 = oy * fy, sy1 = (oy + 1) * fy;
    const int y0 = int(sy0);
    const int y1 = std::min(int(std::ceil(sy1)), h);
    for (int ox = 0; ox < out_size; ++ox) {
      const double sx0 = ox * fx, sx1 = (ox + 1) * fx;
      const int x0 = int(sx0);
      const int x1 = std::min(int(std::ceil(sx1)), w);
      double acc = 0.0, wsum = 0.0;
      for (int y = y0; y < y1; ++y) {
        const double wy =
            std::min<double>(y + 1, sy1) - std::max<double>(y, sy0);
        for (int x = x0; x < x1; ++x) {
          const double wx =
              std::min<double>(x + 1, sx1) - std::max<double>(x, sx0);
          acc += wy * wx * get(y, x);
          wsum += wy * wx;
        }
      }
      put(oy, ox, float(acc / wsum));
    }
  }
}

// Resize the RGB channels into (out_size, out_size, 3) with affine
// normalization, cv2-equivalent interpolation (ResizeCv2).
void ResizeNormalize(const Image& img, float* out, int out_size, float scale,
                     float shift) {
  for (int c = 0; c < 3; ++c) {
    ResizeCv2(
        img.width, img.height, out_size,
        [&](int y, int x) { return PixelValue(img, y, x, c); },
        [&](int oy, int ox, float v) {
          out[(size_t(oy) * out_size + ox) * 3 + c] = v * scale + shift;
        });
  }
}

// ---------------------------------------------------------------------------
// EXR depth decoding (mirror of conditioned_nerf_gan_tpu/data/exr.py)
// ---------------------------------------------------------------------------

float HalfToFloat(uint16_t h) {
  const uint32_t sign = uint32_t(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal half -> normalized float
      exp = 127 - 15 + 1;
      while ((mant & 0x400) == 0) {
        mant <<= 1;
        --exp;
      }
      mant &= 0x3ff;
      bits = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7f800000 | (mant << 13);  // inf / nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  memcpy(&out, &bits, 4);
  return out;
}

// Undo the EXR zip/rle postprocess: delta predictor + byte-plane interleave.
void UnpredictInterleave(std::vector<uint8_t>* data) {
  std::vector<uint8_t>& d = *data;
  for (size_t i = 1; i < d.size(); ++i) d[i] = uint8_t(d[i] + d[i - 1] - 128);
  std::vector<uint8_t> inter(d.size());
  const size_t half = (d.size() + 1) / 2;
  size_t a = 0, b = half, o = 0;
  while (o < d.size()) {
    inter[o++] = d[a++];
    if (o < d.size()) inter[o++] = d[b++];
  }
  d.swap(inter);
}

int RleDecompress(const uint8_t* in, size_t in_len, std::vector<uint8_t>* out,
                  size_t expected) {
  out->clear();
  out->reserve(expected);
  size_t i = 0;
  while (i < in_len) {
    const int8_t count = int8_t(in[i++]);
    if (count < 0) {
      const size_t run = size_t(-int(count));
      if (i + run > in_len || out->size() + run > expected) return kErrFormat;
      out->insert(out->end(), in + i, in + i + run);
      i += run;
    } else {
      if (i >= in_len) return kErrFormat;
      const size_t run = size_t(count) + 1;
      if (out->size() + run > expected) return kErrFormat;
      out->insert(out->end(), run, in[i++]);
    }
  }
  return 0;
}

struct ExrChannel {
  char name[32];
  int pixel_type;  // 0=uint32 1=half 2=float
};

// Decode the R channel (or the alphabetically-first one) of a single-part
// scanline EXR into (height, width) float32.
int DecodeExrDepth(const char* path, std::vector<float>* out_px, int* out_w,
                   int* out_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(size);
  if (size < 8 || fread(data.data(), 1, size, f) != size_t(size)) {
    fclose(f);
    return kErrOpen;
  }
  fclose(f);

  auto rd32 = [&](size_t p) -> uint32_t {
    return uint32_t(data[p]) | (uint32_t(data[p + 1]) << 8) |
           (uint32_t(data[p + 2]) << 16) | (uint32_t(data[p + 3]) << 24);
  };
  if (rd32(0) != 20000630u) return kErrFormat;
  if (rd32(4) & 0x200) return kErrUnsupported;  // tiled

  auto read_cstr = [&](size_t* p, char* buf, size_t cap) -> bool {
    size_t n = 0;
    while (*p < data.size() && data[*p] != 0) {
      if (n + 1 < cap) buf[n++] = char(data[*p]);
      ++(*p);
    }
    if (*p >= data.size()) return false;
    buf[n] = 0;
    ++(*p);
    return true;
  };

  std::vector<ExrChannel> channels;
  int compression = 0;
  int x_min = 0, y_min = 0, x_max = -1, y_max = -1;
  size_t pos = 8;
  char name[64], type[64];
  for (;;) {
    if (!read_cstr(&pos, name, sizeof(name))) return kErrFormat;
    if (name[0] == 0) break;
    if (!read_cstr(&pos, type, sizeof(type))) return kErrFormat;
    if (pos + 4 > data.size()) return kErrFormat;
    const uint32_t attr_len = rd32(pos);
    pos += 4;
    if (attr_len > data.size() - pos) return kErrFormat;
    const size_t payload = pos;
    if (strcmp(name, "channels") == 0) {
      size_t cp = payload;
      while (cp < payload + attr_len && data[cp] != 0) {
        ExrChannel ch;
        if (!read_cstr(&cp, ch.name, sizeof(ch.name))) return kErrFormat;
        if (cp + 16 > payload + attr_len) return kErrFormat;
        ch.pixel_type = int(rd32(cp));
        if (ch.pixel_type < 0 || ch.pixel_type > 2) return kErrUnsupported;
        cp += 16;  // type + pLinear/reserved + xSampling + ySampling
        channels.push_back(ch);
      }
    } else if (strcmp(name, "dataWindow") == 0) {
      if (attr_len < 16) return kErrFormat;
      x_min = int(rd32(payload));
      y_min = int(rd32(payload + 4));
      x_max = int(rd32(payload + 8));
      y_max = int(rd32(payload + 12));
    } else if (strcmp(name, "compression") == 0) {
      if (attr_len < 1) return kErrFormat;
      compression = data[payload];
    }
    pos += attr_len;
  }
  const int width = x_max - x_min + 1;
  const int height = y_max - y_min + 1;
  if (width <= 0 || height <= 0 || width > (1 << 16) || height > (1 << 16) ||
      channels.empty())
    return kErrFormat;
  int lines_per_chunk;
  switch (compression) {
    case 0: case 1: case 2: lines_per_chunk = 1; break;   // NONE/RLE/ZIPS
    case 3: lines_per_chunk = 16; break;                  // ZIP
    default: return kErrUnsupported;
  }
  // EXR stores channels alphabetically; pick "R" else the first
  std::sort(channels.begin(), channels.end(),
            [](const ExrChannel& a, const ExrChannel& b) {
              return strcmp(a.name, b.name) < 0;
            });
  size_t target = 0;
  for (size_t i = 0; i < channels.size(); ++i)
    if (strcmp(channels[i].name, "R") == 0) target = i;
  static const int kTypeBytes[3] = {4, 2, 4};

  const int n_chunks = (height + lines_per_chunk - 1) / lines_per_chunk;
  pos += size_t(n_chunks) * 8;  // skip the scanline offset table
  size_t row_bytes = 0, target_off = 0;
  for (size_t i = 0; i < channels.size(); ++i) {
    if (i == target) target_off = row_bytes;
    row_bytes += size_t(width) * kTypeBytes[channels[i].pixel_type];
  }

  out_px->assign(size_t(width) * height, 0.0f);
  *out_w = width;
  *out_h = height;
  std::vector<uint8_t> chunk;
  for (int ci = 0; ci < n_chunks; ++ci) {
    if (pos + 8 > data.size()) return kErrFormat;
    const int y = int(rd32(pos));
    const uint32_t nbytes = rd32(pos + 4);
    pos += 8;
    if (nbytes > data.size() - pos) return kErrFormat;
    const int n_lines = std::min(lines_per_chunk, y_max - y + 1);
    if (y < y_min || n_lines <= 0) return kErrFormat;
    const size_t expected = row_bytes * n_lines;
    const uint8_t* body = &data[pos];
    size_t body_len = nbytes;
    if ((compression == 2 || compression == 3) && nbytes < expected) {
      chunk.resize(expected);
      uLongf raw_len = expected;
      if (uncompress(chunk.data(), &raw_len, body, nbytes) != Z_OK ||
          raw_len != expected)
        return kErrInflate;
      UnpredictInterleave(&chunk);
      body = chunk.data();
      body_len = expected;
    } else if (compression == 1 && nbytes < expected) {
      std::vector<uint8_t> rle;
      if (RleDecompress(body, nbytes, &rle, expected) != 0) return kErrFormat;
      if (rle.size() != expected) return kErrFormat;
      chunk.swap(rle);
      UnpredictInterleave(&chunk);
      body = chunk.data();
      body_len = expected;
    }
    if (body_len < expected) return kErrFormat;
    pos += nbytes;
    const int tb = kTypeBytes[channels[target].pixel_type];
    for (int line = 0; line < n_lines; ++line) {
      const uint8_t* src = body + row_bytes * line + target_off;
      float* dst = out_px->data() + size_t(y - y_min + line) * width;
      if (channels[target].pixel_type == 1) {
        for (int x = 0; x < width; ++x) {
          uint16_t h;
          memcpy(&h, src + size_t(x) * tb, 2);
          dst[x] = HalfToFloat(h);
        }
      } else if (channels[target].pixel_type == 2) {
        memcpy(dst, src, size_t(width) * 4);
      } else {  // uint32
        for (int x = 0; x < width; ++x) {
          uint32_t v;
          memcpy(&v, src + size_t(x) * tb, 4);
          dst[x] = float(v);
        }
      }
    }
  }
  return 0;
}

// cv2-equivalent resize (ResizeCv2) of a single-channel depth map;
// inf-poisoned outputs collapse to 0 afterwards (the background
// convention, matching data/exr.py: 65504→inf before resize, non-finite
// zeroed after).
void ResizeDepth(const std::vector<float>& px, int w, int h, float* out,
                 int out_size) {
  ResizeCv2(
      w, h, out_size,
      [&](int y, int x) { return px[size_t(y) * w + x]; },
      [&](int oy, int ox, float v) {
        out[size_t(oy) * out_size + ox] = std::isfinite(v) ? v : 0.0f;
      });
}

}  // namespace

extern "C" {

int fastload_png16(const char* path, float* out, int out_size, float scale,
                   float shift) {
  Image img;
  const int rc = DecodePng(path, &img);
  if (rc != 0) return rc;
  ResizeNormalize(img, out, out_size, scale, shift);
  return 0;
}

int fastload_exr_depth(const char* path, float* out, int out_size) {
  std::vector<float> px;
  int w = 0, h = 0;
  const int rc = DecodeExrDepth(path, &px, &w, &h);
  if (rc != 0) return rc;
  // the reference's background convention (datasets.py:183-216): the half
  // max 65504 marks background; mark it inf BEFORE the resize so any
  // averaged window touching background collapses to 0 afterwards
  for (float& v : px)
    if (v == 65504.0f) v = std::numeric_limits<float>::infinity();
  ResizeDepth(px, w, h, out, out_size);
  return 0;
}

int fastload_exr_depth_batch(const char** paths, int n, float* out,
                             int out_size, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> status(0);
  const size_t per_img = size_t(out_size) * out_size;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      const int rc = fastload_exr_depth(paths[i], out + per_img * i, out_size);
      if (rc != 0) status.store(rc);
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return status.load();
}

int fastload_batch(const char** paths, int n, float* out, int out_size,
                   float scale, float shift, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> status(0);
  const size_t per_img = size_t(out_size) * out_size * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      const int rc =
          fastload_png16(paths[i], out + per_img * i, out_size, scale, shift);
      if (rc != 0) status.store(rc);
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return status.load();
}

}  // extern "C"
