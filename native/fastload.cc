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
// Returns 0 on success; negative error codes otherwise. `out` is
// (n, out_size, out_size, 3) float32, value = pixel/65535 * scale + shift.
//
// Build: g++ -O3 -shared -fPIC -o libfastload.so fastload.cc -lz -lpthread

#include <zlib.h>

#include <atomic>
#include <cstdlib>
#include <cstdint>
#include <cstdio>
#include <cstring>
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

// Area-average resize of the RGB channels into (out_size, out_size, 3) with
// affine normalization — matching cv2.INTER_AREA for integer downscales and
// approximating INTER_LINEAR otherwise.
void ResizeNormalize(const Image& img, float* out, int out_size, float scale,
                     float shift) {
  const float fy = float(img.height) / out_size;
  const float fx = float(img.width) / out_size;
  for (int oy = 0; oy < out_size; ++oy) {
    const int y0 = int(oy * fy);
    const int y1 = std::max(y0 + 1, std::min(int((oy + 1) * fy + 0.9999f),
                                             img.height));
    for (int ox = 0; ox < out_size; ++ox) {
      const int x0 = int(ox * fx);
      const int x1 = std::max(x0 + 1, std::min(int((ox + 1) * fx + 0.9999f),
                                               img.width));
      for (int c = 0; c < 3; ++c) {
        float acc = 0.0f;
        for (int y = y0; y < y1; ++y)
          for (int x = x0; x < x1; ++x) acc += PixelValue(img, y, x, c);
        const float mean = acc / float((y1 - y0) * (x1 - x0));
        out[(size_t(oy) * out_size + ox) * 3 + c] = mean * scale + shift;
      }
    }
  }
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
