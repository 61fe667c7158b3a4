// Native data-loading core: PFM codec, resampling, fused normalization.
//
// The reference delegates its below-Python I/O work to torch DataLoader
// workers + cv2 (datasets/data_io.py, dtu_dataset_ms.py pre_resize). This
// framework's host-side input pipeline calls into this library instead
// (mvsformer_tpu/data/native.py via ctypes, with a numpy fallback): PFM
// decode, nearest/area resampling and fused uint8->normalized-float
// conversion, all multithreaded over rows.
//
// Build: `make -C native` -> libmvsio.so.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Simple parallel-for over [0, n) with hardware threads.
template <typename F>
void parallel_rows(int n, F&& fn) {
  int nthreads = static_cast<int>(std::thread::hardware_concurrency());
  nthreads = std::max(1, std::min(nthreads, n));
  if (nthreads == 1 || n < 64) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) {
    pool.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

bool read_line(FILE* f, char* buf, int cap) {
  return std::fgets(buf, cap, f) != nullptr;
}

}  // namespace

extern "C" {

// ---- PFM codec (spec: datasets/data_io.py:7-72 — header "Pf"/"PF", dims,
// scale sign = endianness, rows stored bottom-up) ----------------------------

// Returns 0 on success. Fills h, w, channels (1 or 3).
int mvsio_pfm_dims(const char* path, int* h, int* w, int* channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  char line[256];
  if (!read_line(f, line, sizeof line)) { std::fclose(f); return 2; }
  int ch;
  if (line[0] == 'P' && line[1] == 'F') ch = 3;
  else if (line[0] == 'P' && line[1] == 'f') ch = 1;
  else { std::fclose(f); return 3; }
  if (!read_line(f, line, sizeof line)) { std::fclose(f); return 2; }
  int ww, hh;
  if (std::sscanf(line, "%d %d", &ww, &hh) != 2) { std::fclose(f); return 4; }
  *h = hh; *w = ww; *channels = ch;
  std::fclose(f);
  return 0;
}

// out must hold h*w*channels floats; returns 0 on success. Output is top-down.
int mvsio_read_pfm(const char* path, float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  char line[256];
  if (!read_line(f, line, sizeof line)) { std::fclose(f); return 2; }
  int ch = (line[1] == 'F') ? 3 : 1;
  if (!read_line(f, line, sizeof line)) { std::fclose(f); return 2; }
  int w, h;
  if (std::sscanf(line, "%d %d", &w, &h) != 2) { std::fclose(f); return 4; }
  if (!read_line(f, line, sizeof line)) { std::fclose(f); return 2; }
  const double scale = std::atof(line);
  const bool little = scale < 0.0;

  const size_t row_elems = static_cast<size_t>(w) * ch;
  std::vector<float> raw(static_cast<size_t>(h) * row_elems);
  if (std::fread(raw.data(), sizeof(float), raw.size(), f) != raw.size()) {
    std::fclose(f);
    return 5;
  }
  std::fclose(f);

  const uint16_t probe = 1;
  const bool host_little = *reinterpret_cast<const uint8_t*>(&probe) == 1;
  const bool swap = little != host_little;

  parallel_rows(h, [&](int y) {
    // PFM rows are bottom-up.
    const float* src = raw.data() + static_cast<size_t>(h - 1 - y) * row_elems;
    float* dst = out + static_cast<size_t>(y) * row_elems;
    if (!swap) {
      std::memcpy(dst, src, row_elems * sizeof(float));
    } else {
      for (size_t i = 0; i < row_elems; ++i) {
        uint32_t v;
        std::memcpy(&v, &src[i], 4);
        v = __builtin_bswap32(v);
        std::memcpy(&dst[i], &v, 4);
      }
    }
  });
  return 0;
}

// out layout matches read: top-down rows; writes bottom-up little-endian PFM.
int mvsio_write_pfm(const char* path, const float* data, int h, int w) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  std::fprintf(f, "Pf\n%d %d\n-1.0\n", w, h);
  for (int y = h - 1; y >= 0; --y) {
    if (std::fwrite(data + static_cast<size_t>(y) * w, sizeof(float), w, f) !=
        static_cast<size_t>(w)) {
      std::fclose(f);
      return 5;
    }
  }
  std::fclose(f);
  return 0;
}

// ---- Resampling ------------------------------------------------------------

// Nearest-neighbour resize (torch 'nearest': src_idx = floor(i * in/out)).
void mvsio_resize_nearest_f32(const float* src, int h, int w, int c,
                              float* dst, int oh, int ow) {
  const double sy = static_cast<double>(h) / oh;
  const double sx = static_cast<double>(w) / ow;
  parallel_rows(oh, [&](int y) {
    const int iy = std::min(static_cast<int>(y * sy), h - 1);
    const float* srow = src + (static_cast<size_t>(iy) * w) * c;
    float* drow = dst + (static_cast<size_t>(y) * ow) * c;
    for (int x = 0; x < ow; ++x) {
      const int ix = std::min(static_cast<int>(x * sx), w - 1);
      for (int k = 0; k < c; ++k) drow[x * c + k] = srow[ix * c + k];
    }
  });
}

// Box-filter ("area") downscale for uint8 images (cv2 INTER_AREA-style
// averaging over the source footprint of each output pixel).
void mvsio_resize_area_u8(const uint8_t* src, int h, int w, int c,
                          uint8_t* dst, int oh, int ow) {
  const double sy = static_cast<double>(h) / oh;
  const double sx = static_cast<double>(w) / ow;
  parallel_rows(oh, [&](int y) {
    const int y0 = static_cast<int>(y * sy);
    const int y1 = std::max(y0 + 1, std::min(static_cast<int>((y + 1) * sy), h));
    uint8_t* drow = dst + (static_cast<size_t>(y) * ow) * c;
    for (int x = 0; x < ow; ++x) {
      const int x0 = static_cast<int>(x * sx);
      const int x1 = std::max(x0 + 1, std::min(static_cast<int>((x + 1) * sx), w));
      for (int k = 0; k < c; ++k) {
        uint32_t acc = 0;
        for (int yy = y0; yy < y1; ++yy) {
          const uint8_t* srow = src + (static_cast<size_t>(yy) * w) * c;
          for (int xx = x0; xx < x1; ++xx) acc += srow[xx * c + k];
        }
        const int cnt = (y1 - y0) * (x1 - x0);
        drow[x * c + k] = static_cast<uint8_t>((acc + cnt / 2) / cnt);
      }
    }
  });
}

// ---- Fused conversion ------------------------------------------------------

// uint8 HWC -> float32 HWC: out = (u/255 - mean[k]) / std[k].
void mvsio_normalize_u8(const uint8_t* src, int h, int w, int c,
                        const float* mean, const float* stddev, float* dst) {
  float scale[8], bias[8];
  for (int k = 0; k < c && k < 8; ++k) {
    scale[k] = 1.0f / (255.0f * stddev[k]);
    bias[k] = -mean[k] / stddev[k];
  }
  parallel_rows(h, [&](int y) {
    const uint8_t* srow = src + (static_cast<size_t>(y) * w) * c;
    float* drow = dst + (static_cast<size_t>(y) * w) * c;
    for (int i = 0; i < w * c; ++i) {
      const int k = i % c;
      drow[i] = srow[i] * scale[k] + bias[k];
    }
  });
}

}  // extern "C"
