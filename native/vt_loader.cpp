// Native data-loader core for vislam_tpu.
//
// Role of the reference's C++ ingestion layer (ImageReader/GroundTruth/
// DataReader, /root/reference/src/ImageReader.cpp, src/GroundTruth.cpp,
// src/DataReader.cpp), rebuilt as a standalone C library with a threaded
// prefetch ring: grayscale PNG decode via libpng, '#'-comment CSV parsing,
// and an N-deep background decode pipeline so host IO fully overlaps device
// compute. Bound from Python via ctypes (vislam_tpu/data/native_loader.py).
//
// Build: g++ -O3 -shared -fPIC -o libvtloader.so vt_loader.cpp -lpng -lpthread

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ------------------------------------------------------------------ CSV ----
// Comma CSV -> double array, skipping '#' comments and blank lines.
// Returns 0 on success; caller frees *out with vt_free.
int vt_load_csv(const char* path, double** out, long* rows, long* cols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<double> data;
  long ncols = -1, nrows = 0;
  char line[16384];
  while (std::fgets(line, sizeof(line), f)) {
    char* p = line;
    while (*p == ' ' || *p == '\t') ++p;
    if (*p == '#' || *p == '\n' || *p == '\r' || *p == '\0') continue;
    long c = 0;
    while (*p) {
      char* end = nullptr;
      double v = std::strtod(p, &end);
      if (end == p) break;
      data.push_back(v);
      ++c;
      p = end;
      while (*p == ',' || *p == ';' || *p == ' ' || *p == '\t') ++p;
      if (*p == '\n' || *p == '\r') break;
    }
    if (c == 0) continue;
    if (ncols < 0) ncols = c;
    if (c != ncols) {  // ragged row: pad with zeros to keep the matrix shape
      for (long k = c; k < ncols; ++k) data.push_back(0.0);
    }
    ++nrows;
  }
  std::fclose(f);
  if (nrows == 0 || ncols <= 0) return -2;
  double* buf = static_cast<double*>(std::malloc(sizeof(double) * nrows * ncols));
  if (!buf) return -3;
  std::memcpy(buf, data.data(), sizeof(double) * nrows * ncols);
  *out = buf;
  *rows = nrows;
  *cols = ncols;
  return 0;
}

void vt_free(void* p) { std::free(p); }

// ------------------------------------------------------------------ PNG ----
// Grayscale PNG decode (8-bit output; 16-bit inputs are downshifted; RGB(A)
// inputs are luma-converted). Returns 0 on success; caller frees with vt_free.
int vt_load_png_gray(const char* path, unsigned char** out, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(f);
    return -2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(f);
    return -2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return -3;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_PALETTE ||
      color == PNG_COLOR_TYPE_RGB_ALPHA)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);

  unsigned char* buf = static_cast<unsigned char*>(std::malloc(width * height));
  if (!buf) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return -4;
  }
  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; ++y) rows[y] = buf + y * width;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  *out = buf;
  *w = static_cast<int>(width);
  *h = static_cast<int>(height);
  return 0;
}

// --------------------------------------------------------- prefetch ring ---
// Background thread pool decoding images ahead of the consumer, keyed by
// sequential index (the dataset's access pattern). The role of the
// reference's synchronous per-frame imread (DataReader.cpp:106) — made
// asynchronous.

struct Prefetcher {
  std::vector<std::string> paths;
  int depth;
  std::unordered_map<long, std::pair<unsigned char*, std::pair<int, int>>> ready;
  std::deque<long> want;
  long next_issue = 0;
  long cursor = 0;
  std::mutex mu;
  std::condition_variable cv_worker, cv_consumer;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  explicit Prefetcher(std::vector<std::string> p, int d, int nthreads)
      : paths(std::move(p)), depth(d) {
    for (int i = 0; i < nthreads; ++i)
      workers.emplace_back([this] { this->run(); });
  }

  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> g(mu);
      stop = true;
    }
    cv_worker.notify_all();
    for (auto& t : workers) t.join();
    for (auto& kv : ready) std::free(kv.second.first);
  }

  void run() {
    for (;;) {
      long idx = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_worker.wait(lk, [&] {
          return stop ||
                 (next_issue < static_cast<long>(paths.size()) &&
                  next_issue < cursor + depth);
        });
        if (stop) return;
        idx = next_issue++;
      }
      unsigned char* buf = nullptr;
      int w = 0, h = 0;
      int rc = vt_load_png_gray(paths[idx].c_str(), &buf, &w, &h);
      {
        std::lock_guard<std::mutex> g(mu);
        ready[idx] = {rc == 0 ? buf : nullptr, {w, h}};
      }
      cv_consumer.notify_all();
    }
  }

  // Blocking fetch of image `idx`; advances the ring cursor.
  int get(long idx, unsigned char** out, int* w, int* h) {
    std::unique_lock<std::mutex> lk(mu);
    if (idx < next_issue && ready.count(idx) == 0) {
      // Backward seek to an already-consumed index: decode synchronously
      // (no worker will ever produce it again).
      lk.unlock();
      return vt_load_png_gray(paths[idx].c_str(), out, w, h);
    }
    cursor = idx;
    cv_worker.notify_all();
    cv_consumer.wait(lk, [&] { return ready.count(idx) > 0; });
    auto it = ready.find(idx);
    unsigned char* buf = it->second.first;
    *w = it->second.second.first;
    *h = it->second.second.second;
    ready.erase(it);
    // Drop any stale decodes behind the cursor (random seeks).
    for (auto i = ready.begin(); i != ready.end();) {
      if (i->first < idx) {
        std::free(i->second.first);
        i = ready.erase(i);
      } else {
        ++i;
      }
    }
    if (!buf) return -1;
    *out = buf;
    return 0;
  }
};

void* vt_prefetch_create(const char** paths, long n, int depth, int nthreads) {
  std::vector<std::string> v(paths, paths + n);
  return new Prefetcher(std::move(v), depth, nthreads);
}

int vt_prefetch_get(void* handle, long idx, unsigned char** out, int* w, int* h) {
  return static_cast<Prefetcher*>(handle)->get(idx, out, w, h);
}

void vt_prefetch_destroy(void* handle) { delete static_cast<Prefetcher*>(handle); }

}  // extern "C"
