// Native data-loader runtime: threaded prefetch ring for image sequences.
//
// TPU-native equivalent of the reference's host-side runtime — the
// producer/consumer thread + mutex-guarded queue machinery of
// rebvio/src/rebvio.cpp:28-90 and the rosbag player of
// ros_rebvio/src/ros_rebvio.cpp:89-126 — rebuilt as a standalone C++
// prefetcher: N worker threads decode 8-bit grayscale PNGs (zlib inflate +
// PNG filter reconstruction) into float32 frames ahead of the consumer, so
// the Python/JAX side never blocks on disk or decode.  Exposed through a
// plain C ABI for ctypes (no pybind11 dependency).
//
// Build: see native/Makefile (produces librebvio_loader.so).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Frame {
  int64_t index = -1;
  int width = 0, height = 0;
  std::vector<float> data;
  bool ok = false;
};

// ---------------------------------------------------------------- PNG decode
struct PngImage {
  int width = 0, height = 0, channels = 0;
  std::vector<uint8_t> pixels;  // grayscale (first channel)
};

static uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) | p[3];
}

static bool decode_png_gray(const std::vector<uint8_t>& buf, PngImage* out) {
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (buf.size() < 8 || memcmp(buf.data(), magic, 8) != 0) return false;
  size_t pos = 8;
  std::vector<uint8_t> idat;
  int width = 0, height = 0, bit_depth = 0, color_type = 0;
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    const uint8_t* type = &buf[pos + 4];
    const uint8_t* chunk = &buf[pos + 8];
    if (pos + 12 + len > buf.size()) return false;
    if (memcmp(type, "IHDR", 4) == 0) {
      width = be32(chunk);
      height = be32(chunk + 4);
      bit_depth = chunk[8];
      color_type = chunk[9];
      if (bit_depth != 8) return false;  // EuRoC images are 8-bit
      if (chunk[12] != 0) return false;  // no interlacing
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), chunk, chunk + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (width <= 0 || height <= 0) return false;
  int ch;
  switch (color_type) {
    case 0: ch = 1; break;
    case 2: ch = 3; break;
    case 4: ch = 2; break;
    case 6: ch = 4; break;
    default: return false;
  }
  const size_t stride = size_t(width) * ch;
  std::vector<uint8_t> raw(height * (stride + 1));
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK) return false;

  out->width = width;
  out->height = height;
  out->channels = ch;
  out->pixels.resize(size_t(width) * height);
  std::vector<uint8_t> prev(stride, 0), cur(stride);
  size_t off = 0;
  for (int r = 0; r < height; ++r) {
    uint8_t ft = raw[off];
    memcpy(cur.data(), &raw[off + 1], stride);
    off += stride + 1;
    switch (ft) {
      case 0:
        break;
      case 1:  // sub
        for (size_t i = ch; i < stride; ++i) cur[i] += cur[i - ch];
        break;
      case 2:  // up
        for (size_t i = 0; i < stride; ++i) cur[i] += prev[i];
        break;
      case 3:  // average
        for (size_t i = 0; i < stride; ++i) {
          int left = (i >= size_t(ch)) ? cur[i - ch] : 0;
          cur[i] += uint8_t((left + prev[i]) >> 1);
        }
        break;
      case 4:  // paeth
        for (size_t i = 0; i < stride; ++i) {
          int a = (i >= size_t(ch)) ? cur[i - ch] : 0;
          int b = prev[i];
          int c = (i >= size_t(ch)) ? prev[i - ch] : 0;
          int p = a + b - c;
          int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
          int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          cur[i] += uint8_t(pred);
        }
        break;
      default:
        return false;
    }
    for (int x = 0; x < width; ++x) out->pixels[size_t(r) * width + x] = cur[size_t(x) * ch];
    std::swap(prev, cur);
  }
  return true;
}

static bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t got = fread(out->data(), 1, n, f);
  fclose(f);
  return got == size_t(n);
}

// ------------------------------------------------------------ prefetch ring
class Loader {
 public:
  Loader(std::vector<std::string> paths, int n_threads, int ring, float gain)
      : paths_(std::move(paths)), ring_(ring), gain_(gain), next_fetch_(0), next_emit_(0) {
    stop_ = false;
    for (int i = 0; i < n_threads; ++i) workers_.emplace_back([this] { work(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> g(mu_);
      stop_ = true;
    }
    cv_fetch_.notify_all();
    cv_emit_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocks until frame `next_emit_` is ready; copies into out (H*W floats).
  // Returns: 1 ok, 0 end of sequence, -1 decode error.
  int next(float* out, int* width, int* height) {
    std::unique_lock<std::mutex> lk(mu_);
    if (size_t(next_emit_) >= paths_.size()) return 0;
    int64_t want = next_emit_;
    cv_emit_.wait(lk, [&] { return stop_ || done_.count(want); });
    if (stop_ && !done_.count(want)) return 0;
    Frame f = std::move(done_[want]);
    done_.erase(want);
    ++next_emit_;
    cv_fetch_.notify_all();
    lk.unlock();
    if (!f.ok) return -1;
    *width = f.width;
    *height = f.height;
    memcpy(out, f.data.data(), f.data.size() * sizeof(float));
    return 1;
  }

 private:
  void work() {
    for (;;) {
      int64_t idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_fetch_.wait(lk, [&] {
          return stop_ ||
                 (size_t(next_fetch_) < paths_.size() && next_fetch_ - next_emit_ < ring_);
        });
        if (stop_) return;
        idx = next_fetch_++;
      }
      Frame f;
      f.index = idx;
      std::vector<uint8_t> buf;
      PngImage img;
      if (read_file(paths_[idx], &buf) && decode_png_gray(buf, &img)) {
        f.width = img.width;
        f.height = img.height;
        f.data.resize(img.pixels.size());
        for (size_t i = 0; i < img.pixels.size(); ++i) f.data[i] = gain_ * img.pixels[i];
        f.ok = true;
      }
      {
        std::lock_guard<std::mutex> g(mu_);
        done_[idx] = std::move(f);
      }
      cv_emit_.notify_all();
    }
  }

  std::vector<std::string> paths_;
  int64_t ring_;
  float gain_;
  std::mutex mu_;
  std::condition_variable cv_fetch_, cv_emit_;
  std::vector<std::thread> workers_;
  std::map<int64_t, Frame> done_;
  int64_t next_fetch_, next_emit_;
  bool stop_;
};

}  // namespace

extern "C" {

void* rebvio_loader_open(const char** paths, int n_paths, int n_threads, int ring,
                         float gain) {
  std::vector<std::string> p(paths, paths + n_paths);
  return new Loader(std::move(p), n_threads, ring, gain);
}

int rebvio_loader_next(void* handle, float* out, int* width, int* height) {
  return static_cast<Loader*>(handle)->next(out, width, height);
}

void rebvio_loader_close(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
