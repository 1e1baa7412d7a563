// Async host-side media feeder.
//
// The reference renders mp4 through matplotlib+ffmpeg on the main thread
// (lib/farancia/animation.py:21-37), serializing TPU compute with video
// encoding.  This native component overlaps them: frames are submitted as
// float32 RGB ([-1,1]) and a background worker performs range conversion,
// BT.601 RGB->YUV420 planar conversion, and streaming YUV4MPEG2 writes.
//
// C ABI (consumed via ctypes, streamingt2v_tpu/native/__init__.py):
//   void* mfw_open(const char* path, int w, int h, int fps_num, int fps_den)
//   int   mfw_submit(void* h, const float* rgb, int n_frames)   // copies
//   int   mfw_pending(void* h)
//   int   mfw_close(void* h)                                     // joins
//
// Build: g++ -O3 -shared -fPIC -pthread media_feeder.cpp -o libmediafeeder.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<float> rgb;  // h*w*3, [-1,1]
};

struct Writer {
  FILE* file = nullptr;
  int w = 0, h = 0;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<Frame> queue;
  std::atomic<bool> closing{false};
  std::atomic<int> pending{0};
  std::atomic<bool> error{false};

  void encode_loop() {
    std::vector<uint8_t> y(w * h), u((w / 2) * (h / 2)), v((w / 2) * (h / 2));
    for (;;) {
      Frame f;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return !queue.empty() || closing.load(); });
        if (queue.empty()) return;
        f = std::move(queue.front());
        queue.pop_front();
      }
      convert(f, y, u, v);
      if (std::fputs("FRAME\n", file) < 0 ||
          std::fwrite(y.data(), 1, y.size(), file) != y.size() ||
          std::fwrite(u.data(), 1, u.size(), file) != u.size() ||
          std::fwrite(v.data(), 1, v.size(), file) != v.size()) {
        error.store(true);
      }
      pending.fetch_sub(1);
    }
  }

  static inline uint8_t clamp8(float x) {
    return x < 0.f ? 0 : (x > 255.f ? 255 : static_cast<uint8_t>(x + 0.5f));
  }

  void convert(const Frame& f, std::vector<uint8_t>& y, std::vector<uint8_t>& u,
               std::vector<uint8_t>& v) {
    // [-1,1] float RGB -> BT.601 limited-range YUV420 planar
    const float* p = f.rgb.data();
    for (int r = 0; r < h; ++r) {
      for (int c = 0; c < w; ++c) {
        const float* px = p + (r * w + c) * 3;
        float R = (px[0] + 1.f) * 127.5f;
        float G = (px[1] + 1.f) * 127.5f;
        float B = (px[2] + 1.f) * 127.5f;
        y[r * w + c] = clamp8(0.257f * R + 0.504f * G + 0.098f * B + 16.f);
      }
    }
    for (int r = 0; r < h / 2; ++r) {
      for (int c = 0; c < w / 2; ++c) {
        // average the 2x2 block in RGB, then convert chroma
        float R = 0.f, G = 0.f, B = 0.f;
        for (int dy = 0; dy < 2; ++dy)
          for (int dx = 0; dx < 2; ++dx) {
            const float* px = p + ((2 * r + dy) * w + (2 * c + dx)) * 3;
            R += (px[0] + 1.f) * 127.5f;
            G += (px[1] + 1.f) * 127.5f;
            B += (px[2] + 1.f) * 127.5f;
          }
        R *= 0.25f; G *= 0.25f; B *= 0.25f;
        u[r * (w / 2) + c] = clamp8(-0.148f * R - 0.291f * G + 0.439f * B + 128.f);
        v[r * (w / 2) + c] = clamp8(0.439f * R - 0.368f * G - 0.071f * B + 128.f);
      }
    }
  }
};

}  // namespace

extern "C" {

void* mfw_open(const char* path, int w, int h, int fps_num, int fps_den) {
  if (w % 2 || h % 2) return nullptr;
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  std::fprintf(f, "YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n", w, h, fps_num,
               fps_den);
  auto* wr = new Writer();
  wr->file = f;
  wr->w = w;
  wr->h = h;
  wr->worker = std::thread([wr] { wr->encode_loop(); });
  return wr;
}

int mfw_submit(void* handle, const float* rgb, int n_frames) {
  auto* wr = static_cast<Writer*>(handle);
  if (!wr || wr->closing.load()) return -1;
  const size_t stride = static_cast<size_t>(wr->w) * wr->h * 3;
  for (int i = 0; i < n_frames; ++i) {
    Frame f;
    f.rgb.assign(rgb + i * stride, rgb + (i + 1) * stride);
    {
      std::lock_guard<std::mutex> lk(wr->mu);
      wr->queue.push_back(std::move(f));
      wr->pending.fetch_add(1);
    }
    wr->cv.notify_one();
  }
  return wr->error.load() ? -2 : 0;
}

int mfw_pending(void* handle) {
  auto* wr = static_cast<Writer*>(handle);
  return wr ? wr->pending.load() : -1;
}

int mfw_close(void* handle) {
  auto* wr = static_cast<Writer*>(handle);
  if (!wr) return -1;
  wr->closing.store(true);
  wr->cv.notify_all();
  if (wr->worker.joinable()) wr->worker.join();
  int rc = wr->error.load() ? -2 : 0;
  std::fclose(wr->file);
  delete wr;
  return rc;
}

}  // extern "C"
