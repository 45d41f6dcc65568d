// Multithreaded lookahead PNG prefetcher.
//
// The reference loads images synchronously inside the frame loop
// (cv::imread at reference src/utils.cpp:172-190, called from
// src/main.cpp:137-140), putting ~ms of PNG decode on the critical path.
// For the TPU pipeline the host must hide decode behind device compute
// (SURVEY.md section 7 "host-side image streaming", ~12 ms/frame budget):
// N worker threads decode ahead into a ring of `capacity` slots while the
// consumer drains frames strictly in order.

#include "cvo_native.h"

#include <errno.h>
#include <string.h>

#include <condition_variable>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Slot {
  std::vector<uint8_t> pixels;
  int64_t frame = -1;  // which frame currently occupies the slot
  int err = 0;
};

}  // namespace

struct cvo_prefetcher {
  std::vector<std::string> paths;
  int32_t height = 0, width = 0;
  size_t frame_bytes = 0;

  std::vector<Slot> slots;
  int64_t next_to_schedule = 0;
  int64_t next_to_consume = 0;
  bool stop = false;

  std::mutex mu;
  std::condition_variable cv_worker;
  std::condition_variable cv_consumer;
  std::vector<std::thread> workers;

  void worker_loop() {
    std::vector<uint8_t> local(frame_bytes);
    for (;;) {
      int64_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_worker.wait(lk, [&] {
          return stop ||
                 (next_to_schedule < int64_t(paths.size()) &&
                  next_to_schedule < next_to_consume + int64_t(slots.size()));
        });
        if (stop) return;
        idx = next_to_schedule++;
      }
      int rc = cvo_decode_png_gray(paths[size_t(idx)].c_str(), local.data(),
                                   local.size());
      {
        std::unique_lock<std::mutex> lk(mu);
        Slot &s = slots[size_t(idx) % slots.size()];
        // The ring invariant (idx < next_to_consume + capacity, consumer
        // strictly in order) guarantees this slot has been drained.
        s.pixels.swap(local);
        if (local.size() != frame_bytes) local.resize(frame_bytes);
        s.err = rc;
        s.frame = idx;
        cv_consumer.notify_all();
      }
    }
  }
};

extern "C" cvo_prefetcher *cvo_prefetcher_create(const char **paths,
                                                 int32_t n_paths,
                                                 int32_t n_threads,
                                                 int32_t capacity) {
  if (!paths || n_paths <= 0 || n_threads <= 0 || capacity <= 0) return nullptr;
  auto *p = new cvo_prefetcher();
  p->paths.reserve(size_t(n_paths));
  for (int32_t i = 0; i < n_paths; ++i) p->paths.emplace_back(paths[i]);

  if (cvo_png_info(p->paths[0].c_str(), &p->height, &p->width) != 0) {
    delete p;
    return nullptr;
  }
  p->frame_bytes = size_t(p->height) * size_t(p->width);
  p->slots.resize(size_t(capacity));
  for (auto &s : p->slots) s.pixels.resize(p->frame_bytes);

  int32_t nt = n_threads < n_paths ? n_threads : n_paths;
  for (int32_t t = 0; t < nt; ++t)
    p->workers.emplace_back([p] { p->worker_loop(); });
  return p;
}

extern "C" int32_t cvo_prefetcher_height(const cvo_prefetcher *p) {
  return p ? p->height : 0;
}

extern "C" int32_t cvo_prefetcher_width(const cvo_prefetcher *p) {
  return p ? p->width : 0;
}

extern "C" int64_t cvo_prefetcher_next(cvo_prefetcher *p, uint8_t *out,
                                       size_t out_len) {
  if (!p || !out) return -EINVAL;
  if (out_len < p->frame_bytes) return -ERANGE;
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->next_to_consume >= int64_t(p->paths.size())) return -1;  // EOS
  const int64_t want = p->next_to_consume;
  Slot &s = p->slots[size_t(want) % p->slots.size()];
  p->cv_consumer.wait(lk, [&] { return s.frame == want; });
  const int err = s.err;
  if (err == 0) memcpy(out, s.pixels.data(), p->frame_bytes);
  s.frame = -1;
  p->next_to_consume++;
  p->cv_worker.notify_all();
  if (err != 0) return err < 0 ? int64_t(err) : -EIO;
  return want;
}

extern "C" void cvo_prefetcher_destroy(cvo_prefetcher *p) {
  if (!p) return;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->stop = true;
    p->cv_worker.notify_all();
  }
  for (auto &t : p->workers) t.join();
  delete p;
}
