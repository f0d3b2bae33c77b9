// Native data-loader runtime: shuffled batch assembly + background prefetch.
//
// The reference relies on torch DataLoader worker processes for its input
// pipeline (utils/data_utils.py:128-143). This framework keeps datasets as
// flat host arrays and moves raw uint8 batches to the TPU, so the host-side
// work is shuffling + gather + staging. This C++ runtime does that off the
// Python thread: a ring buffer of pre-assembled batches is kept full by a
// worker thread, so batch assembly fully overlaps the device step and the
// Python interpreter never touches per-batch pixel data.
//
// C ABI (ctypes-friendly); see focused_attention_vit_tpu/data/native.py.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Slot {
  std::vector<uint8_t> images;
  std::vector<int32_t> labels;
  int64_t count = 0;   // examples in the batch (may be < batch for last)
  bool ready = false;
  bool end_of_epoch = false;
};

class Prefetcher {
 public:
  Prefetcher(const uint8_t* images, const int32_t* labels, int64_t n,
             int64_t item_bytes, int64_t batch, int depth, uint64_t seed,
             bool shuffle, bool drop_last)
      : images_(images),
        labels_(labels),
        n_(n),
        item_bytes_(item_bytes),
        batch_(batch),
        shuffle_(shuffle),
        drop_last_(drop_last),
        rng_(seed),
        slots_(std::max(depth, 1)) {
    for (auto& s : slots_) {
      s.images.resize(static_cast<size_t>(batch_) * item_bytes_);
      s.labels.resize(batch_);
    }
    perm_.resize(n_);
    for (int64_t i = 0; i < n_; ++i) perm_[i] = i;
    worker_ = std::thread([this] { Run(); });
  }

  ~Prefetcher() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
      cv_.notify_all();
      // Drain in-flight Next() copies: the reader's memcpy runs outside
      // mu_ (see Next), so without this wait a destroy racing a copy
      // (e.g. GC finalizing the Python wrapper on another thread) would
      // free the slots mid-memcpy — use-after-free.
      cv_.wait(lk, [&] { return active_readers_ == 0; });
    }
    cv_.notify_all();
    worker_.join();
  }

  // Copies the next batch into out buffers. Returns the example count,
  // or 0 at end of epoch (the next call starts a fresh epoch).
  int64_t Next(uint8_t* out_images, int32_t* out_labels) {
    std::unique_lock<std::mutex> lk(mu_);
    Slot& s = slots_[read_idx_ % slots_.size()];
    cv_.wait(lk, [&] { return s.ready || stop_; });
    if (stop_) return -1;
    int64_t count = s.count;
    bool eoe = s.end_of_epoch;
    // Copy outside the lock, mirroring the writer: the slot is
    // exclusively the reader's while `ready` is set (the writer waits
    // for !ready), so holding mu_ across a multi-MB memcpy would only
    // serialize the consumer against the worker's slot handoffs. The
    // reader count keeps ~Prefetcher from freeing the slots under us.
    ++active_readers_;
    lk.unlock();
    if (!eoe) {
      std::memcpy(out_images, s.images.data(),
                  static_cast<size_t>(count) * item_bytes_);
      std::memcpy(out_labels, s.labels.data(), count * sizeof(int32_t));
    }
    lk.lock();
    --active_readers_;
    s.ready = false;
    ++read_idx_;
    cv_.notify_all();
    return eoe ? 0 : count;
  }

 private:
  void Run() {
    while (true) {
      // Start of epoch: reshuffle.
      if (shuffle_) {
        std::shuffle(perm_.begin(), perm_.end(), rng_);
      }
      int64_t limit = drop_last_ ? n_ - (n_ % batch_) : n_;
      // Emit every batch, then ALWAYS one end-of-epoch sentinel slot —
      // a `start <= limit` step-by-batch loop would skip the sentinel
      // whenever limit % batch != 0 (drop_last=false with a ragged
      // tail), fusing epochs forever on the consumer side.
      for (int64_t start = 0; true; start += batch_) {
        bool eoe = start >= limit;
        int64_t count =
            eoe ? 0 : std::min<int64_t>(batch_, limit - start);
        std::unique_lock<std::mutex> lk(mu_);
        Slot& s = slots_[write_idx_ % slots_.size()];
        cv_.wait(lk, [&] { return !s.ready || stop_; });
        if (stop_) return;
        lk.unlock();
        // Assemble outside the lock (slot is exclusively ours until
        // `ready` flips).
        if (!eoe) {
          for (int64_t i = 0; i < count; ++i) {
            int64_t src = perm_[start + i];
            std::memcpy(s.images.data() + i * item_bytes_,
                        images_ + src * item_bytes_, item_bytes_);
            s.labels[i] = labels_[src];
          }
        }
        lk.lock();
        s.count = count;
        s.end_of_epoch = eoe;
        s.ready = true;
        ++write_idx_;
        cv_.notify_all();
        if (eoe) break;
      }
    }
  }

  const uint8_t* images_;
  const int32_t* labels_;
  int64_t n_, item_bytes_, batch_;
  bool shuffle_, drop_last_;
  std::mt19937_64 rng_;
  std::vector<Slot> slots_;
  std::vector<int64_t> perm_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::thread worker_;
  uint64_t read_idx_ = 0, write_idx_ = 0;
  int active_readers_ = 0;
  bool stop_ = false;
};

}  // namespace

extern "C" {

void* favit_prefetcher_create(const uint8_t* images, const int32_t* labels,
                              int64_t n, int64_t item_bytes, int64_t batch,
                              int depth, uint64_t seed, int shuffle,
                              int drop_last) {
  return new Prefetcher(images, labels, n, item_bytes, batch, depth, seed,
                        shuffle != 0, drop_last != 0);
}

int64_t favit_prefetcher_next(void* p, uint8_t* out_images,
                              int32_t* out_labels) {
  return static_cast<Prefetcher*>(p)->Next(out_images, out_labels);
}

void favit_prefetcher_destroy(void* p) { delete static_cast<Prefetcher*>(p); }

}  // extern "C"
