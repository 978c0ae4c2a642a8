// Native data-batching pipeline: shuffled, normalized, prefetched batches.
//
// The reference feeds training with a torch DataLoader at num_workers=0
// (reference: experiments/train_base.py:78-84) — every batch is assembled
// synchronously on the training thread. This library moves the host-side
// hot path (epoch shuffling, gather, uint8 -> [-1,1] float32 conversion,
// NHWC batch assembly) into C++ worker threads with a bounded ring buffer,
// so batch i+1..i+depth are already materialized while the accelerator
// runs step i.
//
// C API (ctypes-friendly):
//   handle = rfv_loader_create(corpus_u8, n, h, w, c, batch, seed, depth, workers)
//   rfv_loader_start_epoch(handle, epoch)       // reshuffles deterministically
//   rfv_loader_next(handle, out_f32)            // blocks; 0 ok, -1 epoch done
//   rfv_loader_batches_per_epoch(handle)
//   rfv_loader_destroy(handle)
//
// Build: tools/build_native.sh -> lib/librfv_data.so

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batch {
  std::vector<float> data;
  long index;  // batch index within the epoch
};

struct Loader {
  const uint8_t* corpus;  // borrowed; caller keeps it alive
  long n, h, w, c;
  long batch;
  uint64_t seed;
  int depth;
  int workers;

  long img_elems() const { return h * w * c; }
  long batches_per_epoch() const { return n / batch; }

  // epoch state (all guarded by mu; `generation` bumps on every
  // start_epoch so workers can detect that their claimed batch belongs
  // to an abandoned epoch and must be discarded)
  std::vector<long> order;
  long next_batch_to_claim = 0;
  long epoch_batches = 0;
  uint64_t generation = 0;

  // ring of finished batches, delivered strictly in order
  std::mutex mu;
  std::condition_variable cv_produced;
  std::condition_variable cv_space;
  std::queue<Batch> ready;          // heap-ordered by arrival
  std::vector<Batch> out_of_order;  // completed but not yet deliverable
  long next_batch_to_deliver = 0;

  std::vector<std::thread> threads;
  std::atomic<bool> stop{false};
  std::atomic<bool> epoch_active{false};

  void worker() {
    for (;;) {
      if (stop.load()) return;
      // Claim a batch and snapshot its image indices UNDER the mutex, so a
      // concurrent start_epoch (which rewrites `order`/`epoch_batches`) can
      // never race the gather below. The claimed generation tags the batch;
      // completions from an abandoned epoch are discarded, not delivered.
      long bi = -1;
      uint64_t gen = 0;
      std::vector<long> idx;
      {
        std::unique_lock<std::mutex> lock(mu);
        if (epoch_active.load() && next_batch_to_claim < epoch_batches) {
          bi = next_batch_to_claim++;
          gen = generation;
          idx.assign(order.begin() + bi * batch,
                     order.begin() + (bi + 1) * batch);
        }
      }
      if (bi < 0) {
        // no epoch active / epoch exhausted; park until the next start_epoch
        std::this_thread::sleep_for(std::chrono::microseconds(200));
        continue;
      }
      Batch b;
      b.index = bi;
      b.data.resize(batch * img_elems());
      // (v/255)*2-1 with true division — matches the Python pipeline
      // bit-exactly (255 -> exactly 1.0f; a reciprocal multiplier does not).
      for (long j = 0; j < batch; ++j) {
        const uint8_t* src = corpus + idx[j] * img_elems();
        float* dst = b.data.data() + j * img_elems();
        for (long k = 0; k < img_elems(); ++k) {
          dst[k] = static_cast<float>(src[k]) / 255.0f * 2.0f - 1.0f;
        }
      }
      {
        std::unique_lock<std::mutex> lock(mu);
        cv_space.wait(lock, [&] {
          return stop.load() || gen != generation ||
                 static_cast<long>(ready.size() + out_of_order.size()) < depth ||
                 b.index == next_batch_to_deliver;
        });
        if (stop.load()) return;
        if (gen != generation) continue;  // stale epoch: drop the batch
        out_of_order.push_back(std::move(b));
        // promote any batches now deliverable in order
        bool moved = true;
        while (moved) {
          moved = false;
          for (size_t i = 0; i < out_of_order.size(); ++i) {
            if (out_of_order[i].index == next_batch_to_deliver +
                                             static_cast<long>(ready.size())) {
              ready.push(std::move(out_of_order[i]));
              out_of_order.erase(out_of_order.begin() + i);
              moved = true;
              break;
            }
          }
        }
        cv_produced.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

void* rfv_loader_create(const uint8_t* corpus, long n, long h, long w, long c,
                        long batch, uint64_t seed, int depth, int workers) {
  if (n <= 0 || batch <= 0 || batch > n || depth < 1 || workers < 1) {
    return nullptr;
  }
  auto* L = new Loader();
  L->corpus = corpus;
  L->n = n;
  L->h = h;
  L->w = w;
  L->c = c;
  L->batch = batch;
  L->seed = seed;
  L->depth = depth;
  L->workers = workers;
  for (int i = 0; i < workers; ++i) {
    L->threads.emplace_back([L] { L->worker(); });
  }
  return L;
}

long rfv_loader_batches_per_epoch(void* handle) {
  return static_cast<Loader*>(handle)->batches_per_epoch();
}

void rfv_loader_start_epoch(void* handle, long epoch) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lock(L->mu);
  L->epoch_active.store(false);
  L->generation += 1;  // invalidates every batch claimed before this point
  while (!L->ready.empty()) L->ready.pop();
  L->out_of_order.clear();

  L->order.resize(L->n);
  for (long i = 0; i < L->n; ++i) L->order[i] = i;
  // deterministic per-epoch shuffle (seed, epoch) -> same order every run
  std::mt19937_64 rng(L->seed * 0x9E3779B97F4A7C15ULL + epoch);
  for (long i = L->n - 1; i > 0; --i) {
    long j = static_cast<long>(rng() % (i + 1));
    std::swap(L->order[i], L->order[j]);
  }

  L->epoch_batches = L->batches_per_epoch();
  L->next_batch_to_deliver = 0;
  L->next_batch_to_claim = 0;
  L->epoch_active.store(true);
  // wake both assemblers parked on cv_space (incl. stale-generation
  // waiters, which now discard) and any consumer blocked in next()
  L->cv_space.notify_all();
}

int rfv_loader_next(void* handle, float* out) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lock(L->mu);
  if (L->next_batch_to_deliver >= L->epoch_batches) return -1;  // epoch done
  L->cv_produced.wait(lock, [&] {
    return L->stop.load() ||
           (!L->ready.empty() &&
            L->ready.front().index == L->next_batch_to_deliver);
  });
  if (L->stop.load()) return -2;
  Batch b = std::move(L->ready.front());
  L->ready.pop();
  std::memcpy(out, b.data.data(), b.data.size() * sizeof(float));
  L->next_batch_to_deliver += 1;
  L->cv_space.notify_all();
  return 0;
}

void rfv_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lock(L->mu);
    L->stop.store(true);
  }
  L->cv_space.notify_all();
  L->cv_produced.notify_all();
  for (auto& t : L->threads) t.join();
  delete L;
}

}  // extern "C"
