// Native frame loader: mmap-backed packed-dataset reader with async
// prefetch threads and a chunk ring buffer.
//
// TPU-native replacement for the reference's per-frame cv::imread disk I/O
// (/root/reference/src/dataset.cc:38-46), which decodes PNGs synchronously
// on the hot path.  Here datasets are packed once into a raw binary
// ("NISF": header + f64 timestamps + contiguous frames — written by
// nislam_tpu.io.dataset.pack(); version 1 = f32 frames, version 2 = raw
// uint8 frames, 4x smaller on disk and over the host->device link, with
// the /255 normalization done on-device) and served as device-feedable
// chunks:
//
//   - the file is mmap'ed; frames are never copied until a chunk is staged,
//   - a pool of prefetch threads walks ahead of the consumer, faulting
//     pages in (madvise WILLNEED + explicit touch) and staging upcoming
//     chunks into aligned ring-buffer slots,
//   - the consumer (Python via ctypes, feeding jax.device_put) pops
//     ready chunks in order, overlapping disk I/O with TPU compute.
//
// Build: make -C nislam_tpu/native   (produces libnisf_loader.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x4653494e;  // "NISF" little-endian

struct Header {
  uint32_t magic;
  uint32_t version;
  uint32_t n;
  uint32_t h;
  uint32_t w;
} __attribute__((packed));

struct Slot {
  std::vector<uint8_t> data;   // chunk_frames * frame_bytes
  int64_t chunk_idx = -1;      // which chunk is staged here
  int64_t n_frames = 0;        // valid frames in this chunk
  std::atomic<bool> ready{false};
};

struct Loader {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_size = 0;
  Header hdr{};
  size_t elem = 4;  // bytes per pixel: 4 (v1 f32) or 1 (v2 u8)
  const double* times = nullptr;
  const uint8_t* frames = nullptr;  // n * h * w * elem bytes

  // prefetch state
  int64_t chunk_frames = 0;
  int64_t n_chunks = 0;
  std::vector<Slot> ring;
  std::atomic<int64_t> next_to_stage{0};  // producer cursor (chunk idx)
  int64_t next_to_consume = 0;            // consumer cursor (chunk idx)
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready;    // consumer waits for slot ready
  std::condition_variable cv_free;     // producers wait for slot free
  std::atomic<bool> stop{false};

  size_t frame_elems() const { return size_t(hdr.h) * hdr.w; }
  size_t frame_bytes() const { return frame_elems() * elem; }
};

void stage_loop(Loader* L) {
  for (;;) {
    int64_t c = L->next_to_stage.fetch_add(1);
    if (c >= L->n_chunks || L->stop.load()) return;
    Slot& slot = L->ring[c % L->ring.size()];
    {
      // Wait until the slot has been consumed (its previous chunk released).
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_free.wait(lk, [&] {
        return L->stop.load() || slot.chunk_idx == -1 ||
               slot.chunk_idx < L->next_to_consume;
      });
      if (L->stop.load()) return;
      slot.ready.store(false);
      slot.chunk_idx = c;
    }
    const int64_t begin = c * L->chunk_frames;
    const int64_t count =
        std::min<int64_t>(L->chunk_frames, int64_t(L->hdr.n) - begin);
    const uint8_t* src = L->frames + begin * L->frame_bytes();
    const size_t bytes = size_t(count) * L->frame_bytes();
    // Hint the kernel, then touch via memcpy into the staging slot: after
    // this the consumer's copy to the device buffer hits page cache + RAM.
    madvise(const_cast<uint8_t*>(src), bytes, MADV_WILLNEED);
    std::memcpy(slot.data.data(), src, bytes);
    slot.n_frames = count;
    {
      std::lock_guard<std::mutex> lk(L->mu);
      slot.ready.store(true);
    }
    L->cv_ready.notify_all();
  }
}

}  // namespace

extern "C" {

void* nisf_open(const char* path) {
  Loader* L = new Loader();
  L->fd = open(path, O_RDONLY);
  if (L->fd < 0) {
    delete L;
    return nullptr;
  }
  struct stat st;
  if (fstat(L->fd, &st) != 0) {
    close(L->fd);
    delete L;
    return nullptr;
  }
  L->map_size = size_t(st.st_size);
  L->map = static_cast<const uint8_t*>(
      mmap(nullptr, L->map_size, PROT_READ, MAP_PRIVATE, L->fd, 0));
  if (L->map == MAP_FAILED) {
    close(L->fd);
    delete L;
    return nullptr;
  }
  std::memcpy(&L->hdr, L->map, sizeof(Header));
  if (L->hdr.magic != kMagic ||
      (L->hdr.version != 1 && L->hdr.version != 2)) {
    munmap(const_cast<uint8_t*>(L->map), L->map_size);
    close(L->fd);
    delete L;
    return nullptr;
  }
  L->elem = (L->hdr.version == 2) ? 1 : sizeof(float);
  const size_t expect = sizeof(Header) + size_t(L->hdr.n) * sizeof(double) +
                        size_t(L->hdr.n) * L->hdr.h * L->hdr.w * L->elem;
  if (L->map_size < expect) {
    munmap(const_cast<uint8_t*>(L->map), L->map_size);
    close(L->fd);
    delete L;
    return nullptr;
  }
  L->times = reinterpret_cast<const double*>(L->map + sizeof(Header));
  L->frames = L->map + sizeof(Header) + size_t(L->hdr.n) * sizeof(double);
  return L;
}

void nisf_info(void* h, int64_t* n, int64_t* height, int64_t* width) {
  Loader* L = static_cast<Loader*>(h);
  *n = L->hdr.n;
  *height = L->hdr.h;
  *width = L->hdr.w;
}

const double* nisf_timestamps(void* h) {
  return static_cast<Loader*>(h)->times;
}

// Bytes per pixel of the stored frames: 4 (v1 f32) or 1 (v2 u8).
int64_t nisf_elem_size(void* h) {
  return int64_t(static_cast<Loader*>(h)->elem);
}

// Direct zero-copy access to one frame (no prefetch machinery).
const void* nisf_frame(void* h, int64_t idx) {
  Loader* L = static_cast<Loader*>(h);
  if (idx < 0 || idx >= int64_t(L->hdr.n)) return nullptr;
  return L->frames + size_t(idx) * L->frame_bytes();
}

// Start background staging: `chunk_frames` frames per chunk, `n_threads`
// prefetch workers, `ring_slots` staged chunks ahead of the consumer.
int nisf_start_prefetch(void* h, int64_t chunk_frames, int n_threads,
                        int ring_slots) {
  Loader* L = static_cast<Loader*>(h);
  if (!L->workers.empty() || chunk_frames <= 0 || ring_slots <= 0) return -1;
  L->chunk_frames = chunk_frames;
  L->n_chunks = (int64_t(L->hdr.n) + chunk_frames - 1) / chunk_frames;
  L->ring = std::vector<Slot>(std::min<int64_t>(ring_slots, L->n_chunks));
  for (auto& s : L->ring)
    s.data.resize(size_t(chunk_frames) * L->frame_bytes());
  L->next_to_stage.store(0);
  L->next_to_consume = 0;
  L->stop.store(false);
  n_threads = std::max(1, std::min<int>(n_threads, int(L->ring.size())));
  for (int i = 0; i < n_threads; ++i)
    L->workers.emplace_back(stage_loop, L);
  return 0;
}

// Blocking: wait for the next in-order chunk, copy it to dst, release the
// slot.  Returns the number of frames copied (0 at end of dataset).
int64_t nisf_next_chunk(void* h, void* dst, double* ts_dst) {
  Loader* L = static_cast<Loader*>(h);
  if (L->next_to_consume >= L->n_chunks) return 0;
  const int64_t c = L->next_to_consume;
  Slot& slot = L->ring[c % L->ring.size()];
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] {
      return L->stop.load() || (slot.chunk_idx == c && slot.ready.load());
    });
    if (L->stop.load()) return -1;
  }
  const int64_t count = slot.n_frames;
  std::memcpy(dst, slot.data.data(), size_t(count) * L->frame_bytes());
  if (ts_dst)
    std::memcpy(ts_dst, L->times + c * L->chunk_frames,
                size_t(count) * sizeof(double));
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->next_to_consume = c + 1;
  }
  L->cv_free.notify_all();
  return count;
}

void nisf_close(void* h) {
  Loader* L = static_cast<Loader*>(h);
  L->stop.store(true);
  L->cv_ready.notify_all();
  L->cv_free.notify_all();
  for (auto& t : L->workers) t.join();
  if (L->map) munmap(const_cast<uint8_t*>(L->map), L->map_size);
  if (L->fd >= 0) close(L->fd);
  delete L;
}

}  // extern "C"
