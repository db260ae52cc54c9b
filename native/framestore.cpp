// framestore: memory-mapped packed-frame dataset reader.
//
// The reference's input pipeline decodes PNG/JPG per item per epoch inside
// DataLoader workers. For TPU training the host must keep a much faster
// device fed, so this framework optionally packs a dataset's decoded RGB
// frames into one binary file (python side: data/framestore.py) and this
// library serves random clip windows out of the mmap with a parallel
// batch-gather — no decode, no Python per-frame overhead, page-cache backed.
//
// File layout (little endian):
//   [0]  magic  "FSTORE01"                      (8 bytes)
//   [8]  int64  n_videos
//   [16] int32  height, width, channels         (12 bytes)
//   [28] int32  pad
//   [32] int64  frame_offset[n_videos + 1]      (cumulative frame counts)
//   [..] uint8  frames (video-major, frame-major, HWC)
//
// Exposed C ABI (ctypes):
//   fs_open(path)               -> handle (0 on failure)
//   fs_meta(handle, out[5])     -> n_videos, height, width, channels, total_frames
//   fs_num_frames(handle, vid)  -> frame count of a video
//   fs_read_batch(handle, vids[B], starts[B], B, T, out)  (parallel gather)
//   fs_close(handle)

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <thread>
#include <vector>

namespace {

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  int64_t n_videos = 0;
  int32_t height = 0, width = 0, channels = 0;
  const int64_t* offsets = nullptr;  // n_videos + 1 cumulative frame counts
  const uint8_t* frames = nullptr;
  size_t frame_bytes = 0;
};

constexpr char kMagic[8] = {'F', 'S', 'T', 'O', 'R', 'E', '0', '1'};

}  // namespace

extern "C" {

void* fs_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) { ::close(fd); return nullptr; }

  auto* s = new Store();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(mem);
  s->size = st.st_size;
  if (st.st_size < 32 || memcmp(s->base, kMagic, 8) != 0) {
    munmap(mem, st.st_size); ::close(fd); delete s; return nullptr;
  }
  memcpy(&s->n_videos, s->base + 8, 8);
  memcpy(&s->height, s->base + 16, 4);
  memcpy(&s->width, s->base + 20, 4);
  memcpy(&s->channels, s->base + 24, 4);
  s->offsets = reinterpret_cast<const int64_t*>(s->base + 32);
  s->frames = s->base + 32 + (s->n_videos + 1) * 8;
  s->frame_bytes =
      static_cast<size_t>(s->height) * s->width * s->channels;
  // advise the kernel we will read randomly; keeps the page cache honest
  madvise(mem, st.st_size, MADV_RANDOM);
  return s;
}

void fs_meta(void* handle, int64_t* out) {
  auto* s = static_cast<Store*>(handle);
  out[0] = s->n_videos;
  out[1] = s->height;
  out[2] = s->width;
  out[3] = s->channels;
  out[4] = s->offsets[s->n_videos];
}

int64_t fs_num_frames(void* handle, int64_t vid) {
  auto* s = static_cast<Store*>(handle);
  if (vid < 0 || vid >= s->n_videos) return -1;
  return s->offsets[vid + 1] - s->offsets[vid];
}

// Gather B windows of T frames each into out (B*T*H*W*C uint8), threaded.
int fs_read_batch(void* handle, const int64_t* vids, const int64_t* starts,
                  int64_t batch, int64_t length, uint8_t* out) {
  auto* s = static_cast<Store*>(handle);
  const size_t clip_bytes = s->frame_bytes * length;

  // bounds check first so worker threads can memcpy unconditionally
  for (int64_t b = 0; b < batch; ++b) {
    if (vids[b] < 0 || vids[b] >= s->n_videos) return -1;
    const int64_t n = s->offsets[vids[b] + 1] - s->offsets[vids[b]];
    if (starts[b] < 0 || starts[b] + length > n) return -2;
  }

  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const uint8_t* src =
          s->frames + (s->offsets[vids[b]] + starts[b]) * s->frame_bytes;
      memcpy(out + b * clip_bytes, src, clip_bytes);
    }
  };

  const int64_t n_threads =
      std::min<int64_t>(batch, std::thread::hardware_concurrency());
  if (n_threads <= 1) {
    worker(0, batch);
  } else {
    std::vector<std::thread> threads;
    const int64_t per = (batch + n_threads - 1) / n_threads;
    for (int64_t t = 0; t < n_threads; ++t) {
      const int64_t lo = t * per;
      const int64_t hi = std::min(batch, lo + per);
      if (lo < hi) threads.emplace_back(worker, lo, hi);
    }
    for (auto& th : threads) th.join();
  }
  return 0;
}

void fs_close(void* handle) {
  auto* s = static_cast<Store*>(handle);
  if (s == nullptr) return;
  munmap(const_cast<uint8_t*>(s->base), s->size);
  ::close(s->fd);
  delete s;
}

}  // extern "C"
