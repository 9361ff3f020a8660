// shardio — packed uint8 array-shard IO for the host input pipeline.
//
// The reference feeds training from 20k individual PNGs per epoch through
// torch DataLoader workers (SURVEY.md §2.4); PNG decode dominates host
// time and threatens to starve the TPU (SURVEY.md §7.3-7).  This native
// component implements a pre-decoded cache: fixed-record uint8 shards,
// mmap'd on open, with a pthread fan-out for gathering shuffled batches
// into a contiguous buffer the Python side hands straight to
// jax.device_put.
//
// Format (little-endian):
//   u64 magic 0x5053544f53484452 ("PSTOSHDR")
//   u32 version = 1
//   u32 n_records
//   u32 dims[4]  — record shape (d0, d1, d2, d3); unused trailing dims = 1
//   u64 record_bytes = d0*d1*d2*d3
//   payload: n_records × record_bytes, raw uint8
//
// Exposed C ABI (ctypes): see shardio.py.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0x5053544f53484452ull;
constexpr uint32_t kVersion = 1;

struct Header {
  uint64_t magic;
  uint32_t version;
  uint32_t n_records;
  uint32_t dims[4];
  uint64_t record_bytes;
};

struct Shard {
  int fd = -1;
  uint8_t* base = nullptr;   // mmap of the whole file
  size_t file_bytes = 0;
  Header hdr{};
  bool writable = false;
};

struct GatherTask {
  const Shard* shard;
  const int64_t* indices;
  uint8_t* out;
  int64_t begin;
  int64_t end;
};

void* gather_worker(void* arg) {
  auto* t = static_cast<GatherTask*>(arg);
  const uint64_t rb = t->shard->hdr.record_bytes;
  const uint8_t* payload = t->shard->base + sizeof(Header);
  for (int64_t i = t->begin; i < t->end; ++i) {
    const int64_t idx = t->indices[i];
    std::memcpy(t->out + static_cast<uint64_t>(i) * rb,
                payload + static_cast<uint64_t>(idx) * rb, rb);
  }
  return nullptr;
}

}  // namespace

extern "C" {

// Create a shard file sized for n_records and mmap it writable.
// Returns an opaque handle (heap Shard*), or null on failure.
void* shard_create(const char* path, uint32_t n_records, uint32_t d0,
                   uint32_t d1, uint32_t d2, uint32_t d3) {
  Header hdr{};
  hdr.magic = kMagic;
  hdr.version = kVersion;
  hdr.n_records = n_records;
  hdr.dims[0] = d0;
  hdr.dims[1] = d1;
  hdr.dims[2] = d2;
  hdr.dims[3] = d3;
  hdr.record_bytes = static_cast<uint64_t>(d0) * d1 * d2 * d3;

  const size_t bytes = sizeof(Header) + hdr.record_bytes * n_records;
  int fd = ::open(path, O_RDWR | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return nullptr;
  if (::ftruncate(fd, static_cast<off_t>(bytes)) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, bytes, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  std::memcpy(base, &hdr, sizeof(Header));

  auto* s = new Shard;
  s->fd = fd;
  s->base = static_cast<uint8_t*>(base);
  s->file_bytes = bytes;
  s->hdr = hdr;
  s->writable = true;
  return s;
}

// Open an existing shard read-only. Returns handle or null.
void* shard_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (::fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                      MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* s = new Shard;
  s->fd = fd;
  s->base = static_cast<uint8_t*>(base);
  s->file_bytes = static_cast<size_t>(st.st_size);
  s->writable = false;
  std::memcpy(&s->hdr, base, sizeof(Header));
  if (s->hdr.magic != kMagic || s->hdr.version != kVersion ||
      sizeof(Header) + s->hdr.record_bytes * s->hdr.n_records >
          s->file_bytes) {
    ::munmap(base, s->file_bytes);
    ::close(fd);
    delete s;
    return nullptr;
  }
  return s;
}

int32_t shard_n_records(void* handle) {
  return static_cast<Shard*>(handle)->hdr.n_records;
}

void shard_dims(void* handle, uint32_t* out4) {
  std::memcpy(out4, static_cast<Shard*>(handle)->hdr.dims, 4 * sizeof(uint32_t));
}

int64_t shard_record_bytes(void* handle) {
  return static_cast<int64_t>(static_cast<Shard*>(handle)->hdr.record_bytes);
}

// Write one record (buffer of record_bytes) at idx. Returns 0 on success.
int32_t shard_write(void* handle, uint32_t idx, const uint8_t* data) {
  auto* s = static_cast<Shard*>(handle);
  if (!s->writable || idx >= s->hdr.n_records) return -1;
  std::memcpy(s->base + sizeof(Header) +
                  static_cast<uint64_t>(idx) * s->hdr.record_bytes,
              data, s->hdr.record_bytes);
  return 0;
}

// Gather n records by index into out (n * record_bytes), using up to
// n_threads pthreads. Returns 0 on success.
int32_t shard_gather(void* handle, const int64_t* indices, int64_t n,
                     uint8_t* out, int32_t n_threads) {
  auto* s = static_cast<Shard*>(handle);
  for (int64_t i = 0; i < n; ++i) {
    if (indices[i] < 0 || indices[i] >= s->hdr.n_records) return -1;
  }
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = static_cast<int32_t>(n);

  if (n_threads == 1) {
    GatherTask t{s, indices, out, 0, n};
    gather_worker(&t);
    return 0;
  }
  pthread_t threads[64];
  GatherTask tasks[64];
  bool created[64] = {false};
  if (n_threads > 64) n_threads = 64;
  const int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int32_t k = 0; k < n_threads; ++k) {
    const int64_t b = k * chunk;
    const int64_t e = b + chunk < n ? b + chunk : n;
    if (b >= e) break;
    tasks[k] = GatherTask{s, indices, out, b, e};
    if (pthread_create(&threads[k], nullptr, gather_worker, &tasks[k]) != 0) {
      // degrade to inline execution for this chunk
      gather_worker(&tasks[k]);
      continue;
    }
    created[k] = true;
  }
  // join by created-slot index: a failed create in the middle must not
  // shift which pthread_t slots are joined (joining a never-created slot
  // is UB)
  for (int32_t k = 0; k < n_threads; ++k) {
    if (created[k]) pthread_join(threads[k], nullptr);
  }
  return 0;
}

// Flush (writable shards) and unmap/close.
void shard_close(void* handle) {
  auto* s = static_cast<Shard*>(handle);
  if (s->writable) ::msync(s->base, s->file_bytes, MS_SYNC);
  ::munmap(s->base, s->file_bytes);
  ::close(s->fd);
  delete s;
}

}  // extern "C"
