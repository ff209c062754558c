// Shared-memory array arena.
//
// Native runtime component replacing the reference's SharedArray dependency
// (segmentation/util/data_util.py:8-12, S3DISDataLoader.py:31-35): named
// POSIX shared-memory segments holding typed n-d arrays, shared zero-copy
// across data-loader worker processes.  A small header carries dtype/shape
// so any process can attach without side-channel metadata.
//
// C ABI for ctypes binding (no pybind11 in this image).
//
// Build:  g++ -O2 -shared -fPIC -o libshm_arena.so shm_arena.cpp -lrt

#include <cerrno>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x52535455;  // "RSTU"
constexpr uint32_t kMaxDims = 8;

struct Header {
  uint32_t magic;
  uint32_t dtype;  // numpy type-num, carried opaquely
  uint32_t ndim;
  uint32_t reserved;
  uint64_t shape[kMaxDims];
  uint64_t nbytes;  // payload size
};

constexpr size_t kHeaderSize = sizeof(Header);

}  // namespace

extern "C" {

// Create (or replace) a named array; returns the payload pointer or null.
void* shm_arena_create(const char* name, uint32_t dtype, uint32_t ndim,
                       const uint64_t* shape, uint64_t nbytes) {
  if (ndim > kMaxDims) return nullptr;
  shm_unlink(name);  // replace any stale segment
  int fd = shm_open(name, O_CREAT | O_EXCL | O_RDWR, 0600);
  if (fd < 0) return nullptr;
  size_t total = kHeaderSize + nbytes;
  if (ftruncate(fd, static_cast<off_t>(total)) != 0) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  void* base = mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (base == MAP_FAILED) {
    shm_unlink(name);
    return nullptr;
  }
  Header* h = static_cast<Header*>(base);
  h->magic = kMagic;
  h->dtype = dtype;
  h->ndim = ndim;
  h->reserved = 0;
  std::memset(h->shape, 0, sizeof(h->shape));
  for (uint32_t i = 0; i < ndim; ++i) h->shape[i] = shape[i];
  h->nbytes = nbytes;
  return static_cast<char*>(base) + kHeaderSize;
}

// Attach to an existing array; fills dtype/ndim/shape/nbytes outputs.
void* shm_arena_attach(const char* name, uint32_t* dtype, uint32_t* ndim,
                       uint64_t* shape /* len >= 8 */, uint64_t* nbytes,
                       int writable) {
  int fd = shm_open(name, writable ? O_RDWR : O_RDONLY, 0600);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < kHeaderSize) {
    close(fd);
    return nullptr;
  }
  int prot = PROT_READ | (writable ? PROT_WRITE : 0);
  void* base = mmap(nullptr, static_cast<size_t>(st.st_size), prot, MAP_SHARED,
                    fd, 0);
  close(fd);
  if (base == MAP_FAILED) return nullptr;
  Header* h = static_cast<Header*>(base);
  if (h->magic != kMagic ||
      kHeaderSize + h->nbytes > static_cast<uint64_t>(st.st_size)) {
    munmap(base, static_cast<size_t>(st.st_size));
    return nullptr;
  }
  *dtype = h->dtype;
  *ndim = h->ndim;
  for (uint32_t i = 0; i < kMaxDims; ++i) shape[i] = h->shape[i];
  *nbytes = h->nbytes;
  return static_cast<char*>(base) + kHeaderSize;
}

int shm_arena_exists(const char* name) {
  int fd = shm_open(name, O_RDONLY, 0600);
  if (fd < 0) return 0;
  close(fd);
  return 1;
}

int shm_arena_unlink(const char* name) { return shm_unlink(name); }

int shm_arena_detach(void* payload, uint64_t nbytes) {
  if (payload == nullptr) return -1;
  char* base = static_cast<char*>(payload) - kHeaderSize;
  return munmap(base, kHeaderSize + nbytes);
}

}  // extern "C"
