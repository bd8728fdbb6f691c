// Memory-mapped packed-record reader: the native random-access dataset
// core replacing the reference's LMDB + pickle path
// (reference: dataset/configdataset.py:245-305 GLDV2Dataset_lmdb).
//
// File layout (.rirrec, little-endian):
//   [0..8)    magic "RIRREC01"
//   [8..16)   uint64 record count N
//   [16..24)  uint64 index table offset
//   payload   concatenated raw blobs (JPEG bytes)
//   index     N x { uint64 offset, uint64 length, int64 label }
//
// Reads are zero-copy: the mmap'd region stays resident and get() hands
// out a pointer + length into it, so the Python side can wrap blobs with
// numpy.frombuffer without a memcpy.  The kernel page cache does the
// caching the reference delegated to LMDB.  No GIL interaction: all
// functions are pure C on an opened handle.
//
// Build: g++ -O3 -fPIC -shared -o librir_records.so rir_records.cc

#include <cstdint>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'R', 'I', 'R', 'R', 'E', 'C', '0', '1'};

struct IndexEntry {
  uint64_t offset;
  uint64_t length;
  int64_t label;
};

struct Reader {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t count = 0;
  const IndexEntry* index = nullptr;
};

}  // namespace

extern "C" {

// Open a record file; returns a handle or null on any error.
void* rir_records_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 24) {
    ::close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  const uint8_t* base = static_cast<const uint8_t*>(mem);
  if (memcmp(base, kMagic, 8) != 0) {
    munmap(mem, st.st_size);
    ::close(fd);
    return nullptr;
  }
  uint64_t count, index_off;
  memcpy(&count, base + 8, 8);
  memcpy(&index_off, base + 16, 8);
  // overflow-safe layout check: a crafted header must not wrap uint64
  const uint64_t fsize = static_cast<uint64_t>(st.st_size);
  if (index_off > fsize ||
      count > (fsize - index_off) / sizeof(IndexEntry)) {
    munmap(mem, st.st_size);
    ::close(fd);
    return nullptr;
  }
  Reader* r = new Reader;
  r->fd = fd;
  r->base = base;
  r->size = st.st_size;
  r->count = count;
  r->index = reinterpret_cast<const IndexEntry*>(base + index_off);
  // random-access workload; tell the kernel not to read ahead
  madvise(mem, st.st_size, MADV_RANDOM);
  return r;
}

int64_t rir_records_count(void* handle) {
  return handle ? static_cast<Reader*>(handle)->count : -1;
}

// Zero-copy record access: *ptr points into the mmap. Returns 0 on
// success, -1 on a bad handle/index/corrupt entry.
int rir_records_get(void* handle, int64_t i, const uint8_t** ptr,
                    uint64_t* len, int64_t* label) {
  if (!handle) return -1;
  Reader* r = static_cast<Reader*>(handle);
  if (i < 0 || static_cast<uint64_t>(i) >= r->count) return -1;
  const IndexEntry& e = r->index[i];
  // overflow-safe: offset+length on a corrupt entry must not wrap uint64
  if (e.offset > r->size || e.length > r->size - e.offset) return -1;
  *ptr = r->base + e.offset;
  *len = e.length;
  *label = e.label;
  return 0;
}

// Copy a batch of labels out (index building without per-record calls).
int rir_records_labels(void* handle, int64_t* out, int64_t n) {
  if (!handle) return -1;
  Reader* r = static_cast<Reader*>(handle);
  if (n > static_cast<int64_t>(r->count)) n = r->count;
  for (int64_t i = 0; i < n; ++i) out[i] = r->index[i].label;
  return 0;
}

// Prefault a batch of records into the page cache (called from a worker
// thread ahead of the decode pass; overlaps IO with compute).
int rir_records_prefetch(void* handle, const int64_t* idxs, int64_t n) {
  if (!handle) return -1;
  Reader* r = static_cast<Reader*>(handle);
  const long page = sysconf(_SC_PAGESIZE);
  for (int64_t k = 0; k < n; ++k) {
    int64_t i = idxs[k];
    if (i < 0 || static_cast<uint64_t>(i) >= r->count) continue;
    const IndexEntry& e = r->index[i];
    if (e.offset > r->size || e.length > r->size - e.offset) continue;
    const uint8_t* p = r->base + (e.offset & ~(page - 1));
    size_t span = e.length + (e.offset & (page - 1));
    madvise(const_cast<uint8_t*>(p), span, MADV_WILLNEED);
  }
  return 0;
}

void rir_records_close(void* handle) {
  if (!handle) return;
  Reader* r = static_cast<Reader*>(handle);
  if (r->base) munmap(const_cast<uint8_t*>(r->base), r->size);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

}  // extern "C"
