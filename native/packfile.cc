// Packfile reader — native data-IO backend (lmdb equivalent).
//
// The reference trains from LMDB databases for fast random reads
// (`/root/reference/Deraining/basicsr/utils/file_client.py:76-146`,
// `create_lmdb.py`); lmdb is not available in this environment, so this is
// a dependency-free replacement: an mmap'd single-file key/value store with
// a sorted-key index, O(log n) binary-search lookup, and zero-copy value
// access (pointers straight into the page cache — no read() syscalls, no
// memcpy; the OS prefetches under sequential scans).
//
// Layout (little-endian):
//   magic    "VMPK0001" (8 bytes)
//   u64      n_entries
//   u64      index_size_bytes
//   index    n_entries x { u16 key_len, key bytes, u64 offset, u64 size }
//            (keys sorted ascending; offsets relative to data section)
//   data     concatenated values
//
// Exposed as a C ABI for ctypes (vmambair_tpu/data/packfile.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Entry {
  std::string key;
  uint64_t offset;
  uint64_t size;
};

struct Pack {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t map_size = 0;
  const uint8_t* data = nullptr;
  std::vector<Entry> index;  // sorted by key
};

uint64_t read_u64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

uint16_t read_u16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

}  // namespace

extern "C" {

void* vmpack_open(const char* path) {
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
  if (std::memcmp(base, "VMPK0001", 8) != 0) {
    munmap(mem, st.st_size);
    ::close(fd);
    return nullptr;
  }
  auto* pack = new Pack();
  pack->fd = fd;
  pack->base = base;
  pack->map_size = st.st_size;
  uint64_t n = read_u64(base + 8);
  uint64_t index_size = read_u64(base + 16);
  const uint8_t* p = base + 24;
  const uint8_t* index_end = p + index_size;
  pack->index.reserve(n);
  for (uint64_t i = 0; i < n && p + 2 <= index_end; ++i) {
    uint16_t klen = read_u16(p);
    p += 2;
    Entry e;
    e.key.assign(reinterpret_cast<const char*>(p), klen);
    p += klen;
    e.offset = read_u64(p);
    p += 8;
    e.size = read_u64(p);
    p += 8;
    pack->index.push_back(std::move(e));
  }
  pack->data = index_end;
  return pack;
}

int64_t vmpack_count(void* handle) {
  return static_cast<Pack*>(handle)->index.size();
}

// Zero-copy lookup: *out points into the mmap. Returns size or -1.
int64_t vmpack_get(void* handle, const char* key, const uint8_t** out) {
  auto* pack = static_cast<Pack*>(handle);
  std::string k(key);
  auto it = std::lower_bound(
      pack->index.begin(), pack->index.end(), k,
      [](const Entry& e, const std::string& kk) { return e.key < kk; });
  if (it == pack->index.end() || it->key != k) return -1;
  *out = pack->data + it->offset;
  return static_cast<int64_t>(it->size);
}

// Key at position i (for iteration). Returns length or -1.
int64_t vmpack_key(void* handle, int64_t i, const char** out) {
  auto* pack = static_cast<Pack*>(handle);
  if (i < 0 || static_cast<size_t>(i) >= pack->index.size()) return -1;
  *out = pack->index[i].key.c_str();
  return static_cast<int64_t>(pack->index[i].key.size());
}

// Value at position i (zero-copy). Returns size or -1.
int64_t vmpack_value_at(void* handle, int64_t i, const uint8_t** out) {
  auto* pack = static_cast<Pack*>(handle);
  if (i < 0 || static_cast<size_t>(i) >= pack->index.size()) return -1;
  *out = pack->data + pack->index[i].offset;
  return static_cast<int64_t>(pack->index[i].size);
}

// Hint the kernel to prefetch the whole data section (sequential epoch).
void vmpack_prefetch(void* handle) {
  auto* pack = static_cast<Pack*>(handle);
  madvise(const_cast<uint8_t*>(pack->base), pack->map_size, MADV_WILLNEED);
}

void vmpack_close(void* handle) {
  auto* pack = static_cast<Pack*>(handle);
  if (pack->base) {
    munmap(const_cast<uint8_t*>(pack->base), pack->map_size);
  }
  if (pack->fd >= 0) ::close(pack->fd);
  delete pack;
}

}  // extern "C"
