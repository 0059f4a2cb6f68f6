// traj_store — append-only memory-mapped key/value trajectory store.
//
// Native replacement for the reference's LMDB dependency (reference uses
// the LMDB C library via python-lmdb for trajectory data and eval-resume
// stores: internnav/dataset/cma_lmdb_dataset.py:82,
// internnav/evaluator/utils/data_collector.py:109). lmdb is not available
// in this environment; this store provides the subset the framework needs
// with an mmap read path suited to feeding the host input pipeline:
//
// - single data file of records: [u32 klen][u32 vlen][key][value]
// - crash-safe appends (records are fsync'd on ts_sync; a torn tail
//   record is detected by bounds-checking and ignored on open)
// - reads are zero-copy pointers into the mmap
// - last-write-wins per key (index built on open, updated on put)
//
// C ABI (ctypes-friendly):
//   void*  ts_open(const char* path, int writable)
//   int    ts_put(void*, const char* k, u32 klen, const char* v, u32 vlen)
//   int    ts_get(void*, const char* k, u32 klen, const char** v, u32* vlen)
//   long   ts_count(void*)
//   int    ts_key_at(void*, long i, const char** k, u32* klen)
//   int    ts_sync(void*)
//   void   ts_close(void*)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Entry {
  uint64_t value_off;
  uint32_t value_len;
};

struct Store {
  int fd = -1;
  bool writable = false;
  uint8_t* map = nullptr;
  uint64_t map_size = 0;   // mapped capacity
  uint64_t data_size = 0;  // valid bytes
  std::unordered_map<std::string, Entry> index;
  std::vector<std::string> keys;  // insertion order (unique)
  std::string path;
};

bool remap(Store* s, uint64_t need) {
  if (s->map && need <= s->map_size) return true;
  uint64_t new_size = s->map_size ? s->map_size : (1ull << 20);
  while (new_size < need) new_size *= 2;
  if (s->map) munmap(s->map, s->map_size);
  if (s->writable) {
    if (ftruncate(s->fd, (off_t)new_size) != 0) return false;
  }
  int prot = PROT_READ | (s->writable ? PROT_WRITE : 0);
  void* m = mmap(nullptr, new_size, prot, MAP_SHARED, s->fd, 0);
  if (m == MAP_FAILED) {
    s->map = nullptr;
    return false;
  }
  s->map = (uint8_t*)m;
  s->map_size = new_size;
  return true;
}

void build_index(Store* s) {
  uint64_t off = 0;
  while (off + 8 <= s->data_size) {
    uint32_t klen, vlen;
    memcpy(&klen, s->map + off, 4);
    memcpy(&vlen, s->map + off + 4, 4);
    uint64_t rec_end = off + 8 + (uint64_t)klen + vlen;
    if (rec_end > s->data_size || klen == 0 || klen > (1u << 20)) break;  // torn tail
    std::string key((const char*)(s->map + off + 8), klen);
    Entry e{off + 8 + klen, vlen};
    auto it = s->index.find(key);
    if (it == s->index.end()) {
      s->keys.push_back(key);
      s->index.emplace(std::move(key), e);
    } else {
      it->second = e;  // last write wins
    }
    off = rec_end;
  }
  s->data_size = off;  // drop torn tail
}

}  // namespace

extern "C" {

void* ts_open(const char* path, int writable) {
  Store* s = new Store();
  s->writable = writable != 0;
  s->path = path;
  int flags = writable ? (O_RDWR | O_CREAT) : O_RDONLY;
  s->fd = open(path, flags, 0644);
  if (s->fd < 0) {
    delete s;
    return nullptr;
  }
  struct stat st;
  fstat(s->fd, &st);
  // valid data size persisted in a sidecar to distinguish file capacity
  // (files are pre-truncated for mmap growth) from written bytes
  std::string meta = s->path + ".size";
  uint64_t recorded = 0;
  if (FILE* f = fopen(meta.c_str(), "rb")) {
    if (fread(&recorded, 8, 1, f) != 1) recorded = 0;
    fclose(f);
  }
  s->data_size = recorded ? recorded : (uint64_t)st.st_size;
  if ((uint64_t)st.st_size < s->data_size) s->data_size = st.st_size;
  if (st.st_size == 0 && !writable) {
    delete s;
    return nullptr;
  }
  if (!remap(s, s->data_size ? s->data_size : 1)) {
    close(s->fd);
    delete s;
    return nullptr;
  }
  build_index(s);
  return s;
}

int ts_put(void* h, const char* k, uint32_t klen, const char* v, uint32_t vlen) {
  Store* s = (Store*)h;
  if (!s || !s->writable || klen == 0) return -1;
  uint64_t need = s->data_size + 8 + klen + vlen;
  if (!remap(s, need)) return -2;
  uint8_t* p = s->map + s->data_size;
  memcpy(p, &klen, 4);
  memcpy(p + 4, &vlen, 4);
  memcpy(p + 8, k, klen);
  memcpy(p + 8 + klen, v, vlen);
  std::string key(k, klen);
  Entry e{s->data_size + 8 + klen, vlen};
  auto it = s->index.find(key);
  if (it == s->index.end()) {
    s->keys.push_back(key);
    s->index.emplace(std::move(key), e);
  } else {
    it->second = e;
  }
  s->data_size = need;
  return 0;
}

int ts_get(void* h, const char* k, uint32_t klen, const char** v, uint32_t* vlen) {
  Store* s = (Store*)h;
  if (!s) return -1;
  auto it = s->index.find(std::string(k, klen));
  if (it == s->index.end()) return 1;  // not found
  *v = (const char*)(s->map + it->second.value_off);
  *vlen = it->second.value_len;
  return 0;
}

long ts_count(void* h) {
  Store* s = (Store*)h;
  return s ? (long)s->keys.size() : -1;
}

int ts_key_at(void* h, long i, const char** k, uint32_t* klen) {
  Store* s = (Store*)h;
  if (!s || i < 0 || i >= (long)s->keys.size()) return -1;
  *k = s->keys[i].data();
  *klen = (uint32_t)s->keys[i].size();
  return 0;
}

int ts_sync(void* h) {
  Store* s = (Store*)h;
  if (!s || !s->writable) return -1;
  if (msync(s->map, s->data_size, MS_SYNC) != 0) return -2;
  std::string meta = s->path + ".size";
  if (FILE* f = fopen(meta.c_str(), "wb")) {
    fwrite(&s->data_size, 8, 1, f);
    fflush(f);
    fsync(fileno(f));
    fclose(f);
  }
  return 0;
}

void ts_close(void* h) {
  Store* s = (Store*)h;
  if (!s) return;
  if (s->writable) ts_sync(h);
  if (s->map) munmap(s->map, s->map_size);
  if (s->fd >= 0) close(s->fd);
  delete s;
}

}  // extern "C"
