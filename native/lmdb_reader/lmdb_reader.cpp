// Read-only LMDB 0.9 environment walker (C++), the native fast path behind
// internnav_tpu.dataset.lmdb_reader (same format logic as the pure-python
// parser; see its module docstring for the layout notes). The reference
// depends on the LMDB C library for all trajectory data
// (internnav/dataset/cma_lmdb_dataset.py:41); this reader provides the
// equivalent native throughput with zero external dependencies.
//
// C API (ctypes):
//   void* lr_open(const char* path)       -> handle (data.mdb or env dir)
//   void  lr_close(void*)
//   long  lr_entries(void*)
//   long  lr_count(void*)                 -> walked pair count
//   int   lr_key(void*, long i, const uint8_t** p, long* n)
//   int   lr_value(void*, long i, const uint8_t** p, long* n)
//   int   lr_get(void*, const uint8_t* k, long kn, const uint8_t** p, long* n)

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0xBEEFC0DE;
constexpr uint16_t kBranch = 0x01, kLeaf = 0x02, kLeaf2 = 0x20;
constexpr uint16_t kBigData = 0x01;
constexpr size_t kPageHdr = 16, kMetaOff = 16;

struct Slice {
  const uint8_t* p;
  size_t n;
};

struct Env {
  const uint8_t* map = nullptr;
  size_t size = 0;
  size_t psize = 4096;
  uint64_t root = ~0ull;
  uint64_t entries = 0;
  std::vector<std::pair<Slice, Slice>> items;  // sorted key order
  int fd = -1;
};

template <typename T>
T rd(const uint8_t* p) {
  T v;
  std::memcpy(&v, p, sizeof(T));
  return v;
}

bool walk(Env* e, uint64_t pgno) {
  if (pgno == ~0ull) return true;
  if ((pgno + 1) * e->psize > e->size) return false;
  const uint8_t* page = e->map + pgno * e->psize;
  uint16_t flags = rd<uint16_t>(page + 10);
  uint16_t lower = rd<uint16_t>(page + 12);
  if (flags & kLeaf2) return false;  // DUPFIXED unsupported
  size_t n = (lower - kPageHdr) / 2;
  for (size_t i = 0; i < n; i++) {
    uint16_t off = rd<uint16_t>(page + kPageHdr + 2 * i);
    const uint8_t* node = page + off;
    uint16_t lo = rd<uint16_t>(node), hi = rd<uint16_t>(node + 2);
    uint16_t nflags = rd<uint16_t>(node + 4), ksize = rd<uint16_t>(node + 6);
    if (flags & kBranch) {
      uint64_t child = (uint64_t)lo | ((uint64_t)hi << 16)
                       | ((uint64_t)nflags << 32);
      if (!walk(e, child)) return false;
    } else {
      Slice key{node + 8, ksize};
      uint64_t dsize = (uint64_t)lo | ((uint64_t)hi << 16);
      const uint8_t* dp = node + 8 + ksize;
      if (nflags & kBigData) {
        uint64_t ov = rd<uint64_t>(dp);
        if ((ov + 1) * e->psize > e->size) return false;
        dp = e->map + ov * e->psize + kPageHdr;
      }
      e->items.push_back({key, Slice{dp, (size_t)dsize}});
    }
  }
  return true;
}

}  // namespace

extern "C" {

void* lr_open(const char* path_c) {
  std::string path(path_c);
  struct stat st;
  if (stat(path.c_str(), &st) != 0) return nullptr;
  if (S_ISDIR(st.st_mode)) {
    path += "/data.mdb";
    if (stat(path.c_str(), &st) != 0) return nullptr;
  }
  int fd = open(path.c_str(), O_RDONLY);
  if (fd < 0) return nullptr;
  auto* e = new Env();
  e->fd = fd;
  e->size = (size_t)st.st_size;
  e->map = (const uint8_t*)mmap(nullptr, e->size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (e->map == MAP_FAILED) {
    close(fd);
    delete e;
    return nullptr;
  }
  if (rd<uint32_t>(e->map + kMetaOff) != kMagic) {
    lr_close_impl:
    munmap((void*)e->map, e->size);
    close(fd);
    delete e;
    return nullptr;
  }
  size_t candidates[] = {4096, 8192, 16384, 32768, 65536, 2048, 1024};
  e->psize = 0;
  for (size_t ps : candidates) {
    if (e->size >= ps + kMetaOff + 4 &&
        rd<uint32_t>(e->map + ps + kMetaOff) == kMagic) {
      e->psize = ps;
      break;
    }
  }
  if (e->psize == 0) goto lr_close_impl;
  // live meta = larger txnid; MDB_meta: magic,version(8) addr,mapsize(16)
  // dbs[2] (48 each) last_pg(8) txnid(8)
  uint64_t best_txn = 0;
  for (int m = 0; m < 2; m++) {
    const uint8_t* meta = e->map + m * e->psize + kMetaOff;
    if (rd<uint32_t>(meta) != kMagic) continue;
    const uint8_t* main_db = meta + 8 + 16 + 48;
    uint64_t txn = rd<uint64_t>(meta + 8 + 16 + 96 + 8);
    if (txn >= best_txn) {
      best_txn = txn;
      e->entries = rd<uint64_t>(main_db + 32);
      e->root = rd<uint64_t>(main_db + 40);
    }
  }
  if (!walk(e, e->root)) goto lr_close_impl;
  return e;
}

void lr_close(void* h) {
  auto* e = (Env*)h;
  if (!e) return;
  munmap((void*)e->map, e->size);
  close(e->fd);
  delete e;
}

long lr_entries(void* h) { return (long)((Env*)h)->entries; }
long lr_count(void* h) { return (long)((Env*)h)->items.size(); }

int lr_key(void* h, long i, const uint8_t** p, long* n) {
  auto* e = (Env*)h;
  if (i < 0 || (size_t)i >= e->items.size()) return -1;
  *p = e->items[i].first.p;
  *n = (long)e->items[i].first.n;
  return 0;
}

int lr_value(void* h, long i, const uint8_t** p, long* n) {
  auto* e = (Env*)h;
  if (i < 0 || (size_t)i >= e->items.size()) return -1;
  *p = e->items[i].second.p;
  *n = (long)e->items[i].second.n;
  return 0;
}

int lr_get(void* h, const uint8_t* k, long kn, const uint8_t** p, long* n) {
  auto* e = (Env*)h;
  // items are in key order (tree walk): binary search
  size_t lo = 0, hi = e->items.size();
  while (lo < hi) {
    size_t mid = (lo + hi) / 2;
    const Slice& key = e->items[mid].first;
    int c = std::memcmp(key.p, k, std::min(key.n, (size_t)kn));
    if (c == 0) c = (key.n < (size_t)kn) ? -1 : (key.n > (size_t)kn ? 1 : 0);
    if (c == 0) {
      *p = e->items[mid].second.p;
      *n = (long)e->items[mid].second.n;
      return 0;
    }
    if (c < 0) lo = mid + 1; else hi = mid;
  }
  return -1;
}

}  // extern "C"
