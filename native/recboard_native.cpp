// recboard_native — host-side hot loops in C++.
//
// The reference delegates its native layer to torchdata workers /
// PyTorch internals (SURVEY.md §2.1: no first-party native code). Here
// the host-side bottleneck is feeding a TPU chip (SURVEY.md §7 hard
// part #5): negative sampling with seen-set exclusion and interaction
// TSV parsing. Exposed via a C ABI for ctypes (no pybind11 in this
// image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o librecboard_native.so
//        recboard_native.cpp
extern "C" {

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

// xorshift128+ PRNG — deterministic per (seed, stream)
struct Rng {
  uint64_t s0, s1;
};

static inline uint64_t splitmix64(uint64_t& x) {
  x += 0x9E3779B97f4A7C15ULL;
  uint64_t z = x;
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

static inline void rng_seed(Rng* r, uint64_t seed) {
  uint64_t x = seed;
  r->s0 = splitmix64(x);
  r->s1 = splitmix64(x);
}

static inline uint64_t rng_next(Rng* r) {
  uint64_t x = r->s0, y = r->s1;
  r->s0 = y;
  x ^= x << 23;
  r->s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
  return r->s1 + y;
}

static inline int64_t rng_below(Rng* r, int64_t n) {
  return (int64_t)(rng_next(r) % (uint64_t)n);
}

// binary search membership in a sorted int64 array
static inline bool contains(const int64_t* arr, int64_t n, int64_t v) {
  int64_t lo = 0, hi = n;
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (arr[mid] < v) lo = mid + 1; else hi = mid;
  }
  return lo < n && arr[lo] == v;
}

// Sample `num_negs` uniform negatives per row, rejecting the row's
// user's seen items (CSR: seen_indptr over users, sorted seen_items).
// out: (n_rows * num_negs) int64.
void sample_negatives(
    const int64_t* users, int64_t n_rows, int64_t num_negs,
    const int64_t* seen_indptr, const int64_t* seen_items,
    int64_t n_items, uint64_t seed, int64_t* out) {
  Rng rng;
  rng_seed(&rng, seed);
  for (int64_t i = 0; i < n_rows; ++i) {
    const int64_t u = users[i];
    const int64_t* seen = seen_items + seen_indptr[u];
    const int64_t n_seen = seen_indptr[u + 1] - seen_indptr[u];
    for (int64_t k = 0; k < num_negs; ++k) {
      int64_t cand = rng_below(&rng, n_items);
      int tries = 0;
      while (contains(seen, n_seen, cand) && tries < 128) {
        cand = rng_below(&rng, n_items);
        ++tries;
      }
      out[i * num_negs + k] = cand;
    }
  }
}

// Parse an interactions TSV (header skipped) with integer user/item in
// the first two columns and optional float/int trailing columns.
// Returns number of rows parsed; fills user/item arrays (caller sizes
// them via count_lines first).
int64_t count_lines(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t lines = 0;
  char buf[1 << 16];
  size_t got;
  while ((got = fread(buf, 1, sizeof(buf), f)) > 0) {
    for (size_t i = 0; i < got; ++i)
      if (buf[i] == '\n') ++lines;
  }
  fclose(f);
  return lines;
}

int64_t parse_interactions(
    const char* path, int64_t* users, int64_t* items,
    double* col3, double* col4, int64_t capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[4096];
  // skip header
  if (!fgets(line, sizeof(line), f)) { fclose(f); return 0; }
  int64_t n = 0;
  while (n < capacity && fgets(line, sizeof(line), f)) {
    char* p = line;
    char* end;
    int64_t u = strtoll(p, &end, 10);
    if (end == p) continue;
    p = end + 1;
    int64_t it = strtoll(p, &end, 10);
    if (end == p) continue;
    users[n] = u;
    items[n] = it;
    if (col3) {
      p = end;
      while (*p == '\t') ++p;
      col3[n] = strtod(p, &end);
      if (col4) {
        p = end;
        while (*p == '\t') ++p;
        col4[n] = strtod(p, &end);
      }
    }
    ++n;
  }
  fclose(f);
  return n;
}

}  // extern "C"
