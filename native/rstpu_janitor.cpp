// Native n-gram janitor scanner (the reference ships a pybind11
// janitor_util.cpp for the same hot loop:
// rag-evaluation-harness/lm_eval/decontamination/janitor_util.cpp).
// Exposed through a plain C ABI and loaded via ctypes
// (retrieval_scaling_tpu/rag_eval/janitor.py); pybind11 is not in this
// image. Clean-room implementation: a 64-bit FNV-1a hash set over
// normalized word n-grams + a scanner that reports match word spans.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o librstpu_janitor.so rstpu_janitor.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_set>
#include <vector>

namespace {

struct Janitor {
  int n = 13;
  std::unordered_set<uint64_t> grams;
};

constexpr uint64_t kFnvOffset = 1469598103934665603ULL;
constexpr uint64_t kFnvPrime = 1099511628211ULL;

inline uint64_t fnv1a_step(uint64_t h, const char* data, size_t len) {
  for (size_t i = 0; i < len; ++i) {
    h ^= static_cast<unsigned char>(data[i]);
    h *= kFnvPrime;
  }
  return h;
}

// Normalized word stream: lowercase, punctuation stripped, split on
// whitespace. Returns per-word (hash, original char start, original char
// end) so matches can be mapped back to the raw string.
struct Word {
  uint64_t hash;
  int32_t start;
  int32_t end;  // inclusive
};

std::vector<Word> tokenize(const char* s, int32_t len) {
  std::vector<Word> words;
  int32_t i = 0;
  while (i < len) {
    while (i < len && std::isspace(static_cast<unsigned char>(s[i]))) ++i;
    if (i >= len) break;
    int32_t start = i;
    uint64_t h = kFnvOffset;
    bool any = false;
    while (i < len && !std::isspace(static_cast<unsigned char>(s[i]))) {
      unsigned char c = static_cast<unsigned char>(s[i]);
      if (std::isalnum(c) || c >= 0x80) {  // keep non-ascii bytes verbatim
        char lc = static_cast<char>(std::tolower(c));
        h = fnv1a_step(h, &lc, 1);
        any = true;
      }
      ++i;
    }
    if (any) words.push_back({h, start, i - 1});
    // punctuation-only tokens vanish under normalization; skip them
  }
  return words;
}

inline uint64_t ngram_hash(const std::vector<Word>& w, size_t i, int n) {
  // combine word hashes with a separator step so "ab c" != "a bc"
  uint64_t h = kFnvOffset;
  for (int j = 0; j < n; ++j) {
    uint64_t wh = w[i + j].hash;
    h = fnv1a_step(h, reinterpret_cast<const char*>(&wh), sizeof(wh));
  }
  return h;
}

}  // namespace

extern "C" {

void* janitor_create(int ngram_n) {
  auto* j = new Janitor();
  j->n = ngram_n;
  return j;
}

void janitor_destroy(void* ptr) { delete static_cast<Janitor*>(ptr); }

// Register every n-gram of the normalized text as a contaminant.
void janitor_register(void* ptr, const char* text, int32_t len) {
  auto* j = static_cast<Janitor*>(ptr);
  auto words = tokenize(text, len);
  if (static_cast<int>(words.size()) < j->n) return;
  for (size_t i = 0; i + j->n <= words.size(); ++i) {
    j->grams.insert(ngram_hash(words, i, j->n));
  }
}

int64_t janitor_ngram_count(void* ptr) {
  return static_cast<int64_t>(static_cast<Janitor*>(ptr)->grams.size());
}

// Scan a document; writes up to max_spans (char_start, char_end) pairs of
// contaminated n-grams into out_spans. Returns the TOTAL number of
// matches (may exceed max_spans).
int64_t janitor_scan(void* ptr, const char* text, int32_t len,
                     int32_t* out_spans, int64_t max_spans) {
  auto* j = static_cast<Janitor*>(ptr);
  auto words = tokenize(text, len);
  int64_t found = 0;
  if (static_cast<int>(words.size()) < j->n || j->grams.empty()) return 0;
  for (size_t i = 0; i + j->n <= words.size(); ++i) {
    if (j->grams.count(ngram_hash(words, i, j->n))) {
      if (found < max_spans) {
        out_spans[2 * found] = words[i].start;
        out_spans[2 * found + 1] = words[i + j->n - 1].end;
      }
      ++found;
    }
  }
  return found;
}

}  // extern "C"
