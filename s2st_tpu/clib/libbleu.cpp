// Native host ops for scoring and batching.
//
// Parity targets (SURVEY.md §2.5):
//  - fairseq/clib/libbleu/libbleu.cpp  — fast clipped n-gram BLEU counting
//  - fairseq/clib/libnat/edit_dist.cpp — Levenshtein edit distance
//  - fairseq/data/data_utils_fast.pyx  — token-budget batch formation
//
// Exposed with plain C ABI and driven from Python via ctypes
// (s2st_tpu/clib/__init__.py); no pybind11 dependency.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// BLEU n-gram counting (libbleu parity). Sequences are int32 token ids.
// counts/totals are length-4 arrays accumulating clipped matches / totals;
// ref_len/hyp_len accumulate lengths. Call once per sentence pair.
// ---------------------------------------------------------------------------

void bleu_add(const int32_t* ref, int64_t ref_n,
              const int32_t* hyp, int64_t hyp_n,
              int64_t* match, int64_t* total,
              int64_t* ref_len, int64_t* hyp_len) {
  *ref_len += ref_n;
  *hyp_len += hyp_n;
  for (int n = 1; n <= 4; ++n) {
    if (hyp_n - n + 1 <= 0) continue;
    total[n - 1] += hyp_n - n + 1;
    // count ref n-grams
    std::map<std::vector<int32_t>, int64_t> ref_counts;
    for (int64_t i = 0; i + n <= ref_n; ++i) {
      std::vector<int32_t> g(ref + i, ref + i + n);
      ref_counts[g] += 1;
    }
    std::map<std::vector<int32_t>, int64_t> hyp_counts;
    for (int64_t i = 0; i + n <= hyp_n; ++i) {
      std::vector<int32_t> g(hyp + i, hyp + i + n);
      hyp_counts[g] += 1;
    }
    for (auto& kv : hyp_counts) {
      auto it = ref_counts.find(kv.first);
      if (it != ref_counts.end()) {
        match[n - 1] += std::min(kv.second, it->second);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Levenshtein edit distance over int32 token sequences (libnat parity).
// ---------------------------------------------------------------------------

int64_t edit_distance(const int32_t* a, int64_t n,
                      const int32_t* b, int64_t m) {
  if (n == 0) return m;
  if (m == 0) return n;
  std::vector<int64_t> prev(m + 1), cur(m + 1);
  for (int64_t j = 0; j <= m; ++j) prev[j] = j;
  for (int64_t i = 1; i <= n; ++i) {
    cur[0] = i;
    for (int64_t j = 1; j <= m; ++j) {
      int64_t sub = prev[j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

// ---------------------------------------------------------------------------
// Token-budget batch formation (data_utils_fast.batch_by_size_vec parity).
// indices/lengths: int64 arrays of size n (indices pre-ordered).
// out_batch_ids[i] = batch index assigned to indices[i] (-1 = skipped).
// Returns the number of batches. Cost model: (len(batch)+1) * max_len.
// ---------------------------------------------------------------------------

int64_t batch_by_size(const int64_t* indices, const int64_t* lengths,
                      int64_t n, int64_t max_tokens, int64_t max_sentences,
                      int64_t bsz_mult, int64_t* out_batch_ids) {
  int64_t batch_id = 0;
  std::vector<int64_t> cur;  // positions in `indices`
  int64_t cur_max = 0;

  auto flush = [&](int64_t keep_from) {
    // emit cur[0:keep_from) as one batch (rounded to bsz_mult)
    int64_t bsz = keep_from;
    if (bsz > bsz_mult) bsz = bsz / bsz_mult * bsz_mult;
    if (bsz <= 0) bsz = keep_from;
    for (int64_t i = 0; i < bsz; ++i) out_batch_ids[cur[i]] = batch_id;
    ++batch_id;
    cur.erase(cur.begin(), cur.begin() + bsz);
    cur_max = 0;
    for (auto pos : cur) cur_max = std::max(cur_max, lengths[indices[pos]]);
  };

  for (int64_t i = 0; i < n; ++i) {
    int64_t idx = indices[i];
    int64_t len = lengths[idx];
    if (len > max_tokens) {
      out_batch_ids[i] = -1;  // skip oversized sample
      continue;
    }
    int64_t new_max = std::max(cur_max, len);
    bool over_tokens =
        !cur.empty() && ((int64_t)cur.size() + 1) * new_max > max_tokens;
    bool over_sents =
        max_sentences > 0 && (int64_t)cur.size() >= max_sentences;
    if (over_tokens || over_sents) {
      flush((int64_t)cur.size());
      new_max = std::max(cur_max, len);
    }
    cur.push_back(i);
    cur_max = new_max;
  }
  if (!cur.empty()) {
    // final batch: no bsz_mult rounding (matches the Python batcher's
    // trailing `if cur: batches.append(cur)`)
    for (auto pos : cur) out_batch_ids[pos] = batch_id;
    ++batch_id;
  }
  return batch_id;
}

}  // extern "C"
