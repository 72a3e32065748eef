// unilm_tpu native runtime ops (C ABI, loaded via ctypes).
//
// TPU-native equivalents of the reference's C++/CUDA clib (SURVEY.md §2.8):
//  - BLEU counting            (edgelm/fairseq/clib/libbleu/libbleu.cpp)
//  - Levenshtein edit distance (edgelm/fairseq/clib/libnat/edit_dist.cpp)
//  - batch-by-size bucketing   (edgelm/fairseq/data/data_utils_fast.cpp)
//  - balanced assignment       (edgelm/fairseq/clib/libbase/balanced_assignment.cpp)
//
// All functions are fresh implementations of the standard algorithms with a
// flat-C interface so Python binds with ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <vector>

extern "C" {

// --------------------------------------------------------------------------
// BLEU: accumulate modified n-gram precision counts for one (ref, hyp) pair.
// counts layout: [match1, count1, match2, count2, match3, count3, match4,
// count4]; caller accumulates across corpus and applies brevity penalty.
// --------------------------------------------------------------------------
void bleu_add(const int32_t* ref, int64_t ref_len, const int32_t* hyp,
              int64_t hyp_len, int64_t* counts /* int64[8] */) {
  for (int n = 1; n <= 4; ++n) {
    if (hyp_len < n) continue;
    // count ref n-grams
    std::map<std::vector<int32_t>, int64_t> ref_grams;
    for (int64_t i = 0; i + n <= ref_len; ++i) {
      std::vector<int32_t> g(ref + i, ref + i + n);
      ref_grams[g] += 1;
    }
    int64_t match = 0;
    std::map<std::vector<int32_t>, int64_t> used;
    for (int64_t i = 0; i + n <= hyp_len; ++i) {
      std::vector<int32_t> g(hyp + i, hyp + i + n);
      auto it = ref_grams.find(g);
      if (it != ref_grams.end() && used[g] < it->second) {
        used[g] += 1;
        match += 1;
      }
    }
    counts[2 * (n - 1)] += match;
    counts[2 * (n - 1) + 1] += hyp_len - n + 1;
  }
}

// --------------------------------------------------------------------------
// Levenshtein distance between two int32 sequences (unit costs).
// Also used for CER/WER: caller tokenizes to chars or words.
// --------------------------------------------------------------------------
int64_t edit_distance(const int32_t* a, int64_t la, const int32_t* b,
                      int64_t lb) {
  if (la == 0) return lb;
  if (lb == 0) return la;
  std::vector<int64_t> prev(lb + 1), cur(lb + 1);
  for (int64_t j = 0; j <= lb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= la; ++i) {
    cur[0] = i;
    for (int64_t j = 1; j <= lb; ++j) {
      int64_t sub = prev[j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

// Batched edit distance: sequences flattened with lengths.
void edit_distance_batch(const int32_t* a_flat, const int64_t* a_lens,
                         const int32_t* b_flat, const int64_t* b_lens,
                         int64_t n, int64_t* out) {
  int64_t ao = 0, bo = 0;
  for (int64_t i = 0; i < n; ++i) {
    out[i] = edit_distance(a_flat + ao, a_lens[i], b_flat + bo, b_lens[i]);
    ao += a_lens[i];
    bo += b_lens[i];
  }
}

// --------------------------------------------------------------------------
// batch_by_size: group pre-sorted indices into batches bounded by
// max_tokens (padded: max_len * batch_size) and max_sentences.
// Mirrors fairseq data_utils_fast.batch_by_size_fn semantics.
// Returns number of batches; batch boundaries written to out_offsets
// (caller allocates n+1).
// --------------------------------------------------------------------------
int64_t batch_by_size(const int64_t* lengths, int64_t n, int64_t max_tokens,
                      int64_t max_sentences, int64_t bsz_multiple,
                      int64_t* out_offsets) {
  int64_t nb = 0;
  out_offsets[0] = 0;
  int64_t start = 0;
  int64_t cur_max = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t new_max = std::max(cur_max, lengths[i]);
    int64_t count = i - start + 1;
    bool overflow =
        (max_tokens > 0 && new_max * count > max_tokens && count > 1) ||
        (max_sentences > 0 && count > max_sentences);
    if (overflow) {
      // close at a multiple of bsz_multiple when possible
      int64_t close = i - start;
      if (bsz_multiple > 1 && close > bsz_multiple)
        close -= close % bsz_multiple;
      start += close;
      out_offsets[++nb] = start;
      cur_max = 0;
      for (int64_t j = start; j <= i; ++j)
        cur_max = std::max(cur_max, lengths[j]);
    } else {
      cur_max = new_max;
    }
  }
  if (start < n) out_offsets[++nb] = n;
  return nb;
}

// --------------------------------------------------------------------------
// balanced_assignment: assign each of n workers (tokens) to one of k experts
// with per-expert capacity n/k, maximizing total score via a simple
// auction algorithm (libbase equivalent for BASE-layer MoE routing).
// scores: [n, k] row-major float32. out: [n] expert ids.
// --------------------------------------------------------------------------
void balanced_assignment(const float* scores, int64_t n, int64_t k,
                         int64_t* out) {
  int64_t cap = n / k;
  std::vector<float> price(k, 0.0f);
  std::vector<std::vector<int64_t>> assigned(k);
  std::vector<int64_t> owner(n, -1);
  std::vector<int64_t> queue(n);
  for (int64_t i = 0; i < n; ++i) queue[i] = i;
  const float eps = 1e-3f;
  size_t qh = 0;
  std::vector<int64_t> q(queue);
  while (qh < q.size()) {
    int64_t i = q[qh++];
    // find best and second-best expert by score - price
    float best = -1e30f, second = -1e30f;
    int64_t bj = 0;
    for (int64_t j = 0; j < k; ++j) {
      float v = scores[i * k + j] - price[j];
      if (v > best) {
        second = best;
        best = v;
        bj = j;
      } else if (v > second) {
        second = v;
      }
    }
    price[bj] += (best - second) + eps;
    assigned[bj].push_back(i);
    owner[i] = bj;
    if ((int64_t)assigned[bj].size() > cap) {
      // evict the lowest-scoring member
      int64_t worst_idx = 0;
      float worst = 1e30f;
      for (size_t m = 0; m < assigned[bj].size(); ++m) {
        float v = scores[assigned[bj][m] * k + bj];
        if (v < worst) {
          worst = v;
          worst_idx = (int64_t)m;
        }
      }
      int64_t evicted = assigned[bj][worst_idx];
      assigned[bj].erase(assigned[bj].begin() + worst_idx);
      owner[evicted] = -1;
      q.push_back(evicted);
    }
  }
  for (int64_t i = 0; i < n; ++i) out[i] = owner[i];
}

// ---------------------------------------------------------------------------
// token_block_utils_fast equivalents (fairseq/data/token_block_utils_fast.pyx)
// Two-pass API: call with out == nullptr to get the row count, then again
// with an [n_rows, 2] buffer.
// break_mode: 0 = none, 1 = complete, 2 = complete_doc, 3 = eos
// ---------------------------------------------------------------------------
int64_t token_block_slices(const int64_t* sizes, int64_t n, int32_t break_mode,
                           int64_t block_size, int64_t document_sep_len,
                           int64_t* out) {
  int64_t rows = 0;
  auto emit = [&](int64_t s, int64_t e) {
    if (out) {
      out[2 * rows] = s;
      out[2 * rows + 1] = e;
    }
    rows++;
  };
  if (break_mode == 0) {  // none: fixed blocks over the concatenated stream
    int64_t total = 0;
    for (int64_t i = 0; i < n; i++) total += sizes[i];
    int64_t length = (total + block_size - 1) / block_size;
    for (int64_t i = 0; i < length; i++) {
      int64_t s = i * block_size;
      int64_t e = s + block_size < total ? s + block_size : total;
      emit(s, e);
    }
  } else if (break_mode == 1) {  // complete: whole sentences up to block_size
    int64_t tok = 0, cur = 0, i = 0;
    while (i < n) {
      if (cur + sizes[i] <= block_size || cur == 0) {
        cur += sizes[i];
        i++;
      } else {
        emit(tok, tok + cur);
        tok += cur;
        cur = 0;
      }
    }
    if (cur > 0) emit(tok, tok + cur);
  } else if (break_mode == 2) {  // complete_doc
    int64_t tok = 0, cur = 0, i = 0;
    while (i < n) {
      if ((cur + sizes[i] <= block_size || cur == 0) &&
          sizes[i] != document_sep_len) {
        cur += sizes[i];
        i++;
      } else {
        if (cur > 1) emit(tok, tok + cur);
        tok += cur;
        cur = 0;
        if (sizes[i] == document_sep_len) {
          tok += sizes[i];
          i++;
        }
      }
    }
    if (cur > 1) emit(tok, tok + cur);
  } else {  // eos: one block per sentence
    int64_t start = 0;
    for (int64_t i = 0; i < n; i++) {
      emit(start, start + sizes[i]);
      start += sizes[i];
    }
  }
  return rows;
}

// block -> (start_ds_idx, start_offset, end_ds_idx) mapping
// (fairseq _get_block_to_dataset_index_fast; single linear sweep since
// slices are non-decreasing)
void block_to_dataset_index(const int64_t* sizes, int64_t n,
                            const int64_t* slices, int64_t m, int64_t* out) {
  int64_t ds = 0;        // current dataset index
  int64_t ds_start = 0;  // stream offset where sizes[ds] begins
  auto seek = [&](int64_t pos) {
    while (ds < n - 1 && pos >= ds_start + sizes[ds]) {
      ds_start += sizes[ds];
      ds++;
    }
  };
  for (int64_t i = 0; i < m; i++) {
    int64_t s = slices[2 * i], e = slices[2 * i + 1];
    seek(s);
    out[3 * i] = ds;
    out[3 * i + 1] = s - ds_start;
    int64_t save_ds = ds, save_start = ds_start;
    if (e > s) seek(e - 1);
    out[3 * i + 2] = ds;
    ds = save_ds;  // next slice may start inside the same sentence
    ds_start = save_start;
  }
}

}  // extern "C"
