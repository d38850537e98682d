// treekit: native host-side trie data path.
//
// The per-step input pipeline — adjacent LCPs, DFS flattening (tokens, depth,
// parent, last_desc), loss-weight accumulation, and block-sparse mask
// metadata — is O(total tokens) host work that runs every training step on
// fresh rollouts. The reference keeps the analogous work in Python/torch-CPU
// (reference: token_trie.py, trie.py, tree_training_engine.py:_get_forkpos);
// at production batch sizes it belongs in native code. Python bindings via
// ctypes (tries/_native.py); the numpy implementation remains as fallback and
// as the differential-test oracle.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libtreekit.so treekit.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Adjacent longest-common-prefix lengths of sorted sequences.
// flat: concatenated tokens; offsets: [n_seqs+1]; out: [n_seqs-1].
void tk_lcp_adjacent(const int32_t* flat, const int64_t* offsets,
                     int64_t n_seqs, int64_t* out) {
  for (int64_t i = 0; i + 1 < n_seqs; ++i) {
    const int32_t* a = flat + offsets[i];
    const int32_t* b = flat + offsets[i + 1];
    int64_t la = offsets[i + 1] - offsets[i];
    int64_t lb = offsets[i + 2] - offsets[i + 1];
    int64_t m = la < lb ? la : lb;
    int64_t l = 0;
    while (l < m && a[l] == b[l]) ++l;
    out[i] = l;
  }
}

// DFS flattening of a sorted+LCP'd leaf list into the packed layout.
// Outputs must be sized n_tree_tokens = sum(lens) - sum(lcps).
// Returns the packed token count actually written (for validation).
int64_t tk_flatten(const int32_t* flat, const int64_t* offsets,
                   const int64_t* lcps /* [n_seqs-1] */, int64_t n_seqs,
                   int32_t* tokens, int32_t* depth, int32_t* parent,
                   int32_t* last_desc) {
  int64_t max_len = 0;
  for (int64_t i = 0; i < n_seqs; ++i)
    max_len = std::max(max_len, offsets[i + 1] - offsets[i]);
  std::vector<int64_t> stack_pos(static_cast<size_t>(max_len) + 1, -1);

  int64_t cursor = 0;
  for (int64_t i = 0; i < n_seqs; ++i) {
    const int32_t* seq = flat + offsets[i];
    int64_t len = offsets[i + 1] - offsets[i];
    int64_t start = i == 0 ? 0 : lcps[i - 1];
    for (int64_t t = start; t < len; ++t) {
      tokens[cursor] = seq[t];
      depth[cursor] = static_cast<int32_t>(t);
      parent[cursor] =
          t == 0 ? -1 : static_cast<int32_t>(stack_pos[t - 1]);
      stack_pos[t] = cursor;
      ++cursor;
    }
  }

  // last_desc via monotone depth stack.
  int64_t n = cursor;
  std::vector<int64_t> st;
  st.reserve(static_cast<size_t>(max_len) + 1);
  for (int64_t j = 0; j < n; ++j) {
    while (!st.empty() && depth[st.back()] >= depth[j]) {
      last_desc[st.back()] = static_cast<int32_t>(j - 1);
      st.pop_back();
    }
    st.push_back(j);
  }
  for (int64_t j : st) last_desc[j] = static_cast<int32_t>(n - 1);
  return n;
}

// Reverse parent-chain accumulation (loss endpoint weights -> per-position).
void tk_accumulate_up(const int32_t* parent, int64_t n, double* acc_a,
                      double* acc_b) {
  for (int64_t j = n - 1; j >= 0; --j) {
    int32_t p = parent[j];
    if (p >= 0) {
      acc_a[p] += acc_a[j];
      acc_b[p] += acc_b[j];
    }
  }
}

// Block-sparse tree-mask metadata.
// Phase 1: per-row active counts for both orientations.
void tk_block_counts(const int32_t* last_desc, int64_t n, int64_t bq,
                     int64_t bk, int32_t* kv_counts /* [nq] */,
                     int32_t* q_counts /* [nk] */) {
  int64_t nq = n / bq, nk = n / bk;
  std::vector<int64_t> ld_max(nk, INT64_MIN);
  for (int64_t k = 0; k < n; ++k) {
    int64_t blk = k / bk;
    ld_max[blk] = std::max<int64_t>(ld_max[blk], last_desc[k]);
  }
  std::memset(kv_counts, 0, sizeof(int32_t) * nq);
  std::memset(q_counts, 0, sizeof(int32_t) * nk);
  for (int64_t i = 0; i < nq; ++i) {
    int64_t qs = i * bq, qe = qs + bq;
    for (int64_t j = 0; j < nk; ++j) {
      bool active = (j * bk < qe) && (ld_max[j] >= qs);
      if (active) {
        ++kv_counts[i];
        ++q_counts[j];
      }
    }
  }
}

// Phase 2: fill compacted id/type tables (widths chosen by the caller).
// types: 2 = FULL (no masking), 1 = partial, 0 = padding slot.
void tk_block_fill(const int32_t* last_desc, int64_t n, int64_t bq, int64_t bk,
                   int64_t kv_width, int64_t q_width,
                   int32_t* kv_ids, int32_t* kv_types, int32_t* q_ids,
                   int32_t* q_types) {
  int64_t nq = n / bq, nk = n / bk;
  std::vector<int64_t> ld_max(nk, INT64_MIN), ld_min(nk, INT64_MAX);
  for (int64_t k = 0; k < n; ++k) {
    int64_t blk = k / bk;
    ld_max[blk] = std::max<int64_t>(ld_max[blk], last_desc[k]);
    ld_min[blk] = std::min<int64_t>(ld_min[blk], last_desc[k]);
  }
  std::vector<int64_t> kv_fill(nq, 0), q_fill(nk, 0);
  for (int64_t i = 0; i < nq; ++i) {
    int64_t qs = i * bq, qe = qs + bq;
    for (int64_t j = 0; j < nk; ++j) {
      int64_t ks = j * bk, ke = ks + bk;
      bool active = (ks < qe) && (ld_max[j] >= qs);
      if (!active) continue;
      bool full = (ke - 1 <= qs) && (ld_min[j] >= qe - 1);
      int32_t typ = full ? 2 : 1;
      kv_ids[i * kv_width + kv_fill[i]] = static_cast<int32_t>(j);
      kv_types[i * kv_width + kv_fill[i]] = typ;
      ++kv_fill[i];
      q_ids[j * q_width + q_fill[j]] = static_cast<int32_t>(i);
      q_types[j * q_width + q_fill[j]] = typ;
      ++q_fill[j];
    }
  }
  // repeat-pad (pipeline re-uses the fetched block), type 0 = skip compute
  for (int64_t i = 0; i < nq; ++i) {
    int32_t last = kv_ids[i * kv_width + kv_fill[i] - 1];
    for (int64_t s = kv_fill[i]; s < kv_width; ++s) {
      kv_ids[i * kv_width + s] = last;
      kv_types[i * kv_width + s] = 0;
    }
  }
  for (int64_t j = 0; j < nk; ++j) {
    int32_t last = q_ids[j * q_width + q_fill[j] - 1];
    for (int64_t s = q_fill[j]; s < q_width; ++s) {
      q_ids[j * q_width + s] = last;
      q_types[j * q_width + s] = 0;
    }
  }
}

}  // extern "C"

extern "C" {

// Endpoint positions for sequence attachments: replay the DFS stack sweep
// (offsets/lcps as in tk_flatten) and, for each query (leaf index asc,
// length), record the packed position of the path node at depth length-1.
// Queries MUST be sorted by leaf index (tk callers emit them in leaf order).
void tk_endpoints(const int64_t* offsets, const int64_t* lcps,
                  int64_t n_seqs, const int64_t* q_leaf, const int64_t* q_len,
                  int64_t n_q, int64_t* out_end) {
  int64_t max_len = 0;
  for (int64_t i = 0; i < n_seqs; ++i)
    max_len = std::max(max_len, offsets[i + 1] - offsets[i]);
  std::vector<int64_t> stack_pos(static_cast<size_t>(max_len) + 1, -1);
  int64_t cursor = 0;
  int64_t qi = 0;
  for (int64_t i = 0; i < n_seqs; ++i) {
    int64_t len = offsets[i + 1] - offsets[i];
    int64_t start = i == 0 ? 0 : lcps[i - 1];
    for (int64_t t = start; t < len; ++t) stack_pos[t] = cursor++;
    while (qi < n_q && q_leaf[qi] == i) {
      out_end[qi] = stack_pos[q_len[qi] - 1];
      ++qi;
    }
  }
}

// Per-sequence root->endpoint packed paths, one walk up the parent chain
// each. paths is [n_q, lmax] row-major, pre-filled with -1 by the caller.
void tk_seq_paths(const int32_t* parent, const int64_t* end_pos,
                  const int64_t* seq_len, int64_t n_q, int64_t lmax,
                  int32_t* paths) {
  for (int64_t s = 0; s < n_q; ++s) {
    int64_t pos = end_pos[s];
    for (int64_t d = seq_len[s] - 1; d >= 0; --d) {
      paths[s * lmax + d] = static_cast<int32_t>(pos);
      pos = parent[pos];
    }
  }
}

}  // extern "C"
