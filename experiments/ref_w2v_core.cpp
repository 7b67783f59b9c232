// Sequential skip-gram reference trainer (test oracle, not a production
// path).  Implements the original word2vec.c / gensim-C update schedule —
// one (center, context) pair at a time, SGNS or hierarchical softmax —
// so experiments/ref_w2v_oracle.py can train the REFERENCE's objective on
// identical walks and compare embedding quality against Word2VecTPU
// (reference backends: gensim C kernels via
// /root/reference/node2vec/embedding.py:120-127; spark.ml HS via
// spark.py:616-631).  Semantics follow the public word2vec.c:
//   * per-position reduced window b = rand % window
//   * input vector = CONTEXT word's syn0 row; prediction target = CENTER
//     word (its syn1neg row + negatives, or its Huffman path)
//   * logits clamped at MAX_EXP=6: SGNS saturates the gradient, HS skips
//   * linear alpha decay to min_alpha over total words
//   * the word2vec.c LCG (next_random * 25214903917 + 11) drives window
//     shrink and negative draws
// Build: g++ -O3 -march=native -fPIC -shared -std=c++17 (done by the
// experiment script on first use).

#include <cmath>
#include <cstdint>

namespace {
constexpr float MAX_EXP = 6.0f;

inline float sigmoid(float x) {
  return 1.0f / (1.0f + std::exp(-x));
}
}  // namespace

extern "C" {

// words: flattened sentences; offsets: [n_sents+1] into words.
// SGNS when negative > 0 (neg_table of size table_size, like word2vec.c's
// 1e8-entry unigram^0.75 table); HS when negative == 0 (points [V, cl]
// int32 inner-node ids, codes [V, cl] uint8, lengths [V]).
int w2v_ref_train(int64_t n_sents, const int64_t* offsets,
                  const int32_t* words, int32_t dim, int32_t window,
                  int32_t negative, int32_t epochs, float alpha0,
                  float min_alpha, const int32_t* points,
                  const uint8_t* codes, const int32_t* lengths, int32_t cl,
                  const int32_t* neg_table, int64_t table_size,
                  uint64_t next_random, float* syn0, float* syn1,
                  float* neu1e /* scratch [dim] */) {
  int64_t total_words = offsets[n_sents] * static_cast<int64_t>(epochs);
  int64_t word_count = 0;
  for (int32_t ep = 0; ep < epochs; ++ep) {
    for (int64_t s = 0; s < n_sents; ++s) {
      int64_t lo = offsets[s], hi = offsets[s + 1];
      for (int64_t i = lo; i < hi; ++i) {
        float alpha =
            alpha0 * (1.0f - static_cast<float>(word_count) / total_words);
        if (alpha < min_alpha) alpha = min_alpha;
        ++word_count;
        int32_t center = words[i];
        next_random = next_random * 25214903917ULL + 11ULL;
        int64_t b = next_random % window;
        for (int64_t j = i - window + b; j <= i + window - b; ++j) {
          if (j == i || j < lo || j >= hi) continue;
          const int32_t ctx = words[j];
          float* l1 = syn0 + static_cast<int64_t>(ctx) * dim;
          for (int32_t d = 0; d < dim; ++d) neu1e[d] = 0.0f;
          if (negative > 0) {
            for (int32_t k = 0; k < negative + 1; ++k) {
              int32_t target;
              float label;
              if (k == 0) {
                target = center;
                label = 1.0f;
              } else {
                next_random = next_random * 25214903917ULL + 11ULL;
                target = neg_table[(next_random >> 16) % table_size];
                if (target == center) continue;
                label = 0.0f;
              }
              float* l2 = syn1 + static_cast<int64_t>(target) * dim;
              float f = 0.0f;
              for (int32_t d = 0; d < dim; ++d) f += l1[d] * l2[d];
              float g;
              if (f > MAX_EXP)
                g = (label - 1.0f) * alpha;
              else if (f < -MAX_EXP)
                g = label * alpha;
              else
                g = (label - sigmoid(f)) * alpha;
              for (int32_t d = 0; d < dim; ++d) neu1e[d] += g * l2[d];
              for (int32_t d = 0; d < dim; ++d) l2[d] += g * l1[d];
            }
          } else {  // hierarchical softmax over the CENTER's Huffman path
            const int32_t len = lengths[center];
            const int32_t* pts = points + static_cast<int64_t>(center) * cl;
            const uint8_t* code = codes + static_cast<int64_t>(center) * cl;
            for (int32_t k = 0; k < len; ++k) {
              float* l2 = syn1 + static_cast<int64_t>(pts[k]) * dim;
              float f = 0.0f;
              for (int32_t d = 0; d < dim; ++d) f += l1[d] * l2[d];
              if (f <= -MAX_EXP || f >= MAX_EXP) continue;  // word2vec.c HS rule
              float g = (1.0f - code[k] - sigmoid(f)) * alpha;
              for (int32_t d = 0; d < dim; ++d) neu1e[d] += g * l2[d];
              for (int32_t d = 0; d < dim; ++d) l2[d] += g * l1[d];
            }
          }
          for (int32_t d = 0; d < dim; ++d) l1[d] += neu1e[d];
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
