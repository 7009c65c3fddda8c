// Fast CIDEr-D scorer over token-id n-grams (C ABI, loaded via ctypes).
//
// The SCST training loop computes CIDEr twice per step (sampled + greedy
// rollouts, reference utils/scst_loss.py:179-180).  The Python id-space scorer
// (eval/cider.py CiderDFast) is semantically identical; this implementation
// removes the per-step Python n-gram/dict overhead from the host side of the
// RL loop.  Scoring semantics match pycocoevalcap's CiderScorer: n-grams 1..4,
// doc-freq counted once per image over its refs, idf = log(N) - log(max(1,df)),
// CIDEr-D clipped similarity min(h,r)*r / norms, gaussian length penalty
// (sigma 6), score = 10 * mean_n(avg over refs).
//
// Token ids pack 16 bits each into a uint64 key (vocab < 2^16, n <= 4).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libcider.so cider.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr int kMaxN = 4;
constexpr double kSigma = 6.0;

using NgramMap = std::unordered_map<uint64_t, double>;

struct RefVec {
  NgramMap vec[kMaxN];
  double norm[kMaxN];
  int length;
};

struct CiderHandle {
  std::unordered_map<uint64_t, int> doc_freq[kMaxN];
  std::vector<std::vector<RefVec>> refs;  // per image, per ref
  double log_n;
};

void count_ngrams(const int32_t* toks, int len, NgramMap (&counts)[kMaxN]) {
  for (int n = 1; n <= kMaxN; ++n) {
    NgramMap& c = counts[n - 1];
    for (int i = 0; i + n <= len; ++i) {
      uint64_t h = 0;
      for (int j = 0; j < n; ++j) {
        h = (h << 16) | (static_cast<uint64_t>(toks[i + j]) & 0xFFFF);
      }
      c[h] += 1.0;
    }
  }
}

void tfidf(const CiderHandle& H, NgramMap (&counts)[kMaxN], RefVec* out) {
  for (int k = 0; k < kMaxN; ++k) {
    double norm = 0.0;
    NgramMap& vec = out->vec[k];
    vec.clear();
    const auto& dfk = H.doc_freq[k];
    for (const auto& [ng, tf] : counts[k]) {
      auto it = dfk.find(ng);
      double df = (it == dfk.end()) ? 0.0 : it->second;
      double idf = H.log_n - std::log(std::max(1.0, df));
      double w = static_cast<double>(tf) * idf;
      vec[ng] = w;
      norm += w * w;
    }
    out->norm[k] = std::sqrt(norm);
  }
}

}  // namespace

extern "C" {

// refs_flat: concatenated token ids for every ref of every image.
// ref_offsets[r] .. ref_offsets[r+1]: token span of ref r (n_refs_total+1 entries).
// image_ref_offsets[i] .. image_ref_offsets[i+1]: ref-index span of image i
// (n_images+1 entries).
void* cider_init(const int32_t* refs_flat, const int64_t* ref_offsets,
                 const int64_t* image_ref_offsets, int64_t n_images) {
  auto* H = new CiderHandle();
  H->refs.resize(n_images);
  H->log_n = std::log(std::max<double>(1.0, static_cast<double>(n_images)));

  // Pass 1: doc freq (each ngram once per image).
  for (int64_t img = 0; img < n_images; ++img) {
    std::unordered_set<uint64_t> seen[kMaxN];
    for (int64_t r = image_ref_offsets[img]; r < image_ref_offsets[img + 1]; ++r) {
      const int32_t* toks = refs_flat + ref_offsets[r];
      int len = static_cast<int>(ref_offsets[r + 1] - ref_offsets[r]);
      NgramMap counts[kMaxN];
      count_ngrams(toks, len, counts);
      for (int k = 0; k < kMaxN; ++k)
        for (const auto& [ng, _] : counts[k]) seen[k].insert(ng);
    }
    for (int k = 0; k < kMaxN; ++k)
      for (uint64_t ng : seen[k]) H->doc_freq[k][ng] += 1;
  }

  // Pass 2: ref tf-idf vectors.
  for (int64_t img = 0; img < n_images; ++img) {
    auto& per_image = H->refs[img];
    for (int64_t r = image_ref_offsets[img]; r < image_ref_offsets[img + 1]; ++r) {
      const int32_t* toks = refs_flat + ref_offsets[r];
      int len = static_cast<int>(ref_offsets[r + 1] - ref_offsets[r]);
      NgramMap counts[kMaxN];
      count_ngrams(toks, len, counts);
      per_image.emplace_back();
      RefVec& rv = per_image.back();
      tfidf(*H, counts, &rv);
      rv.length = len;
    }
  }
  return H;
}

// hyps: one hypothesis per image; hyp_offsets has n_images+1 entries.
void cider_score(void* handle, const int32_t* hyps_flat, const int64_t* hyp_offsets,
                 int64_t n_images, double* out_scores) {
  auto* H = static_cast<CiderHandle*>(handle);
  for (int64_t img = 0; img < n_images; ++img) {
    const int32_t* toks = hyps_flat + hyp_offsets[img];
    int len = static_cast<int>(hyp_offsets[img + 1] - hyp_offsets[img]);
    NgramMap counts[kMaxN];
    count_ngrams(toks, len, counts);
    RefVec hv;
    tfidf(*H, counts, &hv);
    hv.length = len;

    const auto& image_refs = H->refs[img];
    double acc[kMaxN] = {0, 0, 0, 0};
    for (const RefVec& rv : image_refs) {
      double delta = static_cast<double>(hv.length - rv.length);
      double penalty = std::exp(-(delta * delta) / (2.0 * kSigma * kSigma));
      for (int k = 0; k < kMaxN; ++k) {
        double s = 0.0;
        for (const auto& [ng, w] : hv.vec[k]) {
          auto it = rv.vec[k].find(ng);
          if (it != rv.vec[k].end()) {
            s += std::min(w, it->second) *
                 it->second;
          }
        }
        if (hv.norm[k] != 0.0 && rv.norm[k] != 0.0) s /= hv.norm[k] * rv.norm[k];
        acc[k] += s * penalty;
      }
    }
    double mean = (acc[0] + acc[1] + acc[2] + acc[3]) / kMaxN;
    out_scores[img] =
        image_refs.empty() ? 0.0 : mean / static_cast<double>(image_refs.size()) * 10.0;
  }
}

void cider_free(void* handle) { delete static_cast<CiderHandle*>(handle); }

}  // extern "C"
