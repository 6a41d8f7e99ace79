// Dense CRF mean-field inference with a bilateral permutohedral kernel, C++.
//
// Native equivalent of the pydensecrf/densecrf library the reference uses for
// mask refinement (SURVEY.md C21; post_processing/crf_refine.py:110-129):
// 2-label DenseCRF2D, one bilateral pairwise term on
// (x/sxy, y/sxy, r/srgb, g/srgb, b/srgb) with Potts compatibility and
// symmetric kernel normalization, N mean-field iterations, argmax labeling.
//
// The permutohedral lattice follows Adams et al. 2010 as used by densecrf:
// simplex embedding with canonical scale factors, barycentric splat,
// [0.5, 1, 0.5] blur along each of the d+1 lattice directions with a zero
// virtual node, slice with alpha = 1 / (1 + 2^-d). Semantics match the
// Python engine in unsupervised_detection_tpu/postproc/permutohedral.py
// (cross-checked by tests), roughly 20-50x faster.
//
// Exposed through a plain C ABI; Python binds via ctypes
// (unsupervised_detection_tpu/native/densecrf.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// Hash for lattice keys of dimensionality d (stored contiguously).
struct KeyHash {
  const std::vector<int16_t>* keys;
  int d;
  size_t operator()(int32_t idx) const {
    const int16_t* k = keys->data() + (size_t)idx * d;
    size_t h = 0;
    for (int j = 0; j < d; j++) h = h * 2531011 + (size_t)(uint16_t)k[j];
    return h;
  }
};
struct KeyEq {
  const std::vector<int16_t>* keys;
  int d;
  bool operator()(int32_t a, int32_t b) const {
    const int16_t* ka = keys->data() + (size_t)a * d;
    const int16_t* kb = keys->data() + (size_t)b * d;
    return std::memcmp(ka, kb, sizeof(int16_t) * d) == 0;
  }
};

class Permutohedral {
 public:
  void init(const float* features, int n, int d) {
    n_ = n;
    d_ = d;
    offsets_.assign((size_t)n * (d + 1), 0);
    bary_.assign((size_t)n * (d + 1), 0.f);

    std::vector<int16_t> keys;  // candidate keys, d per entry
    keys.reserve((size_t)n * (d + 1) * d);
    std::unordered_map<int32_t, int32_t, KeyHash, KeyEq> table(
        (size_t)n, KeyHash{&keys, d}, KeyEq{&keys, d});

    std::vector<float> scale(d);
    const float inv_std_dev = std::sqrt(2.0f / 3.0f) * (d + 1);
    for (int j = 0; j < d; j++)
      scale[j] = inv_std_dev / std::sqrt((float)(j + 1) * (j + 2));

    std::vector<float> elevated(d + 1), rem0(d + 1), barycentric(d + 2);
    std::vector<int> rank(d + 1);
    std::vector<int16_t> key(d);

    for (int i = 0; i < n; i++) {
      const float* f = features + (size_t)i * d;
      // elevate
      float sm = 0;
      for (int j = d; j > 0; j--) {
        float cf = f[j - 1] * scale[j - 1];
        elevated[j] = sm - j * cf;
        sm += cf;
      }
      elevated[0] = sm;

      // nearest remainder-0 point
      int sum = 0;
      for (int j = 0; j <= d; j++) {
        float v = elevated[j] / (d + 1);
        float up = std::ceil(v) * (d + 1);
        float down = std::floor(v) * (d + 1);
        rem0[j] = (up - elevated[j] < elevated[j] - down) ? up : down;
        sum += (int)std::lround(rem0[j] / (d + 1));
      }

      // rank differential
      std::fill(rank.begin(), rank.end(), 0);
      for (int j = 0; j < d; j++) {
        double dj = elevated[j] - rem0[j];
        for (int k = j + 1; k <= d; k++) {
          double dk = elevated[k] - rem0[k];
          if (dj < dk)
            rank[j]++;
          else
            rank[k]++;
        }
      }
      for (int j = 0; j <= d; j++) {
        rank[j] += sum;
        if (rank[j] < 0) {
          rank[j] += d + 1;
          rem0[j] += d + 1;
        } else if (rank[j] > d) {
          rank[j] -= d + 1;
          rem0[j] -= d + 1;
        }
      }

      // barycentric coordinates
      std::fill(barycentric.begin(), barycentric.end(), 0.f);
      for (int j = 0; j <= d; j++) {
        float delta = (elevated[j] - rem0[j]) / (d + 1);
        barycentric[d - rank[j]] += delta;
        barycentric[d + 1 - rank[j]] -= delta;
      }
      barycentric[0] += 1.0f + barycentric[d + 1];

      // splat keys per simplex corner
      for (int remainder = 0; remainder <= d; remainder++) {
        for (int j = 0; j < d; j++) {
          key[j] = (int16_t)((int)rem0[j] + remainder -
                             (rank[j] >= d + 1 - remainder ? d + 1 : 0));
        }
        int32_t cand = (int32_t)(keys.size() / d);
        keys.insert(keys.end(), key.begin(), key.end());
        auto ins = table.emplace(cand, (int32_t)table.size());
        if (!ins.second) keys.resize(keys.size() - d);  // duplicate key
        offsets_[(size_t)i * (d + 1) + remainder] = ins.first->second;
        bary_[(size_t)i * (d + 1) + remainder] = barycentric[remainder];
      }
    }

    m_ = (int)table.size();

    // canonical key array indexed by lattice id
    std::vector<int16_t> lattice_keys((size_t)m_ * d);
    for (const auto& kv : table) {
      std::memcpy(lattice_keys.data() + (size_t)kv.second * d,
                  keys.data() + (size_t)kv.first * d, sizeof(int16_t) * d);
    }

    // blur neighbors (missing -> m_, the zero virtual node)
    blur_n1_.assign((size_t)(d + 1) * m_, m_);
    blur_n2_.assign((size_t)(d + 1) * m_, m_);
    // rebuild lookup over canonical keys
    std::vector<int16_t> lookup_keys = lattice_keys;
    std::unordered_map<int32_t, int32_t, KeyHash, KeyEq> lut(
        (size_t)m_, KeyHash{&lookup_keys, d}, KeyEq{&lookup_keys, d});
    for (int32_t i = 0; i < m_; i++) lut.emplace(i, i);

    std::vector<int16_t> np_key(d);
    lookup_keys.resize((size_t)(m_ + 1) * d);  // scratch slot for probes
    for (int j = 0; j <= d; j++) {
      for (int32_t i = 0; i < m_; i++) {
        const int16_t* k = lattice_keys.data() + (size_t)i * d;
        for (int t = 0; t < d; t++) np_key[t] = k[t] + 1;
        if (j < d) np_key[j] = k[j] - d;
        std::memcpy(lookup_keys.data() + (size_t)m_ * d, np_key.data(),
                    sizeof(int16_t) * d);
        auto it = lut.find(m_);
        blur_n1_[(size_t)j * m_ + i] = (it != lut.end()) ? it->second : m_;

        for (int t = 0; t < d; t++) np_key[t] = k[t] - 1;
        if (j < d) np_key[j] = k[j] + d;
        std::memcpy(lookup_keys.data() + (size_t)m_ * d, np_key.data(),
                    sizeof(int16_t) * d);
        it = lut.find(m_);
        blur_n2_[(size_t)j * m_ + i] = (it != lut.end()) ? it->second : m_;
      }
    }
    alpha_ = 1.0f / (1.0f + std::pow(2.0f, -(float)d));
  }

  // Filter (n, c) values through the lattice.
  void compute(const float* values, float* out, int c) const {
    std::vector<float> lattice((size_t)(m_ + 1) * c, 0.f);
    std::vector<float> lattice2((size_t)(m_ + 1) * c, 0.f);

    // splat
    for (int i = 0; i < n_; i++) {
      for (int k = 0; k <= d_; k++) {
        int32_t o = offsets_[(size_t)i * (d_ + 1) + k];
        float b = bary_[(size_t)i * (d_ + 1) + k];
        for (int ch = 0; ch < c; ch++)
          lattice[(size_t)o * c + ch] += b * values[(size_t)i * c + ch];
      }
    }

    // blur along each direction
    float* cur = lattice.data();
    float* nxt = lattice2.data();
    for (int j = 0; j <= d_; j++) {
      for (int32_t i = 0; i < m_; i++) {
        const float* v = cur + (size_t)i * c;
        const float* a = cur + (size_t)blur_n1_[(size_t)j * m_ + i] * c;
        const float* b = cur + (size_t)blur_n2_[(size_t)j * m_ + i] * c;
        float* o = nxt + (size_t)i * c;
        for (int ch = 0; ch < c; ch++) o[ch] = v[ch] + 0.5f * (a[ch] + b[ch]);
      }
      std::memset(nxt + (size_t)m_ * c, 0, sizeof(float) * c);
      std::swap(cur, nxt);
    }

    // slice
    for (int i = 0; i < n_; i++) {
      float* o = out + (size_t)i * c;
      std::fill(o, o + c, 0.f);
      for (int k = 0; k <= d_; k++) {
        int32_t off = offsets_[(size_t)i * (d_ + 1) + k];
        float b = bary_[(size_t)i * (d_ + 1) + k];
        for (int ch = 0; ch < c; ch++) o[ch] += b * cur[(size_t)off * c + ch];
      }
      for (int ch = 0; ch < c; ch++) o[ch] *= alpha_;
    }
  }

 private:
  int n_ = 0, d_ = 0, m_ = 0;
  float alpha_ = 1.f;
  std::vector<int32_t> offsets_;
  std::vector<float> bary_;
  std::vector<int32_t> blur_n1_, blur_n2_;
};

}  // namespace

extern "C" {

// 2-label dense CRF mean field.
//   unary: (2, h*w) negative log probabilities (label-major)
//   image: (h*w, 3) uint8 RGB
//   q_out: (2, h*w) final marginals
int dense_crf_binary(const float* unary, const uint8_t* image, int h, int w,
                     float sxy, float srgb, float compat, int n_iterations,
                     float* q_out) {
  const int n = h * w;
  const int d = 5;

  std::vector<float> feats((size_t)n * d);
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++) {
      size_t i = (size_t)y * w + x;
      feats[i * d + 0] = x / sxy;
      feats[i * d + 1] = y / sxy;
      feats[i * d + 2] = image[i * 3 + 0] / srgb;
      feats[i * d + 3] = image[i * 3 + 1] / srgb;
      feats[i * d + 4] = image[i * 3 + 2] / srgb;
    }

  Permutohedral lattice;
  lattice.init(feats.data(), n, d);

  // symmetric normalization
  std::vector<float> ones((size_t)n, 1.f), norm((size_t)n);
  lattice.compute(ones.data(), norm.data(), 1);
  for (int i = 0; i < n; i++)
    norm[i] = 1.0f / std::sqrt(std::max(norm[i], 1e-20f));

  // q layout: (n, 2) interleaved for the filter
  std::vector<float> q((size_t)n * 2), tmp((size_t)n * 2), filtered((size_t)n * 2);
  for (int i = 0; i < n; i++) {
    float a = -unary[i];          // label 0
    float b = -unary[n + i];      // label 1
    float mx = std::max(a, b);
    float ea = std::exp(a - mx), eb = std::exp(b - mx);
    q[(size_t)i * 2] = ea / (ea + eb);
    q[(size_t)i * 2 + 1] = eb / (ea + eb);
  }

  for (int it = 0; it < n_iterations; it++) {
    for (int i = 0; i < n; i++) {
      tmp[(size_t)i * 2] = q[(size_t)i * 2] * norm[i];
      tmp[(size_t)i * 2 + 1] = q[(size_t)i * 2 + 1] * norm[i];
    }
    lattice.compute(tmp.data(), filtered.data(), 2);
    for (int i = 0; i < n; i++) {
      // Potts: pairwise = -compat * filtered (same label support)
      float a = -unary[i] + compat * filtered[(size_t)i * 2] * norm[i];
      float b = -unary[n + i] + compat * filtered[(size_t)i * 2 + 1] * norm[i];
      float mx = std::max(a, b);
      float ea = std::exp(a - mx), eb = std::exp(b - mx);
      q[(size_t)i * 2] = ea / (ea + eb);
      q[(size_t)i * 2 + 1] = eb / (ea + eb);
    }
  }

  for (int i = 0; i < n; i++) {
    q_out[i] = q[(size_t)i * 2];
    q_out[n + i] = q[(size_t)i * 2 + 1];
  }
  return 0;
}

}  // extern "C"
