// Exact OOD metrics (AUPRC / AUROC / FPR@95TPR) over flattened pixel scores.
//
// Host-side native runtime component: the reference's evaluation pipeline
// spends its second-largest chunk of time in sklearn's sort over ~60 images
// x 2M pixels (support.py:270-303, SURVEY.md §3.1).  This implements the
// same metrics with an O(n) LSD radix sort on bit-flipped float keys plus a
// single linear sweep — typically ~10x faster than numpy argsort paths —
// exposed through a C ABI for ctypes.
//
// Labels: 0 = inlier, 1 = anomaly, anything else ignored.
// Build: python -m rba_tpu.native.build   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// map float bits to uint32 so unsigned ordering == float ordering
static inline uint32_t key_of(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  return (u & 0x80000000u) ? ~u : (u | 0x80000000u);
}

// 4-pass LSD radix sort of (key, label) pairs by key, ascending
void radix_sort(std::vector<uint32_t>& keys, std::vector<uint8_t>& labs) {
  const size_t n = keys.size();
  std::vector<uint32_t> tk(n);
  std::vector<uint8_t> tl(n);
  for (int shift = 0; shift < 32; shift += 8) {
    size_t count[257] = {0};
    for (size_t i = 0; i < n; i++) count[((keys[i] >> shift) & 0xFF) + 1]++;
    for (int b = 0; b < 256; b++) count[b + 1] += count[b];
    for (size_t i = 0; i < n; i++) {
      size_t& pos = count[(keys[i] >> shift) & 0xFF];
      tk[pos] = keys[i];
      tl[pos] = labs[i];
      pos++;
    }
    keys.swap(tk);
    labs.swap(tl);
  }
}

}  // namespace

extern "C" {

// scores: n floats; labels: n int32.  out: [auprc, auroc, fpr95].
// returns 0 on success, 1 if either class is empty.
int rba_exact_ood_metrics(const float* scores, const int32_t* labels,
                          int64_t n, double* out) {
  std::vector<uint32_t> keys;
  std::vector<uint8_t> labs;
  keys.reserve(n);
  labs.reserve(n);
  for (int64_t i = 0; i < n; i++) {
    if (labels[i] == 0 || labels[i] == 1) {
      keys.push_back(key_of(scores[i]));
      labs.push_back(static_cast<uint8_t>(labels[i]));
    }
  }
  const size_t m = keys.size();
  double p_total = 0;
  for (size_t i = 0; i < m; i++) p_total += labs[i];
  const double n_total = static_cast<double>(m) - p_total;
  if (p_total == 0 || n_total == 0) return 1;

  radix_sort(keys, labs);

  // sweep descending score; group ties (equal keys) into one threshold step
  double tp = 0, fp = 0;
  double auprc = 0, auroc = 0;
  double prev_recall = 0, prev_fpr = 0, prev_tpr = 0;
  double fpr95 = 1.0;
  bool fpr95_set = false;
  size_t i = m;
  while (i > 0) {
    const uint32_t k = keys[i - 1];
    double dtp = 0, dfp = 0;
    while (i > 0 && keys[i - 1] == k) {
      if (labs[i - 1]) dtp += 1; else dfp += 1;
      i--;
    }
    tp += dtp;
    fp += dfp;
    const double recall = tp / p_total;
    const double precision = tp / (tp + fp);
    auprc += (recall - prev_recall) * precision;  // sklearn AP: step-wise sum
    const double fpr = fp / n_total;
    const double tpr = recall;
    auroc += (fpr - prev_fpr) * (tpr + prev_tpr) * 0.5;  // trapezoid
    // first tpr strictly > 0.95 (reference support.py:252-255)
    if (!fpr95_set && tpr > 0.95) {
      fpr95 = fpr;
      fpr95_set = true;
    }
    prev_recall = recall;
    prev_fpr = fpr;
    prev_tpr = tpr;
  }
  out[0] = auprc;
  out[1] = auroc;
  out[2] = fpr95;
  return 0;
}

// Exact rectangular linear-sum-assignment (Jonker-Volgenant shortest
// augmenting path — the same algorithm scipy uses, and the host-side
// counterpart of rba_tpu/ops/lsap.py).  cost: nr x nc row-major, nr <= nc.
// col4row: nr outputs.  returns 0 on success.
int rba_lsap(const double* cost, int32_t nr, int32_t nc, int32_t* col4row_out) {
  const double INF = 1e30;
  std::vector<double> u(nr, 0.0), v(nc, 0.0);
  std::vector<int32_t> row4col(nc, -1), col4row(nr, -1);
  std::vector<double> spc(nc);
  std::vector<int32_t> path(nc);
  std::vector<char> sr(nr), sc(nc);

  for (int32_t cur = 0; cur < nr; cur++) {
    std::fill(spc.begin(), spc.end(), INF);
    std::fill(sr.begin(), sr.end(), 0);
    std::fill(sc.begin(), sc.end(), 0);
    std::fill(path.begin(), path.end(), -1);
    int32_t i = cur, sink = -1;
    double minv = 0;
    while (sink < 0) {
      sr[i] = 1;
      double lowest = INF;
      int32_t j_min = -1;
      for (int32_t j = 0; j < nc; j++) {
        if (sc[j]) continue;
        const double r = minv + cost[static_cast<int64_t>(i) * nc + j] - u[i] - v[j];
        if (r < spc[j]) {
          spc[j] = r;
          path[j] = i;
        }
        if (spc[j] < lowest || (spc[j] == lowest && row4col[j] == -1)) {
          lowest = spc[j];
          j_min = j;
        }
      }
      if (lowest == INF) return 1;  // infeasible
      minv = lowest;
      if (row4col[j_min] == -1) sink = j_min;
      else i = row4col[j_min];
      sc[j_min] = 1;
    }
    u[cur] += minv;
    for (int32_t k = 0; k < nr; k++)
      if (sr[k] && k != cur) u[k] += minv - spc[col4row[k]];
    for (int32_t j = 0; j < nc; j++)
      if (sc[j]) v[j] -= minv - spc[j];
    int32_t j = sink;
    while (true) {
      const int32_t r = path[j];
      row4col[j] = r;
      const int32_t tmp = col4row[r];
      col4row[r] = j;
      j = tmp;
      if (r == cur) break;
    }
  }
  std::memcpy(col4row_out, col4row.data(), sizeof(int32_t) * nr);
  return 0;
}

}  // extern "C"
