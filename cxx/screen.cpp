// Host-side quartet screening runtime.
//
// The TPU-native equivalent of the reference's (Rust) host-side integral
// bookkeeping: enumerating unique shell quartets for a pair-group pair,
// applying the Schwarz bound |(P|Q)| <= q_P q_Q, computing the 8-fold
// coincidence weights, and packing the surviving quartets. This is the
// O(npairs^2) host loop that dominates setup time for large systems when
// done in Python; here it is a small C++ library loaded via ctypes
// (qchem_rs_tpu/utils/native.py) with a numpy fallback.
//
// mode 0: count surviving quartets only.
// mode 1: fill br/kt/weight (caller allocated with the count from mode 0).

#include <cstdint>

extern "C" {

int64_t screened_quartets_cxx(
    int64_t n1, int64_t n2, int same_group,
    const int64_t* i_sh1, const int64_t* j_sh1,
    const int64_t* i_sh2, const int64_t* j_sh2,
    const double* q1, const double* q2,
    double threshold, int mode,
    int64_t* br, int64_t* kt, double* weight) {
  int64_t count = 0;
  for (int64_t p = 0; p < n1; ++p) {
    const double qp = q1[p];
    const int64_t qstart = same_group ? p : 0;
    for (int64_t q = qstart; q < n2; ++q) {
      if (threshold > 0.0 && qp * q2[q] <= threshold) continue;
      if (mode == 1) {
        double w = 1.0;
        if (i_sh1[p] == j_sh1[p]) w *= 0.5;
        if (i_sh2[q] == j_sh2[q]) w *= 0.5;
        if (same_group && p == q) w *= 0.5;
        br[count] = p;
        kt[count] = q;
        weight[count] = w;
      }
      ++count;
    }
  }
  return count;
}

// Schwarz-style bound on the number of significant pairs (utility used by
// diagnostics): count pairs with q above threshold.
int64_t count_significant_pairs_cxx(int64_t n, const double* q, double threshold) {
  int64_t c = 0;
  for (int64_t i = 0; i < n; ++i)
    if (q[i] > threshold) ++c;
  return c;
}

}  // extern "C"
