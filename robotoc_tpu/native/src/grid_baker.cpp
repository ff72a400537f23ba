// Native grid baker: ContactSchedule -> static-shape per-slot arrays.
//
// TPU-native counterpart of the reference's C++ TimeDiscretization
// (reference: src/ocp/time_discretization.cpp:43-120). The jitted solver
// consumes per-slot ARRAYS (planner/contact_sequence.py GridData); baking
// them runs on the host at MPC control rate (400 Hz), so it is implemented
// natively like the reference's, with the Python implementation as the
// reference oracle (tests/test_native.py).
//
// Build: make -C robotoc_tpu/native   (g++ -O2 -shared -fPIC)
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

inline int clampi(int x, int lo, int hi) {
  return x < lo ? lo : (x > hi ? hi : x);
}

}  // namespace

extern "C" {

// Returns 0 on success, -1 if more impact events than reserved slots.
// Layout: S = N + 1 + n_reserved slots. phase arrays have n_events+1 rows
// (phase p is active on [event_times[p-1], event_times[p])). Events must be
// sorted. All outputs preallocated by the caller:
//   t (S), dt (S-1), contact_mask (S*nc), p_ref (S*nc*3), friction (S*nc),
//   is_impact (S), imp_mask (S*nc), R_ref (S*nc*9).
int rtpu_bake_grid(double t0, double T, int N, int n_reserved, int nc,
                   int n_events, const double* event_times,
                   const std::uint8_t* event_is_impact,
                   const std::uint8_t* phase_active,
                   const double* phase_pref, const double* phase_fric,
                   const double* phase_rot,
                   double* t, double* dt, double* contact_mask,
                   double* p_ref, double* friction, double* is_impact,
                   double* imp_mask, double* R_ref) {
  const int S = N + 1 + n_reserved;
  const double h = T / N;

  // uniform boundaries with exact event snapping
  // (time_discretization.cpp:43-90 analog)
  double* bounds = new double[N + 1];
  for (int k = 0; k <= N; ++k) bounds[k] = t0 + h * k;
  // impact boundary index -> newly-active mask accumulated
  std::uint8_t* imp_at = new std::uint8_t[(N + 1) * nc]();
  bool* has_imp = new bool[N + 1]();
  int n_impacts = 0;
  for (int e = 0; e < n_events; ++e) {
    const double te = event_times[e];
    if (te <= t0 || te > t0 + T + 1e-9) continue;
    int b = clampi(static_cast<int>(std::lround((te - t0) / h)), 1, N);
    bounds[b] = te;
    if (event_is_impact[e]) {
      const std::uint8_t* prev = phase_active + e * nc;
      const std::uint8_t* next = phase_active + (e + 1) * nc;
      if (!has_imp[b]) { has_imp[b] = true; ++n_impacts; }
      for (int c = 0; c < nc; ++c)
        imp_at[b * nc + c] |= (next[c] && !prev[c]) ? 1 : 0;
    }
  }
  // keep boundaries monotone
  for (int k = 1; k <= N; ++k)
    bounds[k] = std::max(bounds[k], bounds[k - 1]);
  if (n_impacts > n_reserved) {
    delete[] bounds; delete[] imp_at; delete[] has_imp;
    return -1;
  }

  // phase lookup at time tau (+eps)
  auto phase_at = [&](double tau) {
    int p = 0;
    for (int e = 0; e < n_events; ++e)
      if (tau + 1e-9 >= event_times[e]) p = e + 1;
    return p;
  };
  auto write_row = [&](int row, double tt, double dtt, int p,
                       double imp_flag, const std::uint8_t* imask) {
    t[row] = tt;
    if (row < S - 1) dt[row] = dtt;
    is_impact[row] = imp_flag;
    const std::uint8_t* act = phase_active + p * nc;
    for (int c = 0; c < nc; ++c) {
      contact_mask[row * nc + c] = act[c] ? 1.0 : 0.0;
      friction[row * nc + c] = phase_fric[p * nc + c];
      imp_mask[row * nc + c] = imask ? static_cast<double>(imask[c]) : 0.0;
      std::memcpy(p_ref + (row * nc + c) * 3,
                  phase_pref + (p * nc + c) * 3, 3 * sizeof(double));
      std::memcpy(R_ref + (row * nc + c) * 9,
                  phase_rot + (p * nc + c) * 9, 9 * sizeof(double));
    }
  };

  int row = 0;
  for (int k = 0; k < N; ++k) {
    const double tk = bounds[k], tk1 = bounds[k + 1];
    const int p = phase_at(tk);
    if (has_imp[k]) write_row(row++, tk, 0.0, p, 1.0, imp_at + k * nc);
    write_row(row++, tk, tk1 - tk, p, 0.0, nullptr);
  }
  const double t_end = bounds[N];
  const int p_end = phase_at(t_end);
  for (int r = 0; r < n_reserved - n_impacts; ++r)
    write_row(row++, t_end, 0.0, p_end, 1.0, nullptr);
  if (has_imp[N])
    write_row(row++, t_end, 0.0, p_end, 1.0, imp_at + N * nc);
  write_row(row++, t_end, 0.0, p_end, 0.0, nullptr);  // terminal

  delete[] bounds; delete[] imp_at; delete[] has_imp;
  return row == S ? 0 : -2;
}

}  // extern "C"
