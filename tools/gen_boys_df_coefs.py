"""Generate Chebyshev coefficient tables for the double-float Boys function.

Writes qchem_rs_tpu/ops/_boys_df_coefs.py. Run offline (CPU, f64):

    python tools/gen_boys_df_coefs.py

Fits:
- F0 on [0, 36] in NPIECE equal pieces (abs err <= ~3e-15); T > 36 uses the
  asymptotic 0.5*sqrt(pi/T) exactly (erfc(6) = 2.15e-17 relative).
- For L = 1..16: the SCALED function S_L(T) = F_L(T) * exp(T) (the
  all-positive Kummer sum), fitted in equal pieces on [0, T_switch(L)].
  Fitting S instead of F keeps the piece's dynamic range small, so the
  Chebyshev coefficients are O(min S) and the double-float Clenshaw
  evaluation stays ~1e-14 RELATIVE everywhere (a direct F fit loses
  ~dynamic-range x 1e-14 near the right edge — measured 4e-12 at L=8,
  1e-8 at L=16). The kernel reconstructs F = S * exp(-T) with the exp(-T)
  it already computes for the recursion ladders.
- T_switch(L): smallest grid T where f64 UPWARD recursion F_0 -> F_L is
  <= 2e-15 relative for ALL orders <= L (measured, not assumed; upward
  recursion cancels catastrophically for T ~< L).

Reference values from the all-positive-term Kummer series in f64 (no
cancellation; ~1e-16 relative), cross-checked against the closed-form F0.
"""

import numpy as np
from numpy.polynomial import chebyshev as _C


def boys_series_f64(m, T, terms=None):
    """F_m(T) by Kummer series at order m (small/mid T), f64, vectorized."""
    T = np.asarray(T, np.float64)
    terms = terms or int(2 * np.max(T) + 2 * m + 60)
    term = np.full_like(T, 1.0 / (2 * m + 1))
    acc = term.copy()
    for i in range(terms):
        term = term * (2.0 * T) / (2.0 * m + 2.0 * i + 3.0)
        acc += term
    return np.exp(-T) * acc


def boys_upward_f64(m, T):
    """F_0..F_m by closed-form F0 + upward recursion (f64)."""
    from scipy.special import erf

    T = np.asarray(T, np.float64)
    F = [0.5 * np.sqrt(np.pi / T) * erf(np.sqrt(T))]
    E = np.exp(-T)
    for k in range(m):
        F.append(((2 * k + 1) * F[-1] - E) / (2.0 * T))
    return np.stack(F)


def find_switch(L, lo, hi=60.0, step=0.25, tol=4e-15):
    """Smallest T where upward recursion is tol-accurate for all m <= L."""
    for Ts in np.arange(lo, hi, step):
        Tg = np.linspace(Ts, Ts + 40.0, 400)
        up = boys_upward_f64(L, Tg)
        ref = np.stack([boys_series_f64(m, Tg) for m in range(L + 1)])
        rel = np.max(np.abs(up - ref) / ref)
        if rel <= tol:
            return float(Ts)
    raise RuntimeError(f"no stable switch for L={L}")


def fit_piece(fn, lo, hi, tol, max_deg=40):
    for deg in range(6, max_deg + 1):
        k = np.arange(deg + 1)
        x = np.cos(np.pi * (k + 0.5) / (deg + 1))
        Tn = 0.5 * (hi - lo) * x + 0.5 * (hi + lo)
        c = _C.chebfit(x, fn(Tn), deg)
        Tg = np.linspace(lo, hi, 30001)
        xg = (2 * Tg - (hi + lo)) / (hi - lo)
        err = np.max(np.abs(_C.chebval(xg, c) - fn(Tg)))
        if err < tol:
            return c, err, deg
    raise RuntimeError(f"no fit for [{lo},{hi}] (err {err:.2e})")


def main():
    from scipy.special import erf

    def F0(T):
        T = np.atleast_1d(np.asarray(T, np.float64))
        out = np.empty_like(T)
        tiny = T < 1e-10
        out[tiny] = 1.0 - T[tiny] / 3.0
        Ts = T[~tiny]
        out[~tiny] = 0.5 * np.sqrt(np.pi / Ts) * erf(np.sqrt(Ts))
        return out

    # sanity: series vs closed form
    Tt = np.linspace(0.01, 30, 500)
    assert np.max(np.abs(boys_series_f64(0, Tt) - F0(Tt)) / F0(Tt)) < 5e-15

    NPIECE, TMAX = 4, 36.0
    f0_edges = np.linspace(0.0, TMAX, NPIECE + 1)
    f0_pieces = []
    max_deg = 0
    for lo, hi in zip(f0_edges[:-1], f0_edges[1:]):
        c, err, deg = fit_piece(F0, lo, hi, tol=3e-15)
        f0_pieces.append((lo, hi, c))
        max_deg = max(max_deg, deg)
        print(f"F0 [{lo:5.1f},{hi:5.1f}] deg {deg:2d} err {err:.2e}")
    # pad all pieces to the common degree (uniform Clenshaw loop)
    f0_coefs = np.zeros((NPIECE, max_deg + 1))
    for i, (lo, hi, c) in enumerate(f0_pieces):
        f0_coefs[i, : len(c)] = c

    fl = {}
    RANGE_MAX = 6.0  # max S(hi)/S(lo) per piece: bounds the df Clenshaw's
    # relative error at ~RANGE_MAX * 1e-14 (coefs are O(S_max_piece), the
    # evaluation's absolute error is ~1e-14 * max|coef|)
    for L in range(1, 17):
        switch = find_switch(L, lo=L + 1.0)
        SL = lambda T: boys_series_f64(L, T) * np.exp(np.asarray(T, np.float64))
        # greedy segmentation: S is increasing; extend each piece until the
        # in-piece dynamic range hits RANGE_MAX (S's log-slope is ~0 at small
        # T and ~1-(L+1/2)/T at large T, so early pieces are wide)
        edges = [0.0]
        while edges[-1] < switch:
            lo = edges[-1]
            s_lo = SL(np.array([lo]))[0]
            hi = switch
            if SL(np.array([hi]))[0] > RANGE_MAX * s_lo:
                # bisect for S(hi) = RANGE_MAX * s_lo
                a, b = lo, switch
                for _ in range(50):
                    m = 0.5 * (a + b)
                    if SL(np.array([m]))[0] > RANGE_MAX * s_lo:
                        b = m
                    else:
                        a = m
                hi = b
            # round UP to a multiple of 1/4 (f32-exact: the kernel maps T
            # into the piece with f32 edge constants); never exceed switch
            hi = min(float(np.ceil(hi * 4.0) / 4.0), float(switch))
            if hi <= edges[-1]:
                hi = min(edges[-1] + 0.25, float(switch))
            edges.append(hi)
        pieces = []
        deg_max = 0
        errs = []
        for lo, hi in zip(edges[:-1], edges[1:]):
            smin = SL(np.array([lo]))[0]  # S is increasing: min at left edge
            c, err, deg = fit_piece(SL, lo, hi, tol=max(1.5e-15 * smin, 4e-15))
            pieces.append(c)
            deg_max = max(deg_max, deg)
            errs.append(err / smin)
        coefs = np.zeros((len(pieces), deg_max + 1))
        for i, c in enumerate(pieces):
            coefs[i, : len(c)] = c
        fl[L] = (switch, edges, coefs)
        print(
            f"S{L:2d} switch {switch:5.2f} pieces {len(pieces)} "
            f"deg {deg_max:2d} relerr {max(errs):.2e}"
        )

    with open("qchem_rs_tpu/ops/_boys_df_coefs.py", "w") as f:
        f.write('"""Chebyshev tables for ops/boys_df.py (generated by '
                'tools/gen_boys_df_coefs.py — do not edit)."""\n\n')
        f.write(f"F0_TMAX = {TMAX!r}\n")
        f.write(f"F0_EDGES = {f0_edges.tolist()!r}\n")
        f.write("F0_CHEB = [  # per piece, ascending Chebyshev order\n")
        for row in f0_coefs:
            f.write(f"    {row.tolist()!r},\n")
        f.write("]\n\n")
        f.write("# L -> (T_switch, piece edges, per-piece coefs for\n")
        f.write("# S_L = F_L*exp(T) on [0, T_switch], ascending order)\n")
        f.write("FL_CHEB = {\n")
        for L, (hi, edges, coefs) in fl.items():
            f.write(f"    {L}: ({hi!r}, {list(edges)!r}, [\n")
            for row in coefs:
                f.write(f"        {row.tolist()!r},\n")
            f.write("    ]),\n")
        f.write("}\n")
    print("wrote qchem_rs_tpu/ops/_boys_df_coefs.py")


if __name__ == "__main__":
    main()
