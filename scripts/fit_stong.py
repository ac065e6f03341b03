"""Derive the universal STO-NG least-squares fits (Hehre, Stewart &
Pople, JCP 51, 2657 (1969); JCP 52, 2769 (1970)) from first principles.

The STO-3G basis for every element is a zeta-scaled copy of THREE
universal 3-Gaussian fits (1s; shared-exponent 2sp; shared-exponent
3sp).  This script reproduces those fits by maximizing the overlap of a
normalized zeta=1 Slater orbital with a normalized 3-term Gaussian
expansion (shared exponents between the s and p members of an sp shell,
equal-weight sum of the two overlaps — the HSP objective).

Validation: the derived 1s and 2sp constants must match the embedded
literature values in auto_oo_tpu/moldata/basis.py to ~7 significant
digits; the derived 3sp constants then carry the same provenance and are
used for the third-row elements.
"""

import numpy as np
from scipy import integrate, optimize, linalg


def sto_radial(n):
    """Normalized radial function R_n(r) = N r^{n-1} e^{-r} (zeta = 1)."""
    # \int_0^inf (r^{n-1} e^{-r})^2 r^2 dr = (2n)!/2^(2n+1)
    from math import factorial
    norm = np.sqrt(2.0 ** (2 * n + 1) / factorial(2 * n))
    return lambda r: norm * r ** (n - 1) * np.exp(-r)


def gauss_radial(alpha, l):
    """Normalized radial part of a Cartesian Gaussian of angular momentum
    l: N r^l e^{-alpha r^2} with \int R^2 r^2 dr = 1."""
    from math import factorial

    def dfact(k):  # (2l+1)!! etc. via direct integral instead
        return 1

    # \int_0^inf r^(2l+2) e^{-2 alpha r^2} dr =
    #   (2l+1)!! / (2^(l+2) (2 alpha)^(l+1)) * sqrt(pi/(2 alpha))
    dd = 1.0
    for k in range(1, 2 * l + 2, 2):
        dd *= k
    val = dd / (2.0 ** (l + 2) * (2 * alpha) ** (l + 1)) * np.sqrt(
        np.pi / (2 * alpha))
    norm = 1.0 / np.sqrt(val)
    return lambda r: norm * r ** l * np.exp(-alpha * r * r)


def overlap(f, g):
    val, _ = integrate.quad(lambda r: f(r) * g(r) * r * r, 0.0, np.inf,
                            limit=200)
    return val


def best_contraction(alphas, l, sto_n):
    """Optimal normalized contraction over fixed exponents: c maximizing
    <STO|sum c_i g_i> is c ~ S_gg^{-1} s_gs; overlap = sqrt(s^T S^{-1} s)."""
    gs = [gauss_radial(a, l) for a in alphas]
    sto = sto_radial(sto_n)
    s = np.array([overlap(sto, g) for g in gs])
    S = np.array([[overlap(gi, gj) for gj in gs] for gi in gs])
    c = linalg.solve(S, s, assume_a="pos")
    ov = float(np.sqrt(s @ c))
    c = c / np.sqrt(c @ S @ c)
    # sign convention: overall sign so the overlap is positive
    if s @ c < 0:
        c = -c
    return ov, c


def fit_shell(sto_specs, n_gauss=3, x0=None):
    """Maximize the equal-weight sum of overlaps over shared exponents.

    sto_specs: list of (sto_n, l) members sharing the exponents
    (e.g. [(2, 0), (2, 1)] for the 2sp fit)."""
    def neg(logas):
        alphas = np.exp(logas)
        tot = 0.0
        for n, l in sto_specs:
            ov, _ = best_contraction(alphas, l, n)
            tot += ov
        return -tot

    if x0 is None:
        x0 = np.log(np.logspace(-1, 0.5, n_gauss))
    res = optimize.minimize(neg, x0, method="Nelder-Mead",
                            options={"xatol": 1e-12, "fatol": 1e-14,
                                     "maxiter": 20000, "maxfev": 20000})
    alphas = np.sort(np.exp(res.x))[::-1]
    out = {"exps": alphas}
    for n, l in sto_specs:
        ov, c = best_contraction(alphas, l, n)
        out[f"coef_l{l}"] = c
        out[f"overlap_l{l}"] = ov
    return out


def main():
    np.set_printoptions(precision=9, suppress=False)
    print("1s fit (expect 2.227660584 / 0.405771156 / 0.109817510;")
    print("        0.154328967 / 0.535328142 / 0.444634542):")
    r = fit_shell([(1, 0)], x0=np.log([2.2, 0.4, 0.11]))
    print("  exps:", r["exps"])
    print("  coef:", r["coef_l0"], " overlap:", r["overlap_l0"])

    print("2sp fit (expect 0.994203260 / 0.231031443 / 0.075138602):")
    r = fit_shell([(2, 0), (2, 1)], x0=np.log([1.0, 0.23, 0.075]))
    print("  exps:", r["exps"])
    print("  s coef:", r["coef_l0"])
    print("  p coef:", r["coef_l1"])

    print("3sp fit (to derive):")
    r = fit_shell([(3, 0), (3, 1)], x0=np.log([0.5, 0.15, 0.05]))
    print("  exps:", r["exps"])
    print("  s coef:", r["coef_l0"])
    print("  p coef:", r["coef_l1"])


if __name__ == "__main__":
    main()
