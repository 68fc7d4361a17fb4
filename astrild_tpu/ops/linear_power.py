"""Linear matter power spectrum (Eisenstein & Hu 1998) and ISW source power.

Replaces the reference's CLASS/CAMB/nbodykit bridge
(/root/reference/src/astrild/power_spectra/linear_power_spectrum.py:87-126)
with the EH98 transfer-function fit (ApJ 496, 605; including baryon
acoustic features) in pure JAX, sigma8-normalized. Accuracy vs Boltzmann
codes is the EH98 fit's few-percent level — adequate for all of the
reference's uses (theory overlays, ISW Cl integrands).

P_dpdp implements the linear ISW source power (arxiv:0809.4488 Eq. 6),
mirroring LinearPowerSpectrum.P_dpdp (linear_power_spectrum.py:141-183).

Units: k in h/Mpc, P in (Mpc/h)^3.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.cosmology import Cosmology

__all__ = ["eh98_transfer", "eh98_transfer_nowiggle", "linear_power",
           "linear_power_nowiggle", "sigma_r", "normalization",
           "p_dpdp", "kaiser_multipoles"]


def eh98_transfer(k_hmpc, cosmo: Cosmology):
    """EH98 matter transfer function T(k) with baryon features.

    k in h/Mpc; internally converted to 1/Mpc as the fit requires.
    """
    h = cosmo.h
    k = jnp.asarray(k_hmpc) * h  # [1/Mpc]
    om = cosmo.Om0 * h ** 2
    ob = cosmo.Ob0 * h ** 2
    oc = om - ob
    fb = ob / om
    fc = oc / om
    theta = cosmo.Tcmb / 2.7

    z_eq = 2.50e4 * om * theta ** -4
    k_eq = 7.46e-2 * om * theta ** -2  # [1/Mpc]

    b1d = 0.313 * om ** -0.419 * (1.0 + 0.607 * om ** 0.674)
    b2d = 0.238 * om ** 0.223
    z_d = (1291.0 * om ** 0.251 / (1.0 + 0.659 * om ** 0.828)
           * (1.0 + b1d * ob ** b2d))

    def R_of(z):
        return 31.5 * ob * theta ** -4 * (1.0e3 / z)

    r_d = R_of(z_d)
    r_eq = R_of(z_eq)
    s = (2.0 / (3.0 * k_eq) * jnp.sqrt(6.0 / r_eq)
         * jnp.log((jnp.sqrt(1.0 + r_d) + jnp.sqrt(r_d + r_eq))
                   / (1.0 + jnp.sqrt(r_eq))))
    k_silk = (1.6 * ob ** 0.52 * om ** 0.73
              * (1.0 + (10.4 * om) ** -0.95))

    q = k / (13.41 * k_eq)

    # ---- CDM piece ----
    a1 = (46.9 * om) ** 0.670 * (1.0 + (32.1 * om) ** -0.532)
    a2 = (12.0 * om) ** 0.424 * (1.0 + (45.0 * om) ** -0.582)
    alpha_c = a1 ** (-fb) * a2 ** (-fb ** 3)
    bb1 = 0.944 / (1.0 + (458.0 * om) ** -0.708)
    bb2 = (0.395 * om) ** -0.0266
    beta_c = 1.0 / (1.0 + bb1 * (fc ** bb2 - 1.0))

    def t0(q, alpha, beta):
        c = 14.2 / alpha + 386.0 / (1.0 + 69.9 * q ** 1.08)
        lnarg = jnp.log(jnp.e + 1.8 * beta * q)
        return lnarg / (lnarg + c * q ** 2)

    f = 1.0 / (1.0 + (k * s / 5.4) ** 4)
    t_c = f * t0(q, 1.0, beta_c) + (1.0 - f) * t0(q, alpha_c, beta_c)

    # ---- baryon piece ----
    def G(y):
        sq = jnp.sqrt(1.0 + y)
        return y * (-6.0 * sq + (2.0 + 3.0 * y)
                    * jnp.log((sq + 1.0) / (sq - 1.0)))

    alpha_b = (2.07 * k_eq * s * (1.0 + r_d) ** -0.75
               * G((1.0 + z_eq) / (1.0 + z_d)))
    beta_b = 0.5 + fb + (3.0 - 2.0 * fb) * jnp.sqrt((17.2 * om) ** 2 + 1.0)
    beta_node = 8.41 * om ** 0.435
    ks = jnp.maximum(k * s, 1e-12)
    s_tilde = s / (1.0 + (beta_node / ks) ** 3) ** (1.0 / 3.0)
    x = jnp.maximum(k * s_tilde, 1e-12)
    j0 = jnp.sin(x) / x
    t_b = (t0(q, 1.0, 1.0) / (1.0 + (ks / 5.2) ** 2)
           + alpha_b / (1.0 + (beta_b / ks) ** 3)
           * jnp.exp(-((k / k_silk) ** 1.4))) * j0

    return fb * t_b + fc * t_c


def eh98_transfer_nowiggle(k_hmpc, cosmo: Cosmology):
    """EH98 zero-baryon ("no-wiggle") transfer function (EH98 sec. 4.2).

    The smooth shape-matched companion of eh98_transfer: same broadband
    (baryon suppression through the effective shape parameter
    Gamma_eff, eq. 30-31) but no acoustic oscillations and no Silk
    detail — the denominator of the BAO wiggle ratio O(k) used by
    ops.bao's acoustic-scale template fits.
    """
    h = cosmo.h
    k_hmpc = jnp.asarray(k_hmpc)
    om = cosmo.Om0 * h ** 2
    ob = cosmo.Ob0 * h ** 2
    fb = ob / om
    theta = cosmo.Tcmb / 2.7
    # sound horizon, EH98 eq. 26 approximation [Mpc]
    s = 44.5 * jnp.log(9.83 / om) / jnp.sqrt(1.0 + 10.0 * ob ** 0.75)
    # effective shape parameter, eq. 30-31
    a_gamma = (1.0 - 0.328 * jnp.log(431.0 * om) * fb
               + 0.38 * jnp.log(22.3 * om) * fb ** 2)
    ks = k_hmpc * h * s  # k [1/Mpc] * s [Mpc]
    gamma_eff = cosmo.Om0 * h * (a_gamma + (1.0 - a_gamma)
                                 / (1.0 + (0.43 * ks) ** 4))
    q = k_hmpc * theta ** 2 / gamma_eff  # eq. 28
    l0 = jnp.log(2.0 * jnp.e + 1.8 * q)
    c0 = 14.2 + 731.0 / (1.0 + 62.5 * q)
    return l0 / (l0 + c0 * q ** 2)


def _unnormalized_power(k, cosmo: Cosmology):
    t = eh98_transfer(k, cosmo)
    return jnp.asarray(k) ** cosmo.ns * t ** 2


def sigma_r(r_hmpc, cosmo: Cosmology, amplitude=1.0, nk: int = 1024):
    """sigma(R) of the (amplitude-scaled) linear power at z=0."""
    lnk = jnp.linspace(jnp.log(1e-4), jnp.log(50.0), nk)
    k = jnp.exp(lnk)
    p = amplitude * _unnormalized_power(k, cosmo)
    x = k * r_hmpc
    # top-hat window with a series branch: the closed form suffers f32
    # cancellation at small x whose SECOND-order jvp goes NaN (mixed
    # d2 sigma/dOm0 dlnM in theory_hmf-through-Fisher chains). The
    # dangerous branch gets a CLAMPED argument so the unselected side
    # stays NaN-free under autodiff (the where-grad trap).
    xs = jnp.maximum(x, 0.1)
    w_formula = 3.0 * (jnp.sin(xs) - xs * jnp.cos(xs)) / xs ** 3
    w_series = 1.0 - x ** 2 / 10.0 + x ** 4 / 280.0
    w = jnp.where(x < 0.1, w_series, w_formula)
    integrand = k ** 3 * p * w ** 2 / (2.0 * jnp.pi ** 2)  # d(lnk) measure
    dlnk = lnk[1] - lnk[0]
    var = jnp.sum(0.5 * (integrand[1:] + integrand[:-1]) * dlnk)
    return jnp.sqrt(var)


def normalization(cosmo: Cosmology) -> jnp.ndarray:
    """Amplitude A such that sigma(8 Mpc/h) = cosmo.sigma8."""
    s1 = sigma_r(8.0, cosmo, amplitude=1.0)
    return (cosmo.sigma8 / s1) ** 2


def linear_power(k_hmpc, cosmo: Cosmology, z=0.0, amplitude=None):
    """Linear matter P(k, z) [(Mpc/h)^3], sigma8-normalized at z=0."""
    if amplitude is None:
        amplitude = normalization(cosmo)
    d = cosmo.growth_factor(z)
    return amplitude * _unnormalized_power(k_hmpc, cosmo) * d ** 2


def linear_power_nowiggle(k_hmpc, cosmo: Cosmology, z=0.0, amplitude=None):
    """Smooth (no-wiggle) linear P(k, z) [(Mpc/h)^3].

    Normalized with the SAME sigma8 amplitude as linear_power (computed
    from the full wiggly spectrum), so linear_power/linear_power_nowiggle
    is the pure acoustic oscillation pattern O(k) riding on a broadband
    ratio ~= 1.
    """
    if amplitude is None:
        amplitude = normalization(cosmo)
    d = cosmo.growth_factor(z)
    t = eh98_transfer_nowiggle(k_hmpc, cosmo)
    return (amplitude * jnp.asarray(k_hmpc) ** cosmo.ns * t ** 2
            * d ** 2)


def kaiser_multipoles(k_hmpc, cosmo: Cosmology, z=0.0, bias: float = 1.0,
                      amplitude=None):
    """Linear Kaiser redshift-space multipoles (P0, P2, P4) [(Mpc/h)^3].

    P(k, mu) = b^2 (1 + beta mu^2)^2 P_lin(k), beta = f(z)/b:
      P0 = (1 + 2 beta/3 + beta^2/5) b^2 P_lin
      P2 = (4 beta/3 + 4 beta^2/7)   b^2 P_lin
      P4 = (8 beta^2 / 35)           b^2 P_lin
    Theory anchor for ops.power.auto_power_multipoles and the s-mu TPCF
    (the reference measured redshift-space clustering, halo.py:274-340,
    with no linear prediction to compare against).
    """
    p = linear_power(k_hmpc, cosmo, z=z, amplitude=amplitude)
    f = cosmo.growth_rate(z)
    beta = f / bias
    b2p = bias ** 2 * p
    p0 = (1.0 + 2.0 * beta / 3.0 + beta ** 2 / 5.0) * b2p
    p2 = (4.0 * beta / 3.0 + 4.0 * beta ** 2 / 7.0) * b2p
    p4 = (8.0 * beta ** 2 / 35.0) * b2p
    return p0, p2, p4


def p_dpdp(k_hmpc, z, cosmo: Cosmology, amplitude=None):
    """Linear ISW source power (arxiv:0809.4488 Eq. 6).

    Mirrors the reference's default branch (scale=False,
    linear_power_spectrum.py:169-183):
      P = (9/4) (H0/k)^4 Om^2 * H(z) * [D(z)(1-f(z))]^2 * P_dd(k, z=0)
    with H0 = 100 (h-units).
    """
    k = jnp.asarray(k_hmpc)
    p_dd = linear_power(k, cosmo, z=0.0, amplitude=amplitude)
    d = cosmo.growth_factor(z)
    f = cosmo.growth_rate(z)
    hz = 100.0 * cosmo.efunc(z)
    pref_static = 9.0 / 4.0 * (100.0 / k) ** 4 * cosmo.Om0 ** 2
    pref_dyn = hz * (d * (1.0 - f)) ** 2
    return pref_static * pref_dyn * p_dd


# ----------------------------------------------------- halofit (nonlinear)
def _sigma2_gauss(lnR, cosmo: Cosmology, amplitude, growth2, nk=512):
    """sigma^2(R) with a GAUSSIAN window (halofit convention)."""
    lnk = jnp.linspace(jnp.log(1e-4), jnp.log(1e3), nk)
    k = jnp.exp(lnk)
    d2l = (k ** 3 * amplitude * growth2 * _unnormalized_power(k, cosmo)
           / (2.0 * jnp.pi ** 2))
    r2 = jnp.exp(2.0 * lnR)
    integrand = d2l * jnp.exp(-(k ** 2) * r2)
    dlnk = lnk[1] - lnk[0]
    return jnp.sum(0.5 * (integrand[1:] + integrand[:-1])) * dlnk


@jax.jit
def nonlinear_power(k_hmpc, cosmo: Cosmology, z=0.0, amplitude=None):
    """Nonlinear matter P(k, z) via halofit (Takahashi+2012, arXiv
    1208.2701 eqs. A1-A14) on the EH98 linear spectrum.

    Beyond the reference (its LinearPowerSpectrum was linear-only,
    linear_power_spectrum.py:87-100); anchors weak-lensing spectra at
    ell >~ 500 and P(k) comparisons beyond k ~ 0.1 h/Mpc. The nonlinear
    scale k_sigma solves sigma_G(1/k_sigma, z) = 1 by bisection; n_eff
    and the curvature C come from autodiff of ln sigma^2(ln R).
    """
    if amplitude is None:
        amplitude = normalization(cosmo)
    g2 = cosmo.growth_factor(z) ** 2

    def ln_s2(lnR):
        return jnp.log(_sigma2_gauss(lnR, cosmo, amplitude, g2))

    # bisection for sigma^2(R) = 1 on lnR in [ln 1e-3, ln 1e2]
    lo, hi = jnp.log(1e-3), jnp.log(1e2)

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        high = ln_s2(mid) > 0.0  # sigma^2 decreasing in R
        return jnp.where(high, mid, lo), jnp.where(high, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 48, body, (lo, hi))
    lnR_s = 0.5 * (lo + hi)
    ksig = jnp.exp(-lnR_s)

    dln = jax.grad(ln_s2)
    n_eff = -3.0 - dln(lnR_s)
    C = -jax.grad(lambda q: dln(q))(lnR_s)

    # Takahashi+12 coefficients (flat wCDM; w = w0 in the DE correction)
    om_z = cosmo.Om0 * (1.0 + z) ** 3 / cosmo.efunc_a(1.0 / (1.0 + z)) ** 2
    ode_z = 1.0 - om_z
    w = cosmo.w0
    n, n2, n3, n4 = n_eff, n_eff ** 2, n_eff ** 3, n_eff ** 4
    a_n = 10.0 ** (1.5222 + 2.8553 * n + 2.3706 * n2 + 0.9903 * n3
                   + 0.2250 * n4 - 0.6038 * C
                   + 0.1749 * ode_z * (1.0 + w))
    b_n = 10.0 ** (-0.5642 + 0.5864 * n + 0.5716 * n2 - 1.5474 * C
                   + 0.2279 * ode_z * (1.0 + w))
    c_n = 10.0 ** (0.3698 + 2.0404 * n + 0.8161 * n2 + 0.5869 * C)
    gam = 0.1971 - 0.0843 * n + 0.8460 * C
    alp = jnp.abs(6.0835 + 1.3373 * n - 0.1959 * n2 - 5.5274 * C)
    bet = (2.0379 - 0.7354 * n + 0.3157 * n2 + 1.2490 * n3
           + 0.3980 * n4 - 0.1682 * C)
    nu_n = 10.0 ** (5.2105 + 3.6902 * n)
    f1 = om_z ** -0.0307
    f2 = om_z ** -0.0585
    f3 = om_z ** 0.0743

    k = jnp.asarray(k_hmpc, jnp.float32)
    d2l = k ** 3 * amplitude * g2 * _unnormalized_power(k, cosmo) \
        / (2.0 * jnp.pi ** 2)
    y = k / ksig
    d2q = d2l * ((1.0 + d2l) ** bet / (1.0 + alp * d2l)) \
        * jnp.exp(-y / 4.0 - y ** 2 / 8.0)
    d2hp = a_n * y ** (3.0 * f1) / (1.0 + b_n * y ** f2
                                    + (c_n * f3 * y) ** (3.0 - gam))
    d2h = d2hp / (1.0 + nu_n / y ** 2)
    return (d2q + d2h) * 2.0 * jnp.pi ** 2 / k ** 3
