"""Pure-JAX background cosmology: distances, growth, Hubble flow.

Replaces the reference's use of astropy.cosmology / nbodykit.cosmology /
CAMB (see /root/reference/src/astrild/power_spectra/linear_power_spectrum.py:87-100
and /root/reference/src/astrild/utils/geometrical_transforms.py:30-58) with a
jit-friendly flat-(w0,wa)CDM implementation.

Everything is table-based: `Cosmology` precomputes comoving-distance and
growth tables on a fixed grid at construction (traceable jnp ops), and all
evaluations are `jnp.interp` lookups, so cosmology calls can live inside
jit/vmap/shard_map regions without host callbacks.

Units: Mpc/h for distances, km/s for velocities (h-unit convention, so no
explicit h appears anywhere).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .constants import (C_LIGHT_KMS, H0_HUNITS, H0_OVER_C_HMPC,
                        RHO_CRIT0)

__all__ = ["Cosmology", "PLANCK18"]

_A_MIN = 1.0e-3
_N_TABLE = 1024
_Z_MAX_TABLE = 40.0


def _concrete_zero(x) -> bool:
    """True iff x is a compile-time-known zero. Traced values (Fisher
    derivatives through Cosmology(**params)) always take the general
    path — the zero fast paths are trace-unsafe shortcuts only."""
    try:
        return bool(x == 0.0)
    except jax.errors.TracerBoolConversionError:
        return False


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Cosmology:
    """Flat (w0, wa)CDM cosmology with precomputed distance/growth tables.

    Parameters mirror the reference's usage (Om0, Ob0, h for unit
    conversions; ns/sigma8 feed the linear power spectrum in
    ops/linear_power.py).
    """

    Om0: float = 0.3089
    Ob0: float = 0.0486
    h: float = 0.6774
    ns: float = 0.9667
    sigma8: float = 0.8159
    w0: float = -1.0
    wa: float = 0.0
    Tcmb: float = 2.7255
    # Modified-gravity growth: G_eff = G (1 + mu(a)). mu0=0 is exact GR.
    # mu_model 'const' is the scale-independent f(R) small-scale limit
    # (mu0 = 1/3); 'lambda' scales mu with the dark-energy fraction
    # (Planck mu-Sigma convention). Theory anchor for ECOSMOG fifth-force
    # P(k) ratios — the reference's snapshot-info generator used a custom
    # MG astropy class (reference utils/sim_collection_info.py:6,21).
    mu0: float = 0.0
    mu_model: str = "const"
    # Hu-Sawicki f(R): |f_R0| (0 = GR) and the model index n. Enables the
    # SCALE-DEPENDENT growth methods (mu_k, growth_factor_k,
    # fofr_pk_enhancement) — the linear-theory anchor for ECOSMOG
    # fifth-force P(k) ratios (reference utils/sim_collection_info.py:6,21
    # used a custom MG astropy class 'cvG' for exactly this bookkeeping).
    fR0: float = 0.0
    fR_n: float = 1.0

    # --- derived tables (filled in __post_init__) ---
    _z_tab: jnp.ndarray = dataclasses.field(default=None, repr=False)
    _chi_tab: jnp.ndarray = dataclasses.field(default=None, repr=False)
    _lna_tab: jnp.ndarray = dataclasses.field(default=None, repr=False)
    _lnD_tab: jnp.ndarray = dataclasses.field(default=None, repr=False)
    _f_tab: jnp.ndarray = dataclasses.field(default=None, repr=False)

    def __post_init__(self):
        if self._z_tab is None:
            ztab, chitab = self._build_distance_table()
            lna, lnD, f = self._build_growth_table()
            object.__setattr__(self, "_z_tab", ztab)
            object.__setattr__(self, "_chi_tab", chitab)
            object.__setattr__(self, "_lna_tab", lna)
            object.__setattr__(self, "_lnD_tab", lnD)
            object.__setattr__(self, "_f_tab", f)

    # ---------------------------------------------------------------- pytree
    def tree_flatten(self):
        # Numeric parameters are LEAVES (not aux metadata) so a Cosmology
        # built from traced values — jax.jacfwd through Cosmology(**p) for
        # Fisher forecasts (ops/forecast.py), vmap over parameter grids —
        # can cross jit boundaries. Only genuinely-static model switches
        # stay aux. Bonus: one compilation now serves every parameter
        # value instead of re-tracing per (Om0, sigma8, ...) tuple.
        leaves = (
            self.Om0, self.Ob0, self.h, self.ns, self.sigma8, self.w0,
            self.wa, self.Tcmb, self.mu0, self.fR0, self.fR_n,
            self._z_tab,
            self._chi_tab,
            self._lna_tab,
            self._lnD_tab,
            self._f_tab,
        )
        aux = (self.mu_model,)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (Om0, Ob0, h, ns, sigma8, w0, wa, Tcmb, mu0, fR0, fR_n,
         z_tab, chi_tab, lna_tab, lnD_tab, f_tab) = leaves
        return cls(Om0=Om0, Ob0=Ob0, h=h, ns=ns, sigma8=sigma8, w0=w0,
                   wa=wa, Tcmb=Tcmb, mu0=mu0, mu_model=aux[0], fR0=fR0,
                   fR_n=fR_n,
                   _z_tab=z_tab, _chi_tab=chi_tab,
                   _lna_tab=lna_tab, _lnD_tab=lnD_tab, _f_tab=f_tab)

    # ----------------------------------------------------------- background
    @property
    def Ode0(self) -> float:
        return 1.0 - self.Om0

    def _de_density_ratio(self, a):
        """rho_DE(a)/rho_DE(0) for CPL w(a) = w0 + wa(1-a)."""
        w0, wa = self.w0, self.wa
        return a ** (-3.0 * (1.0 + w0 + wa)) * jnp.exp(-3.0 * wa * (1.0 - a))

    def efunc_a(self, a):
        """E(a) = H(a)/H0."""
        a = jnp.asarray(a)
        return jnp.sqrt(self.Om0 * a ** -3 + self.Ode0 * self._de_density_ratio(a))

    def efunc(self, z):
        return self.efunc_a(1.0 / (1.0 + jnp.asarray(z)))

    def H(self, z):
        """H(z) in km/s/(Mpc/h)."""
        return H0_HUNITS * self.efunc(z)

    def Om(self, z):
        """Omega_m(z) = Om0 (1+z)^3 / E(z)^2."""
        z = jnp.asarray(z)
        return self.Om0 * (1.0 + z) ** 3 / self.efunc(z) ** 2

    def rho_crit(self, z):
        """Critical density at z in (Msun/h)/(Mpc/h)^3 (comoving h-units)."""
        return RHO_CRIT0 * self.efunc(z) ** 2

    def rho_mean0(self):
        """Mean comoving matter density, (Msun/h)/(Mpc/h)^3."""
        return RHO_CRIT0 * self.Om0

    # ------------------------------------------------------------ distances
    def _build_distance_table(self):
        z = jnp.linspace(0.0, _Z_MAX_TABLE, _N_TABLE)
        integrand = 1.0 / self.efunc(z)
        dz = z[1] - z[0]
        # cumulative trapezoid, chi(0) = 0
        cum = jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(0.5 * (integrand[1:] + integrand[:-1]) * dz)]
        )
        chi = (C_LIGHT_KMS / H0_HUNITS) * cum  # Mpc/h
        return z, chi

    def comoving_distance(self, z):
        """chi(z) in Mpc/h (flat universe: == transverse comoving)."""
        return jnp.interp(jnp.asarray(z), self._z_tab, self._chi_tab)

    def redshift_at_comoving_distance(self, chi):
        """Inverse of comoving_distance, by table inversion."""
        return jnp.interp(jnp.asarray(chi), self._chi_tab, self._z_tab)

    def angular_diameter_distance(self, z):
        """D_A(z) = chi(z)/(1+z) in Mpc/h."""
        z = jnp.asarray(z)
        return self.comoving_distance(z) / (1.0 + z)

    def lookback_time(self, z):
        """Lookback time in Gyr (h-free: uses physical H0 = 100 h)."""
        z = jnp.asarray(z)
        zt = self._z_tab
        integ = 1.0 / ((1.0 + zt) * self.efunc(zt))
        dz = zt[1] - zt[0]
        cum = jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(0.5 * (integ[1:] + integ[:-1]) * dz)]
        )
        # 1/H0 in Gyr: (Mpc/h / (km/s)) -> s -> Gyr ; Mpc = 3.0857e19 km
        hubble_time_gyr = 3.085677581491367e19 / (H0_HUNITS * self.h) / (
            3.15576e16
        )
        return jnp.interp(z, zt, cum) * hubble_time_gyr

    def age(self, z=0.0):
        """Cosmic time (age of the universe) at redshift z, in Gyr.

        Counterpart of the reference's snapshot `cosmic_time` helper
        (read_hdf5.py), which deferred to astropy. Computed as the
        lookback integral over the background table plus the
        matter-dominated closed form beyond the table's z_max = 40
        (t = 2/(3 H sqrt(Om) (1+z)^{3/2}), sub-0.1% there for any
        radiation-free (w0, wa) background this class supports).
        """
        z = jnp.asarray(z)
        zmax = self._z_tab[-1]
        hubble_time_gyr = 3.085677581491367e19 / (H0_HUNITS * self.h) / (
            3.15576e16
        )
        t_md = ((2.0 / 3.0) / jnp.sqrt(self.Om0) * hubble_time_gyr
                * (1.0 + z) ** -1.5)
        t_tail = (2.0 / 3.0) / jnp.sqrt(self.Om0) * (1.0 + zmax) ** -1.5 \
            * hubble_time_gyr
        t_table = self.lookback_time(zmax) - self.lookback_time(z) + t_tail
        # beyond the table, lookback_time's interp clamps at z_max — use
        # the matter-dominated closed form AT the queried z instead
        return jnp.where(z > zmax, t_md, t_table)

    # --------------------------------------------------------------- growth
    def mu(self, a):
        """MG growth-source enhancement: G_eff/G - 1 at scale factor a."""
        a = jnp.asarray(a)
        if self.mu_model == "lambda":
            # scale with the dark-energy fraction (Planck mu-Sigma form)
            ode_frac = (self.Ode0 * self._de_density_ratio(a)
                        / self.efunc_a(a) ** 2)
            return self.mu0 * ode_frac / self.Ode0
        return self.mu0 * jnp.ones_like(a)

    def _build_growth_table_ode(self):
        """Growth from the linear ODE with a modified source term,

          D'' + (2 + dlnE/dlna) D' = 1.5 Om(a) (1 + mu(a)) D   (' = d/dlna)

        integrated with RK4 from matter domination (D ~ a). This is the
        mu(a)-parameterized growth (scale-independent f(R) / mu-Sigma);
        at mu0=0 it reproduces the GR integral solution to <1e-4
        (tested). Used whenever mu0 != 0.
        """
        lna, D, Dp = self._growth_D_of_lna(self.mu, with_derivative=True)
        f = Dp / D
        lnD = jnp.log(D) - jnp.log(D[-1])
        return lna, lnD, f

    def _build_growth_table(self):
        """Linear growth via D(a) = 5/2 Om0 E(a) int_0^a da'/(a'E(a'))^3.

        Valid for LCDM / smooth DE (matches the heuristic used by the
        reference's nbodykit PerturbationGrowth calls). f = dlnD/dlna from
        the analytic derivative of the integral expression. With mu0 != 0
        the ODE path (_build_growth_table_ode) is used instead.
        """
        if not _concrete_zero(self.mu0):
            return self._build_growth_table_ode()
        lna = jnp.linspace(jnp.log(_A_MIN), 0.0, _N_TABLE)
        a = jnp.exp(lna)
        E = self.efunc_a(a)
        integrand = 1.0 / (a * E) ** 3 * a  # d(lna) measure: da = a dlna
        dlna = lna[1] - lna[0]
        cum = jnp.cumsum(0.5 * (integrand[1:] + integrand[:-1]) * dlna)
        cum = jnp.concatenate([jnp.zeros((1,)), cum])
        # add the [0, a_min] tail analytically (matter domination: int ~ 2/5 a^{5/2}/sqrt(Om))
        tail = 2.0 / 5.0 * _A_MIN ** 2.5 / jnp.sqrt(self.Om0)
        I = cum + tail
        D = 2.5 * self.Om0 * E * I
        lnD = jnp.log(D) - jnp.log(D[-1])  # normalize D(a=1)=1
        # f = dlnD/dlna = dlnE/dlna + (integrand/I)
        dlnE = jax.vmap(jax.grad(lambda l: jnp.log(self.efunc_a(jnp.exp(l)))))(lna)
        f = dlnE + (1.0 / (a * E) ** 3 * a) / I
        return lna, lnD, f

    def growth_factor(self, z):
        """D(z), normalized to D(z=0)=1."""
        a = 1.0 / (1.0 + jnp.asarray(z))
        return jnp.exp(jnp.interp(jnp.log(a), self._lna_tab, self._lnD_tab))

    def growth_rate(self, z):
        """f(z) = dlnD/dlna."""
        a = 1.0 / (1.0 + jnp.asarray(z))
        return jnp.interp(jnp.log(a), self._lna_tab, self._f_tab)

    # ------------------------------------ scale-dependent f(R) growth
    def scalaron_mass2(self, a):
        """Hu-Sawicki scalaron mass^2 M^2(a) in (h/Mpc)^2.

        M^2 = H0^2 (Om a^-3 + 4 Ode)^(n+2) / ((n+1)|fR0| (Om+4 Ode)^(n+1))
        — the standard linear-response mass of the n-index Hu-Sawicki
        model on a LCDM background. Early times: M^2 ~ a^-3(n+2) -> GR.
        """
        n = self.fR_n
        om, ol = self.Om0, self.Ode0
        base = om * jnp.asarray(a) ** -3.0 + 4.0 * ol
        return (base ** (n + 2.0) / ((om + 4.0 * ol) ** (n + 1.0))
                / ((n + 1.0) * abs(self.fR0)) * H0_OVER_C_HMPC ** 2)

    def mu_k(self, a, k):
        """G_eff/G - 1 at comoving k [h/Mpc]: k^2 / (3 (k^2 + a^2 M^2)).

        The fifth force is unscreened (mu -> 1/3) for k/a >> M and
        suppressed (mu -> 0, GR) for k/a << M. Linear theory only — no
        chameleon screening (that is what the ECOSMOG simulations the
        reference post-processes are for); this is the theory anchor for
        their fifth-force P(k) ratios.
        """
        if _concrete_zero(self.fR0):
            return jnp.zeros(jnp.broadcast_shapes(jnp.shape(a),
                                                  jnp.shape(k)))
        k2 = jnp.asarray(k) ** 2.0
        return k2 / (3.0 * (k2 + jnp.asarray(a) ** 2
                            * self.scalaron_mass2(a)))

    def _growth_D_of_lna(self, mu_fn, with_derivative: bool = False):
        """RK4 growth table D(lna) for a given mu(a) source enhancement.

        THE single growth integrator:
          D'' + (2 + dlnE/dlna) D' = 1.5 Om(a) (1 + mu(a)) D  (' = d/dlna)
        shared by the scale-independent table (_build_growth_table_ode,
        mu = self.mu) and the per-k f(R) growth (mu = mu_k(a, k)).
        Returns (lna, D) or (lna, D, D') with with_derivative.
        """
        lna = jnp.linspace(jnp.log(_A_MIN), 0.0, _N_TABLE)
        dlna = lna[1] - lna[0]

        def dlnE(l):
            return jax.grad(lambda q: jnp.log(self.efunc_a(jnp.exp(q))))(l)

        def rhs(l, y):
            D, Dp = y
            a = jnp.exp(l)
            om = self.Om0 * a ** -3 / self.efunc_a(a) ** 2
            acc = -(2.0 + dlnE(l)) * Dp + 1.5 * om * (1.0 + mu_fn(a)) * D
            return jnp.stack([Dp, acc])

        def step(y, l):
            k1 = rhs(l, y)
            k2 = rhs(l + 0.5 * dlna, y + 0.5 * dlna * k1)
            k3 = rhs(l + 0.5 * dlna, y + 0.5 * dlna * k2)
            k4 = rhs(l + dlna, y + dlna * k3)
            return y + (dlna / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), y

        y0 = jnp.array([_A_MIN, _A_MIN])  # matter domination: D ~ a
        _, ys = jax.lax.scan(step, y0, lna)
        if with_derivative:
            return lna, ys[:, 0], ys[:, 1]
        return lna, ys[:, 0]

    def growth_factor_k(self, k, z=0.0):
        """Scale-dependent linear growth D(k, z), Hu-Sawicki f(R).

        k: array of comoving wavenumbers [h/Mpc]; integrates the
        mu(k, a)-modified growth ODE per k (vmapped RK4), normalized to
        D ~ a in matter domination (same convention as the GR table, so
        ratios against growth_factor are meaningful). Jitted (one device
        program — on a remote backend the eager path would pay a round
        trip per RK4 step).
        """
        k = jnp.atleast_1d(jnp.asarray(k, jnp.float32))
        return _growth_factor_k_impl(self, k,
                                     jnp.asarray(1.0 / (1.0 + z)))

    def fofr_pk_enhancement(self, k, z=0.0):
        """Linear fifth-force power enhancement P_f(R)(k)/P_GR(k).

        = (D_f(R)(k, z) / D_GR(z))^2 with a common early-time
        normalization. GR limits: fR0=0 exactly 1; k -> 0 exactly 1;
        k -> inf approaches the scale-independent mu=1/3 enhancement.
        This is the theory anchor the reference's fifth-force spectra
        pipelines lacked (powmes.py module script computed only the
        simulation side). Jitted.
        """
        k = jnp.atleast_1d(jnp.asarray(k, jnp.float32))
        return _fofr_enhancement_impl(self, k,
                                      jnp.asarray(1.0 / (1.0 + z)))

    # -------------------------------------------------------------- lensing
    def lensing_kernel(self, chi, chi_s):
        """Lensing efficiency g(chi) = (chi_s - chi) * chi / chi_s.

        Mirrors SimulationCollection._kernel_function
        (/root/reference/src/astrild/simcoll.py:432-443).
        """
        chi = jnp.asarray(chi)
        return jnp.clip(chi_s - chi, 0.0, None) * chi / chi_s

    def sigma_crit_inv(self, z_l, z_s):
        """1/Sigma_crit in (Mpc/h)^2/(Msun/h) (comoving)."""
        chi_l = self.comoving_distance(z_l)
        chi_s = self.comoving_distance(z_s)
        d_ls = jnp.clip(chi_s - chi_l, 0.0, None) / (1.0 + z_s)
        d_l = chi_l / (1.0 + z_l)
        d_s = chi_s / (1.0 + z_s)
        # Sigma_crit = c^2 / (4 pi G) * D_s / (D_l D_ls)
        pref = C_LIGHT_KMS ** 2 / (4.0 * jnp.pi * 4.300917270e-9)
        return d_l * d_ls / (jnp.where(d_s > 0, d_s, 1.0) * pref)


_PLANCK18_CACHE = None


def __getattr__(name):
    """PEP 562 lazy module attribute: building ``PLANCK18`` runs jnp table
    construction (device work), so it must not happen at import time —
    drivers configure the backend (platform, device count) *after* importing
    the package."""
    if name == "PLANCK18":
        global _PLANCK18_CACHE
        if _PLANCK18_CACHE is None:
            _PLANCK18_CACHE = Cosmology()
        return _PLANCK18_CACHE
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


@jax.jit
def _growth_factor_k_impl(cosmo: Cosmology, k, a_t):
    def one(kv):
        lna, D = cosmo._growth_D_of_lna(lambda a: cosmo.mu_k(a, kv))
        return jnp.interp(jnp.log(a_t), lna, D)

    return jax.vmap(one)(k)


@jax.jit
def _fofr_enhancement_impl(cosmo: Cosmology, k, a_t):
    lna, D_gr = cosmo._growth_D_of_lna(lambda a: 0.0)
    D0 = jnp.interp(jnp.log(a_t), lna, D_gr)
    Dk = _growth_factor_k_impl(cosmo, k, a_t)
    return (Dk / D0) ** 2
