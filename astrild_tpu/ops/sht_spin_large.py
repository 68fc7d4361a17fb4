"""Large-lmax spin-2 transforms: production-scale full-sky shear E/B.

No direct reference counterpart (the reference's healpy surface,
/root/reference/src/astrild/rays/skys/sky_healpix.py:183-241, is
scalar-only); this extends the healpy-parity SHT stack to the spin-2
transforms (alm2map_spin/map2alm_spin) a full-sky shear pipeline needs.

The table spin-2 path (ops/sht_spin.py) materializes O(lmax^2 * nring)
Wigner-d tables — practical to lmax ~ 512 like the scalar tables. This
module is its libsharp-style counterpart on the ops/sht_large
architecture: the d^l_{+-2, m}(theta) functions are never materialized —
each m-block runs the Wigner-d three-term upward l-recursion as a
lax.scan over rings with the same 2^60 underflow rescaling, accumulating
the contraction with the (E, B) alms (synthesis) or the ring quadrature
sums (analysis adjoint) inside the scan.

Spin-2 specifics vs the scalar scan:
  * the recursion multiplies by (alpha*x + beta) instead of a*x (the
    d-recursion has an m1*m shift term), with the gamma term vanishing
    automatically at the first post-seed step;
  * seeds sit at l0 = max(m, 2): closed forms of d^2_{+-2, m} for
    m < 2, and the log2-scaled cos/sin(theta/2)-power seeds for m >= 2
    (host float64 log2 half-angle tables — float32 1-x collapses near
    the poles);
  * the belt synthesis is ONE complex inverse FFT per ring (the spin-2
    field Q+iU has independent +-m coefficients, so no rfft folding or
    super-Nyquist alias bookkeeping: bins are taken mod n, which is the
    exact aliasing of equally spaced pixels);
  * the adjoint is hand-written (vjp through the scans would store
    O(lmax * nring * MBLOCK) residuals — tens of GB at nside 1024): one
    complex FFT of Q+iU per belt ring + the analysis-mode scans, exactly
    transposed against the synthesis folding.

Conventions identical to ops/sht_spin.py (Q + iU = -sum (E+iB) 2Y_lm,
2Y from the numerically pinned d-matrix); equivalence with the table
path is tested at small nside, where both are exact.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import healpix as hpx
from ..utils.jax_compat import match_vma as _match_vma
from .sht import alm2cl, ring_geometry
from .sht_large import (_INV_RESCALE, _MBLOCK, _TRIGGER, LargeSHTTables,
                        _cap_core_apply, _rotate_phase, sht_large_tables)

__all__ = ["Spin2LargeTables", "spin2_large_tables", "synthesize_spin2_large",
           "analyze_spin2_large", "anafast_spin2_large",
           "Spin1LargeTables", "spin1_large_tables",
           "synthesize_spin1_large", "analyze_spin1_large",
           "deflection_from_kappa_alm_large"]


class Spin2LargeTables(NamedTuple):
    base: LargeSHTTables
    log2_ch: jnp.ndarray    # (nring,) log2 cos(theta/2), host float64
    log2_sh: jnp.ndarray    # (nring,) log2 sin(theta/2)
    seed2_p: jnp.ndarray    # (2, nring) d^2_{+2, m} for m = 0, 1
    seed2_m: jnp.ndarray    # (2, nring) d^2_{-2, m} for m = 0, 1
    lnc: jnp.ndarray        # (lmax+1,) log2 seed amplitude (same for
                            # m1 = +-2: sqrt((2m)!/((m+2)!(m-2)!)) is
                            # symmetric in the m1 sign)


@lru_cache(maxsize=4)
def spin2_large_tables(nside: int, lmax: int) -> Spin2LargeTables:
    from math import lgamma

    base = sht_large_tables(nside, lmax)
    geo = ring_geometry(nside)
    th = np.asarray(geo.theta, np.float64)
    x = np.cos(th)
    ch = np.cos(th / 2.0)
    sh = np.sin(th / 2.0)
    s = np.sin(th)
    # closed-form l0=2 seeds for m = 0, 1 (verified against
    # wigner_d_column in tests): d^2_{2,0} = d^2_{-2,0} = sqrt(6)/4 sin^2
    # d^2_{2,1} = -(1+x)/2 sin ; d^2_{-2,1} = (1-x)/2 sin
    seed2_p = np.stack([np.sqrt(6.0) / 4.0 * s * s,
                        -(1.0 + x) / 2.0 * s])
    seed2_m = np.stack([np.sqrt(6.0) / 4.0 * s * s,
                        (1.0 - x) / 2.0 * s])
    # seed amplitude log2 for m >= 2: sqrt((2m)!/((m+m1)!(m-m1)!))
    ms = np.arange(lmax + 1)
    ln2 = np.log(2.0)
    lnc = np.array([0.5 * (lgamma(2 * m + 1) - lgamma(m + 3)
                           - lgamma(m - 1)) / ln2 if m >= 2 else 0.0
                    for m in ms])
    nb = -(-(lmax + 1) // _MBLOCK)
    pad = nb * _MBLOCK - (lmax + 1)
    dev = jax.device_put
    return Spin2LargeTables(
        base,
        dev(jnp.asarray(np.log2(np.maximum(ch, 1e-300)), jnp.float32)),
        dev(jnp.asarray(np.log2(np.maximum(sh, 1e-300)), jnp.float32)),
        dev(jnp.asarray(seed2_p, jnp.float32)),
        dev(jnp.asarray(seed2_m, jnp.float32)),
        dev(jnp.asarray(np.pad(lnc, (0, pad)), jnp.float32)),
    )


def _spin_seed_state(m0: int, tab, m1: int):
    """Scaled d^{l0}_{m1, m} seeds for one m-block: (frac, scale).

    Generic in the spin s = |m1|, read off the closed-form seed table's
    row count (Spin2LargeTables carries the m = 0, 1 rows at l0 = 2;
    Spin1LargeTables the m = 0 row at l0 = 1)."""
    B = _MBLOCK
    s_spin = abs(m1)
    m = (m0 + jnp.arange(B, dtype=jnp.float32))[:, None]
    lnc = jax.lax.dynamic_slice_in_dim(tab.lnc, m0, B)[:, None]
    # |seed| = C * ch^(m+m1) * sh^(m-m1); sign = (-1)^(m-m1)
    log2_mag = (lnc + (m + m1) * tab.log2_ch[None, :]
                + (m - m1) * tab.log2_sh[None, :])
    s0 = jnp.maximum(0.0, jnp.ceil((-log2_mag - 29.0) / 60.0))
    sign = jnp.where(jnp.mod(m, 2.0) == 0.0, 1.0, -1.0)
    if s_spin % 2:
        sign = -sign            # (-1)^(m-m1) = (-1)^m (-1)^m1
    frac = sign * jnp.exp2(log2_mag + 60.0 * s0)
    # closed-form l0 = s seeds for the m < s rows (no underflow).
    # Selected by a traceable where on the m VALUE, not a python branch
    # on m0: the distributed path (parallel/sht_large) calls with a
    # TRACED m0 (only the first block has m < s rows, so for every other
    # block the where is the identity, matching the old m0 == 0 branch).
    seeds = tab.seed2_p if m1 > 0 else tab.seed2_m
    if seeds.shape[0] == 1:
        row_lo = seeds[0][None, :]
    else:
        row_lo = jnp.where(m == 0.0, seeds[0][None, :],
                           seeds[1][None, :])
    frac = jnp.where(m < s_spin, row_lo, frac)
    s0 = jnp.where(m < s_spin, 0.0, s0)
    return frac, s0


def _spin_coeffs(l, m, m1: int):
    """alpha (x-coefficient), beta, gamma of the d-recursion, masked so
    denominators never divide by zero for l <= l0."""
    lf = l.astype(jnp.float32)
    m1sq = float(m1 * m1)
    d1 = lf * lf - m1sq
    d2 = lf * lf - m * m
    den = (lf - 1.0) * jnp.sqrt(jnp.where(d1 > 0, d1, 1.0)
                                * jnp.where(d2 > 0, d2, 1.0))
    den = jnp.where((d1 > 0) & (d2 > 0) & (lf > 1), den, 1.0)
    alpha = (2.0 * lf - 1.0) * lf * (lf - 1.0) / den
    beta = -(2.0 * lf - 1.0) * m1 * m / den
    g1 = (lf - 1.0) ** 2 - m1sq
    g2 = (lf - 1.0) ** 2 - m * m
    gamma = -lf * jnp.sqrt(jnp.maximum(g1, 0.0)
                           * jnp.maximum(g2, 0.0)) / den
    return alpha, beta, gamma


def _spin_scan(m0: int, tab: Spin2LargeTables, lmax: int, m1: int,
               alm_rows=None, q=None, l_start=None):
    """Wigner-d scan over l for one m-block, one spin column (m1 = +-2).

    synthesis mode (alm_rows = 4 rows (lmax+1, B): er, ei, br, bi):
      returns 4 accumulators (B, nring) = sum_l alm[l, m] d^l_{m1,m}
      * norm, norm = sqrt((2l+1)/4pi).
    analysis mode (q = (q1, q2) each (B, nring)): returns 2 outputs
      (lmax+1, B) = sum_r norm d^l_{m1,m}(theta_r) q[m, r].
    """
    B = _MBLOCK
    nring = tab.base.x.shape[0]
    m = (m0 + jnp.arange(B, dtype=jnp.float32))[:, None]
    l0 = jnp.maximum(m, float(abs(m1)))
    x = tab.base.x[None, :]
    frac_seed, s0 = _spin_seed_state(m0, tab, m1)
    synth = alm_rows is not None
    nch = 4 if synth else 2

    def step(carry, xs):
        if synth:
            l, rows = xs[0], xs[1:]
        else:
            l = xs
        p_prev, p_curr, s, accs = carry
        alpha, beta, gamma = _spin_coeffs(l, m, m1)
        p_next = (alpha * x + beta) * p_curr + gamma * p_prev
        seed = (l == l0)
        p_next = jnp.where(seed, frac_seed, p_next)
        p_prev2 = jnp.where(seed, 0.0, p_curr)
        big = (jnp.abs(p_next) > _TRIGGER) & (s > 0)
        p_next = jnp.where(big, p_next * _INV_RESCALE, p_next)
        p_prev2 = jnp.where(big, p_prev2 * _INV_RESCALE, p_prev2)
        s = s - big.astype(s.dtype)
        norm = jnp.sqrt((2.0 * l + 1.0) / (4.0 * jnp.pi))
        lam = jnp.where((s == 0) & (l >= l0), p_next * norm, 0.0)
        if synth:
            accs = tuple(a + r[:, None] * lam for a, r in zip(accs, rows))
            out = None
        else:
            out = tuple(jnp.sum(lam * qq, axis=1) for qq in q)
        return (p_prev2, p_next, s, accs), out

    zeros = jnp.zeros((B, nring), jnp.float32)
    # carry zeros must match the data stream's vma under shard_map
    # (parallel/sht_large spin path); no-op outside shard_map
    zeros = _match_vma(zeros, alm_rows[0] if synth else q[0])
    # triangular shortening (same as sht_large._legendre_scan): every m
    # in the block seeds at l0 = max(m, s) >= m0, so a STATIC m0 lets
    # the scan start there; traced m0 (distributed path) passes an
    # explicit static l_start lower bound instead
    if l_start is not None:
        start = int(l_start)
    else:
        start = int(m0) if isinstance(m0, (int, np.integer)) else 0
    ls = _match_vma(jnp.arange(start, lmax + 1, dtype=jnp.float32), zeros)
    init = (zeros, zeros, _match_vma(s0, zeros),
            tuple(zeros for _ in range(nch)) if synth else ())
    if synth:
        xs = (ls,) + tuple(r[start:] for r in alm_rows)
        (_, _, _, accs), _ = jax.lax.scan(step, init, xs)
        return accs
    (_, _, _, _), outs = jax.lax.scan(step, init, ls)
    if start:
        outs = tuple(jnp.pad(o, ((start, 0), (0, 0))) for o in outs)
    return outs


def _fold_block(m0, tab: Spin2LargeTables, lmax: int, blk_rows,
                l_start=None):
    """One m-block's folded ring coefficients, each (MBLOCK, nring).

    blk_rows: the block's 4 alm row slices (lmax+1, MBLOCK). m0 may be
    traced (the distributed path). Shared by _fold_coeffs below and
    parallel/sht_large's spin synthesis body.
    """
    A_er, A_ei, A_br, A_bi = _spin_scan(m0, tab, lmax, -2,
                                        alm_rows=blk_rows, l_start=l_start)
    M_er, M_ei, M_br, M_bi = _spin_scan(m0, tab, lmax, 2,
                                        alm_rows=blk_rows, l_start=l_start)
    gp_re = -(A_er - A_bi)
    gp_im = -(A_ei + A_br)
    gm_re = -(M_er + M_bi)
    gm_im = M_ei - M_br
    return gp_re, gp_im, gm_re, gm_im


def _fold_coeffs_generic(tab, lmax: int, e_re, e_im, b_re, b_im,
                         fold_block):
    """(gp_re, gp_im, gm_re, gm_im) ring coefficients, (lmax+1, nring).

    gp_m multiplies e^{+im phi}, gm_m multiplies e^{-im phi} (m > 0);
    the (-1)^m reality factors cancel exactly as in ops/sht_spin.py.
    Spin enters only through `fold_block` (and the tables)."""
    nb = -(-(lmax + 1) // _MBLOCK)
    pad = nb * _MBLOCK - (lmax + 1)
    rows = tuple(jnp.pad(a, ((0, 0), (0, pad)))
                 for a in (e_re, e_im, b_re, b_im))
    gs = [[], [], [], []]
    for blk in range(nb):
        blk_rows = tuple(r[:, blk * _MBLOCK:(blk + 1) * _MBLOCK]
                         for r in rows)
        for acc, g in zip(gs, fold_block(blk * _MBLOCK, tab, lmax,
                                         blk_rows)):
            acc.append(g)
    return tuple(jnp.concatenate(x)[: lmax + 1] for x in gs)


def _fold_coeffs(tab: Spin2LargeTables, lmax: int, e_re, e_im, b_re,
                 b_im):
    return _fold_coeffs_generic(tab, lmax, e_re, e_im, b_re, b_im,
                                _fold_block)


def _cap_complex_apply(qc, qs, tab: Spin2LargeTables, lmax: int,
                       adjoint: bool = False, map_cap=None):
    """Cap-ring trig synthesis sum_m qc cos(m phi) + qs sin(m phi)
    (adjoint: returns (sum_p map cos, sum_p map sin) per m).

    Thin wrapper over sht_large._cap_core_apply — the cap-ring
    chunk/scan structure has ONE home; the spin path is the sign-free
    convention (no m >= 1 doubling, + sin, + adjoint sin).
    """
    base = tab.base
    return _cap_core_apply(qc, qs, base.phi_cap, base.mask_cap, lmax,
                           adjoint=adjoint, map_cap=map_cap)


@partial(jax.jit, static_argnames=("nside", "lmax"))
def _synth_spin2_large_impl(e_re, e_im, b_re, b_im,
                            tab: Spin2LargeTables, nside: int, lmax: int):
    gp_re, gp_im, gm_re, gm_im = _fold_coeffs(tab, lmax, e_re, e_im,
                                              b_re, b_im)
    return _synth_from_g(gp_re, gp_im, gm_re, gm_im, tab, nside, lmax)


def _synth_from_g(gp_re, gp_im, gm_re, gm_im, tab: Spin2LargeTables,
                  nside: int, lmax: int):
    """Ring-coefficient tail of spin-2 synthesis (shared with the
    distributed m-sharded path, which gathers g before this tail)."""
    base = tab.base
    nring = base.x.shape[0]
    ncap_side = nside - 1
    n = 4 * nside
    p = (jnp.arange(lmax + 1) > 0).astype(jnp.float32)[:, None]

    # ---- belt: one complex inverse FFT per ring; bins taken mod n is
    # the exact aliasing of n equally spaced pixels
    belt = slice(ncap_side, nring - ncap_side)
    bp_re, bp_im = _rotate_phase(gp_re[:, belt], gp_im[:, belt],
                                 base.phi0[belt])
    bm_re, bm_im = _rotate_phase(gm_re[:, belt], gm_im[:, belt],
                                 base.phi0[belt], sign=-1.0)
    nbelt = bp_re.shape[1]
    ms = np.arange(lmax + 1)
    S = jnp.zeros((nbelt, n), jnp.complex64)
    S = S.at[:, ms % n].add((bp_re + 1j * bp_im).T)
    mneg = (-ms[1:]) % n
    S = S.at[:, mneg].add((bm_re[1:] + 1j * bm_im[1:]).T)
    G = jnp.fft.ifft(S, axis=1) * float(n)
    q_belt = jnp.real(G).astype(jnp.float32)
    u_belt = jnp.imag(G).astype(jnp.float32)

    # ---- caps: trig sums of the folded real channels
    cap_rows = jnp.concatenate([jnp.arange(ncap_side),
                                jnp.arange(nring - ncap_side, nring)])
    gpr, gpi = gp_re[:, cap_rows], gp_im[:, cap_rows]
    gmr, gmi = gm_re[:, cap_rows] * p, gm_im[:, cap_rows] * p
    q_cap = _cap_complex_apply(gpr + gmr, -gpi + gmi, tab, lmax)
    u_cap = _cap_complex_apply(gpi + gmi, gpr - gmr, tab, lmax)

    def assemble(cap, beltm):
        plane = jnp.concatenate([cap[:ncap_side], beltm,
                                 cap[ncap_side:]], axis=0)
        return plane.reshape(-1)[base.flat_idx]

    return assemble(q_cap, q_belt), assemble(u_cap, u_belt)


def _spin_quadrature_sums(q, u, tab: Spin2LargeTables, nside: int,
                          lmax: int):
    """Quadrature-sum head of spin-2 analysis: (Q, U) maps ->
    (dgp_re, dgp_im, dgm_re, dgm_im), each (lmax+1, nring) (shared with
    the distributed m-sharded path)."""
    base = tab.base
    nring = base.x.shape[0]
    ncap_side = nside - 1
    n = 4 * nside
    qp = (q[base.pad_idx] * base.pad_valid).reshape(nring, n)
    up = (u[base.pad_idx] * base.pad_valid).reshape(nring, n)

    # ---- belt: one complex FFT of H = Q + iU per ring
    belt = slice(ncap_side, nring - ncap_side)
    H = qp[belt] + 1j * up[belt]
    F = jnp.fft.fft(H, axis=1)          # F_k = sum_p H e^{-2pi i k p/n}
    ms = np.arange(lmax + 1)
    Fp = F[:, ms % n].T                 # dgp_m = F at +m
    Fm = F[:, (-ms) % n].T              # dgm_m = F at -m
    dgp_re_b, dgp_im_b = _rotate_phase(jnp.real(Fp).astype(jnp.float32),
                                       jnp.imag(Fp).astype(jnp.float32),
                                       base.phi0[belt], sign=-1.0)
    dgm_re_b, dgm_im_b = _rotate_phase(jnp.real(Fm).astype(jnp.float32),
                                       jnp.imag(Fm).astype(jnp.float32),
                                       base.phi0[belt], sign=1.0)

    # ---- caps: trig quadrature sums against Q and U
    cap_rows = np.concatenate([np.arange(ncap_side),
                               np.arange(nring - ncap_side, nring)])
    dqc, dqs = _cap_complex_apply(None, None, tab, lmax, adjoint=True,
                                  map_cap=qp[cap_rows])
    duc, dus = _cap_complex_apply(None, None, tab, lmax, adjoint=True,
                                  map_cap=up[cap_rows])
    p = (jnp.arange(lmax + 1) > 0).astype(jnp.float32)[:, None]
    dgp_re_c = dqc + dus
    dgp_im_c = -dqs + duc
    # m = 0 masking happens ONCE, post-assemble (the `* p` below covers
    # cap and belt rows alike)
    dgm_re_c = dqc - dus
    dgm_im_c = dqs + duc

    def assemble(cap, beltm):
        return jnp.concatenate([cap[:, :ncap_side], beltm,
                                cap[:, ncap_side:]], axis=1)

    dgp_re = assemble(dgp_re_c, dgp_re_b)
    dgp_im = assemble(dgp_im_c, dgp_im_b)
    # the belt dgm for m = 0 duplicates dgp (bin 0); the fold defines
    # gm only for m > 0, so zero the m = 0 row
    dgm_re = assemble(dgm_re_c, dgm_re_b) * p
    dgm_im = assemble(dgm_im_c, dgm_im_b) * p
    return dgp_re, dgp_im, dgm_re, dgm_im


def _adjoint_block(m0, tab: Spin2LargeTables, lmax: int, dg_slices,
                   l_start=None):
    """One m-block of the transpose scans + fold chain rule: returns the
    UNMASKED (der, dei, dbr, dbi) column chunks, each (lmax+1, MBLOCK).

    dg_slices: the block's slices of (dgp_re, dgp_im, dgm_re, dgm_im).
    m0 may be traced (the distributed path). The wq/triangle/half masks
    apply AFTER column assembly (they are elementwise in (l, m))."""
    Ar, Ai = _spin_scan(m0, tab, lmax, -2, q=(dg_slices[0], dg_slices[1]),
                        l_start=l_start)
    Mr, Mi = _spin_scan(m0, tab, lmax, 2, q=(dg_slices[2], dg_slices[3]),
                        l_start=l_start)
    # chain rule through the fold (see ops/sht_spin derivation)
    return -(Ar + Mr), -Ai + Mi, -(Ai + Mi), Ar - Mr


def _alm_masks(lmax: int, npix: int, lmin: int = 2):
    """(vre, vim) final masks: wq * triangle * m>0-halving (shared with
    the distributed path; lmin = spin)."""
    wq = 4.0 * jnp.pi / npix
    lg = jnp.arange(lmax + 1)[:, None]
    mg = jnp.arange(lmax + 1)[None, :]
    valid = (mg <= lg) & (lg >= lmin)
    half = jnp.where(mg == 0, 1.0, 0.5)
    vre = valid.astype(jnp.float32) * half * wq
    vim = (valid & (mg > 0)).astype(jnp.float32) * half * wq
    return vre, vim


def _adjoint_generic(q, u, tab, nside: int, lmax: int, adjoint_block,
                     lmin: int):
    """Quadrature adjoint (the exact transpose with 4pi/npix + m>0 halves
    folded in, the same normalization as sht_spin._adjoint_spin2).
    Spin enters only through `adjoint_block`, the tables and lmin."""
    npix = q.shape[0]
    dgs = _spin_quadrature_sums(q, u, tab, nside, lmax)

    nb = -(-(lmax + 1) // _MBLOCK)
    pad_m = nb * _MBLOCK - (lmax + 1)
    pads = tuple(jnp.pad(a, ((0, pad_m), (0, 0))) for a in dgs)
    outs = [[], [], [], []]
    for blk in range(nb):
        sl = slice(blk * _MBLOCK, (blk + 1) * _MBLOCK)
        chunk = adjoint_block(blk * _MBLOCK, tab, lmax,
                              tuple(pp[sl] for pp in pads))
        for acc, c in zip(outs, chunk):
            acc.append(c)
    der, dei, dbr, dbi = (jnp.concatenate(x, axis=1)[:, : lmax + 1]
                          for x in outs)
    vre, vim = _alm_masks(lmax, npix, lmin=lmin)
    return der * vre, dei * vim, dbr * vre, dbi * vim


@partial(jax.jit, static_argnames=("nside", "lmax"))
def _adjoint_spin2_large_impl(q, u, tab: Spin2LargeTables, nside: int,
                              lmax: int):
    return _adjoint_generic(q, u, tab, nside, lmax, _adjoint_block,
                            lmin=2)


def synthesize_spin2_large(e_re, e_im, b_re, b_im, nside: int, lmax: int,
                           tables: Optional[Spin2LargeTables] = None):
    """(E, B) alms -> (Q, U)/(gamma1, gamma2) maps at large lmax
    (alm2map_spin parity; lmax <= 4*nside - 1)."""
    tab = tables if tables is not None else spin2_large_tables(nside, lmax)
    return _synth_spin2_large_impl(
        jnp.asarray(e_re, jnp.float32), jnp.asarray(e_im, jnp.float32),
        jnp.asarray(b_re, jnp.float32), jnp.asarray(b_im, jnp.float32),
        tab, nside, lmax)


def _analyze_spin_generic(q, u, nside: int, lmax: int, niter: int,
                          method: str, tab, synth_impl, adjoint_impl):
    """Shared jacobi/cg analysis driver (spin enters only through the
    impl pair and tables).

    method as in sht_large.analyze_large: 'jacobi' residual iterations,
    'cg' the symmetrized normal-equations solve (the adjoint's m>0
    half-weight makes the raw A∘S non-SPD; undoing it restores S^T S).
    'auto' picks cg in the super-Nyquist lmax > 2*nside band, where the
    aliased +-m pairs make Jacobi useless (measured roundtrip error 0.25
    at lmax = 3*nside-1 vs 1e-3 with cg-3).
    """
    if method not in ("auto", "cg", "jacobi"):
        raise ValueError(f"method must be 'auto', 'cg' or 'jacobi', got "
                         f"{method!r}")  # typos must not silently run
    # jacobi in the super-Nyquist band where it is badly biased
    q = jnp.asarray(q, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    if method == "auto":
        method = "cg" if lmax > 2 * nside else "jacobi"
    b = adjoint_impl(q, u, tab, nside, lmax)
    if method == "cg" and niter > 0:
        from jax.scipy.sparse.linalg import cg

        mg = jnp.arange(lmax + 1)[None, :]
        unhalf = jnp.where(mg == 0, 1.0, 2.0).astype(jnp.float32)

        def mul(t):
            return tuple(a * unhalf for a in t)

        def matvec(a):
            return mul(adjoint_impl(
                *synth_impl(*a, tab, nside, lmax), tab, nside, lmax))

        alm, _ = cg(matvec, mul(b), x0=b, maxiter=niter)
        return alm
    alm = b
    for _ in range(niter):
        sq, su = synth_impl(*alm, tab, nside, lmax)
        d = adjoint_impl(q - sq, u - su, tab, nside, lmax)
        alm = tuple(a + da for a, da in zip(alm, d))
    return alm


def analyze_spin2_large(q, u, nside: int, lmax: int, niter: int = 3,
                        tables: Optional[Spin2LargeTables] = None,
                        method: str = "auto"):
    """(Q, U) maps -> (E_re, E_im, B_re, B_im) at large lmax
    (see _analyze_spin_generic for the method semantics)."""
    tab = tables if tables is not None else spin2_large_tables(nside, lmax)
    return _analyze_spin_generic(q, u, nside, lmax, niter, method, tab,
                                 _synth_spin2_large_impl,
                                 _adjoint_spin2_large_impl)


def anafast_spin2_large(q, u, lmax: int, niter: int = 3,
                        tables: Optional[Spin2LargeTables] = None,
                        method: str = "auto"):
    """(Cl_EE, Cl_BB, Cl_EB) of a spin-2 map pair at large lmax.

    method passes through to analyze_spin2_large ('auto'/'cg'/'jacobi')
    — healpy-parity comparisons must pin method='jacobi', matching the
    scalar anafast_large surface.
    """
    nside = hpx.npix2nside(jnp.asarray(q).shape[0])
    er, ei, br, bi = analyze_spin2_large(q, u, nside, lmax, niter=niter,
                                         tables=tables, method=method)
    ee = alm2cl(er, ei)
    bb = alm2cl(br, bi)
    pp = alm2cl(er + br, ei + bi)
    mm = alm2cl(er - br, ei - bi)
    return ee, bb, 0.25 * (pp - mm)


# --------------------------------------------------------------------
# spin-1: large-lmax gradient/curl (deflection) transforms
# --------------------------------------------------------------------

class Spin1LargeTables(NamedTuple):
    """Same field layout as Spin2LargeTables (the generic scan reads the
    spin off the seed table's row count); seed2_* hold the single m = 0
    closed-form row at l0 = 1."""
    base: LargeSHTTables
    log2_ch: jnp.ndarray
    log2_sh: jnp.ndarray
    seed2_p: jnp.ndarray    # (1, nring) d^1_{+1, 0}
    seed2_m: jnp.ndarray    # (1, nring) d^1_{-1, 0}
    lnc: jnp.ndarray


@lru_cache(maxsize=4)
def spin1_large_tables(nside: int, lmax: int) -> Spin1LargeTables:
    from math import lgamma

    base = sht_large_tables(nside, lmax)
    geo = ring_geometry(nside)
    th = np.asarray(geo.theta, np.float64)
    s = np.sin(th)
    # closed-form l0 = 1 seeds for m = 0 (verified against
    # wigner_d_column): d^1_{1,0} = -sin/sqrt(2), d^1_{-1,0} = +sin/sqrt(2)
    seed1_p = (-s / np.sqrt(2.0))[None, :]
    seed1_m = (+s / np.sqrt(2.0))[None, :]
    # seed amplitude log2 for m >= 1: sqrt((2m)!/((m+1)!(m-1)!))
    ms = np.arange(lmax + 1)
    ln2 = np.log(2.0)
    lnc = np.array([0.5 * (lgamma(2 * m + 1) - lgamma(m + 2)
                           - lgamma(m)) / ln2 if m >= 1 else 0.0
                    for m in ms])
    ch = np.cos(th / 2.0)
    sh = np.sin(th / 2.0)
    nb = -(-(lmax + 1) // _MBLOCK)
    pad = nb * _MBLOCK - (lmax + 1)
    dev = jax.device_put
    return Spin1LargeTables(
        base,
        dev(jnp.asarray(np.log2(np.maximum(ch, 1e-300)), jnp.float32)),
        dev(jnp.asarray(np.log2(np.maximum(sh, 1e-300)), jnp.float32)),
        dev(jnp.asarray(seed1_p, jnp.float32)),
        dev(jnp.asarray(seed1_m, jnp.float32)),
        dev(jnp.asarray(np.pad(lnc, (0, pad)), jnp.float32)),
    )


def _fold_block_spin1(m0, tab: Spin1LargeTables, lmax: int, blk_rows,
                      l_start=None):
    """One m-block's folded spin-1 ring coefficients.

    Convention pinned in ops/sht_spin.spin1_tables:
    alpha_theta + i alpha_phi = sum_{m>=0} P e^{im phi} + sum_{m>0} C
    e^{-im phi} with the plus branch s_m d_{-1,m} (s_0 = -1) and the
    fold -d_{+1,m}; returns (gp_re, gp_im, gm_re, gm_im) for the generic
    complex-FFT synthesis tail (_synth_from_g)."""
    B = _MBLOCK
    m = (m0 + jnp.arange(B, dtype=jnp.float32))[:, None]
    s_m = jnp.where(m == 0.0, -1.0, 1.0)
    A_er, A_ei, A_br, A_bi = _spin_scan(m0, tab, lmax, -1,
                                        alm_rows=blk_rows, l_start=l_start)
    M_er, M_ei, M_br, M_bi = _spin_scan(m0, tab, lmax, 1,
                                        alm_rows=blk_rows, l_start=l_start)
    gp_re = s_m * (A_er - A_bi)
    gp_im = s_m * (A_ei + A_br)
    gm_re = -(M_er + M_bi)
    gm_im = M_ei - M_br
    return gp_re, gp_im, gm_re, gm_im


def _fold_coeffs_spin1(tab: Spin1LargeTables, lmax: int, e_re, e_im,
                       b_re, b_im):
    return _fold_coeffs_generic(tab, lmax, e_re, e_im, b_re, b_im,
                                _fold_block_spin1)


@partial(jax.jit, static_argnames=("nside", "lmax"))
def _synth_spin1_large_impl(e_re, e_im, b_re, b_im,
                            tab: Spin1LargeTables, nside: int, lmax: int):
    gp_re, gp_im, gm_re, gm_im = _fold_coeffs_spin1(tab, lmax, e_re,
                                                    e_im, b_re, b_im)
    # the complex-FFT/cap tail is spin-generic: F = alpha_th + i alpha_ph
    return _synth_from_g(gp_re, gp_im, gm_re, gm_im, tab, nside, lmax)


def _adjoint_block_spin1(m0, tab: Spin1LargeTables, lmax: int,
                         dg_slices, l_start=None):
    """Transpose of _fold_block_spin1 (chain rule through the fold)."""
    B = _MBLOCK
    m = (m0 + jnp.arange(B, dtype=jnp.float32))[:, None]
    s_m = jnp.where(m == 0.0, -1.0, 1.0)[:, 0][None, :]
    Ar, Ai = _spin_scan(m0, tab, lmax, -1, q=(dg_slices[0], dg_slices[1]),
                        l_start=l_start)
    Mr, Mi = _spin_scan(m0, tab, lmax, 1, q=(dg_slices[2], dg_slices[3]),
                        l_start=l_start)
    der = s_m * Ar - Mr
    dei = s_m * Ai + Mi
    dbr = s_m * Ai - Mi
    dbi = -s_m * Ar - Mr
    return der, dei, dbr, dbi


@partial(jax.jit, static_argnames=("nside", "lmax"))
def _adjoint_spin1_large_impl(a_t, a_p, tab: Spin1LargeTables,
                              nside: int, lmax: int):
    return _adjoint_generic(a_t, a_p, tab, nside, lmax,
                            _adjoint_block_spin1, lmin=1)


def synthesize_spin1_large(e_re, e_im, b_re, b_im, nside: int, lmax: int,
                           tables: Optional[Spin1LargeTables] = None):
    """Spin-1 (E = gradient, B = curl) alms -> (alpha_theta, alpha_phi)
    at large lmax (convention of ops.sht_spin.synthesize_spin1;
    lmax <= 4*nside - 1)."""
    tab = tables if tables is not None else spin1_large_tables(nside, lmax)
    return _synth_spin1_large_impl(
        jnp.asarray(e_re, jnp.float32), jnp.asarray(e_im, jnp.float32),
        jnp.asarray(b_re, jnp.float32), jnp.asarray(b_im, jnp.float32),
        tab, nside, lmax)


def analyze_spin1_large(a_t, a_p, nside: int, lmax: int, niter: int = 3,
                        tables: Optional[Spin1LargeTables] = None,
                        method: str = "auto"):
    """(alpha_theta, alpha_phi) maps -> (E_re, E_im, B_re, B_im) at
    large lmax (method semantics as analyze_spin2_large)."""
    tab = tables if tables is not None else spin1_large_tables(nside, lmax)
    return _analyze_spin_generic(a_t, a_p, nside, lmax, niter, method,
                                 tab, _synth_spin1_large_impl,
                                 _adjoint_spin1_large_impl)


def deflection_from_kappa_alm_large(k_re, k_im, nside: int, lmax: int,
                                    tables: Optional[Spin1LargeTables]
                                    = None):
    """kappa alms -> deflection maps at large lmax (the production-scale
    counterpart of ops.sht_spin.deflection_from_kappa_alm — ONE
    convention home: sht_spin.deflection_E_factor)."""
    from .sht_spin import deflection_E_factor

    inv = deflection_E_factor(lmax)
    z = jnp.zeros_like(jnp.asarray(k_re, jnp.float32))
    return synthesize_spin1_large(k_re * inv, k_im * inv, z, z, nside,
                                  lmax, tables=tables)
