"""Publication figures (port of /root/reference/src/astrildvisual/).

matplotlib is host-side and optional; every function degrades to raising a
clear ImportError when it is unavailable.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["figure_size", "plot_map", "plot_power_spectra",
           "plot_halo_mass_function", "plot_velocity_field",
           "plot_void_profiles", "plot_dipole_maps",
           "plot_dipole_cross_section"]


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:
        raise ImportError("visualization requires matplotlib") from e


def figure_size(width_pt: float = 510.0, fraction: float = 1.0,
                ratio: Optional[float] = None):
    """LaTeX-matched figure dimensions in inches
    (astrildvisual/figure_size.py)."""
    width_in = width_pt * fraction / 72.27
    ratio = ratio if ratio is not None else (5 ** 0.5 - 1) / 2
    return (width_in, width_in * ratio)


def plot_map(img, opening_angle_deg: float = None, title: str = "",
             cmap: str = "RdBu_r", symmetric: bool = True, fname=None):
    """Sky-map imshow (astrildvisual/particles/map.py,
    rays/visuals.py map plots)."""
    plt = _plt()
    img = np.asarray(img)
    vmax = np.nanmax(np.abs(img)) if symmetric else None
    vmin = -vmax if symmetric else None
    extent = None
    if opening_angle_deg:
        extent = [0, opening_angle_deg, 0, opening_angle_deg]
    fig, ax = plt.subplots(figsize=figure_size())
    im = ax.imshow(img, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax,
                   extent=extent)
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    if opening_angle_deg:
        ax.set_xlabel(r"$\theta_1$ [deg]")
        ax.set_ylabel(r"$\theta_2$ [deg]")
    if fname:
        fig.savefig(fname, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_power_spectra(k, pks: dict, theory=None, fname=None):
    plt = _plt()
    fig, ax = plt.subplots(figsize=figure_size())
    for label, p in pks.items():
        ax.loglog(np.asarray(k), np.asarray(p), label=label)
    if theory is not None:
        ax.loglog(np.asarray(k), np.asarray(theory), "k--", label="linear")
    ax.set_xlabel(r"$k$ [$h$/Mpc]")
    ax.set_ylabel(r"$P(k)$ [(Mpc/$h$)$^3$]")
    ax.legend()
    if fname:
        fig.savefig(fname, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_halo_mass_function(mass_bins, counts, volume=None, fname=None):
    """(astrildvisual/particles/halo_mass_function.py)"""
    plt = _plt()
    fig, ax = plt.subplots(figsize=figure_size())
    y = np.asarray(counts, float)
    if volume:
        y = y / volume
    ax.loglog(np.asarray(mass_bins), y)
    ax.set_xlabel(r"$M_{200c}$ [$M_\odot/h$]")
    ax.set_ylabel(r"$N(>M)$" + (r"$/V$" if volume else ""))
    if fname:
        fig.savefig(fname, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_velocity_field(pos, vel, nbins: int = 32, boxsize: float = None,
                        fname=None):
    """Binned quiver of a 2D velocity field slice
    (astrildvisual/rays/visuals.py:28-60)."""
    plt = _plt()
    pos = np.asarray(pos)
    vel = np.asarray(vel)
    boxsize = boxsize or pos.max()
    edges = np.linspace(0, boxsize, nbins + 1)
    cx = 0.5 * (edges[1:] + edges[:-1])
    vx = np.zeros((nbins, nbins))
    vy = np.zeros((nbins, nbins))
    ix = np.clip(np.digitize(pos[:, 0], edges) - 1, 0, nbins - 1)
    iy = np.clip(np.digitize(pos[:, 1], edges) - 1, 0, nbins - 1)
    cnt = np.zeros((nbins, nbins))
    np.add.at(vx, (ix, iy), vel[:, 0])
    np.add.at(vy, (ix, iy), vel[:, 1])
    np.add.at(cnt, (ix, iy), 1)
    cnt = np.maximum(cnt, 1)
    fig, ax = plt.subplots(figsize=figure_size(ratio=1.0))
    ax.quiver(cx[:, None] * np.ones((1, nbins)),
              cx[None, :] * np.ones((nbins, 1)), vx / cnt, vy / cnt)
    ax.set_xlabel("x [Mpc/h]")
    ax.set_ylabel("y [Mpc/h]")
    if fname:
        fig.savefig(fname, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_void_profiles(radii, mean, lowerr=None, higherr=None, fname=None):
    plt = _plt()
    fig, ax = plt.subplots(figsize=figure_size())
    ax.plot(np.asarray(radii), np.asarray(mean))
    if lowerr is not None and higherr is not None:
        ax.fill_between(np.asarray(radii), np.asarray(lowerr),
                        np.asarray(higherr), alpha=0.3)
    ax.axhline(0, color="k", lw=0.5)
    ax.set_xlabel(r"$r / R_{\rm void}$")
    ax.set_ylabel(r"$\kappa(r)$")
    if fname:
        fig.savefig(fname, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_dipole_maps(dipoles, skymap, indices, extent_deg: float = 1.0,
                     opening_angle_deg: float = 20.0, fname=None):
    """Cutouts of the dT map around selected dipoles, transverse-velocity
    arrow overlaid (astrildvisual/rays/visuals.py:162-238).

    dipoles: dict of columns with theta1_pix/theta2_pix and
    theta1_mtvel/theta2_mtvel (or *_tv); skymap: 2D array.
    """
    plt = _plt()
    img = np.asarray(skymap)
    npix = img.shape[0]
    pix_per_deg = npix / opening_angle_deg
    half = max(2, int(extent_deg * pix_per_deg / 2))
    get = lambda k: np.asarray(dipoles[k], float)
    vk = "theta1_mtvel" if "theta1_mtvel" in dipoles else "theta1_tv"
    vk2 = vk.replace("theta1", "theta2")
    fig, axes = plt.subplots(1, len(indices), figsize=(5 * len(indices), 5),
                             squeeze=False)
    for ax, i in zip(axes[0], indices):
        r = int(get("theta1_pix")[i])
        c = int(get("theta2_pix")[i])
        r0, r1 = max(0, r - half), min(npix, r + half)
        c0, c1 = max(0, c - half), min(npix, c + half)
        cut = img[r0:r1, c0:c1]
        vmax = float(np.abs(cut).max()) or 1.0
        ax.imshow(cut, cmap="RdBu_r", vmin=-vmax, vmax=vmax,
                  origin="lower")
        ax.quiver([c - c0], [r - r0], [get(vk2)[i]], [get(vk)[i]],
                  color="k")
        ax.set_title(f"dipole {i}")
    if fname:
        fig.savefig(fname, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_dipole_cross_section(dipoles, skymap, index: int,
                              extent_deg: float = 1.0,
                              opening_angle_deg: float = 20.0, axis: int = 1,
                              fname=None):
    """1D dT profile through a dipole center along the given array axis
    (astrildvisual/rays/visuals.py:241-300)."""
    plt = _plt()
    img = np.asarray(skymap)
    npix = img.shape[0]
    pix_per_deg = npix / opening_angle_deg
    half = max(2, int(extent_deg * pix_per_deg / 2))
    r = int(np.asarray(dipoles["theta1_pix"], float)[index])
    c = int(np.asarray(dipoles["theta2_pix"], float)[index])
    if axis == 1:
        lo, hi = max(0, c - half), min(npix, c + half)
        prof = img[r, lo:hi]
        x = (np.arange(lo, hi) - c) / pix_per_deg
    else:
        lo, hi = max(0, r - half), min(npix, r + half)
        prof = img[lo:hi, c]
        x = (np.arange(lo, hi) - r) / pix_per_deg
    fig, ax = plt.subplots(figsize=figure_size())
    ax.plot(x, prof)
    ax.axhline(0.0, color="0.6", lw=0.8)
    ax.set_xlabel(r"offset [deg]")
    ax.set_ylabel(r"$\Delta T$")
    if fname:
        fig.savefig(fname, bbox_inches="tight")
        plt.close(fig)
    return fig
