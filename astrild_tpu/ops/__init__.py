from . import (angular_power, bao, bispectrum, cmb_lensing, covariance, density_split, fftlog, field_infer, filters, halo_model, halo_stats, hod, lens_planes, lensing,
               lightcone_sphere, linear_power, map_transform, mocks, nbody, object_selection, paint,
               pairwise, pallas_pairwise, peaks, power, profiles, profiles3d,
               raytrace, recon, shear_2pt, so_halos, strong_lensing, sz, tpcf, troughs, velocity, voids, voids3d)

__all__ = ["angular_power", "bao", "bispectrum", "cmb_lensing", "covariance", "density_split", "fftlog", "field_infer", "filters", "halo_model", "halo_stats", "hod", "lens_planes", "lensing",
           "lightcone_sphere", "linear_power", "map_transform", "mocks", "nbody", "object_selection",
           "paint", "pairwise", "pallas_pairwise", "peaks", "power",
           "profiles", "profiles3d", "raytrace", "recon", "shear_2pt", "so_halos", "strong_lensing", "sz", "tpcf", "troughs",
           "velocity", "voids", "voids3d"]
