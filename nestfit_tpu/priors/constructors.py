"""Standard prior constructors.

Rebuild of the reference prior constructors
(reference: nestfit/prior_constructors.py:20-141) -- identical
distributions and parameter intervals.
"""

import numpy as np
from scipy import stats

import jax.numpy as jnp

from nestfit_tpu.priors.distributions import make_distribution
from nestfit_tpu.priors.priors import (
    ConstantPrior,
    DuplicatePrior,
    Prior,
    PriorTransformer,
    ResolvedCenSepPrior,
    ResolvedPlacementPrior,
)


def get_irdc_priors(size=500, vsys=0.0, dtype=jnp.float32):
    """Priors for the IRDCs of Svoboda et al. (in prep)
    (reference: prior_constructors.py:20-76): beta-distribution PDFs on
    500-point grids with a resolved-placement prior on the centroids
    and the ortho fraction fixed to zero."""
    u = np.linspace(0, 1, size)
    x_voff = 8.00 * u - 4.00 + vsys
    x_trot = 23.00 * u + 7.00
    x_tex = 9.26 * u + 2.80
    x_ntot = 4.00 * u + 12.50
    x_sigm = 2.00 * u + 0.067
    f_voff = stats.beta(5.0, 5.0).pdf(u)
    f_trot = stats.beta(3.0, 6.7).pdf(u)
    f_tex = stats.beta(1.0, 2.5).pdf(u)
    f_ntot = stats.beta(10.0, 8.5).pdf(u)
    f_sigm = stats.beta(1.5, 5.0).pdf(u)
    d_voff = make_distribution(x_voff, f_voff, dtype=dtype)
    d_trot = make_distribution(x_trot, f_trot, dtype=dtype)
    d_tex = make_distribution(x_tex, f_tex, dtype=dtype)
    d_ntot = make_distribution(x_ntot, f_ntot, dtype=dtype)
    d_sigm = make_distribution(x_sigm, f_sigm, dtype=dtype)
    priors = [
        ResolvedPlacementPrior(
            Prior(d_voff, 0),
            Prior(d_sigm, 4),
            scale=1.2,
        ),
        Prior(d_trot, 1),
        Prior(d_tex, 2),
        Prior(d_ntot, 3),
        ConstantPrior(0, 5),
    ]
    return PriorTransformer(priors)


def get_synth_priors(size=500, dtype=jnp.float32):
    """Priors for synthetic ammonia tests per Keown et al. (2019) S6.1
    (reference: prior_constructors.py:79-141): uniform PDFs, a
    scaled log-normal on sigma, a resolved center-separation prior on
    the centroids, and tex duplicated from tkin (LTE)."""
    u = np.linspace(0, 1, size)
    x_voff = 7.800 * u - 3.90
    x_vsep = 2.570 * u + 0.13
    x_tkin = 17.200 * u + 7.90
    x_ntot = 1.600 * u + 12.95
    x_sigm = 2.025 * u + 0.075
    f_voff = np.ones_like(u) / size
    f_vsep = np.ones_like(u) / size
    f_tkin = np.ones_like(u) / size
    f_ntot = np.ones_like(u) / size
    f_sigm = stats.lognorm(1.0, scale=0.136).pdf(u)
    d_voff = make_distribution(x_voff, f_voff, dtype=dtype)
    d_vsep = make_distribution(x_vsep, f_vsep, dtype=dtype)
    d_tkin = make_distribution(x_tkin, f_tkin, dtype=dtype)
    d_ntot = make_distribution(x_ntot, f_ntot, dtype=dtype)
    d_sigm = make_distribution(x_sigm, f_sigm, dtype=dtype)
    fwhm = 2 * np.sqrt(2 * np.log(2))
    priors = [
        ResolvedCenSepPrior(
            Prior(d_voff, 0),
            Prior(d_vsep, 0),
            Prior(d_sigm, 4),
            scale=1 / fwhm,
        ),
        DuplicatePrior(d_tkin, 1, 2),
        Prior(d_ntot, 3),
        ConstantPrior(0, 5),
    ]
    return PriorTransformer(priors)


def get_gaussian_priors(size=500, vsys=0.0, voff_span=8.0, sigm_hi=2.0,
                        peak_hi=10.0, dtype=jnp.float32):
    """Simple uniform priors for the 3-parameter Gaussian model
    (analogue of the experiment configs, reference
    experiments/dynesty_gaussian.py / multinest_gaussian.py)."""
    u = np.linspace(0, 1, size)
    flat = np.ones_like(u) / size
    d_voff = make_distribution(voff_span * u - voff_span / 2 + vsys, flat, dtype=dtype)
    d_sigm = make_distribution((sigm_hi - 0.05) * u + 0.05, flat, dtype=dtype)
    d_peak = make_distribution(peak_hi * u + 0.01, flat, dtype=dtype)
    priors = [
        ResolvedPlacementPrior(Prior(d_voff, 0), Prior(d_sigm, 1), scale=1.0),
        Prior(d_peak, 2),
    ]
    return PriorTransformer(priors)


def get_diazenylium_priors(size=500, vsys=0.0, voff_span=8.0,
                           dtype=jnp.float32):
    """Priors for the 4-parameter N2H+ model (voff, tex, ltau, sigm;
    reference diazenylium.pyx:140-155): uniform velocity placement with
    resolved-separation ordering, Tex in (2.8, 12) K, log10 tau in
    (-2, 2), sigma in (0.05, 2) km/s."""
    u = np.linspace(0, 1, size)
    flat = np.ones_like(u) / size
    d_voff = make_distribution(
        voff_span * u - voff_span / 2 + vsys, flat, dtype=dtype
    )
    d_tex = make_distribution(9.2 * u + 2.8, flat, dtype=dtype)
    d_ltau = make_distribution(4.0 * u - 2.0, flat, dtype=dtype)
    d_sigm = make_distribution(1.95 * u + 0.05, flat, dtype=dtype)
    priors = [
        ResolvedPlacementPrior(Prior(d_voff, 0), Prior(d_sigm, 3),
                               scale=1.2),
        Prior(d_tex, 1),
        Prior(d_ltau, 2),
    ]
    return PriorTransformer(priors)
