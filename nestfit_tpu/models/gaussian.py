"""Gaussian mixture line model.

TPU-native rebuild of the reference Gaussian model
(reference: nestfit/models/gaussian.pyx).  Three parameters per
component (gaussian.pyx:124)::

    voff : velocity centroid offset  [km/s]
    sigm : velocity dispersion       [km/s]
    peak : peak brightness           [K]

The reference truncates each Gaussian at +-5 sigma with an indexed
scalar loop (gaussian.pyx:34-50); here the profile is evaluated densely
over the channel (lane) axis -- exact and faster on TPU.
"""

import jax.numpy as jnp

from nestfit_tpu.constants import CKMS
from nestfit_tpu.models.ammonia import unpack_params
from nestfit_tpu.models.spectrum import Spectrum, make_spectrum

N_PARAMS = 3


def gauss_predict(spec: Spectrum, params):
    """Predict the Gaussian mixture spectrum.

    Pure-function equivalent of ``c_gauss_predict``
    (reference: gaussian.pyx:17-50).

    Parameters
    ----------
    spec : Spectrum
        ``rest_freq`` defines the velocity reference.
    params : f32[..., 3*ncomp]
        Parameter-major packed (voff, sigm, peak) per component.

    Returns
    -------
    pred : f32[..., S]
    """
    p = unpack_params(jnp.asarray(params, dtype=spec.dnu.dtype), N_PARAMS)
    voff, sigm, peak = (p[..., i, :] for i in range(N_PARAMS))
    # nu_cen = rest_freq * (1 - voff/c); relative to rest_freq that is
    # -voff/c * rest_freq (gaussian.pyx:31-33).
    rel_cen = -voff * (spec.rest_freq / CKMS)              # [..., ncomp]
    nu_width = sigm * (spec.rest_freq / CKMS)
    idenom = 0.5 / (nu_width * nu_width)
    d = spec.dnu - rel_cen[..., None]                      # [..., ncomp, S]
    prof = peak[..., None] * jnp.exp(-(d * d) * idenom[..., None])
    return jnp.sum(prof, axis=-2)


def fused_chi2(spec: Spectrum, params_flat):
    """Fused Pallas spectrum-synthesis + chi-square (see ops/fused.py)."""
    from nestfit_tpu.constants import CKMS as _C
    from nestfit_tpu.ops import fused
    from nestfit_tpu.models.ammonia import unpack_params as _unpack

    p = _unpack(jnp.asarray(params_flat, jnp.float32), N_PARAMS)
    voff, sigm, peak = (p[..., i, :] for i in range(N_PARAMS))
    return fused.gauss_chi2_fused(
        spec.rest_freq / _C, spec.dnu, spec.data, voff, sigm, peak
    )


def make_gaussian_spectrum(xarr, data, noise, trans_id=-1, **kw) -> Spectrum:
    """Plain Spectrum with rest_freq from the axis midpoint (the
    reference uses ``Spectrum`` directly with an explicit rest_freq,
    gaussian.pyx:121)."""
    return make_spectrum(xarr, data, noise, trans_id=trans_id, **kw)


# Module-level metadata (reference: gaussian.pyx:115-137)
N = N_PARAMS
IX_VCEN = 0
IX_SIGM = 1
NAME = "gaussian"
model_predict = gauss_predict
make_model_spectrum = make_gaussian_spectrum
TRANSITIONS = ()

PAR_NAMES = ["voff", "sigm", "peak"]
PAR_NAMES_SHORT = ["v", "s", "pk"]
TEX_LABELS = [
    r"$v_\mathrm{lsr}$",
    r"$\sigma_\mathrm{v}$",
    r"$T_\mathrm{pk}$",
]
TEX_LABELS_WITH_UNITS = [
    r"$v_\mathrm{lsr} \ [\mathrm{km\, s^{-1}}]$",
    r"$\sigma_\mathrm{v} \ [\mathrm{km\, s^{-1}}]$",
    r"$T_\mathrm{pk} \ [\mathrm{K}]$",
]


def get_par_names(ncomp=None):
    if ncomp is not None:
        return [
            f"{label}{n}"
            for label in PAR_NAMES_SHORT
            for n in range(1, ncomp + 1)
        ]
    return PAR_NAMES_SHORT
