"""Diazenylium (N2H+) hyperfine model.

TPU-native rebuild of the reference diazenylium model
(reference: nestfit/models/diazenylium.pyx).  Four parameters per
component (diazenylium.pyx:242) -- the optical depth is a direct
parameter, no partition function (diazenylium.pyx:140-155)::

    voff : velocity centroid offset    [km/s]
    tex  : excitation temperature      [K]
    ltau : log10 main-line optical depth
    sigm : velocity dispersion         [km/s]
"""

import jax.numpy as jnp

from nestfit_tpu.models import hyperfine
from nestfit_tpu.models.ammonia import unpack_params
from nestfit_tpu.models.spectrum import Spectrum, make_spectrum
from nestfit_tpu.models.tables import DIAZENYLIUM_TRANSITIONS

N_PARAMS = 4


def nnhp_predict(spec: Spectrum, params):
    """Predict the N2H+ spectrum for a mixture of components.

    Pure-function equivalent of ``c_nnhp_predict``
    (reference: diazenylium.pyx:140-155).
    """
    trans = DIAZENYLIUM_TRANSITIONS[spec.trans_id - 1]
    p = unpack_params(jnp.asarray(params, dtype=spec.dnu.dtype), N_PARAMS)
    voff, tex, ltau, sigm = (p[..., i, :] for i in range(N_PARAMS))
    tb = hyperfine.hf_predict(
        trans, spec.dnu, spec.t0, spec.tbg, voff, tex, 10.0 ** ltau, sigm
    )
    return jnp.sum(tb, axis=-2)


def fused_chi2(spec: Spectrum, params_flat):
    """Fused Pallas spectrum-synthesis + chi-square (see ops/fused.py)."""
    from nestfit_tpu.ops import fused

    trans = DIAZENYLIUM_TRANSITIONS[spec.trans_id - 1]
    p = unpack_params(jnp.asarray(params_flat, jnp.float32), N_PARAMS)
    voff, tex, ltau, sigm = (p[..., i, :] for i in range(N_PARAMS))
    return fused.hf_chi2_fused(
        trans, spec.dnu, spec.t0, spec.tbg, spec.data,
        voff, tex, 10.0 ** ltau, sigm,
    )


def make_diazenylium_spectrum(xarr, data, noise, trans_id=1, **kw) -> Spectrum:
    """Equivalent of ``DiazenyliumSpectrum`` construction
    (reference: diazenylium.pyx:105-137)."""
    assert 1 <= trans_id <= len(DIAZENYLIUM_TRANSITIONS)
    trans = DIAZENYLIUM_TRANSITIONS[trans_id - 1]
    return make_spectrum(xarr, data, noise, rest_freq=trans.nu,
                         trans_id=trans_id, **kw)


# Module-level metadata (reference: diazenylium.pyx:233-257)
N = N_PARAMS
IX_VCEN = 0
IX_SIGM = 3
NAME = "diazenylium"
model_predict = nnhp_predict
make_model_spectrum = make_diazenylium_spectrum
TRANSITIONS = DIAZENYLIUM_TRANSITIONS

PAR_NAMES = ["voff", "tex", "ltau", "sigm"]
PAR_NAMES_SHORT = ["v", "Tx", "lt", "s"]
TEX_LABELS = [
    r"$v_\mathrm{lsr}$",
    r"$T_\mathrm{ex}$",
    r"$\log(\tau_0)$",
    r"$\sigma_\mathrm{v}$",
]
TEX_LABELS_WITH_UNITS = [
    r"$v_\mathrm{lsr} \ [\mathrm{km\, s^{-1}}]$",
    r"$T_\mathrm{ex} \ [\mathrm{K}]$",
    r"$\log(\tau_0)$",
    r"$\sigma_\mathrm{v} \ [\mathrm{km\, s^{-1}}]$",
]


def get_par_names(ncomp=None):
    if ncomp is not None:
        return [
            f"{label}{n}"
            for label in PAR_NAMES_SHORT
            for n in range(1, ncomp + 1)
        ]
    return PAR_NAMES_SHORT
