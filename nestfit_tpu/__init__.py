"""nestfit_tpu -- TPU-native Bayesian spectral-line decomposition.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NestFit
(reference: /root/reference, autocorr/nestfit): per-pixel nested
sampling over hyperfine/Gaussian spectral models with Bayes-factor
N-component selection, scaled to whole cubes by batching thousands of
pixels per chip and sharding over a TPU mesh.

Flat API re-export mirroring the reference package layout
(reference: nestfit/__init__.py:8-62).
"""

from nestfit_tpu.constants import CKMS, CCMS, FWHM, H, KB, TCMB
from nestfit_tpu.models import (
    AMMONIA_TRANSITIONS,
    DIAZENYLIUM_TRANSITIONS,
    MODELS,
    AmmoniaRunner,
    DiazenyliumRunner,
    GaussianRunner,
    Runner,
    Spectrum,
    Transition,
    ammonia,
    diazenylium,
    gaussian,
    make_spectrum,
)
from nestfit_tpu.models.ammonia import amm_predict, make_ammonia_spectrum
from nestfit_tpu.models.diazenylium import make_diazenylium_spectrum, nnhp_predict
from nestfit_tpu.models.gaussian import gauss_predict, make_gaussian_spectrum
from nestfit_tpu.utils import freq_axis_from_velocity, velocity_axis_from_freq

__version__ = "0.1.0"
