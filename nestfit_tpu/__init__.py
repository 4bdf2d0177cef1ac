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

# models
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
from nestfit_tpu.models.ammonia import (
    amm_predict,
    make_ammonia_spectrum,
    partition_func,
    partition_level,
    swift_convert,
)
from nestfit_tpu.models.diazenylium import (
    make_diazenylium_spectrum,
    nnhp_predict,
)
from nestfit_tpu.models.gaussian import gauss_predict, make_gaussian_spectrum

# priors
from nestfit_tpu.priors import (
    CenSepPrior,
    ConstantPrior,
    Distribution,
    DuplicatePrior,
    OrderedPrior,
    Prior,
    PriorTransformer,
    ResolvedCenSepPrior,
    ResolvedPlacementPrior,
    SpacedPrior,
    get_diazenylium_priors,
    get_gaussian_priors,
    get_irdc_priors,
    get_synth_priors,
    make_distribution,
)

# sampling
from nestfit_tpu.sampling import (
    MARGINAL_COLS,
    QUANTILES,
    NSConfig,
    NSResult,
    ModeProducts,
    PosteriorProducts,
    information_criteria,
    posterior_modes,
    posterior_products,
    run_nested,
)
from nestfit_tpu.sampling.fit import FitResult, fit_batch, fit_single

# cube pipeline
from nestfit_tpu.cube import (
    CubeFitter,
    CubeStack,
    DataCube,
    HdfStore,
    NoiseMap,
    NoiseMapUniform,
    read_fits,
    write_fits,
)
from nestfit_tpu.cube.products import (
    aggregate_run_attributes,
    aggregate_run_pdfs,
    aggregate_run_products,
    apply_circular_mask,
    convolve_evidence,
    convolve_post_pdfs,
    create_fits_from_store,
    deblend_hf_intensity,
    extended_masked_evidence,
    generate_predicted_profiles,
    get_indep_info_kernel,
    postprocess_run,
    quantize_conv_marginals,
    take_by_components,
)

# parallel / synthetic / utils
from nestfit_tpu.parallel import make_mesh, pixel_sharding, shard_pixel_batch
from nestfit_tpu.synth import (
    ParamSampler,
    SyntheticSpectrum,
    get_test_spectra,
    make_synth_cube_arrays,
)
from nestfit_tpu.utils import (
    freq_axis_from_velocity,
    get_logger,
    velocity_axis_from_freq,
)

__version__ = "0.1.0"
