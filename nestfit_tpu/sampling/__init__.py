from nestfit_tpu.sampling.results import (
    MARGINAL_COLS,
    QUANTILES,
    ModeProducts,
    PosteriorProducts,
    information_criteria,
    posterior_modes,
    posterior_products,
)
from nestfit_tpu.sampling.sampler import NSConfig, NSResult, run_nested
