from nestfit_tpu.sampling.results import (
    MARGINAL_COLS,
    QUANTILES,
    PosteriorProducts,
    information_criteria,
    posterior_products,
)
from nestfit_tpu.sampling.sampler import NSConfig, NSResult, run_nested
