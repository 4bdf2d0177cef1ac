"""SNR-sweep model-selection experiment (reference
experiments/varnoise.py:23-209 rebuilt batched)."""

import numpy as np
import pytest

from nestfit_tpu.experiments.varnoise import run_varnoise_sweep
from nestfit_tpu.priors import get_irdc_priors


@pytest.mark.slow
def test_varnoise_selection_trend():
    """Low SNR prefers fewer components; high SNR finds both."""
    utrans = get_irdc_priors(vsys=0.0)
    out = run_varnoise_sweep(
        utrans, snr_levels=np.array([1.0, 40.0]), n_per_level=8,
        ncomp_max=2, nlive=60, tol=1.0, seed=7,
    )
    nbest = out["nbest_lnz"]                  # [n_levels, n_per_level]
    assert nbest.shape == (2, 8)
    # at SNR ~1 almost nothing is detected; at SNR 40 every spectrum
    # prefers >= 1 component and most prefer 2
    assert nbest[0].mean() < 1.0
    assert (nbest[1] >= 1).all()
    assert (nbest[1] == 2).mean() >= 0.5
    # evidences are monotone with ncomp at high SNR for 2-comp truth
    lnz = out["lnz"]                          # [levels, n, ncomp_max+1]
    assert np.all(lnz[1, :, 2] > lnz[1, :, 0])
