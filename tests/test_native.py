"""Native C++ engine tests: kernel parity and sampler agreement.

The C++ library is an independent implementation of both the model
physics and (sequential) nested sampling; these tests close the
three-way loop jax-kernel <-> numpy-oracle <-> C++ engine, and check
evidence agreement between the vectorized sampler and the classical
sequential one -- the reference's "logZ agreement vs MultiNest" metric
(BASELINE.json) with an in-repo stand-in.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

from nestfit_tpu import native, oracle
from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS
from nestfit_tpu.sampling import NSConfig, run_nested
from nestfit_tpu.utils import freq_axis_from_velocity

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_native_predict_matches_oracle():
    params = np.array([-1.0, 1.5, 10.0, 15.0, 4.0, 6.0,
                       14.5, 15.0, 0.3, 0.6, 0.0, 0.0])
    for tid in (1, 2):
        xarr = freq_axis_from_velocity(
            np.arange(-30, 30, 0.158), AMMONIA_TRANSITIONS[tid - 1].nu
        )
        p_native = native.amm_predict_native(xarr, params, tid)
        p_oracle = oracle.amm_predict(xarr, params, tid)
        np.testing.assert_allclose(p_native, p_oracle, rtol=1e-12, atol=1e-14)


def test_native_transform_parity_irdc():
    """The C++ engine's prior transform (per-dim PPF tables + joint
    resolved-placement overwrite, the exact path ``nf_ns_spectral``
    integrates) must match ``PriorTransformer.transform`` on random
    unit cubes for ncomp = 1..3.  Guards the CPU baseline / native
    truth against integrating a different prior than the TPU sampler
    (the placement coupling is NOT representable by per-dim tables)."""
    from nestfit_tpu.priors import get_irdc_priors

    utrans = get_irdc_priors(vsys=0.0)
    rng = np.random.default_rng(7)
    voff_dx = float(utrans.priors[0].dist.dx)   # centroid grid cell
    for ncomp in (1, 2, 3):
        ndim = utrans.n_param * ncomp
        u = rng.uniform(0.02, 0.98, size=(256, ndim))
        th_py = np.asarray(utrans.transform(jnp.asarray(u), ncomp),
                           dtype=np.float64)
        th_py = th_py.reshape(-1, utrans.n_param, ncomp)
        th_c = native.transform_native(utrans, ncomp, u)
        th_c = th_c.reshape(-1, utrans.n_param, ncomp)
        # independent dims: table sub-sampling error only
        for p in (1, 2, 3, 4, 5):
            np.testing.assert_allclose(
                th_c[:, p], th_py[:, p], atol=5e-3,
                err_msg=f"ncomp={ncomp} p_ix={p}",
            )
        # placement (voff) dims: two independent implementations of
        # the tapered interval inversion; the Python O(1)-memory f32
        # path is documented accurate to ~2.5 grid cells on narrow
        # intervals (distributions.py), so gate max error at 5 cells
        # and median at 1 cell
        err = np.abs(th_c[:, 0] - th_py[:, 0])
        assert np.median(err) < 1.0 * voff_dx, (ncomp, np.median(err))
        assert err.max() < 5.0 * voff_dx, (ncomp, err.max())
        if ncomp >= 2:
            # ordering + minimum resolved separation hold in both
            assert np.all(np.diff(th_c[:, 0], axis=-1) > 0)
            pr = utrans.priors[0]
            sig = th_c[:, 4]
            min_sep = pr.sep_scale * np.sqrt(sig[:, 1:] * sig[:, :-1])
            # separations are shrunk to fit when their sum exceeds the
            # centroid range (priors.py:222-227)
            v_range = float(pr.dist.xmax - pr.dist.xmin)
            sep_tot = min_sep.sum(axis=-1, keepdims=True)
            min_sep = min_sep * np.minimum(1.0, v_range / sep_tot)
            gap = np.diff(th_c[:, 0], axis=-1)
            assert np.all(gap >= min_sep * 0.9 - 1e-6)


def test_native_ns_gaussian_evidence():
    ndim, sigma = 6, 0.05
    lnz_true = 0.5 * ndim * np.log(2 * np.pi * sigma**2)
    runs = [native.ns_gaussian(ndim, sigma, nlive=200, tol=0.1, seed=s)
            for s in range(4)]
    lnzs = np.array([r["lnz"] for r in runs])
    errs = np.array([r["lnz_err"] for r in runs])
    assert np.all(np.abs(lnzs - lnz_true) < 4 * errs)


def test_vectorized_vs_sequential_agreement():
    """The TPU-style vectorized sampler and the classical sequential
    C++ sampler must agree on lnZ for the same analytic problem."""
    ndim, sigma = 4, 0.06
    lnz_true = 0.5 * ndim * np.log(2 * np.pi * sigma**2)

    def loglike(u):
        return -0.5 * jnp.sum((u - 0.5) ** 2, axis=-1) / sigma**2

    res_v = run_nested(random.key(0), loglike, ndim, 8,
                       NSConfig(nlive=200, tol=0.1), dtype=jnp.float64)
    lnz_v = float(np.mean(np.asarray(res_v.lnz)))
    seq = [native.ns_gaussian(ndim, sigma, nlive=200, tol=0.1, seed=s)
           for s in range(4)]
    lnz_s = float(np.mean([r["lnz"] for r in seq]))
    err = float(np.mean(np.asarray(res_v.lnz_err)))
    assert abs(lnz_v - lnz_s) < 3 * err, (lnz_v, lnz_s, lnz_true)
    assert abs(lnz_v - lnz_true) < 3 * err
    assert abs(lnz_s - lnz_true) < 3 * err


@pytest.mark.slow
def test_ammonia_lnz_agreement_vectorized_vs_sequential():
    """End-to-end ammonia fit: vectorized vs sequential lnZ within
    combined error bars (independent per-dim priors so both samplers
    see the identical posterior)."""
    from nestfit_tpu.models import AmmoniaRunner, ammonia
    from nestfit_tpu.priors import (
        ConstantPrior, Prior, PriorTransformer, make_distribution,
    )
    from nestfit_tpu.synth import SyntheticSpectrum

    vax = np.arange(-30, 30, 0.158)
    params = np.array([-1.0, 12.0, 6.0, 14.3, 0.35, 0.0])
    syn = [
        SyntheticSpectrum(
            freq_axis_from_velocity(vax, AMMONIA_TRANSITIONS[i].nu),
            params, noise=0.15, trans_id=i + 1, set_seed=True,
        )
        for i in range(2)
    ]
    # independent flat-ish priors (exactly representable per-dim)
    u = np.linspace(0, 1, 300)
    flat = np.ones_like(u)
    mk = lambda lo, hi: make_distribution(lo + (hi - lo) * u, flat,  # noqa
                                          dtype=jnp.float64)
    ut = PriorTransformer([
        Prior(mk(-4.0, 4.0), 0),
        Prior(mk(7.0, 25.0), 1),
        Prior(mk(2.8, 12.0), 2),
        Prior(mk(12.5, 16.0), 3),
        Prior(mk(0.1, 1.5), 4),
        ConstantPrior(0.0, 5),
    ])
    spectra = [s.to_ammspec(dtype=jnp.float64) for s in syn]
    runner = AmmoniaRunner(spectra, ut, ncomp=1)
    runner.use_fused = False
    res_v = run_nested(
        random.key(1), lambda uu: runner.loglike_unit(uu), 6, 4,
        NSConfig(nlive=200, tol=0.5), dtype=jnp.float64,
    )
    lnz_v = float(np.mean(np.asarray(res_v.lnz)))
    err_v = float(np.mean(np.asarray(res_v.lnz_err)))

    ppf = native.bindings.ppf_tables_from_utrans(ut, 1)
    spec_data = [(s.xarr, s.sampled_spec, s.noise, s.trans_id) for s in syn]
    seq = [native.ns_spectral_ammonia(spec_data, ppf, ncomp=1, nlive=200,
                                      tol=0.5, seed=s) for s in range(3)]
    lnz_s = float(np.mean([r["lnz"] for r in seq]))
    err_s = float(np.mean([r["lnz_err"] for r in seq]))
    tol = 3 * np.hypot(err_v, err_s) + 0.5
    assert abs(lnz_v - lnz_s) < tol, (lnz_v, lnz_s, err_v, err_s)
    # bestfit centroids agree with the truth
    bf = seq[0]["bestfit"]
    assert abs(bf[0] - params[0]) < 0.1
