"""Model kernel tests.

Strategy mirrors the reference's (SURVEY.md section 4):
golden values hard-coded from pyspeckit (reference ammonia.pyx:496-521)
plus channel-by-channel cross-validation against an independent float64
NumPy implementation (the role pyspeckit plays in reference
plotting.py:1031-1060).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nestfit_tpu import oracle
from nestfit_tpu.constants import CKMS
from nestfit_tpu.models import ammonia, diazenylium, gaussian
from nestfit_tpu.models.ammonia import (
    BROT_OLD,
    CROT_OLD,
    partition_func,
    partition_level,
    swift_convert,
    unpack_params,
)
from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS, DIAZENYLIUM_TRANSITIONS
from nestfit_tpu.utils import freq_axis_from_velocity


def make_axis(rest_freq, vmin=-30.0, vmax=30.0, vchan=0.158):
    varr = np.arange(vmin, vmax, vchan)
    return freq_axis_from_velocity(varr, rest_freq)


# ---------------------------------------------------------------------------
# Golden values (pyspeckit-derived, via reference test functions)
# ---------------------------------------------------------------------------

def test_partition_level_golden():
    # Golden values from pyspeckit Zpara/Zortho with the legacy
    # Poynter & Kakar constants (reference ammonia.pyx:496-514).
    zlev1 = oracle.amm_partition_level(1, 10.0, BROT_OLD, CROT_OLD)
    np.testing.assert_almost_equal(zlev1, 0.29279893434489096, decimal=7)
    zlev2 = oracle.amm_partition_level(2, 10.0, BROT_OLD, CROT_OLD)
    np.testing.assert_almost_equal(zlev2, 0.007933862262432792, decimal=7)
    qpara = oracle.amm_partition_func(True, 10.0, BROT_OLD, CROT_OLD)
    np.testing.assert_almost_equal(qpara, 0.30073281405688107, decimal=7)


def test_swift_convert_golden():
    # Reference ammonia.pyx:517-521.
    trot = float(swift_convert(jnp.float64(15.0)))
    np.testing.assert_almost_equal(trot, 14.023487575888257, decimal=8)
    np.testing.assert_almost_equal(
        oracle.swift_convert(15.0), 14.023487575888257, decimal=8
    )


def test_partition_jax_vs_oracle():
    for trot in (5.0, 10.0, 25.0):
        np.testing.assert_allclose(
            float(partition_level(1, jnp.float64(trot))),
            oracle.amm_partition_level(1, trot),
            rtol=1e-12,
        )
        for para in (True, False):
            np.testing.assert_allclose(
                float(partition_func(para, jnp.float64(trot))),
                oracle.amm_partition_func(para, trot),
                rtol=1e-12,
            )


# ---------------------------------------------------------------------------
# Kernel cross-validation against the float64 oracle
# ---------------------------------------------------------------------------

AMM_PARAMS_2C = np.array([
    -1.0, 1.5,    # voff
    10.0, 15.0,   # trot
    4.0, 6.0,     # tex
    14.5, 15.0,   # ntot
    0.3, 0.6,     # sigm
    0.0, 0.0,     # orth
])


@pytest.mark.parametrize("trans_id", [1, 2])
def test_amm_predict_vs_oracle_f64(trans_id):
    xarr = make_axis(AMMONIA_TRANSITIONS[trans_id - 1].nu)
    spec = ammonia.make_ammonia_spectrum(
        xarr, np.zeros_like(xarr), 0.1, trans_id=trans_id, dtype=jnp.float64
    )
    pred = np.asarray(ammonia.amm_predict(spec, AMM_PARAMS_2C.astype(np.float64)))
    truth = oracle.amm_predict(xarr, AMM_PARAMS_2C, trans_id=trans_id)
    # Same tolerance the reference uses vs pyspeckit (plotting.py:1040)
    np.testing.assert_allclose(pred, truth, rtol=1e-8, atol=1e-5)
    assert truth.max() > 0.5  # sanity: a real line is present


@pytest.mark.parametrize("trans_id", [1, 2])
def test_amm_predict_f32_accuracy(trans_id):
    xarr = make_axis(AMMONIA_TRANSITIONS[trans_id - 1].nu)
    spec = ammonia.make_ammonia_spectrum(
        xarr, np.zeros_like(xarr), 0.1, trans_id=trans_id
    )
    pred = np.asarray(
        ammonia.amm_predict(spec, AMM_PARAMS_2C.astype(np.float32))
    )
    truth = oracle.amm_predict(xarr, AMM_PARAMS_2C, trans_id=trans_id)
    # float32 path: errors should be far below typical noise (~0.1 K)
    assert np.max(np.abs(pred - truth)) < 1e-3 * max(1.0, truth.max())


def test_amm_predict_cold_lte():
    xarr = make_axis(AMMONIA_TRANSITIONS[0].nu)
    spec = ammonia.make_ammonia_spectrum(
        xarr, np.zeros_like(xarr), 0.1, trans_id=1, dtype=jnp.float64
    )
    p = AMM_PARAMS_2C.astype(np.float64)
    pred = np.asarray(ammonia.amm_predict(spec, p, cold=True, lte=True))
    truth = oracle.amm_predict(xarr, p, trans_id=1, cold=True, lte=True)
    np.testing.assert_allclose(pred, truth, rtol=1e-8, atol=1e-5)


def test_amm_predict_batched():
    xarr = make_axis(AMMONIA_TRANSITIONS[0].nu)
    spec = ammonia.make_ammonia_spectrum(xarr, np.zeros_like(xarr), 0.1, trans_id=1)
    rng = np.random.default_rng(0)
    batch = np.tile(AMM_PARAMS_2C, (4, 3, 1)).astype(np.float32)
    batch[..., 0] += rng.normal(scale=0.1, size=(4, 3))
    pred = np.asarray(ammonia.amm_predict(spec, batch))
    assert pred.shape == (4, 3, xarr.shape[0])
    for i in range(4):
        for j in range(3):
            truth = oracle.amm_predict(xarr, batch[i, j], trans_id=1)
            assert np.max(np.abs(pred[i, j] - truth)) < 1e-3


@pytest.mark.parametrize("trans_id", [1, 2, 3])
def test_nnhp_predict_vs_oracle(trans_id):
    nu = DIAZENYLIUM_TRANSITIONS[trans_id - 1].nu
    xarr = make_axis(nu, vchan=0.1)
    spec = diazenylium.make_diazenylium_spectrum(
        xarr, np.zeros_like(xarr), 0.1, trans_id=trans_id, dtype=jnp.float64
    )
    params = np.array([-0.5, 1.0, 5.0, 6.0, 0.2, 0.8, 0.25, 0.5])
    pred = np.asarray(diazenylium.nnhp_predict(spec, params))
    truth = oracle.nnhp_predict(xarr, params, trans_id=trans_id)
    np.testing.assert_allclose(pred, truth, rtol=1e-8, atol=1e-5)
    assert truth.max() > 0.1


def test_gauss_predict_vs_oracle():
    rest_freq = 23.6944955e9
    xarr = make_axis(rest_freq)
    spec = gaussian.make_gaussian_spectrum(
        xarr, np.zeros_like(xarr), 0.1, dtype=jnp.float64
    )
    spec_f = gaussian.make_gaussian_spectrum(
        xarr, np.zeros_like(xarr), 0.1, rest_freq=rest_freq, dtype=jnp.float64
    )
    params = np.array([-1.0, 2.0, 0.3, 0.5, 1.0, 3.0])
    pred = np.asarray(gaussian.gauss_predict(spec_f, params))
    truth = oracle.gauss_predict(xarr, params, rest_freq)
    np.testing.assert_allclose(pred, truth, rtol=1e-8, atol=1e-6)
    assert truth.max() > 2.9


def test_loglikelihood_and_null_lnz():
    rest_freq = 23.6944955e9
    xarr = make_axis(rest_freq)
    rng = np.random.default_rng(1)
    data = rng.normal(scale=0.2, size=xarr.shape[0])
    noise = 0.2
    spec = gaussian.make_gaussian_spectrum(
        xarr, data, noise, rest_freq=rest_freq, dtype=jnp.float64
    )
    # null model lnL = -sum(d^2)/(2 sigma^2) (reference core.pyx:518-530)
    expect = -np.sum(data**2) / (2 * noise**2)
    np.testing.assert_allclose(float(spec.null_lnZ), expect, rtol=1e-10)
    pred = np.zeros_like(data)
    np.testing.assert_allclose(
        float(spec.loglikelihood(jnp.asarray(pred))), expect, rtol=1e-10
    )
    # prefactor matches -S/2 log(2 pi sigma^2) (core.pyx:517)
    np.testing.assert_allclose(
        float(spec.prefactor),
        -xarr.shape[0] / 2 * np.log(2 * np.pi * noise**2),
        rtol=1e-10,
    )


def test_unpack_params_stride():
    # parameter-major stride: params[p*ncomp + i] (core.pyx:192-197)
    params = jnp.arange(12.0)
    p = unpack_params(params, 6)
    assert p.shape == (6, 2)
    np.testing.assert_array_equal(np.asarray(p[0]), [0.0, 1.0])   # voff
    np.testing.assert_array_equal(np.asarray(p[4]), [8.0, 9.0])   # sigm


def test_windowed_parity_mode():
    """The optional +-N sigma windowed evaluation (the reference's
    __APPROX index-windowed loops, hyperfine.pyx:76-96,
    model_includes.pxi:20) matches dense evaluation to the documented
    truncation error exp(-12.5) of peak (hyperfine.pyx:79-82)."""
    import jax.numpy as jnp

    from nestfit_tpu.models import hyperfine
    from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS
    from nestfit_tpu.utils import freq_axis_from_velocity

    trans = AMMONIA_TRANSITIONS[0]
    vaxis = np.arange(-30, 30, 0.158)
    xarr = freq_axis_from_velocity(vaxis, trans.nu)
    dnu = jnp.asarray(xarr - trans.nu, dtype=jnp.float64)
    kw = dict(voff=jnp.asarray(0.5), tau_main=jnp.asarray(3.0),
              sigm=jnp.asarray(0.4))
    dense = np.asarray(hyperfine.tau_profile(trans, dnu, **kw))
    windowed = np.asarray(
        hyperfine.tau_profile(trans, dnu, window_sigma=5.0, **kw)
    )
    peak = dense.max()
    diff = np.abs(dense - windowed)
    assert diff.max() > 0  # the mask actually bites somewhere
    # truncation bounded by nhf * exp(-12.5) of the per-line peak
    assert diff.max() < trans.nhf * np.exp(-12.5) * peak
