"""Fused Pallas kernel parity vs the pure-jnp reference path.

Runs the kernels in Pallas interpreter mode on CPU; on TPU the same
code compiles to a single VMEM-resident kernel.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nestfit_tpu.models import ammonia, diazenylium, gaussian
from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS, DIAZENYLIUM_TRANSITIONS
from nestfit_tpu.ops import fused
from nestfit_tpu.utils import freq_axis_from_velocity


@pytest.fixture(autouse=True)
def interpret_mode():
    fused.INTERPRET = True
    yield
    fused.INTERPRET = False


def _amm_spec(R, trans_id=1, seed=0, n_chan=380):
    nu = AMMONIA_TRANSITIONS[trans_id - 1].nu
    xarr = freq_axis_from_velocity(np.linspace(-30, 30, n_chan), nu)
    rng = np.random.default_rng(seed)
    data = rng.normal(scale=0.2, size=(R, n_chan))
    return ammonia.make_ammonia_spectrum(xarr, data, 0.2, trans_id=trans_id)


@pytest.mark.parametrize("ncomp", [1, 2])
def test_hf_chi2_fused_matches_jnp(ncomp):
    R, T = 4, 3
    spec = _amm_spec(R)
    rng = np.random.default_rng(1)
    base = np.array([0.0, 12.0, 5.0, 14.5, 0.4, 0.1] * 1)
    params = np.tile(
        np.repeat(base, ncomp), (T, R, 1)
    ).astype(np.float32)
    params += rng.normal(scale=0.02, size=params.shape).astype(np.float32)
    flat = jnp.asarray(params.reshape(-1, 6 * ncomp))

    chi2 = np.asarray(ammonia.fused_chi2(spec, flat))
    # reference path
    pred = ammonia.amm_predict(spec, flat.reshape(T, R, -1))
    dev = spec.data[None] - pred
    expect = np.asarray(jnp.sum(dev * dev, axis=-1)).reshape(-1)
    np.testing.assert_allclose(chi2, expect, rtol=2e-4, atol=1e-3)


def test_hf_chi2_fused_diazenylium():
    nu = DIAZENYLIUM_TRANSITIONS[0].nu
    xarr = freq_axis_from_velocity(np.linspace(-20, 20, 300), nu)
    rng = np.random.default_rng(2)
    data = rng.normal(scale=0.1, size=(2, 300))
    spec = diazenylium.make_diazenylium_spectrum(xarr, data, 0.1, trans_id=1)
    params = jnp.asarray(
        rng.uniform(0.2, 0.8, size=(4, 4)).astype(np.float32)
        * np.array([1.0, 8.0, 1.0, 1.0], dtype=np.float32)
        + np.array([0.0, 3.0, -0.5, 0.1], dtype=np.float32)
    )
    chi2 = np.asarray(diazenylium.fused_chi2(spec, params))
    pred = diazenylium.nnhp_predict(spec, params.reshape(2, 2, 4))
    dev = spec.data[None] - pred
    expect = np.asarray(jnp.sum(dev * dev, axis=-1)).reshape(-1)
    np.testing.assert_allclose(chi2, expect, rtol=2e-4, atol=1e-3)


def test_gauss_chi2_fused_matches_jnp():
    rest = 23.6944955e9
    xarr = freq_axis_from_velocity(np.linspace(-12, 12, 200), rest)
    rng = np.random.default_rng(3)
    data = rng.normal(scale=0.1, size=(3, 200))
    spec = gaussian.make_gaussian_spectrum(
        xarr, data, 0.1, rest_freq=rest
    )
    params = jnp.asarray(np.column_stack([
        rng.uniform(-2, 2, 6), rng.uniform(0.2, 1.0, 6),
        rng.uniform(0.5, 3.0, 6),
    ]).astype(np.float32))
    chi2 = np.asarray(gaussian.fused_chi2(spec, params))
    pred = gaussian.gauss_predict(spec, params.reshape(2, 3, 3))
    dev = spec.data[None] - pred
    expect = np.asarray(jnp.sum(dev * dev, axis=-1)).reshape(-1)
    np.testing.assert_allclose(chi2, expect, rtol=2e-4, atol=1e-3)


def test_runner_fused_flag_matches():
    from nestfit_tpu.models import AmmoniaRunner
    from nestfit_tpu.priors import get_irdc_priors

    R = 4
    spec = _amm_spec(R)
    utrans = get_irdc_priors(vsys=0.0)
    r = AmmoniaRunner((spec,), utrans, ncomp=1)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.uniform(0.2, 0.8, size=(2, R, 6)).astype(np.float32))
    r.use_fused = False
    lnl_ref = np.asarray(r.loglike_unit(u))
    r.use_fused = True
    lnl_fused = np.asarray(r.loglike_unit(u))
    np.testing.assert_allclose(lnl_fused, lnl_ref, rtol=2e-4, atol=5e-2)
