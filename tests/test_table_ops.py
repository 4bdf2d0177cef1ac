"""Pallas table-kernel parity vs the XLA gather implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from nestfit_tpu.ops import tables as tops
from nestfit_tpu.priors import distributions as dists
from nestfit_tpu.priors.distributions import (
    make_distribution,
    ppf_interp,
    tapered_interval_invert,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(tops, "INTERPRET", True)
    # force the XLA path inside the reference computations
    monkeypatch.setattr(dists, "USE_PALLAS_TABLES", False)
    yield


def _dist32():
    x = np.linspace(-4, 4, 500)
    y = np.exp(-0.5 * (x / 1.7) ** 2) + 0.05
    return make_distribution(x, y, dtype=jnp.float32)


def test_table_lerp_matches_gather():
    dist = _dist32()
    rng = np.random.default_rng(3)
    u = rng.uniform(size=517).astype(np.float32)   # non-multiple of 128
    want = np.asarray(ppf_interp(dist, jnp.asarray(u)))
    got = np.asarray(
        tops.table_lerp(dist.ppf, jnp.asarray(u) * (dist.size - 1))
    )
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_table_lerp_endpoints():
    dist = _dist32()
    got = np.asarray(tops.table_lerp(
        dist.ppf, jnp.asarray([0.0, dist.size - 1.0], dtype=jnp.float32)
    ))
    np.testing.assert_allclose(
        got, [float(dist.ppf[0]), float(dist.ppf[-1])], rtol=1e-6
    )


@pytest.mark.parametrize("sfact", [0, 1, 2])
def test_tapered_invert_matches_xla(sfact):
    dist = _dist32()
    rng = np.random.default_rng(7)
    B = 300
    lo = rng.uniform(-4, 3, size=B).astype(np.float32)
    hi = (lo + rng.uniform(0.005, 6, size=B)).astype(np.float32)
    u = rng.uniform(size=B).astype(np.float32)
    want = np.asarray(tapered_interval_invert(
        dist, jnp.asarray(u), jnp.asarray(lo), jnp.asarray(hi), sfact
    ))
    got = np.asarray(tops.tapered_invert(
        dist.t0, dist.t1c, dist.t2c, dist.xax,
        jnp.asarray(u), jnp.asarray(lo), jnp.asarray(hi),
        sfact, dist.size, dist.xmin, dist.dx, dist.center,
    ))
    # identical algebra modulo f32 reduction order; within a grid cell
    dx = dist.dx
    assert np.max(np.abs(got - want)) < 0.51 * dx, np.max(np.abs(got - want))
    np.testing.assert_allclose(got, want, atol=0.51 * dx)
