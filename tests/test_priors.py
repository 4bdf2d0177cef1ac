"""Prior system tests.

Cross-validates the vectorized JAX prior transforms against the scalar
float64 oracle (mirroring reference semantics, core/core.pyx:23-434)
and checks the structural invariants each prior is supposed to
guarantee (ordering, minimum separations, bounds).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nestfit_tpu import oracle
from nestfit_tpu.constants import FWHM
from nestfit_tpu.priors import (
    CenSepPrior,
    ConstantPrior,
    DuplicatePrior,
    OrderedPrior,
    Prior,
    PriorTransformer,
    ResolvedCenSepPrior,
    ResolvedPlacementPrior,
    SpacedPrior,
    cdf_interp,
    cdf_over_interval,
    get_irdc_priors,
    get_synth_priors,
    make_distribution,
    ppf_interp,
)


def gauss_dist(dtype=jnp.float64, size=201):
    x = np.linspace(-4, 4, size)
    y = np.exp(-0.5 * x**2)
    return make_distribution(x, y, dtype=dtype), x, y


def test_distribution_median():
    # reference core.pyx:830-839: symmetric distribution -> median ~ 0
    dist, x, y = gauss_dist()
    assert abs(float(dist.ppf[100])) < 1e-12
    assert abs(float(ppf_interp(dist, 0.5))) < 1e-12
    assert abs(float(cdf_interp(dist, 0.5))) < 1e-12


def test_ppf_cdf_vs_oracle():
    dist, x, y = gauss_dist()
    odist = oracle.OracleDistribution(x, y)
    us = np.linspace(0.01, 0.99, 37)
    got_ppf = np.asarray(ppf_interp(dist, jnp.asarray(us)))
    got_cdf = np.asarray(cdf_interp(dist, jnp.asarray(us)))
    for u, gp, gc in zip(us, got_ppf, got_cdf):
        np.testing.assert_allclose(gp, odist.ppf_interp(u), rtol=1e-10)
        np.testing.assert_allclose(gc, odist.cdf_interp(u), rtol=1e-8, atol=1e-10)


def test_cdf_roundtrip():
    dist, *_ = gauss_dist()
    us = jnp.linspace(0.02, 0.98, 25)
    x = ppf_interp(dist, us)
    # invert through the CDF: should recover u to table resolution
    u2 = np.interp(np.asarray(x), np.asarray(dist.xax), np.asarray(dist.cdf))
    np.testing.assert_allclose(np.asarray(us), u2, atol=5e-3)


def test_cdf_interval_quadrature():
    """Independent check of the tapered interval CDF against direct
    fine-grid quadrature of the *analytic* integrand.

    The oracle's ``cdf_over_interval`` is a transliteration of the
    reference algorithm (see oracle.py module docstring), so agreement
    with it only proves faithful porting.  Here the same quantity --
    F(x) = int_lo^x p(s) (1 - (s-lo)/(hi-lo))^sfact ds, renormalized
    -- is integrated from the analytic Gaussian pdf on a 40x finer
    grid with no shared code, and the implementation must match to
    grid-discretization accuracy."""
    dist, x, y = gauss_dist()
    dx = x[1] - x[0]
    for (lo, hi, sfact) in [(-2.0, 1.0, 0.0), (-1.5, 2.5, 1.0),
                            (-3.0, 3.0, 2.0)]:
        cdf = np.asarray(cdf_over_interval(dist, lo, hi, sfact))
        # fine quadrature, snapped to the implementation's cell
        # convention (taper measured in grid-index space from the
        # cell containing lo to the cell containing hi)
        i_lo = int(np.clip((lo - x[0]) / dx, 0, len(x) - 1))
        i_hi = int(np.clip((hi - x[0]) / dx, 1, len(x)))
        a, b = x[0] + i_lo * dx, x[0] + i_hi * dx
        xs = np.linspace(a, b, 40 * (i_hi - i_lo) + 1)
        ps = np.exp(-0.5 * xs**2) * (1.0 - (xs - a) / (b - a)) ** sfact
        fine = np.concatenate(
            [[0.0], np.cumsum(0.5 * (ps[1:] + ps[:-1]) * np.diff(xs))]
        )
        fine /= fine[-1]
        got = cdf[i_lo:i_hi + 1]
        want = np.interp(x[i_lo:i_hi + 1], xs, fine)
        # trapezoid-on-the-coarse-grid vs fine quadrature: agreement
        # to O(dx) near the taper edge, better in the interior
        assert np.max(np.abs(got - want)) < 0.02, (lo, hi, sfact)


def test_cdf_over_interval_vs_oracle():
    dist, x, y = gauss_dist()
    for (lo, hi, sfact) in [(-2.0, 1.0, 0.0), (-1.5, 2.5, 1.0),
                            (-3.0, 3.0, 2.0), (0.5, 0.52, 1.0)]:
        cdf = np.asarray(cdf_over_interval(dist, lo, hi, sfact))
        odist = oracle.OracleDistribution(x, y)
        odist.cdf_over_interval(lo, hi, sfact)
        np.testing.assert_allclose(cdf, odist.cdf, rtol=1e-8, atol=1e-10)
        # inversion agreement too
        for u in (0.1, 0.5, 0.9):
            got = float(cdf_interp(jnp.asarray(cdf), jnp.asarray(u),
                                   xax=dist.xax, dx=dist.dx))
            np.testing.assert_allclose(got, odist.cdf_interp(u),
                                       rtol=1e-6, atol=1e-8)


def _transform(priors, u, ncomp):
    ut = PriorTransformer(priors)
    return np.asarray(ut.transform(jnp.asarray(u), ncomp))


def test_prior_basic_and_constant():
    dist, *_ = gauss_dist()
    u = np.array([0.5, 0.25, 0.7, 0.7])  # p0 x 2 comps, p1 x 2 comps
    out = _transform([Prior(dist, 0), ConstantPrior(3.5, 1)], u, 2)
    assert abs(out[0]) < 1e-12
    np.testing.assert_allclose(out[2:], 3.5)


def test_duplicate_prior():
    dist, *_ = gauss_dist()
    u = np.random.default_rng(0).uniform(size=3 * 2)
    out = _transform([Prior(dist, 0), DuplicatePrior(dist, 1, 2)], u, 2)
    np.testing.assert_allclose(out[2:4], out[4:6])


def test_ordered_prior_sorted():
    dist, *_ = gauss_dist()
    rng = np.random.default_rng(1)
    u = rng.uniform(size=(64, 3))
    out = np.asarray(
        PriorTransformer([OrderedPrior(dist, 0)]).transform(jnp.asarray(u), 3)
    )
    assert np.all(np.diff(out, axis=-1) >= 0)


def test_spaced_prior_increasing():
    dist, *_ = gauss_dist()
    dep = make_distribution(np.linspace(0.5, 3.0, 200),
                            np.ones(200), dtype=jnp.float64)
    rng = np.random.default_rng(2)
    u = rng.uniform(size=(32, 3))
    out = np.asarray(
        PriorTransformer([SpacedPrior(Prior(dist, 0), Prior(dep, 0))])
        .transform(jnp.asarray(u), 3)
    )
    diffs = np.diff(out, axis=-1)
    assert np.all(diffs >= 0.5 - 1e-9)


def test_censep_prior():
    dist, *_ = gauss_dist()
    sep = make_distribution(np.linspace(0.1, 2.0, 200),
                            np.ones(200), dtype=jnp.float64)
    rng = np.random.default_rng(3)
    u = rng.uniform(size=(16, 2))
    out = np.asarray(
        PriorTransformer([CenSepPrior(Prior(dist, 0), Prior(sep, 0))])
        .transform(jnp.asarray(u), 2)
    )
    seps = out[:, 1] - out[:, 0]
    assert np.all(seps >= 0.1 - 1e-9) and np.all(seps <= 2.0 + 1e-9)


def test_resolved_censep_minimum_separation():
    dist, *_ = gauss_dist()
    sepd = make_distribution(np.linspace(0.0, 2.0, 200),
                             np.ones(200), dtype=jnp.float64)
    sigd = make_distribution(np.linspace(0.2, 1.0, 200),
                             np.ones(200), dtype=jnp.float64)
    scale = 1.5
    prior = ResolvedCenSepPrior(Prior(dist, 0), Prior(sepd, 0),
                                Prior(sigd, 1), scale=scale)
    rng = np.random.default_rng(4)
    u = rng.uniform(size=(128, 2, 2)).reshape(128, 4)
    out = np.asarray(PriorTransformer([prior]).transform(jnp.asarray(u), 2))
    out = out.reshape(128, 2, 2)
    vsep = out[:, 0, 1] - out[:, 0, 0]
    sig = out[:, 1, :]
    min_sep = FWHM * scale * np.sqrt(sig[:, 0] * sig[:, 1])
    assert np.all(vsep >= min_sep - 1e-9)


@pytest.mark.parametrize("ncomp", [1, 2, 3])
def test_resolved_placement_vs_oracle(ncomp):
    x = np.linspace(-4, 4, 200)
    y = np.exp(-0.5 * x**2)
    y = y / y.sum()
    dist = make_distribution(x, y, dtype=jnp.float64)
    scale = 1.5
    sig_val = 0.3
    prior = ResolvedPlacementPrior(
        Prior(dist, 0), ConstantPrior(sig_val, 1), scale=scale
    )
    rng = np.random.default_rng(5)
    for _ in range(5):
        u = rng.uniform(size=2 * ncomp)
        out = np.asarray(
            PriorTransformer([prior]).transform(jnp.asarray(u), ncomp)
        )
        vcen = out[:ncomp]
        # oracle path (scalar mirror of core.pyx:392-434)
        odist = oracle.OracleDistribution(x, y)
        expect = oracle.resolved_placement_interp(
            odist, u[:ncomp], np.full(ncomp, sig_val), FWHM * scale
        )
        np.testing.assert_allclose(vcen, expect, rtol=1e-6, atol=1e-8)
        # invariants
        if ncomp > 1:
            seps = np.diff(vcen)
            min_sep = FWHM * scale * sig_val
            assert np.all(seps >= min_sep * 0.999)


def test_resolved_placement_batched_shapes():
    x = np.linspace(-4, 4, 200)
    y = np.exp(-0.5 * x**2)
    dist = make_distribution(x, y, dtype=jnp.float64)
    sigd = make_distribution(np.linspace(0.1, 0.8, 200),
                             np.ones(200), dtype=jnp.float64)
    prior = ResolvedPlacementPrior(Prior(dist, 0), Prior(sigd, 1), scale=1.2)
    ut = PriorTransformer([prior])
    rng = np.random.default_rng(6)
    u = rng.uniform(size=(7, 5, 4))  # batch (7,5), ncomp=2, n_param=2
    out = np.asarray(ut.transform(jnp.asarray(u), 2))
    assert out.shape == (7, 5, 4)
    vcen = out[..., :2]
    assert np.all(np.diff(vcen, axis=-1) > 0)
    assert np.all(vcen >= -4) and np.all(vcen <= 4)


def test_irdc_priors_shapes_and_ranges():
    ut = get_irdc_priors(vsys=0.0, dtype=jnp.float64)
    assert ut.n_param == 6
    rng = np.random.default_rng(7)
    for ncomp in (1, 2, 3):
        u = rng.uniform(size=(50, 6 * ncomp))
        out = np.asarray(ut.transform(jnp.asarray(u), ncomp))
        t = out.reshape(50, 6, ncomp)
        voff, trot, tex, ntot, sigm, orth = (t[:, i] for i in range(6))
        assert np.all((voff >= -4.0 - 1e-6) & (voff <= 4.0 + 1e-6))
        assert np.all((trot >= 7.0 - 1e-6) & (trot <= 30.0 + 1e-6))
        assert np.all((tex >= 2.8 - 1e-6) & (tex <= 12.06 + 1e-6))
        assert np.all((ntot >= 12.5 - 1e-6) & (ntot <= 16.5 + 1e-6))
        assert np.all((sigm >= 0.067 - 1e-6) & (sigm <= 2.067 + 1e-6))
        assert np.all(orth == 0.0)
        if ncomp > 1:
            assert np.all(np.diff(voff, axis=-1) > 0)


def test_synth_priors_lte_duplicate():
    ut = get_synth_priors(dtype=jnp.float64)
    assert ut.n_param == 6
    rng = np.random.default_rng(8)
    u = rng.uniform(size=(20, 12))
    out = np.asarray(ut.transform(jnp.asarray(u), 2)).reshape(20, 6, 2)
    np.testing.assert_allclose(out[:, 1], out[:, 2])  # tex == tkin
    assert np.all(out[:, 5] == 0.0)


def test_tapered_interval_invert_matches_dense():
    """The O(1)-memory analytic inversion must reproduce the dense
    cdf_over_interval + cdf_interp composition for s = 0, 1, 2."""
    from nestfit_tpu.priors.distributions import tapered_interval_invert

    x = np.linspace(-4, 4, 500)
    y = np.exp(-0.5 * (x / 1.7) ** 2) + 0.1
    dist = make_distribution(x, y, dtype=jnp.float64)
    rng = np.random.default_rng(11)
    B = 64
    for sfact in (0, 1, 2):
        lo = rng.uniform(-4, 3, size=B)
        hi = lo + rng.uniform(0.005, 6, size=B)
        u = rng.uniform(size=B)
        dense_cdf = cdf_over_interval(
            dist, jnp.asarray(lo), jnp.asarray(hi), float(sfact)
        )
        want = np.asarray(
            cdf_interp(dense_cdf, jnp.asarray(u), xax=dist.xax, dx=dist.dx)
        )
        got = np.asarray(tapered_interval_invert(
            dist, jnp.asarray(u), jnp.asarray(lo), jnp.asarray(hi), sfact
        ))
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_tapered_interval_invert_f32_accuracy():
    """f32 tables: the analytic inversion stays within a grid cell of
    the f64 dense reference (self-limiting cancellation)."""
    from nestfit_tpu.priors.distributions import tapered_interval_invert

    x = np.linspace(-4, 4, 500)
    y = np.exp(-0.5 * (x / 1.7) ** 2) + 0.1
    dist64 = make_distribution(x, y, dtype=jnp.float64)
    dist32 = make_distribution(x, y, dtype=jnp.float32)
    dx = float(x[1] - x[0])
    rng = np.random.default_rng(12)
    B = 256
    for sfact in (0, 1, 2):
        lo = rng.uniform(-4, 3, size=B)
        hi = lo + rng.uniform(0.005, 6, size=B)
        u = rng.uniform(size=B)
        want = np.asarray(tapered_interval_invert(
            dist64, jnp.asarray(u), jnp.asarray(lo), jnp.asarray(hi), sfact
        ))
        got = np.asarray(tapered_interval_invert(
            dist32, jnp.asarray(u, dtype=np.float32),
            jnp.asarray(lo, dtype=np.float32),
            jnp.asarray(hi, dtype=np.float32), sfact
        ))
        assert np.max(np.abs(got - want)) < 2.5 * dx, (
            sfact, np.max(np.abs(got - want)), dx
        )
