"""End-to-end fit tests on synthetic spectra with known truth.

Mirrors the reference's smoke/recovery strategy: ``test_nested``
(reference main.py:1279-1294) and parameter-recovery tolerance checks.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

from nestfit_tpu import oracle
from nestfit_tpu.models import GaussianRunner, AmmoniaRunner, gaussian
from nestfit_tpu.priors import get_gaussian_priors, get_irdc_priors
from nestfit_tpu.sampling import NSConfig
from nestfit_tpu.sampling.fit import fit_batch, fit_single
from nestfit_tpu.synth import get_test_spectra
from nestfit_tpu.utils import freq_axis_from_velocity

REST = 23.6944955e9


def make_gauss_spec(params, noise=0.1, seed=0, vchan=0.158):
    vaxis = np.arange(-12, 12, vchan)
    xarr = freq_axis_from_velocity(vaxis, REST)
    truth = oracle.gauss_predict(xarr, params, REST)
    rng = np.random.default_rng(seed)
    data = truth + rng.normal(scale=noise, size=xarr.shape[0])
    return gaussian.make_gaussian_spectrum(
        xarr, data, noise, rest_freq=REST
    ), xarr, truth


def test_fit_single_gaussian_recovery():
    params = np.array([0.5, 0.45, 2.5])  # voff, sigm, peak
    spec, xarr, truth = make_gauss_spec(params, noise=0.1, seed=1)
    utrans = get_gaussian_priors(vsys=0.0)
    runner = GaussianRunner(spec, utrans, ncomp=1)
    res = fit_single(random.key(0), runner,
                     NSConfig(nlive=200, tol=0.5))
    assert bool(res.ns.converged[0])
    best = np.asarray(res.products.bestfit_params[0])
    # recovered parameters near truth (tolerances ~ few noise sigma)
    assert abs(best[0] - params[0]) < 0.15
    assert abs(best[1] - params[1]) < 0.15
    assert abs(best[2] - params[2]) < 0.3
    # evidence strongly favors signal over null
    assert float(res.lnz[0]) - float(res.null_lnz[0]) > 50.0


@pytest.mark.slow
def test_fit_batch_model_selection_gaussian():
    """1-comp data: lnZ(2) - lnZ(1) must be below the threshold;
    2-comp data: above (the Bayes-factor ladder gate,
    reference main.py:448-472)."""
    utrans = get_gaussian_priors(vsys=0.0)
    p1 = np.array([0.0, 0.5, 3.0])
    p2 = np.array([-1.5, 1.5, 0.4, 0.4, 2.0, 2.0])
    spec1, *_ = make_gauss_spec(p1, noise=0.15, seed=2)
    spec2, *_ = make_gauss_spec(p2, noise=0.15, seed=3)

    data = jnp.stack([spec1.data, spec2.data])     # [2, S]
    noise = jnp.stack([spec1.noise, spec2.noise])
    import dataclasses as dc
    spec_b = dc.replace(spec1, data=data, noise=noise)

    lnz = {}
    for ncomp in (1, 2):
        runner = GaussianRunner(spec_b, utrans, ncomp=ncomp)
        res = fit_batch(random.key(10 + ncomp), runner, 2,
                        NSConfig(nlive=150, tol=1.0))
        lnz[ncomp] = np.asarray(res.lnz)
        if ncomp == 1:
            null = np.asarray(res.null_lnz)
    # pixel 0 (1-comp truth): adding a second comp gains < 11
    assert lnz[2][0] - lnz[1][0] < 11.0
    # pixel 1 (2-comp truth): second comp gains > 11
    assert lnz[2][1] - lnz[1][1] > 11.0
    # both pixels: signal vs null is decisive
    assert np.all(lnz[1] - null > 11.0)


@pytest.mark.slow
def test_three_component_ladder_recovery():
    """ncomp=3 fits work end to end with the placement priors (D=9):
    the ladder prefers 3 over 2 on 3-component truth and recovers the
    ordered centroids (reference fits ncomp up to 4 in
    experiments/varnoise.py:23-43; ResolvedPlacementPrior supports
    n <= 10, core.pyx:369-434)."""
    utrans = get_gaussian_priors(vsys=0.0, voff_span=16.0)
    # well-separated 3-comp truth, high SNR so the ladder is decisive
    params = np.array([-4.0, 0.5, 4.5, 0.7, 0.5, 0.9, 2.2, 1.6, 2.8])
    spec, *_ = make_gauss_spec(params, noise=0.15, seed=4)
    import dataclasses as dc
    R = 4
    spec_b = dc.replace(
        spec,
        data=jnp.broadcast_to(spec.data, (R,) + spec.data.shape),
        noise=jnp.broadcast_to(spec.noise, (R,) + spec.noise.shape),
    )
    lnz = {}
    for ncomp in (2, 3):
        runner = GaussianRunner(spec_b, utrans, ncomp=ncomp)
        res = fit_batch(random.key(20 + ncomp), runner, R,
                        NSConfig(nlive=100, tol=1.0), segment_iters=250)
        lnz[ncomp] = np.asarray(res.lnz)
        if ncomp == 3:
            bf = np.asarray(res.products.bestfit_params)
            voff = np.sort(bf[:, :3], axis=1)
            assert np.all(np.abs(
                np.median(voff, axis=0) - [-4.0, 0.5, 4.5]
            ) < 0.3), voff
    assert np.all(lnz[3] - lnz[2] > 11.0), (lnz[3], lnz[2])


@pytest.mark.slow
def test_fit_single_ammonia_recovery():
    """2-transition 1-comp ammonia fit recovers truth parameters
    (the reference's canonical seeded test, main.py:1279-1294, with
    1-comp truth for speed)."""
    from nestfit_tpu.synth import SyntheticSpectrum
    from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS

    vaxis = np.arange(-30, 30, 0.158)
    params = np.array([-1.0, 12.0, 6.0, 14.8, 0.35, 0.0])
    syn = [
        SyntheticSpectrum(
            freq_axis_from_velocity(vaxis, AMMONIA_TRANSITIONS[i].nu),
            params, noise=0.1, trans_id=i + 1, set_seed=True,
        )
        for i in range(2)
    ]
    spectra = [s.to_ammspec() for s in syn]
    utrans = get_irdc_priors(vsys=0)
    runner = AmmoniaRunner(spectra, utrans, ncomp=1)
    res = fit_single(random.key(7), runner, NSConfig(nlive=200, tol=0.5))
    assert bool(res.ns.converged[0])
    best = np.asarray(res.products.bestfit_params[0])
    voff, trot, tex, ntot, sigm, orth = best
    assert abs(voff - params[0]) < 0.1
    assert abs(trot - params[1]) < 3.0
    assert abs(tex - params[2]) < 1.0
    assert abs(ntot - params[3]) < 0.4
    assert abs(sigm - params[4]) < 0.1
    assert float(res.lnz[0]) - float(res.null_lnz[0]) > 100.0
    # information criteria ordering sanity
    assert float(res.ics["BIC"][0]) < float(res.ics["null_BIC"][0])


def test_diazenylium_fit_recovery():
    """End-to-end N2H+ fit: multi-transition runner -> nested sampling
    -> parameter recovery (DiazenyliumRunner analogue of the reference
    diazenylium.pyx:161-230)."""
    from nestfit_tpu import oracle
    from nestfit_tpu.models import DiazenyliumRunner, diazenylium
    from nestfit_tpu.models.tables import DIAZENYLIUM_TRANSITIONS
    from nestfit_tpu.priors import get_diazenylium_priors
    from nestfit_tpu.utils import freq_axis_from_velocity

    rng = np.random.default_rng(12)
    noise = 0.1
    params = np.array([0.4, 6.0, 0.8, 0.35])  # voff, tex, ltau, sigm
    vaxis = np.arange(-12, 12, 0.1)
    spectra = []
    for tid in (1,):
        nu = DIAZENYLIUM_TRANSITIONS[tid - 1].nu
        xarr = freq_axis_from_velocity(vaxis, nu)
        truth = oracle.nnhp_predict(xarr, params, trans_id=tid)
        data = truth + rng.normal(scale=noise, size=xarr.shape)
        spectra.append(
            diazenylium.make_diazenylium_spectrum(xarr, data, noise,
                                                  trans_id=tid)
        )
    utrans = get_diazenylium_priors(vsys=0.0)
    runner = DiazenyliumRunner(tuple(spectra), utrans, ncomp=1)
    fit = fit_batch(random.key(3), runner, 1,
                    NSConfig(nlive=100, tol=0.5), n_post=256)
    assert bool(np.asarray(fit.ns.converged)[0])
    assert float(fit.lnz[0]) > float(fit.null_lnz[0]) + 11
    best = np.asarray(fit.products.bestfit_params)[0]
    assert abs(best[0] - params[0]) < 0.2       # voff
    assert abs(best[3] - params[3]) < 0.2       # sigm


def test_resolve_n_post():
    """Auto n_post scales with nlive (VERDICT r3 item 8: fixed 512
    left ~0.7 expected samples beyond the stored 3-sigma quantiles)."""
    from nestfit_tpu.sampling.results import resolve_n_post

    assert resolve_n_post(64, 100) == 64      # explicit wins
    assert resolve_n_post(0, 100) == 2048     # cube-fit default
    assert resolve_n_post(0, 400) == 4096     # single-fit default, capped
    assert resolve_n_post(0, 8) == 512        # floor


def test_merge_fit_rows():
    """merge_fit_rows swaps whole per-run records (lnZ, posteriors,
    products) between two FitResults of different batch widths."""
    from nestfit_tpu.sampling.fit import merge_fit_rows

    utrans = get_gaussian_priors(vsys=0.0)
    p1 = np.array([0.0, 0.5, 3.0])
    spec1, *_ = make_gauss_spec(p1, noise=0.3, seed=4)
    import dataclasses as dc
    data4 = jnp.stack([spec1.data] * 4)
    noise4 = jnp.stack([spec1.noise] * 4)
    spec_b = dc.replace(spec1, data=data4, noise=noise4)
    runner = GaussianRunner(spec_b, utrans, ncomp=1)
    fit_a = fit_batch(random.key(0), runner, 4,
                      NSConfig(nlive=50, tol=1.0), n_post=32)

    data2 = jnp.stack([spec1.data] * 2)
    noise2 = jnp.stack([spec1.noise] * 2)
    spec_c = dc.replace(spec1, data=data2, noise=noise2)
    runner2 = GaussianRunner(spec_c, utrans, ncomp=1)
    fit_b = fit_batch(random.key(1), runner2, 2,
                      NSConfig(nlive=50, tol=1.0), n_post=32)

    merged = merge_fit_rows(fit_a, fit_b, dst_rows=[2], src_rows=[1],
                            n_rows_a=4, n_rows_b=2)
    # row 2 now carries fit_b's run 1, the others are untouched
    assert np.isclose(float(merged.lnz[2]), float(fit_b.lnz[1]))
    for i in (0, 1, 3):
        assert np.isclose(float(merged.lnz[i]), float(fit_a.lnz[i]))
    np.testing.assert_allclose(
        np.asarray(merged.products.bestfit_params[2]),
        np.asarray(fit_b.products.bestfit_params[1]),
    )
    np.testing.assert_allclose(
        np.asarray(merged.products.bestfit_params[0]),
        np.asarray(fit_a.products.bestfit_params[0]),
    )
    assert int(merged.ns.ncall[2]) == int(fit_b.ns.ncall[1])


@pytest.mark.slow
def test_aot_precompile_matches_jit():
    """The AOT precompiler (sampling/aot.py) must produce bit-identical
    results through the installed executables, report a complete plan,
    and fall back to the jit path -- not crash -- on a signature
    mismatch."""
    import dataclasses as dc
    import warnings

    import jax

    from nestfit_tpu.sampling import aot
    from nestfit_tpu.sampling import fit as fit_mod
    from nestfit_tpu.sampling import sampler as sampler_mod

    utrans = get_gaussian_priors(vsys=0.0)
    p1 = np.array([0.0, 0.5, 3.0])
    spec, *_ = make_gauss_spec(p1, noise=0.15, seed=6)
    R = 8
    spec_b = dc.replace(
        spec,
        data=jnp.broadcast_to(spec.data, (R,) + spec.data.shape),
        noise=jnp.broadcast_to(spec.noise, (R,) + spec.noise.shape),
    )
    runner = GaussianRunner(spec_b, utrans, ncomp=1)
    cfg = NSConfig(nlive=32, tol=1.0, min_compact=2)

    ref = fit_batch(random.key(7), runner, R, cfg, segment_iters=64)
    lnz_ref = np.asarray(ref.lnz)

    # fresh caches so the AOT install paths are actually exercised
    sampler_mod._JIT_CACHE.clear()
    sampler_mod._AOT_CACHE.clear()
    fit_mod._LOGLIKE_CACHE.clear()
    fit_mod._FINALIZE_CACHE.clear()
    fit_mod._FINALIZE_AOT.clear()

    plan = aot.build_plan(runner, R, cfg, n_post=512)
    names = {t.name for t in plan}
    assert f"n1:init@{R}" in names and f"n1:fin@{R}" in names
    assert f"n1:finalize@{R}" in names
    rep = aot.compile_plan(plan, max_workers=4)
    assert rep["n_errors"] == 0, rep
    assert rep["n_programs"] == len(plan)
    assert sampler_mod._AOT_CACHE, "no AOT executables installed"

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a fallback warning -> failure
        res = fit_batch(random.key(7), runner, R, cfg,
                        segment_iters=64)
        jax.block_until_ready(res.lnz)
    assert np.allclose(np.asarray(res.lnz), lnz_ref, atol=0.0), (
        np.asarray(res.lnz), lnz_ref
    )

    # the installed programs are dispatched through _AotDispatch (the
    # run above promoted the raw (name, compiled) entries)
    assert any(isinstance(v, sampler_mod._AotDispatch)
               for v in sampler_mod._AOT_CACHE.values())

    # mismatch fallback: a dispatch called with the wrong signature
    # must warn and hand off to its jit fallback, not crash
    disp = next(v for v in sampler_mod._AOT_CACHE.values()
                if isinstance(v, sampler_mod._AotDispatch)
                and ":init@" in v.name)
    calls = []
    disp_bad = sampler_mod._AotDispatch(
        disp.name, disp.compiled, lambda *a: calls.append(a) or "fb"
    )
    with pytest.warns(UserWarning, match="signature mismatch"):
        out = disp_bad(jnp.zeros((3, 3)))   # wrong arity/avals
    assert out == "fb" and disp_bad.failed and len(calls) == 1


def test_align_fit_meta_cross_nlive_merge():
    """Boundary refinement merges a higher-nlive batch's rows into the
    base batch: align_fit_meta must reconcile the NSResult pytree
    metadata so merge_fit_rows can tree_map the two, and the merged
    rows must carry the refined scalars."""
    import dataclasses as dc

    from nestfit_tpu.sampling.fit import align_fit_meta, merge_fit_rows

    utrans = get_gaussian_priors(vsys=0.0)
    p1 = np.array([0.0, 0.5, 3.0])
    spec, *_ = make_gauss_spec(p1, noise=0.3, seed=6)
    R = 4

    def batched(nlive):
        spec_b = dc.replace(
            spec,
            data=jnp.broadcast_to(spec.data, (R,) + spec.data.shape),
            noise=jnp.broadcast_to(spec.noise, (R,) + spec.noise.shape),
        )
        runner = GaussianRunner(spec_b, utrans, ncomp=1)
        cfg = NSConfig(nlive=nlive, tol=1.0,
                       max_iter=NSConfig(nlive=32).resolved(3).max_iter)
        return fit_batch(random.key(3), runner, R, cfg, n_post=64)

    fit_a = batched(32)
    fit_b = batched(64)
    merged = merge_fit_rows(
        fit_a, align_fit_meta(fit_b, fit_a), np.array([1, 2]),
        np.array([0, 1]), R, R,
    )
    lnz_a, lnz_b = np.asarray(fit_a.lnz), np.asarray(fit_b.lnz)
    lnz_m = np.asarray(merged.lnz)
    assert lnz_m[0] == lnz_a[0] and lnz_m[3] == lnz_a[3]
    assert lnz_m[1] == lnz_b[0] and lnz_m[2] == lnz_b[1]
    # refined rows' products replaced too
    bf_m = np.asarray(merged.products.bestfit_params)
    assert np.allclose(bf_m[1], np.asarray(fit_b.products.bestfit_params)[0])
    # metadata stays the base batch's
    assert merged.ns.nlive == fit_a.ns.nlive
