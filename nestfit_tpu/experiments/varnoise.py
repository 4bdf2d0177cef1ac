"""Evidence-vs-SNR model-selection study.

Rebuild of the reference's statistical validation experiment
(reference: experiments/varnoise.py:23-209): synthetic 2-component
ammonia spectra across a log-spaced SNR ladder, fit with
ncomp = 1..ncomp_max, comparing lnZ/BIC/AICc model selection.  The
reference loops pixels sequentially through MultiNest; here the entire
(spectrum x noise-level) grid is one batched fit per rung.
"""

import dataclasses

import numpy as np

import jax.numpy as jnp
from jax import random

from nestfit_tpu import oracle
from nestfit_tpu.models import AmmoniaRunner, ammonia
from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS
from nestfit_tpu.sampling import NSConfig
from nestfit_tpu.sampling.fit import fit_batch
from nestfit_tpu.utils import freq_axis_from_velocity, get_logger

log = get_logger("nestfit_tpu.varnoise")


def run_varnoise_sweep(
    utrans,
    params=None,
    snr_levels=None,
    n_per_level=16,
    ncomp_max=2,
    nlive=100,
    tol=1.0,
    lnz_thresh=11.0,
    seed=5,
    vchan=0.158,
    segment_iters=0,
):
    """Fit synthetic 2-component spectra over an SNR ladder.

    Returns a dict of arrays keyed by metric, each of shape
    [n_levels, n_per_level] or [n_levels, n_per_level, ncomp_max(+1)].
    """
    if params is None:
        # canonical 2-comp truth (reference synth_spectra.py:251-258)
        params = np.array([
            -1.0, 1.5, 10.0, 15.0, 4.0, 6.0, 14.5, 15.0,
            0.3, 0.6, 0.0, 0.0,
        ])
    if snr_levels is None:
        snr_levels = np.geomspace(1.0, 100.0, 7)
    rng = np.random.default_rng(seed)

    vax = np.arange(-30, 30, vchan)
    xarrs = [
        freq_axis_from_velocity(vax, AMMONIA_TRANSITIONS[i].nu)
        for i in range(2)
    ]
    truths = [
        oracle.amm_predict(x, params, trans_id=i + 1)
        for i, x in enumerate(xarrs)
    ]
    peak = max(t.max() for t in truths)

    n_lev = len(snr_levels)
    R = n_lev * n_per_level
    noises = np.repeat(peak / np.asarray(snr_levels), n_per_level)  # [R]
    datas = []
    for x, t in zip(xarrs, truths):
        d = t[None, :] + rng.normal(
            scale=noises[:, None], size=(R, x.shape[0])
        )
        datas.append(d)

    out = {
        "snr": np.asarray(snr_levels),
        "noise": noises.reshape(n_lev, n_per_level),
        "lnz": np.full((n_lev, n_per_level, ncomp_max + 1), np.nan),
        "lnz_err": np.full((n_lev, n_per_level, ncomp_max + 1), np.nan),
        "bic": np.full((n_lev, n_per_level, ncomp_max + 1), np.nan),
        "aicc": np.full((n_lev, n_per_level, ncomp_max + 1), np.nan),
    }
    key = random.key(seed)
    for ncomp in range(1, ncomp_max + 1):
        spectra = []
        for i, (x, d) in enumerate(zip(xarrs, datas)):
            spec = ammonia.make_ammonia_spectrum(
                x, d, 0.1, trans_id=i + 1
            )
            spec = dataclasses.replace(
                spec, noise=jnp.asarray(noises, dtype=jnp.float32)
            )
            spectra.append(spec)
        runner = AmmoniaRunner(tuple(spectra), utrans, ncomp=ncomp)
        key, sub = random.split(key)
        cfg = NSConfig(nlive=nlive, tol=tol)
        log.info("varnoise: fitting ncomp=%d over %d spectra", ncomp, R)
        fit = fit_batch(sub, runner, R, cfg, n_post=256,
                        segment_iters=segment_iters)
        if ncomp == 1:
            out["lnz"][..., 0] = np.asarray(fit.null_lnz).reshape(
                n_lev, n_per_level
            )
            out["bic"][..., 0] = np.asarray(
                fit.ics["null_BIC"]
            ).reshape(n_lev, n_per_level)
            out["aicc"][..., 0] = np.asarray(
                fit.ics["null_AICc"]
            ).reshape(n_lev, n_per_level)
        out["lnz"][..., ncomp] = np.asarray(fit.lnz).reshape(
            n_lev, n_per_level
        )
        out["lnz_err"][..., ncomp] = np.asarray(fit.lnz_err).reshape(
            n_lev, n_per_level
        )
        out["bic"][..., ncomp] = np.asarray(fit.ics["BIC"]).reshape(
            n_lev, n_per_level
        )
        out["aicc"][..., ncomp] = np.asarray(fit.ics["AICc"]).reshape(
            n_lev, n_per_level
        )

    # model selection per criterion (reference varnoise.py:77-209)
    lnz = out["lnz"]
    nbest = np.zeros(lnz.shape[:2], dtype=int)
    for m in range(1, ncomp_max + 1):
        step = lnz[..., m] - lnz[..., m - 1]
        nbest[(nbest == m - 1) & (step > lnz_thresh)] = m
    out["nbest_lnz"] = nbest
    out["nbest_bic"] = np.nanargmin(out["bic"], axis=-1)
    out["nbest_aicc"] = np.nanargmin(out["aicc"], axis=-1)
    return out
