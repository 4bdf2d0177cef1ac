#!/usr/bin/env python3
"""Regime-economics probes behind docs/performance.md (round 3).

Two measurements that justify the sampler's one-way, batch-global
candidate->slice regime switch:

``revival``  (VERDICT r2 item 5): force the auto path to never switch
    (``cand_min_acc=1e-9``) on bench-cube pixels with
    ``NESTFIT_NS_DEBUG=1`` and watch the candidate-union acceptance
    EMA over the whole run.  Measured: collapse to ~0.7-1% by
    iteration ~100, monotonic decline to ~0.05% late -- never
    re-approaching the ~5-9% slice break-even -- at 67.5k evals/px vs
    the default path's ~35.5k.  Late-run candidate revival would
    never fire; rejected.

``hetero``  (VERDICT r2 item 6): per-run eval counts on the
    heterogeneous fixture cutouts (tests/data, max-SNR 0.9-9.9) under
    the default batch-global switch vs forced-candidate.  Measured:
    0/256 runs prefer the candidate regime (summed positive savings
    0.0% of total), so per-run regime splitting has nothing to
    recover; rejected.

Usage: python validation/regime_probes.py {revival,hetero}
(Needs the TPU/accelerator JAX backend for representative walls; the
eval counts and acceptance trajectory are backend-independent.)
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench_runner(ncomp, n_px, jnp):
    from nestfit_tpu.models import AmmoniaRunner, ammonia
    from nestfit_tpu.priors import get_irdc_priors
    from nestfit_tpu.synth import make_synth_cube_arrays

    noise = 0.15
    (xa11, d11), (xa22, d22), _ = make_synth_cube_arrays(
        n_pix=1024, noise=noise, rng=np.random.default_rng(5))
    spectra = []
    for xarr, d, tid in ((xa11, d11[:n_px], 1), (xa22, d22[:n_px], 2)):
        spec = ammonia.make_ammonia_spectrum(xarr, d, noise, trans_id=tid)
        spec = dataclasses.replace(
            spec, noise=jnp.full((n_px,), noise, dtype=jnp.float32))
        spectra.append(spec)
    return AmmoniaRunner(tuple(spectra), get_irdc_priors(vsys=0.0),
                         ncomp=ncomp)


def revival():
    os.environ["NESTFIT_NS_DEBUG"] = "1"
    import jax
    import jax.numpy as jnp
    from jax import random

    from nestfit_tpu.sampling import NSConfig
    from nestfit_tpu.sampling.fit import fit_batch

    R = 128
    runner = _bench_runner(2, R, jnp)
    for mode, cfg in (
        ("forced_cand", NSConfig(nlive=100, tol=1.0, cand_min_acc=1e-9)),
        ("default", NSConfig(nlive=100, tol=1.0)),
    ):
        t0 = time.time()
        r = fit_batch(random.key(5), runner, R, cfg, segment_iters=64)
        jax.block_until_ready(r.lnz)
        nc = np.asarray(r.ns.ncall, dtype=np.int64)
        print(f"RESULT mode={mode} wall={time.time()-t0:.1f}s "
              f"ncall_mean={nc.mean():.0f} "
              f"lnz_mean={np.asarray(r.lnz).mean():.2f}", flush=True)


def hetero():
    import jax
    import jax.numpy as jnp
    from jax import random

    from nestfit_tpu import CubeStack, DataCube, NoiseMap
    from nestfit_tpu.cube.fits_io import read_fits
    from nestfit_tpu.models import AmmoniaRunner, ammonia
    from nestfit_tpu.priors import get_irdc_priors
    from nestfit_tpu.sampling import NSConfig
    from nestfit_tpu.sampling.fit import fit_batch

    d_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data")
    pb, _ = read_fits(os.path.join(d_dir, "pb_cutout.fits"))
    nmap = NoiseMap.from_pbimg(0.35, pb)
    stack = CubeStack([
        DataCube.from_fits(os.path.join(d_dir, "nh3_11_cutout.fits"),
                           noise_map=nmap, trans_id=1),
        DataCube.from_fits(os.path.join(d_dir, "nh3_22_cutout.fits"),
                           noise_map=nmap, trans_id=2),
    ])
    datas, noises, nan_mask, max_snr = stack.get_flat_batch()
    valid = np.nonzero(~nan_mask)[0]
    R = 256
    ix = valid[:R] if valid.size >= R else np.concatenate(
        [valid, np.full(R - valid.size, valid[0])])
    active = np.arange(R) < min(valid.size, R)
    print(f"valid={valid.size} R={R} snr "
          f"{np.nanmin(max_snr[valid]):.1f}..{np.nanmax(max_snr[valid]):.1f}")

    spectra = []
    for d, nn, tid in ((datas[0], noises[0], 1), (datas[1], noises[1], 2)):
        db = jnp.asarray(d[ix], dtype=jnp.float32)
        nb = jnp.asarray(np.maximum(nn[ix], 1e-30), dtype=jnp.float32)
        spec = ammonia.make_ammonia_spectrum(
            np.asarray(stack.cubes[tid - 1].xarr), np.asarray(db),
            float(nb[0]), trans_id=tid)
        spectra.append(dataclasses.replace(spec, noise=nb))
    runner = AmmoniaRunner(tuple(spectra), get_irdc_priors(vsys=0.0),
                           ncomp=2)

    res = {}
    for mode, cfg in (
        ("default", NSConfig(nlive=100, tol=1.0)),
        ("forced_cand", NSConfig(nlive=100, tol=1.0, cand_min_acc=1e-9)),
    ):
        t0 = time.time()
        r = fit_batch(random.key(11), runner, R, cfg, segment_iters=64,
                      active=active)
        jax.block_until_ready(r.lnz)
        nc = np.asarray(r.ns.ncall, dtype=np.int64)[active]
        res[mode] = (nc, np.asarray(r.lnz)[active])
        print(f"{mode}: wall={time.time()-t0:.1f}s "
              f"ncall_mean={nc.mean():.0f}", flush=True)
    nc_a, lnz_a = res["default"]
    nc_c, lnz_c = res["forced_cand"]
    sav = nc_a - nc_c
    print(f"frac preferring cand (>10% fewer evals): "
          f"{float((sav > 0.1 * nc_a).mean()):.3f}")
    print(f"max split win: {np.maximum(sav, 0).sum()} evals "
          f"({np.maximum(sav, 0).sum() / nc_a.sum() * 100:.1f}% of default)")
    print(f"lnz agreement: median {np.median(lnz_a - lnz_c):+.2f} "
          f"max|.| {np.abs(lnz_a - lnz_c).max():.2f}")


if __name__ == "__main__":
    {"revival": revival, "hetero": hetero}[sys.argv[1]]()
