#!/usr/bin/env python3
"""Headline benchmark: spectra fit/sec/chip on a synthetic NH3 cube.

Measures the full production path on one chip: batched 2-transition
ammonia nested-sampling fits with the Bayes-factor N-component ladder
(ncomp = 1 then 2), using the reference's cube-fit sampler defaults
nlive=100, tol=1.0 (reference: main.py:381-386) and the IRDC priors
(prior_constructors.py:20-76).  One "fit" = one pixel through the full
1->2 component ladder including posterior products.

Baseline: the reference publishes no timing tables (BASELINE.md).  The
reference's own numbers imply ~5e3 likelihood evaluations per 1-comp
fit at a few us each plus MultiNest overhead; a 2-model ladder pixel
costs ~1 s on one CPU core in practice (docs/overview.rst:7-11, 28-29).
We take CPU_FITS_PER_SEC = 1.0 as the single-core reference baseline;
``vs_baseline`` is the per-chip speedup over it.

Prints exactly one JSON line on stdout.
"""

import json
import os
import sys
import time

import numpy as np

CPU_FITS_PER_SEC = 1.0  # reference CPU NestFit, full ladder, one core


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n_pix = int(os.environ.get("BENCH_PIXELS", "1024"))
    nlive = int(os.environ.get("BENCH_NLIVE", "100"))
    seed = int(os.environ.get("BENCH_SEED", "5"))

    import jax
    import jax.numpy as jnp
    from jax import random

    import dataclasses
    from nestfit_tpu.models import AmmoniaRunner, ammonia
    from nestfit_tpu.priors import get_irdc_priors
    from nestfit_tpu.sampling import NSConfig
    from nestfit_tpu.sampling.fit import fit_batch
    from nestfit_tpu.synth import make_synth_cube_arrays

    log(f"bench: devices={jax.devices()}")
    log(f"bench: generating {n_pix}px synthetic NH3 (1,1)+(2,2) cube ...")
    noise = 0.15
    (xa11, d11), (xa22, d22), truth = make_synth_cube_arrays(
        n_pix=n_pix, noise=noise, rng=np.random.default_rng(seed),
    )

    utrans = get_irdc_priors(vsys=0.0)

    def make_runner(ncomp):
        spectra = []
        for xarr, d, tid in ((xa11, d11, 1), (xa22, d22, 2)):
            spec = ammonia.make_ammonia_spectrum(xarr, d, noise, trans_id=tid)
            spec = dataclasses.replace(
                spec, noise=jnp.full((n_pix,), noise, dtype=jnp.float32)
            )
            spectra.append(spec)
        return AmmoniaRunner(spectra, utrans, ncomp=ncomp)

    # reference cube-fit defaults (main.py:381-386)
    cfg = NSConfig(nlive=nlive, tol=1.0)
    seg = int(os.environ.get("BENCH_SEGMENT_ITERS", "250"))

    runners = {n: make_runner(n) for n in (1, 2)}

    def ladder(key):
        k1, k2 = random.split(key)
        r1 = fit_batch(k1, runners[1], n_pix, cfg, segment_iters=seg)
        r2 = fit_batch(k2, runners[2], n_pix, cfg, segment_iters=seg)
        return r1, r2

    log("bench: compiling + warmup ...")
    t0 = time.perf_counter()
    r1, r2 = ladder(random.key(0))
    jax.block_until_ready((r1.lnz, r2.lnz))
    t_compile = time.perf_counter() - t0
    log(f"bench: warmup (incl. compile) {t_compile:.1f}s")

    t0 = time.perf_counter()
    r1, r2 = ladder(random.key(seed))
    jax.block_until_ready((r1.lnz, r2.lnz))
    elapsed = time.perf_counter() - t0

    lnz1 = np.asarray(r1.lnz)
    lnz2 = np.asarray(r2.lnz)
    null = np.asarray(r1.null_lnz)
    nbest = np.where(
        lnz1 - null < 11.0, 0, np.where(lnz2 - lnz1 < 11.0, 1, 2)
    )
    conv = np.asarray(r1.ns.converged) & np.asarray(r2.ns.converged)
    ncall = np.asarray(r1.ns.ncall, dtype=np.int64) + np.asarray(
        r2.ns.ncall, dtype=np.int64
    )
    fits_per_sec = n_pix / elapsed
    log(
        f"bench: {n_pix} ladder fits in {elapsed:.2f}s -> "
        f"{fits_per_sec:.1f} fits/s/chip; "
        f"converged={conv.mean()*100:.1f}% "
        f"likelihood evals/pixel={ncall.mean():.0f} "
        f"nbest histogram={np.bincount(nbest, minlength=3).tolist()}"
    )
    # truth is >= 1 component everywhere; sanity-check selection quality
    log(f"bench: mean lnZ1-null={np.mean(lnz1 - null):.1f} "
        f"mean lnZ2-lnZ1={np.mean(lnz2 - lnz1):.1f}")

    print(json.dumps({
        "metric": "spectra_fit_per_sec_per_chip",
        "value": round(fits_per_sec, 3),
        "unit": "ladder-fits/s/chip",
        "vs_baseline": round(fits_per_sec / CPU_FITS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
