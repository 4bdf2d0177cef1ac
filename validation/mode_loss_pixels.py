#!/usr/bin/env python3
"""Reproduce and instrument the two unexplained mode-loss pixels.

VERDICT r4 item 2: pixels 17 and 23 of the bench cube (rung 2) are
classified ``sampler-mode-loss`` in validation/outlier_postmortem.md --
the TPU nlive=100 median sits 25 / 7 nats LOW of the native nlive=400
truth, with huge seed scatter (14.5 / 2.8 nats), and pixel 17 flips
model selection.  Both pixels share a truth signature: one very narrow
(sigma ~ 0.19 / 0.34 km/s), weak component beside a broad strong one --
a tiny joint (voff, sigm, ntot) basin the live set loses.

This script fits the listed pixels in isolation, many seeds per
configuration, and reports per-seed lnZ2, max lnL, and the recovered
MAP parameters vs truth, so a candidate fix (e.g. the oversampled-init
kill-down, NSConfig.init_factor) can be judged by the failure RATE and
the lnZ distribution rather than a single draw.

Usage: python validation/mode_loss_pixels.py [--pixels 17,23]
         [--seeds 8] [--init-factors 1,4] [--nlive 100]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NATIVE_TRUTH = {  # native nlive=400 medians from native_truth_seed5.json
    17: {"lnz1": -479.79, "lnz2": -442.83},
    23: {"lnz1": -1088.62, "lnz2": -1069.30},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pixels", default="17,23")
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--init-factors", default="1,4")
    ap.add_argument("--nlive", type=int, default=100)
    ap.add_argument("--kill-k", type=int, default=0)
    ap.add_argument("--sbe", type=int, default=1)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import dataclasses

    import jax.numpy as jnp
    from jax import random

    from nestfit_tpu.models import AmmoniaRunner, ammonia
    from nestfit_tpu.priors import get_irdc_priors
    from nestfit_tpu.sampling import NSConfig
    from nestfit_tpu.sampling.fit import fit_batch
    from nestfit_tpu.synth import make_synth_cube_arrays

    pixels = [int(p) for p in args.pixels.split(",")]
    init_factors = [int(f) for f in args.init_factors.split(",")]
    noise, seed = 0.15, 5
    (xa11, d11), (xa22, d22), truth = make_synth_cube_arrays(
        n_pix=1024, noise=noise, rng=np.random.default_rng(seed))
    utrans = get_irdc_priors(vsys=0.0)

    # batch layout: one row per (pixel, seed-slot); every seed gets its
    # own fit_batch call (fresh key) but rows share the compile
    ix = np.asarray(pixels)

    def make_runner(ncomp):
        spectra = []
        for xarr, d, tid in ((xa11, d11, 1), (xa22, d22, 2)):
            spec = ammonia.make_ammonia_spectrum(
                xarr, d[ix], noise, trans_id=tid)
            spec = dataclasses.replace(
                spec, noise=jnp.full((len(ix),), noise,
                                     dtype=jnp.float32))
            spectra.append(spec)
        return AmmoniaRunner(spectra, utrans, ncomp=ncomp)

    runner2 = make_runner(2)
    par_names = ["voff", "trot", "tex", "ntot", "sigm", "orth"]

    for f in init_factors:
        cfg = NSConfig(nlive=args.nlive, tol=1.0, init_factor=f,
                       kill_k=args.kill_k,
                       slice_bound_every=args.sbe)
        rows = {p: [] for p in pixels}
        t0 = time.perf_counter()
        for s in range(args.seeds):
            r = fit_batch(random.key(1000 + s), runner2, len(ix), cfg,
                          segment_iters=250)
            jax.block_until_ready(r.lnz)
            lnz = np.asarray(r.lnz)
            mll = np.asarray(r.ns.max_loglike)
            mapp = np.asarray(r.products.map_params)
            nc = np.asarray(r.ns.ncall)
            for j, p in enumerate(pixels):
                rows[p].append({
                    "seed": s, "lnz2": float(lnz[j]),
                    "max_lnl": float(mll[j]),
                    "ncall": int(nc[j]),
                    "map": np.round(mapp[j], 3).tolist(),
                })
        wall = time.perf_counter() - t0
        for p in pixels:
            v = np.array([r["lnz2"] for r in rows[p]])
            ml = np.array([r["max_lnl"] for r in rows[p]])
            nat = NATIVE_TRUTH.get(p, {}).get("lnz2")
            n_lost = int(np.sum(v < (nat or v.max()) - 8.0))
            print(json.dumps({
                "pixel": p, "init_factor": f, "nlive": args.nlive,
                "kill_k": args.kill_k, "sbe": args.sbe,
                "native_lnz2": nat,
                "lnz2_median": float(np.median(v)),
                "lnz2_min": float(v.min()), "lnz2_max": float(v.max()),
                "lnz2_scatter": float(v.std(ddof=1)),
                "max_lnl_spread": float(ml.max() - ml.min()),
                "n_seeds": args.seeds, "n_mode_lost": n_lost,
                "truth": np.round(truth[p], 3).tolist(),
                "par_names": par_names,
                "wall_s": round(wall, 1),
                "seeds": rows[p],
            }), flush=True)


if __name__ == "__main__":
    main()
