#!/usr/bin/env python3
"""TPU-sampler evidence records on the native-truth artifact pixels.

Runs the batched TPU sampler on exactly the pixels covered by
``validation/native_truth_seed5.json`` (the sequential C++ engine's
nlive=400 truth), at both the cube-fit default nlive=100 (multi-seed)
and the truth-matched nlive=400 (single seed), and commits the per
-pixel evidences to ``validation/tpu_agreement_seed5.json``.

Together with the native artifact this feeds
``validation/outlier_postmortem.py`` (VERDICT r3 item 4): every
|dz|/sigma > 10 record between the engines must be classified --
rung-1 misfit-island divergence, undersampling at nlive=100, baseline
seed scatter, or a genuine sampler failure.

Usage: python validation/tpu_agreement.py [--seeds 3] [--batch 64]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "native_truth_seed5.json")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_agreement_seed5.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--nlive400-seeds", type=int, default=1)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import dataclasses
    import jax.numpy as jnp
    from jax import random

    from nestfit_tpu.models import AmmoniaRunner, ammonia
    from nestfit_tpu.priors import get_irdc_priors
    from nestfit_tpu.sampling import NSConfig
    from nestfit_tpu.sampling.fit import fit_batch
    from nestfit_tpu.synth import make_synth_cube_arrays

    with open(ART) as fh:
        art = json.load(fh)
    pix = sorted(int(k) for k in art["records"])
    noise, bench_seed = art["noise"], art["bench_seed"]
    (xa11, d11), (xa22, d22), truth = make_synth_cube_arrays(
        n_pix=art["n_pix"], noise=noise,
        rng=np.random.default_rng(bench_seed))

    R = args.batch
    pad = np.asarray(
        pix + [pix[0]] * (R - len(pix) % R if len(pix) % R else 0))
    utrans = get_irdc_priors(vsys=0.0)

    def make_runner(ncomp, ix):
        spectra = []
        for xarr, d, tid in ((xa11, d11, 1), (xa22, d22, 2)):
            spec = ammonia.make_ammonia_spectrum(
                xarr, d[ix], noise, trans_id=tid)
            spec = dataclasses.replace(
                spec, noise=jnp.full((len(ix),), noise, dtype=jnp.float32))
            spectra.append(spec)
        return AmmoniaRunner(spectra, utrans, ncomp=ncomp)

    out = {
        "bench_seed": bench_seed,
        "noise": noise,
        "cube_checksum": art["cube_checksum"],
        "pixels": pix,
        "truth_params": {str(i): np.round(truth[i], 4).tolist()
                         for i in pix},
        "runs": {},   # "nlive<en>/seed<s>" -> {pixel: {lnz1, lnz2, ...}}
    }

    def run_config(nlive, seed):
        # production sampler defaults (CubeFitter.ns_default_kwargs):
        # the artifact certifies the SHIPPED configuration, oversampled
        # init included
        cfg = NSConfig(nlive=nlive, tol=1.0, init_factor=4)
        tag = f"nlive{nlive}/seed{seed}"
        rec = {}
        active = np.arange(pad.size) < len(pix)
        for n in (1, 2):
            runner = make_runner(n, pad)
            t0 = time.time()
            r = fit_batch(random.key(1000 * nlive + seed * 10 + n),
                          runner, pad.size, cfg, segment_iters=250,
                          active=active)
            jax.block_until_ready(r.lnz)
            lnz = np.asarray(r.lnz)
            err = np.asarray(r.ns.lnz_err)
            nc = np.asarray(r.ns.ncall, dtype=np.int64)
            null = np.asarray(r.null_lnz)
            bf = np.asarray(r.products.bestfit_params)
            mp = np.asarray(r.products.map_params)
            med = np.asarray(r.products.marginals)
            sd = np.asarray(r.products.std_params)
            # median row of the marginal quantiles ("p50" of the 15
            # reference quantiles, core.pyx:585-594)
            from nestfit_tpu.sampling.results import MARGINAL_COLS
            i_med = MARGINAL_COLS.index("p50")
            print(f"{tag} ncomp={n}: {time.time()-t0:.0f}s "
                  f"evals/px={nc[:len(pix)].mean():.0f}", flush=True)
            for j, i in enumerate(pix):
                d = rec.setdefault(str(i), {})
                d[f"lnz{n}"] = float(lnz[j])
                d[f"lnz{n}_err"] = float(err[j])
                # parameter vectors for the MAP-agreement gate
                # (VERDICT r4 item 3): max-likelihood (bestfit), MAP,
                # marginal median, and posterior std per parameter
                d[f"bestfit{n}"] = np.round(bf[j], 5).tolist()
                d[f"map{n}"] = np.round(mp[j], 5).tolist()
                d[f"median{n}"] = np.round(med[j, i_med], 5).tolist()
                d[f"std{n}"] = np.round(sd[j], 5).tolist()
                if n == 1:
                    d["null_lnz"] = float(null[j])
        out["runs"][tag] = rec
        save()

    def save():
        tmp = OUT + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(out, fh, indent=1)
        os.replace(tmp, OUT)

    for seed in range(args.seeds):
        run_config(100, seed)
    for seed in range(args.nlive400_seeds):
        run_config(400, seed)
    print(f"done: {len(pix)} pixels x {len(out['runs'])} configs in {OUT}")


if __name__ == "__main__":
    main()
