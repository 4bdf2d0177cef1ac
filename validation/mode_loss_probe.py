#!/usr/bin/env python3
"""Mode-loss economics probe (round 4, VERDICT r3 item 3).

Counts nested-model evidence-floor violations (``lnZ_2 < lnZ_1 - 8``
and ``lnZ_1 < null - 8``) on the fixed-seed bench cube BEFORE any
retry, with and without the Latin-hypercube stratified initial live
set (NSConfig.init_stratified), over several PRNG seeds.  The floor
violations are what the fitter's mode-loss retries re-fit at ~10% of
the bench's evals (BENCH_r03 tail: 48+24 of 1024 rung-2 runs); this
probe measures whether stratified init prevents them at the source.

Usage: python validation/mode_loss_probe.py [n_seeds] [n_px] [variants]
``variants`` is a comma list of named configs (default "lhs,iid"):
lhs (default config), iid (init_stratified=False), kill12 (kill_k=12),
kill6 (kill_k=6), diff (dir_mode=diff), rep6 (fallback_repeats=6),
rep8 (fallback_repeats=8).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARGIN = 8.0


VARIANTS = {
    "lhs": {},
    "iid": {"init_stratified": False},
    "kill12": {"kill_k": 12},
    "kill6": {"kill_k": 6},
    "diff": {"dir_mode": "diff"},
    "diff3": {"dir_mode": "diff", "fallback_repeats": 3},
    "rep6": {"fallback_repeats": 6},
    "rep8": {"fallback_repeats": 8},
    # bound-enlargement variants (round 4): mode loss needs the
    # candidate bound to exclude the dominant basin while it is thinly
    # populated -- a larger union keeps proposals visiting it at the
    # cost of lower candidate acceptance
    "fudge": {"ell_fudge": 1.25},
    "efr01": {"efr": 0.1},
    "nlive150": {"nlive": 150},
}


def main(n_seeds=2, n_px=1024, variants="lhs,iid"):
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    from jax import random

    from nestfit_tpu.models import AmmoniaRunner, ammonia
    from nestfit_tpu.priors import get_irdc_priors
    from nestfit_tpu.sampling import NSConfig
    from nestfit_tpu.sampling.fit import fit_batch
    from nestfit_tpu.synth import make_synth_cube_arrays

    noise = 0.15
    (xa11, d11), (xa22, d22), _ = make_synth_cube_arrays(
        n_pix=n_px, noise=noise, rng=np.random.default_rng(5))
    utrans = get_irdc_priors(vsys=0.0)

    def make_runner(ncomp):
        spectra = []
        for xarr, d, tid in ((xa11, d11, 1), (xa22, d22, 2)):
            spec = ammonia.make_ammonia_spectrum(xarr, d, noise,
                                                 trans_id=tid)
            spec = dataclasses.replace(
                spec, noise=jnp.full((d.shape[0],), noise,
                                     dtype=jnp.float32))
            spectra.append(spec)
        return AmmoniaRunner(spectra, utrans, ncomp=ncomp)

    runners = {n: make_runner(n) for n in (1, 2)}
    out = {}
    for tag in str(variants).split(","):
        kw = dict(nlive=100, tol=1.0)
        kw.update(VARIANTS[tag])
        cfg = NSConfig(**kw)
        viols1, viols2, ncall, walls = [], [], [], []
        for seed in range(n_seeds):
            k1, k2 = random.split(random.key(100 + seed))
            t0 = time.time()
            r1 = fit_batch(k1, runners[1], n_px, cfg, segment_iters=250)
            jax.block_until_ready(r1.lnz)
            r2 = fit_batch(k2, runners[2], n_px, cfg, segment_iters=250)
            jax.block_until_ready(r2.lnz)
            walls.append(time.time() - t0)
            lnz1 = np.asarray(r1.lnz)
            lnz2 = np.asarray(r2.lnz)
            null = np.asarray(r1.null_lnz)
            v1 = int(np.sum(lnz1 < null - MARGIN))
            v2 = int(np.sum(lnz2 < lnz1 - MARGIN))
            viols1.append(v1)
            viols2.append(v2)
            nc = (np.asarray(r1.ns.ncall, np.int64).mean()
                  + np.asarray(r2.ns.ncall, np.int64).mean())
            ncall.append(float(nc))
            print(f"{tag} seed {seed}: viol1={v1} viol2={v2} "
                  f"evals/px={nc:.0f} wall={walls[-1]:.0f}s", flush=True)
        out[tag] = {"viol1": viols1, "viol2": viols2,
                    "evals_px": ncall, "wall_s": walls}
    print(json.dumps(out))


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 2,
         int(args[1]) if len(args) > 1 else 1024,
         args[2] if len(args) > 2 else "lhs,iid")
