#!/usr/bin/env python3
"""Sweep the kill+slice regime's iteration-cost knobs on real hardware.

VERDICT r4 item 1: the slice regime is ITERATION-bound at R=1024
(evals/px fell 29% while wall rose 3%), so throughput now comes from
fewer / cheaper iterations, not fewer evaluations.  The two bias-safe
levers:

* ``kill_k`` -- deaths per fill-cycle.  The slice-fill lnZ bias was
  measured nearly independent of kill_k (docs/limitations.md), so
  doubling it (25 -> 50 at nlive=100) halves the iteration count per
  death at constant evals/death, and doubles the chain-lane width of
  every likelihood launch (better device utilization).
* ``slice_bound_every`` -- whitening-refresh cadence.  The every-
  iteration ``_slim_bounds`` refresh (Cholesky + triangular solve +
  max-radius scan) is pure per-iteration fixed cost; cadence 2 halves
  it at bounded staleness.

Each combo runs the full bench-protocol ladder (rung 1 then rung 2,
1024 px, nlive=100, tol=1.0, IRDC priors) with one warmup pass
(compiles) + one clean timed pass, and reports wall, consumed
evals/px, deaths/px, the nbest selection fractions, and the
nested-model floor-violation count (mode-loss proxy; no retries here
-- retries would blur the per-config comparison).

Usage: python validation/iter_cost_sweep.py [combo ...]
where combo is "KILLK,SBE" (default sweep: 0,1 50,1 0,2 50,2 --
kill_k 0 = auto = nlive//4).
Env: SWEEP_PIXELS (1024), SWEEP_SEED (5), SWEEP_TIMED (1).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.environ.get(
        "BENCH_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import dataclasses

    import jax.numpy as jnp
    from jax import random

    from nestfit_tpu.models import AmmoniaRunner, ammonia
    from nestfit_tpu.priors import get_irdc_priors
    from nestfit_tpu.sampling import NSConfig
    from nestfit_tpu.sampling.fit import fit_batch
    from nestfit_tpu.synth import make_synth_cube_arrays

    n_pix = int(os.environ.get("SWEEP_PIXELS", "1024"))
    seed = int(os.environ.get("SWEEP_SEED", "5"))
    timed = os.environ.get("SWEEP_TIMED", "1") != "0"
    noise = 0.15

    # combo syntax: "kk,sbe[,init_factor[,max_contract[,repeats[,specw]]]]"
    combos = []
    for arg in (sys.argv[1:] or ["0,1", "50,1", "0,2", "50,2"]):
        f = [int(x) for x in arg.split(",")]
        f += [1, 6, 0, 2][len(f) - 2:]
        combos.append(tuple(f[:6]))

    print(f"sweep: devices={jax.devices()} n_pix={n_pix} "
          f"combos={combos}", file=sys.stderr, flush=True)
    (xa11, d11), (xa22, d22), _truth = make_synth_cube_arrays(
        n_pix=n_pix, noise=noise, rng=np.random.default_rng(seed),
    )
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
    seg = int(os.environ.get("BENCH_SEGMENT_ITERS", "250"))

    def ladder(key, cfg):
        out = {}
        prev = None
        for n in (1, 2):
            k, key = random.split(key)
            t0 = time.perf_counter()
            r = fit_batch(k, runners[n], n_pix, cfg, segment_iters=seg)
            jax.block_until_ready(r.lnz)
            wall = time.perf_counter() - t0
            lnz = np.asarray(r.lnz)
            floor = np.asarray(r.null_lnz) if n == 1 else prev
            viol = int(np.sum(lnz < floor - 8.0))
            out[n] = {
                "wall_s": round(wall, 2),
                "evals_px": float(np.asarray(
                    r.ns.ncall, dtype=np.int64).mean()),
                "deaths_px": float(np.asarray(r.ns.n_dead).mean()),
                "lnz_mean": float(lnz.mean()),
                "floor_viol": viol,
                "conv": float(np.asarray(r.ns.converged).mean()),
            }
            if n == 1:
                null = np.asarray(r.null_lnz)
                out["d10_mean"] = float((lnz - null).mean())
            else:
                out["d21_mean"] = float((lnz - prev).mean())
                nbest = np.where(
                    prev - null < 11.0, 0,
                    np.where(lnz - prev < 11.0, 1, 2))
                out["nbest_hist"] = np.bincount(
                    nbest, minlength=3).tolist()
            prev = lnz
        out["ladder_wall_s"] = out[1]["wall_s"] + out[2]["wall_s"]
        return out

    for kk, sbe, inif, mc, rep, sw in combos:
        cfg = NSConfig(nlive=100, tol=1.0, kill_k=kk,
                       slice_bound_every=sbe, init_factor=inif,
                       max_contract=mc, fallback_repeats=rep,
                       spec_width=sw)
        tag = (f"kk{kk or 'auto'}-sbe{sbe}-if{inif}-mc{mc}"
               f"-rep{rep or 'auto'}-sw{sw}")
        t0 = time.perf_counter()
        warm = ladder(random.key(0), cfg)
        t_warm = time.perf_counter() - t0
        print(f"sweep: {tag} warmup {t_warm:.1f}s "
              f"(ladder {warm['ladder_wall_s']:.1f}s)",
              file=sys.stderr, flush=True)
        rec = {"combo": tag, "kill_k": kk, "slice_bound_every": sbe,
               "init_factor": inif, "max_contract": mc,
               "fallback_repeats": rep,
               "warmup_s": round(t_warm, 1), "warm": warm}
        if timed:
            rec["timed"] = ladder(random.key(seed), cfg)
            rec["fits_per_sec"] = round(
                n_pix / rec["timed"]["ladder_wall_s"], 2)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
