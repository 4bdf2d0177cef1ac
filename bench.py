#!/usr/bin/env python3
"""Headline benchmark: spectra fit/sec/chip on a synthetic NH3 cube.

Measures the full production path on one chip: batched 2-transition
ammonia nested-sampling fits with the Bayes-factor N-component ladder
(ncomp = 1 then 2), using the reference's cube-fit sampler defaults
nlive=100, tol=1.0 (reference: main.py:381-386) and the IRDC priors
(prior_constructors.py:20-76).  One "fit" = one pixel through the full
1->2 component ladder including posterior products.

Protocol: a warmup ladder (includes all XLA compiles) followed by a
clean timed ladder on fresh keys; the reported number is the clean
pass whenever the budget allows (an in-process rerun of the same
shapes never recompiles, so the timed pass is pure steady-state and
is attempted whenever a small floor of budget remains).  Alongside
the headline
number the bench records per-rung wall/evals telemetry and enforces
two accuracy gates so a perf "win" can never silently trade away
correctness (VERDICT r1 items 2/4):

* model-selection quality: fraction of pixels recovering nbest >= 1
  and nbest == 2 on the 2-component-truth cube;
* lnZ agreement with the in-repo sequential C++ engine (the
  MultiNest-agreement analogue) on a pixel sample.

Baseline: the reference publishes no timing tables (BASELINE.md), so
the baseline is *measured* here: the in-repo native C++ engine
(cpp/nestfit_native.cpp) runs the same 1->2 component ladder with a
classical sequential nested sampler -- the architectural equivalent of
CPU NestFit+MultiNest -- on a sample of the same pixels, one core.
``vs_baseline`` is the per-chip speedup over that measured single-core
rate.  If the native library is unavailable, falls back to the
documented estimate of 0.5 ladder-fits/s/core (reference
docs/overview.rst:7-11 implies ~5e3 likelihood evals/fit at a few us
plus sampler overhead).

Budgeted: the whole script respects BENCH_BUDGET_S (default 1500 s)
and always prints exactly one JSON line on stdout, falling back to the
warmup-run timing (which includes compilation) when the budget cannot
fit a clean timed pass.
"""

import json
import os
import sys
import time

import numpy as np

CPU_FITS_PER_SEC_FALLBACK = 0.5
T_START = time.perf_counter()
if "--fast" in sys.argv:
    # CI-style sanity tier (VERDICT r4 item 8): 128-px ladder through
    # the identical code paths at ~1/8 the work.  Env vars override.
    os.environ.setdefault("BENCH_PIXELS", "128")
    os.environ.setdefault("BENCH_BUDGET_S", "900")
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))

#: progressively-updated result record: every completed phase folds its
#: numbers in, so the SIGALRM deadline handler (and the exception
#: handler) can always emit the best-known JSON line.  The r3 driver
#: run died rc=124 with `parsed: null` because the JSON was only
#: printed at the very end -- the record must exist BEFORE the deadline.
RESULT = {
    "metric": "spectra_fit_per_sec_per_chip",
    "value": 0.0,
    "unit": "ladder-fits/s/chip",
    "vs_baseline": 0.0,
    "timed_clean": False,
    "partial": True,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.perf_counter() - T_START)


def _deadline_emit(signum=None, frame=None):  # pragma: no cover
    RESULT["deadline_hit"] = True
    log(f"bench: DEADLINE at {time.perf_counter() - T_START:.0f}s -- "
        "emitting the best-known partial result")
    print(json.dumps(RESULT), flush=True)
    os._exit(0)


def main():
    n_pix = int(os.environ.get("BENCH_PIXELS", "1024"))
    nlive = int(os.environ.get("BENCH_NLIVE", "100"))
    seed = int(os.environ.get("BENCH_SEED", "5"))

    # persistent compile cache: repeated bench runs on the same machine
    # skip recompilation (harmless if the backend ignores it)
    import jax

    try:
        cache_dir = os.environ.get(
            "BENCH_CACHE_DIR", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), ".jax_cache")
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as exc:
        log(f"bench: no persistent compile cache ({exc})")

    import jax.numpy as jnp
    from jax import random

    import dataclasses
    from nestfit_tpu.models import AmmoniaRunner, ammonia
    from nestfit_tpu.priors import get_irdc_priors
    from nestfit_tpu.sampling import NSConfig
    from nestfit_tpu.sampling.fit import fit_batch
    from nestfit_tpu.synth import make_synth_cube_arrays

    log(f"bench: devices={jax.devices()} budget={BUDGET_S:.0f}s")
    log(f"bench: generating {n_pix}px synthetic NH3 (1,1)+(2,2) cube ...")
    noise = 0.15
    (xa11, d11), (xa22, d22), truth = make_synth_cube_arrays(
        n_pix=n_pix, noise=noise, rng=np.random.default_rng(seed),
    )

    utrans = get_irdc_priors(vsys=0.0)

    def make_runner(ncomp, ix=None):
        spectra = []
        for xarr, d, tid in ((xa11, d11, 1), (xa22, d22, 2)):
            db = d if ix is None else d[ix]
            spec = ammonia.make_ammonia_spectrum(xarr, db, noise,
                                                 trans_id=tid)
            spec = dataclasses.replace(
                spec, noise=jnp.full((db.shape[0],), noise,
                                     dtype=jnp.float32)
            )
            spectra.append(spec)
        return AmmoniaRunner(spectra, utrans, ncomp=ncomp)

    # reference cube-fit defaults (main.py:381-386) + the oversampled
    # init (init_factor=4: the narrow-basin mode-loss root fix, ~1%
    # eval cost; production default in CubeFitter too)
    cfg = NSConfig(nlive=nlive, tol=1.0,
                   init_factor=int(os.environ.get("BENCH_INIT_FACTOR",
                                                  "4")))
    seg = int(os.environ.get("BENCH_SEGMENT_ITERS", "250"))
    mode_loss_margin = 8.0
    runners = {n: make_runner(n) for n in (1, 2)}
    # ---- combined second pass (mirrors CubeFitter): ONE re-fit batch
    # at 2x nlive serves BOTH quality mechanisms --
    # * nested-model floor violators (objective mode loss): the
    #   higher-resolution rerun replaces the record when better.  This
    #   SUPERSEDES the old fallback_repeats=2*ndim escalation, which
    #   cost 150 s per 64-row batch (142k evals/px) on-device vs 23 s
    #   for the nlive=200 batch that recovers at least as well
    #   (nlive=400-class mode retention).
    # * decision-boundary pixels (|gain - 11| <= band nats): refined
    #   rows supersede unconditionally -- the targeted form of the
    #   reference's SNR-scaled nlive boost (main.py:444-447).
    # Fixed batch width r_band = one compile class; floor rows get
    # priority, then band rows nearest the threshold.
    band_nats = float(os.environ.get("BENCH_BOUNDARY_BAND", "6"))
    # two width classes: the big one for the main refinement round and
    # a small one so a handful of stubborn round-2 rows does not pay a
    # 128-row batch (per-iteration compute scales with R)
    r_band = min(128, n_pix)
    r_small = min(32, n_pix)
    band_runners = {(n, w): make_runner(n, np.arange(w))
                    for n in (1, 2) for w in {r_band, r_small}}

    def band_cfg(n):
        return dataclasses.replace(
            cfg, nlive=2 * cfg.nlive,
            max_iter=cfg.resolved(band_runners[n, r_band].ndim).max_iter,
        )

    mode_loss_remaining = {}

    def second_pass(k, n, r, lnz, floor):
        """Combined mode-loss + boundary refinement pass (see above).

        Up to two rounds: round 0 takes floor violators plus the
        boundary band; round 1 (rare) re-runs only still-violating
        floor rows with a fresh key.  Returns (fit, lnz, extra_evals)
        with every superseded/discarded record's likelihood calls
        counted so evals/pixel stays honest."""
        from nestfit_tpu.sampling.fit import align_fit_meta, merge_fit_rows

        extra = 0
        n_bad0 = None
        for attempt in range(2):
            bad = np.flatnonzero(lnz < floor - mode_loss_margin)
            if attempt == 0:
                n_bad0 = bad.size
                gain = lnz - floor
                if band_nats > 0:
                    band = np.flatnonzero(
                        (np.abs(gain - 11.0) <= band_nats)
                        & (lnz >= floor - mode_loss_margin)
                    )
                    band = band[np.argsort(np.abs(gain[band] - 11.0))]
                else:
                    band = np.empty(0, dtype=np.int64)
                # floor rows first, then band rows nearest the gate
                rows = np.concatenate([bad, band])[:r_band]
                n_floor = bad.size
            else:
                rows = bad[:r_band]
                n_floor = rows.size
            if rows.size == 0:
                break
            w = r_small if rows.size <= r_small else r_band
            pad = np.concatenate([
                rows, np.full(w - rows.size, rows[0]),
            ])
            data_tree = tuple(
                (jnp.asarray(d[pad], dtype=jnp.float32),
                 jnp.full((w,), noise, dtype=jnp.float32))
                for _x, d, _t in ((xa11, d11, 1), (xa22, d22, 2))
            )
            k, sub = random.split(k)
            r2 = fit_batch(sub, band_runners[n, w], w, band_cfg(n),
                           segment_iters=seg, data=data_tree,
                           active=np.arange(w) < rows.size)
            lnz_r = np.asarray(r2.lnz)[: rows.size]
            # one winner per destination (floor rows appear twice:
            # keep the better refit); floor rows then keep-better vs
            # the original (objective constraint violation), band rows
            # supersede unconditionally (decided pre-outcome)
            bad_set = set(bad.tolist())
            best = {}
            for j, dest in enumerate(rows.tolist()):
                if dest not in best or lnz_r[j] > lnz_r[best[dest]]:
                    best[dest] = j
            dst, src = [], []
            for dest, j in best.items():
                if dest in bad_set and not lnz_r[j] > lnz[dest]:
                    continue
                dst.append(dest)
                src.append(j)
            dst = np.asarray(dst, dtype=np.int64)
            src = np.asarray(src, dtype=np.int64)
            nc_old = np.asarray(r.ns.ncall, dtype=np.int64)
            nc_new = np.asarray(r2.ns.ncall, dtype=np.int64)[: rows.size]
            taken_j = set(src.tolist())
            extra += int(nc_old[dst].sum()) + int(sum(
                nc_new[j] for j in range(rows.size) if j not in taken_j
            ))
            if dst.size:
                r = merge_fit_rows(r, align_fit_meta(r2, r), dst, src,
                                   n_pix, w)
                lnz = lnz.copy()
                lnz[dst] = lnz_r[src]
            log(f"bench: second pass {attempt + 1} ncomp={n}: "
                f"{n_floor} floor + {rows.size - min(n_floor, rows.size)} "
                f"boundary rows re-fit at nlive={2 * nlive} (R={w}); "
                f"{dst.size} records replaced")
        still = int(np.sum(lnz < floor - mode_loss_margin))
        mode_loss_remaining[n] = max(mode_loss_remaining.get(n, 0), still)
        if n_bad0:
            log(f"bench: mode-loss ncomp={n}: {n_bad0} first-pass "
                f"floor violations, {still} remain after refinement")
        return r, lnz, extra

    def ladder(key, tag="", reserve=None):
        """Run both rungs; with ``reserve`` set, skip a rung whose
        estimated cost no longer fits the budget (returns what
        completed).  The estimate uses the walls of rungs already timed
        in THIS ladder (steady-state, same process), never the
        compile-polluted warmup walls."""
        k1, k2 = random.split(key)
        results, walls = {}, {}
        extra_evals = {}
        prev_lnz = None
        mode_loss_remaining.clear()
        for n, k in ((1, k1), (2, k2)):
            if reserve is not None:
                # rung-2 costs ~7-8x rung-1 now (rung 1 runs the wide
                # kill_k=nlive/2 batch; rung 2 carries the second-pass
                # refinement batches), so estimate accordingly
                est = 8.0 * max(walls.values()) if walls else 75.0
                if remaining() - reserve < est:
                    log(f"bench: {tag} aborted before ncomp={n} "
                        f"(budget {remaining():.0f}s left, "
                        f"est {est:.0f}s + reserve {reserve:.0f}s)")
                    break
            t0 = time.perf_counter()
            kf, kr = random.split(k)
            r = fit_batch(kf, runners[n], n_pix, cfg, segment_iters=seg)
            jax.block_until_ready(r.lnz)
            lnz = np.asarray(r.lnz)
            floor = np.asarray(r.null_lnz) if n == 1 else prev_lnz
            r, lnz, extra_evals[n] = second_pass(kr, n, r, lnz, floor)
            jax.block_until_ready(r.lnz)
            walls[n] = time.perf_counter() - t0
            prev_lnz = lnz
            nc = np.asarray(r.ns.ncall, dtype=np.int64)
            log(f"bench: {tag} ncomp={n} rung {walls[n]:.1f}s "
                f"evals/px={nc.mean() + extra_evals[n] / n_pix:.0f} "
                f"deaths/px={np.asarray(r.ns.n_dead).mean():.0f}")
            results[n] = r
        return results, walls, sum(extra_evals.values())

    # ---- AOT parallel precompile of every program the ladder will
    # dispatch (sampling/aot.py).  Serial compile discovery through a
    # remote-tunneled worker paid the SUM of 25-600s program compiles
    # (~1,000s of the budget in the r1/r2 driver runs); concurrent
    # compiles pay ~the max instead, and the per-program
    # persistent-cache hit/miss counts make a slow driver warmup
    # diagnosable from the JSON.
    from nestfit_tpu.sampling import aot

    log("bench: AOT precompile (parallel) ...")
    t0 = time.perf_counter()
    # PRIORITY ORDER (VERDICT r4 item 4: 38/44 programs were abandoned
    # by the time box because retry programs occupied the worker pool
    # ahead of rung-2's main programs).  ThreadPoolExecutor assigns
    # workers in submission order, so: every full-batch program of both
    # rungs first (the 12 programs every bench run certainly
    # dispatches), then the second-pass (nlive=2x refinement) family,
    # then the straggler-compaction classes.
    plan = []
    for n in (1, 2):
        plan += aot.build_plan(runners[n], n_pix, cfg, r_classes=[])
    for n in (1, 2):
        # boundary-refinement programs fire on EVERY run (the band is
        # never empty on this cube), so they rank above the classes
        plan += aot.build_plan(band_runners[n, r_band], r_band,
                               band_cfg(n), r_classes=[],
                               label=f"band{n}")
    for n in (1, 2):
        # small class for stubborn round-2 rows
        plan += aot.build_plan(band_runners[n, r_small], r_small,
                               band_cfg(n), r_classes=[],
                               label=f"band{n}s")
    for n in (1, 2):
        plan += aot.build_plan(
            runners[n], n_pix, cfg,
            kinds_full=(), label=f"n{n}c")  # compaction classes only
    # time-box the phase: a wedged backend compile RPC (observed once
    # on the axon tunnel -- zero-CPU futex wait, remote never replies)
    # must not eat the whole budget; abandoned programs compile lazily
    # during warmup instead
    # cap env-tunable: the documented cold no-cache precompile range is
    # 371-519 s (docs/performance.md), so a fixed 480 s cap could
    # abandon a legitimate cold run's slowest compiles
    box_cap = float(os.environ.get("BENCH_PRECOMPILE_BOX_S", "550"))
    pre_box = max(60.0, min(box_cap, remaining() - 720.0))
    pre = aot.compile_plan(plan, max_workers=12, verbose=log,
                           timeout=pre_box)
    pre.pop("programs", None)
    log(f"bench: precompile {pre['wall_s']:.0f}s "
        f"({pre['n_programs']} programs, "
        f"{pre['cache_hits']} cache hits, "
        f"{pre['cache_misses']} misses, "
        f"{pre['n_deduped']} hlo-deduped, "
        f"{pre['n_errors']} errors)")

    def score_pass(results, elapsed, timed_clean, extra_nc):
        """Fold a completed ladder pass into RESULT: headline rate,
        selection-quality gate, telemetry.  Called after the warmup AND
        after the timed pass so the deadline handler always has the
        latest complete pass to emit."""
        r1, r2 = results[1], results[2]
        lnz1 = np.asarray(r1.lnz)
        lnz2 = np.asarray(r2.lnz)
        null = np.asarray(r1.null_lnz)
        nbest = np.where(
            lnz1 - null < 11.0, 0, np.where(lnz2 - lnz1 < 11.0, 1, 2)
        )
        conv = np.asarray(r1.ns.converged) & np.asarray(r2.ns.converged)
        evals_px = float(
            np.asarray(r1.ns.ncall, dtype=np.int64).mean()
            + np.asarray(r2.ns.ncall, dtype=np.int64).mean()
            + extra_nc / n_pix
        )
        fits_per_sec = n_pix / elapsed
        log(
            f"bench: {n_pix} ladder fits in {elapsed:.2f}s -> "
            f"{fits_per_sec:.1f} fits/s/chip; "
            f"converged={conv.mean()*100:.1f}% "
            f"likelihood evals/pixel={evals_px:.0f} "
            f"nbest histogram={np.bincount(nbest, minlength=3).tolist()}"
        )
        log(f"bench: mean lnZ1-null={np.mean(lnz1 - null):.1f} "
            f"mean lnZ2-lnZ1={np.mean(lnz2 - lnz1):.1f}")
        frac_ge1 = float((nbest >= 1).mean())
        frac_eq2 = float((nbest == 2).mean())
        gates = {
            "converged_frac": float(conv.mean()),
            "nbest_ge1_frac": frac_ge1,
            "nbest_eq2_frac": frac_eq2,
            "mode_loss_remaining": {
                str(k): int(v)
                for k, v in sorted(mode_loss_remaining.items())
            },
        }
        ok_sel = (frac_ge1 >= 0.90 and frac_eq2 >= 0.30
                  and conv.mean() >= 0.98)
        # diagnostics for the nbest=0 tail (VERDICT r4 item 8): these
        # pixels sit at the >=1 floor, so log how far below the 11-nat
        # rule they actually fall -- genuine low-SNR physics shows a
        # continuum of small margins, a sampler failure shows cliffs
        n0 = np.flatnonzero(nbest == 0)
        if n0.size:
            m0 = np.sort(lnz1[n0] - null[n0])
            gates["nbest0_margins"] = np.round(m0, 2).tolist()[:32]
            log(f"bench: nbest=0 tail ({n0.size} px): lnZ1-null "
                f"median {np.median(m0):.1f}, range "
                f"[{m0[0]:.1f}, {m0[-1]:.1f}] vs the 11-nat rule")
        log(f"bench: selection gate {'PASS' if ok_sel else 'FAIL'} "
            f"(>=1: {frac_ge1:.2f}, ==2: {frac_eq2:.2f}, "
            f"conv: {conv.mean():.3f})")
        RESULT.update({
            "value": round(fits_per_sec, 3) if ok_sel else 0.0,
            "vs_baseline": round(
                fits_per_sec / CPU_FITS_PER_SEC_FALLBACK, 2),
            "timed_clean": bool(timed_clean),
            "evals_per_pixel": int(evals_px),
            "gates": gates,
        })
        return (lnz1, lnz2, null, nbest, r1, r2, fits_per_sec, ok_sel,
                gates)

    log("bench: warmup ...")
    results, _, extra_nc = ladder(random.key(0), tag="warmup")
    t_warm = time.perf_counter() - t0
    log(f"bench: warmup incl. precompile {t_warm:.1f}s "
        f"(budget left {remaining():.0f}s)")
    RESULT["warmup_s"] = round(t_warm, 1)
    RESULT["precompile"] = pre
    score_pass(results, t_warm, False, extra_nc)

    # Clean timed pass whenever the budget plausibly holds it.  The
    # warmup wall is compile-dominated (XLA compile through remote
    # workers varies 25-600+ s for the same program, measured), so
    # warmup time says nothing about a clean pass: an in-process rerun
    # of the same shapes NEVER recompiles, so the timed ladder is pure
    # steady-state (measured ~40-90 s total at 1024 px).  Attempt it
    # whenever a minimal floor fits and let the ladder self-abort
    # between rungs against its own actual rung walls, falling back to
    # the completed warmup results.
    baseline_reserve = 180.0
    timed_clean = remaining() - baseline_reserve > 105.0
    if timed_clean:
        t0 = time.perf_counter()
        t_results, walls, t_extra = ladder(
            random.key(seed), tag="timed", reserve=baseline_reserve,
        )
        if len(t_results) == 2:
            results = t_results
            extra_nc = t_extra
            elapsed = time.perf_counter() - t0
            log(f"bench: clean timed pass {elapsed:.1f}s "
                f"(rung1 {walls[1]:.1f}s rung2 {walls[2]:.1f}s)")
        else:
            timed_clean = False
            elapsed = t_warm
            log("bench: timed pass aborted on budget; "
                "reporting warmup timing (includes compile)")
    else:
        log("bench: budget too tight for a clean pass; "
            "reporting warmup timing (includes compile)")
        elapsed = t_warm

    # ---- score the reported pass (selection gate = accuracy gate 1:
    # truth is 2 components everywhere; low-SNR / small-vsep pixels
    # legitimately prefer fewer, so gate on floors calibrated from the
    # round-1 baseline ([24, 560, 440] at seed 5), with slack for seed
    # scatter.  A sampler perf regression that loses modes or biases
    # lnZ differences shows up here first.)
    (lnz1, lnz2, null, nbest, r1, r2, fits_per_sec, ok_sel,
     gates) = score_pass(results, elapsed, timed_clean, extra_nc)

    # ---- accuracy gate 3 first (cheap: reads the committed nlive=400
    # native-truth artifact) so it lands in RESULT even if the
    # in-budget baseline phase cannot run.
    ok_agree = True
    nt = native_truth_comparison(d11, d22, lnz1, lnz2, null, nbest,
                                 fits=(r1, r2))
    if nt:
        gates.update(nt)
        # thresholds documented in validation/compute_native_truth.py:
        # median within a few sigma of a baseline with a MEASURED seed
        # scatter; selection agreement floor 0.7 leaves room for
        # genuine boundary pixels where the 11-nat rule flips on
        # seed-level evidence scatter in either engine; the outlier
        # bound keeps unexplained large-sigma records from hiding
        # behind the median (each must be classified in
        # validation/outlier_postmortem.md)
        if nt["native400_n_records"] >= 16:
            ok_native = (nt["native400_dz_sigma_median"] < 4.0
                         and nt["native400_nbest_agree_frac"] >= 0.7
                         and nt["native400_dz_frac_gt10"] <= 0.15)
            # MAP-parameter agreement (VERDICT r4 item 3 / BASELINE.md
            # "logZ and MAP parameters matching"): per-parameter
            # max-likelihood vectors vs the native engine's, in units
            # of the TPU posterior std.  Floor measured on the r5
            # artifact (median ~0.2 sigma_post); gate leaves ~3x slack
            # for seed scatter of the ML point estimate.
            if nt.get("map_dz_n", 0) >= 16:
                ok_native = ok_native and nt["map_dz_median"] < 1.0
            log(f"bench: native-truth gate "
                f"{'PASS' if ok_native else 'FAIL'}")
            ok_agree = ok_agree and ok_native
        else:
            log("bench: native-truth artifact too small to gate "
                f"(n={nt['native400_n_records']})")
    if not (ok_sel and ok_agree):
        RESULT["value"] = 0.0

    # ---- accuracy gate 2 + baseline: sequential C++ engine on a
    # pixel sample (the MultiNest-agreement analogue).  The same runs
    # provide the CPU-baseline rate and the per-pixel lnZ comparison.
    # Strictly budget-boxed: each native run carries a wall box, and
    # the whole phase is skipped when the budget is nearly spent (the
    # committed artifact above already carries the agreement load).
    cpu_rate, agree = measure_cpu_baseline(
        xa11, d11, xa22, d22, noise, nlive,
        (lnz1, np.asarray(r1.ns.lnz_err)),
        (lnz2, np.asarray(r2.ns.lnz_err)),
    )
    log(f"bench: CPU baseline {cpu_rate:.3f} ladder-fits/s/core")
    if agree:
        # Robust two-part gate: median |dz|/sigma plus an outlier
        # FRACTION, not a hard max.  The sequential baseline is not
        # exact truth: on multimodal rung-2 pixels at nlive=100 it
        # scatters several nats seed-to-seed and sits up to ~10 nats
        # LOW of its own nlive=400 run (measured, bench-cube pixel 4:
        # nlive=100 seeds -> lnz2 -438.2/-435.7/-433.9, nlive=400 ->
        # -427.8; this sampler's median -425.4), so a single
        # baseline-undersampled pixel can post a 20-sigma record
        # against a quoted sigma of ~0.5.  A max-statistic over a
        # budget-dependent sample size turns that into a coin-flip
        # gate; a bounded outlier fraction still catches systematic
        # disagreement.
        dz = np.array([a["dz_sigma"] for a in agree])
        n_out = int(np.sum(np.abs(dz) > 10.0))
        frac_out = n_out / len(dz)
        # count-based allowance: at the smallest budget-limited
        # samples (1 pixel -> n=2 records) a single
        # baseline-undersampled record must not zero the headline, so
        # one outlier is always tolerated
        # loose absolute cap on top of the count allowance: tolerated
        # outliers must still be baseline-undersampling-sized (tens of
        # nats / quoted sigma ~0.5), not arbitrarily wrong
        ok2 = bool(np.median(np.abs(dz)) < 6.0 and
                   n_out <= max(1, len(dz) // 3) and
                   np.max(np.abs(dz)) < 50.0)
        log(f"bench: lnZ-agreement gate {'PASS' if ok2 else 'FAIL'} "
            f"(|dz|/sigma median {np.median(np.abs(dz)):.2f}, "
            f"frac>10 {frac_out:.2f}, max {np.max(np.abs(dz)):.2f}, "
            f"n={len(dz)})")
        gates["lnz_dz_sigma_median"] = float(np.median(np.abs(dz)))
        gates["lnz_dz_sigma_max"] = float(np.max(np.abs(dz)))
        gates["lnz_dz_frac_gt10"] = frac_out
        ok_agree = ok_agree and ok2

    value = round(fits_per_sec, 3)
    if not (ok_sel and ok_agree):
        # accuracy regressions fail loudly: zero out the headline so
        # the driver records the failure rather than a tainted number
        log("bench: ACCURACY GATE FAILED -- reporting 0")
        value = 0.0

    RESULT.update({
        "value": value,
        "vs_baseline": round(value / cpu_rate, 2),
        "gates": gates,
    })
    RESULT.pop("partial", None)
    return RESULT


def native_truth_comparison(d11, d22, lnz1, lnz2, null, nbest,
                            fits=None):
    """Compare against the committed nlive=400 sequential-engine truth
    artifact (validation/native_truth_seed5.json, produced by
    validation/compute_native_truth.py).

    Two independent checks the in-budget baseline sample cannot give
    (VERDICT r2 items 2/3):

    * a wide lnZ-agreement sample against a *less undersampled*
      baseline (nlive=400: 4x the live points of the in-budget
      nlive=100 comparison), with the baseline's own seed-to-seed
      scatter measured from its multi-seed pixels and folded into the
      per-record sigma;
    * model-SELECTION agreement: the artifact's lnz1/lnz2 put through
      the same Bayes-factor ladder rule (thresh 11, reference
      main.py:448-472) vs this sampler's nbest on the same pixels.

    The gate is the MEDIAN plus the selection agreement, never the
    max: on strongly-2-component pixels the rung-1 (misfit) posterior
    is a set of far-separated noise islands where the two engines can
    legitimately settle 1e2-1e3 nats apart against quoted sigmas of
    ~0.3 (measured max ~3.8e3 sigma on such a pixel), while both
    still select nbest=2 by >1e3 nats.  Those records say nothing
    about either engine's evidence quality on models that FIT.

    Returns a gates sub-dict (empty when the artifact is absent or
    belongs to a different cube).
    """
    import hashlib

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "validation", "native_truth_seed5.json")
    try:
        with open(path) as fh:
            art = json.load(fh)
    except Exception:
        return {}
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(d11, dtype=np.float32).tobytes())
    h.update(np.ascontiguousarray(d22, dtype=np.float32).tobytes())
    if art.get("cube_checksum") != h.hexdigest()[:16]:
        log("bench: native-truth artifact is for a different cube; "
            "skipping")
        return {}
    if not art.get("placement"):
        log("bench: native-truth artifact predates the joint "
            "placement prior (its rung-2 evidences integrate a "
            "different prior); skipping")
        return {}
    recs = art.get("records", {})
    if not recs:
        return {}

    # measured seed-to-seed scatter of the native engine, pooled over
    # its multi-seed pixels (the baseline-error model: quoted
    # sqrt(H/nlive) errors understate run-to-run scatter on multimodal
    # rungs)
    scat = {1: [], 2: []}
    for rec in recs.values():
        seeds = list(rec["seeds"].values())
        if len(seeds) >= 2:
            for n in (1, 2):
                v = [s[f"lnz{n}"] for s in seeds]
                scat[n].append(np.std(v, ddof=1))
    s_model = {n: float(np.median(scat[n])) if scat[n] else 0.0
               for n in (1, 2)}

    dz, sel_pairs, dz21 = [], [], []
    for key, rec in recs.items():
        i = int(key)
        if i >= lnz1.shape[0]:
            continue
        seeds = list(rec["seeds"].values())
        nat = {n: float(np.median([s[f"lnz{n}"] for s in seeds]))
               for n in (1, 2)}
        nat_err = {n: float(np.median([s[f"lnz{n}_err"] for s in seeds]))
                   for n in (1, 2)}
        for n, tpu in ((1, lnz1), (2, lnz2)):
            sig = float(np.sqrt(nat_err[n] ** 2 + s_model[n] ** 2))
            sig = max(sig, 0.3)
            dz.append((float(tpu[i]) - nat[n]) / sig)
        nat_nbest = 0 if nat[1] - null[i] < 11.0 else (
            1 if nat[2] - nat[1] < 11.0 else 2)
        sel_pairs.append((int(nbest[i]), nat_nbest))
        dz21.append(float(lnz2[i] - lnz1[i]) - (nat[2] - nat[1]))

    # ---- MAP-parameter agreement (VERDICT r4 item 3): TPU vs native
    # max-likelihood vectors in units of the TPU posterior std, on
    # pixels where BOTH engines select that rung's model (a parameter
    # comparison on a model neither engine selects compares noise).
    # Native bestfit vectors exist only in backfilled artifacts.
    map_dz = []
    if fits is not None:
        for key, rec in recs.items():
            i = int(key)
            if i >= lnz1.shape[0]:
                continue
            seeds = list(rec["seeds"].values())
            nat = {n: float(np.median([s[f"lnz{n}"] for s in seeds]))
                   for n in (1, 2)}
            nat_nbest = 0 if nat[1] - null[i] < 11.0 else (
                1 if nat[2] - nat[1] < 11.0 else 2)
            for n, fit in ((1, fits[0]), (2, fits[1])):
                bf_nat = next((s.get(f"bestfit{n}") for s in seeds
                               if s.get(f"bestfit{n}")), None)
                if bf_nat is None:
                    continue
                # require both engines to select >= this rung
                if int(nbest[i]) < n or nat_nbest < n:
                    continue
                bf = np.asarray(fit.products.bestfit_params)[i]
                sd = np.asarray(fit.products.std_params)[i]
                bf_nat = np.asarray(bf_nat, dtype=float)
                ok = sd > 1e-6  # skip constant (orth) rows
                map_dz.extend(
                    (np.abs(bf - bf_nat) / np.maximum(sd, 1e-6))[ok]
                    .tolist()
                )

    dz = np.asarray(dz)
    agree = np.mean([a == b for a, b in sel_pairs])
    out = {
        "native400_n_records": int(dz.size),
        "native400_dz_sigma_median": float(np.median(np.abs(dz))),
        "native400_dz_sigma_max": float(np.max(np.abs(dz))),
        "native400_seed_scatter_lnz1": round(s_model[1], 3),
        "native400_seed_scatter_lnz2": round(s_model[2], 3),
        "native400_nbest_agree_frac": float(agree),
        "native400_dz_frac_gt10": float(np.mean(np.abs(dz) > 10.0)),
        "native400_n_sel": len(sel_pairs),
        "native400_dz21_median": float(np.median(dz21)),
    }
    if map_dz:
        out["map_dz_n"] = len(map_dz)
        out["map_dz_median"] = float(np.median(map_dz))
        out["map_dz_p90"] = float(np.quantile(map_dz, 0.9))
        log(f"bench: MAP-parameter agreement: n={len(map_dz)} params, "
            f"|dtheta|/sigma_post median {out['map_dz_median']:.3f} "
            f"p90 {out['map_dz_p90']:.2f}")
    log(f"bench: native nlive=400 truth: n={dz.size} records, "
        f"|dz|/sigma median {out['native400_dz_sigma_median']:.2f} "
        f"max {out['native400_dz_sigma_max']:.2f}; "
        f"nbest agreement {agree:.2f} on {len(sel_pairs)} px "
        f"(median d(lnZ2-lnZ1) {out['native400_dz21_median']:+.2f})")
    return out


def measure_cpu_baseline(xa11, d11, xa22, d22, noise, nlive, rung1, rung2,
                         n_sample=None):
    """Single-core sequential C++ ladder rate on a pixel sample,
    time-boxed to the remaining budget.  Also returns the per-pixel
    lnZ agreement records for the accuracy gate."""
    agree = []
    try:
        from nestfit_tpu import native
        from nestfit_tpu.priors import get_irdc_priors

        if not native.available():
            raise RuntimeError("native lib unavailable")
        if remaining() < 45:
            raise RuntimeError(
                f"budget too tight ({remaining():.0f}s left); the "
                "committed native-truth artifact carries the agreement "
                "gate")
        # SMOKE-sized by default (VERDICT r4 item 5): the committed
        # 96-record nlive=400 artifact (native_truth_comparison) is
        # the primary agreement gate -- its refresh policy is
        # documented in validation/compute_native_truth.py (regenerate
        # whenever the bench cube checksum or the prior spec changes;
        # the bench skips it automatically on checksum mismatch).  The
        # in-budget run only (a) measures the CPU rate for
        # vs_baseline and (b) smoke-checks the engine still agrees
        # live, so 3 pixels suffice and the budget goes to the timed
        # pass instead.
        n_sample = n_sample or int(os.environ.get("BENCH_CPU_PIXELS", "3"))
        box_s = min(float(os.environ.get("BENCH_CPU_BUDGET_S", "150")),
                    max(remaining() - 30, 30))
        utrans = get_irdc_priors(vsys=0.0)
        ppf1 = native.bindings.ppf_tables_from_utrans(utrans, 1)
        ppf2 = native.bindings.ppf_tables_from_utrans(utrans, 2)
        # joint resolved-placement spec: without it the per-dim tables
        # drop the minimum-separation constraint and the engine
        # integrates a different, wider prior for ncomp >= 2
        plc = native.bindings.placement_spec_from_utrans(utrans)
        t0 = time.perf_counter()
        done = 0
        for i in range(n_sample):
            spec_data = [
                (xa11, d11[i], noise, 1), (xa22, d22[i], noise, 2),
            ]
            # every native run is wall-boxed so a single stalled run
            # can never eat the whole budget (a truncated run returns
            # a lower-bound lnZ and is excluded from rate + agreement)
            wall_left = min(box_s - (time.perf_counter() - t0),
                            remaining() - 25)
            if wall_left <= 5:
                break
            res1 = native.ns_spectral_ammonia(
                spec_data, ppf1, ncomp=1, nlive=nlive, tol=1.0, seed=i,
                placement=plc, max_wall_s=wall_left,
            )
            wall_left = min(box_s - (time.perf_counter() - t0),
                            remaining() - 25)
            res2 = None
            if not res1["truncated"] and wall_left > 5:
                res2 = native.ns_spectral_ammonia(
                    spec_data, ppf2, ncomp=2, nlive=nlive, tol=1.0,
                    seed=i, placement=plc, max_wall_s=wall_left,
                )
            if res2 is None or res2["truncated"]:
                log(f"bench: CPU baseline pixel {i} truncated by the "
                    "wall box; dropped")
                break
            done += 1
            for res, (lnz, lnz_err) in ((res1, rung1), (res2, rung2)):
                sig = max(
                    float(np.hypot(res["lnz_err"], lnz_err[i])), 0.3
                )
                agree.append({
                    "pixel": i,
                    "dz_sigma": (float(lnz[i]) - res["lnz"]) / sig,
                })
            if time.perf_counter() - t0 > box_s:
                break
        dt = time.perf_counter() - t0
        if done == 0:
            raise RuntimeError("no baseline pixel finished in budget")
        return done / dt, agree
    except Exception as exc:  # pragma: no cover
        log(f"bench: CPU baseline unavailable ({exc}); using fallback")
        return CPU_FITS_PER_SEC_FALLBACK, agree


if __name__ == "__main__":
    # hard deadline: emit the best-known partial JSON BEFORE the
    # driver's external timeout can SIGKILL us (the r3 run was lost to
    # rc=124 with no JSON).  SIGALRM's Python handler is deferred while
    # a C call holds the main thread, so the native baseline runs are
    # additionally wall-boxed inside C (ns_run max_wall_s) to return
    # control in time.
    import faulthandler
    import signal

    # stack dumps for wedge diagnosis: if any phase hangs past the
    # deadline the thread stacks land in stderr alongside the partial
    # JSON (the deadline handler still wins -- it os._exit()s first)
    faulthandler.enable()
    lead = float(os.environ.get("BENCH_DEADLINE_LEAD_S", "45"))
    faulthandler.dump_traceback_later(
        max(BUDGET_S - lead - 10, 20), exit=False)
    signal.signal(signal.SIGALRM, _deadline_emit)
    signal.alarm(int(max(BUDGET_S - lead, 30)))
    try:
        result = main()
    except Exception as exc:  # always emit the JSON line
        log(f"bench: FAILED: {exc!r}")
        import traceback

        traceback.print_exc(file=sys.stderr)
        result = dict(RESULT)
        result["error"] = repr(exc)
        if "gates" not in result:
            result["value"] = 0.0
    signal.alarm(0)
    print(json.dumps(result))
    # abandoned precompile threads (aot.compile_plan timeout) are
    # non-daemon and would block normal interpreter exit on the
    # concurrent.futures atexit join -- the JSON is out, leave now
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
