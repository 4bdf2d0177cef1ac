"""Vectorized batched-kill nested sampler.

TPU-native replacement for the external MultiNest Fortran library the
reference links against (reference: core/cmultinest.pxd:4-33,
core/core.pyx:727-823).  Instead of one sequential sampler per pixel
driven by callbacks, a *batch* of R independent nested-sampling runs
(one per pixel) advances in lockstep on device.

The sampler uses **batched deletion**: each fill-cycle removes the
``kill_k`` worst live points of a run at once and replaces all of them
with draws above the frozen threshold ``L_(k)`` (the k-th smallest
live likelihood).  This is the standard vectorized-NS formulation:
with all replacements constrained above ``L_(k)``, removing the k
worst is a single valid NS compression step, and the per-death prior
volumes follow the order statistics of uniforms -- death j (0-based
rank within its batch) compresses ``ln X`` by ``1/(nlive - j)``
exactly, which the implementation bakes into static weight tables.
For ``kill_k=1`` this reduces to classic single-kill NS with
``X_i = exp(-i/nlive)``.

Why batched deletion on TPU: one fill-cycle needs ~``kill_k`` accepted
proposals, so candidates are drawn and evaluated as one large
``[T, R, ndim]`` batch per iteration -- a single fused
transform+predict+chi2 launch that keeps the MXU busy -- instead of
many tiny sequential proposal rounds.  Replacement draws come from a
bounding-ellipsoid rejection proposal (mean/cov of the live set,
radius set by the max Mahalanobis distance times ``ell_fudge``); runs
that stall (pathological contour shapes) fall back to whitened
random-direction slice sampling with stepping-out/shrinkage, which is
correct for any contour.

Per-run termination follows the remaining-evidence criterion
``logaddexp(lnZ, lnX + max lnL_live) - lnZ < tol`` (the role of
MultiNest's ``tol``, core.pyx:752-753); finished runs freeze via
masking.  The host-driven segmented mode additionally *compacts*
stragglers: when most runs in the batch have finished, the unfinished
rows are gathered into a smaller power-of-two batch so the tail does
not pay full-batch compute (the lockstep analogue of MultiNest runs
simply ending at different times).

Numerics: log-likelihoods are shifted per run by the initial live-point
maximum so float32 ``logaddexp`` accumulation keeps ~1e-5 absolute
accuracy regardless of the raw lnL magnitude; the shift cancels in the
information integral H and is added back to the returned lnZ.

Execution is split into ``ns_init`` / ``ns_segment`` / ``ns_finalize``
pure functions.  ``run_nested`` composes them either as one traced
computation (jittable; used by tests and the multi-chip dry run) or as
a host-driven loop of bounded device segments (``segment_iters > 0``);
the segmented mode keeps each device dispatch short -- essential for
remote-tunneled TPU workers with RPC deadlines -- and enables compile
reuse across pixel batches because the spectra enter as traced
arguments (``data``) rather than closure constants.

The likelihood callable is either ``loglike(u: f32[..., R, ndim]) ->
f32[..., R]`` (data baked in) or ``loglike(u, data)`` with a ``data``
pytree passed to ``run_nested``; it must be pure JAX and broadcast over
extra leading batch axes (the sampler batches initial live points and
proposal candidates that way).
"""

import dataclasses
import math
from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, random


_NEG = -1e30  # sentinel for log-zero; avoids inf-inf NaNs in f32

import os as _os
_NS_DEBUG = bool(_os.environ.get("NESTFIT_NS_DEBUG"))


@dataclasses.dataclass(frozen=True)
class NSConfig:
    """Nested sampling knobs.

    Maps onto the MultiNest knob set the reference exposes
    (core.pyx:727-776): ``nlive`` and ``tol`` are the same quantities;
    ``efr`` maps to the same volume-enlargement semantics (see below)
    and proposal aggressiveness is otherwise governed by
    ``ell_fudge``/``cand_factor``.  ``kill_k`` is the batched-deletion
    width (no MultiNest analogue; it trades iteration count for
    per-iteration batch size on the MXU).
    """

    nlive: int = 100
    tol: float = 1.0              # remaining-evidence termination (dlogz)
    max_iter: int = 0             # max deaths per run; 0 -> auto: 120 * nlive
    method: str = "auto"          # "auto" (host-adaptive candidate ->
    #                               kill+slice regime switch in
    #                               segmented mode; identical to
    #                               "ellipsoid" when traced),
    #                               "ellipsoid" (candidate blocks +
    #                               slice rescue), or "slice"
    #                               (kill_k=1 slice chains only)
    kill_k: int = 0               # points killed per fill-cycle; 0 -> auto
    cand_factor: int = 2          # proposal candidates per kill slot
    n_clusters: int = 3           # bounding ellipsoids per run (mmodal)
    km_iters: int = 4             # Lloyd iterations for the clustering
    km_refine: int = 3            # Mahalanobis-reassignment rounds
    #                               after k-means: fit each cluster's
    #                               bounding ellipsoid, then reassign
    #                               every point to the cluster whose
    #                               boundary it is deepest inside
    #                               (argmin d^2/rmax^2) and refit --
    #                               the MultiNest ellipsoid-set
    #                               refinement (Feroz & Hobson 2008
    #                               sec. 5.2; reference core.pyx:
    #                               746-747 links it as mmodal).
    #                               k-means cells cut a curved contour
    #                               across its short axes; this step
    #                               lets elongated ellipsoids claim
    #                               the points they already cover,
    #                               which is what actually shrinks the
    #                               union volume and keeps candidate
    #                               acceptance (and with it the
    #                               unbiased independent-insert
    #                               regime) alive at high D
    cluster_vol_frac: float = 0.7  # use clusters only if their total
    #                                volume beats this fraction of the
    #                                single ellipsoid's (coverage guard)
    cube_redraws: int = 4         # cheap redraw rounds for candidates
    #                               that land outside the unit cube
    bound_every: int = 4          # iterations between bounding-geometry
    #                               recomputes (clustering + Cholesky +
    #                               radii); the live set turns over by
    #                               kill_k/nlive per iteration, so mild
    #                               staleness costs only proposal
    #                               acceptance, never correctness
    #                               (candidates are filtered by the
    #                               *current* threshold)
    flat_dims: tuple = ()         # likelihood-flat unit-cube dims
    #                               (e.g. ConstantPrior rows): excluded
    #                               from the bounding geometry, sampled
    #                               uniformly
    pwrap_dims: tuple = ()        # periodic unit-cube dims (MultiNest
    #                               pWrap, reference core.pyx:761-763):
    #                               slice chains walk the universal
    #                               cover (no cube walls) and wrap at
    #                               likelihood eval / live-set insert;
    #                               candidate draws wrap into the cube
    #                               with minimal-image overlap tests.
    #                               The bounding covariance itself is
    #                               NOT circular, so mass split across
    #                               the seam costs proposal efficiency,
    #                               never correctness (as in MultiNest)
    block_iters: int = 8          # candidate iterations between
    #                               slice-fill passes
    cand_min_acc: float = 0.0     # candidate-acceptance EMA below which
    #                               the segmented "auto" method retires
    #                               the candidate program and switches
    #                               (one-way) to the kill+slice
    #                               program.  0 (default) -> margin /
    #                               (fallback_repeats * 2.6 + 0.6),
    #                               the break-even with the slice
    #                               chain's measured cost (NH3 cube:
    #                               2.6 consumed evals per slice step
    #                               + ~0.6 overhead/death) scaled by
    #                               a repeats-dependent margin set in
    #                               run_nested: 1.0 at
    #                               fallback_repeats <= 3 (0.119 at
    #                               D=6) and 0.6 at deeper repeats
    #                               (0.053 at D=12).  Candidate
    #                               inserts are INDEPENDENT draws (no
    #                               slice correlation bias), so at
    #                               high D they are kept up to ~1.7x
    #                               the slice cost: on contours whose
    #                               union acceptance genuinely
    #                               collapses (NH3 placement priors,
    #                               ~0.005) any threshold fires the
    #                               rescue early, while on
    #                               well-conditioned contours whose
    #                               EMA only sags through break-even
    #                               in the evidence-bulk tail
    #                               (analytic D=12 Gaussian) the
    #                               margin keeps the unbiased regime
    #                               alive -- switching there at exact
    #                               break-even tripled the
    #                               default-path lnZ bias pin for
    #                               zero eval saving.  At shallow
    #                               repeats the exact threshold is
    #                               measured safe (see run_nested).
    switch_iters: int = 16        # candidate-phase segment length in
    #                               "auto" mode: the host re-checks the
    #                               acceptance EMA every this many
    #                               iterations (bounds the evals wasted
    #                               in a collapsed candidate regime to
    #                               switch_iters * n_cand per run)
    switch_back: bool = True      # two-way regime switch: while in the
    #                               kill+slice regime, periodically
    #                               rebuild the full multi-ellipsoid
    #                               bound (ZERO likelihood evals) and
    #                               ESTIMATE the would-be candidate
    #                               acceptance as X / V_union -- both
    #                               factors are already known (X from
    #                               the order-statistic compression
    #                               table at each run's death count, V
    #                               from the rebuilt union's ellipsoid
    #                               volumes; see ns_rebuild_bounds).
    #                               When the active-run mean clears
    #                               switch_back_margin * the break-even
    #                               threshold, return to the candidate
    #                               program: post-bulk contours are
    #                               compact and ellipsoid-friendly
    #                               again, where rejection pays ~1/acc
    #                               evals per death vs the slice
    #                               chains' ~2.6*repeats + 0.6
    #                               regardless of contour quality.
    #                               Candidate inserts are independent
    #                               draws, so switching back can only
    #                               REDUCE the correlated-insert lnZ
    #                               bias, never add to it.
    switch_back_margin: float = 1.3  # hysteresis on the estimate: the
    #                               probe must predict acceptance this
    #                               factor above the away-switch
    #                               threshold before a switch-back is
    #                               attempted (the estimate assumes the
    #                               union covers the contour exactly;
    #                               under-coverage makes the realized
    #                               EMA land below the prediction)
    switch_back_every: int = 64   # slice iterations between acceptance
    #                               estimates (each costs one bound
    #                               rebuild -- k-means + Cholesky on
    #                               the [R, nlive, D] live set, no
    #                               likelihood evaluations); 0 disables
    #                               the probes
    slice_bound_every: int = 1    # iterations between whitening-geometry
    #                               (_slim_bounds) refreshes in the
    #                               kill+slice regime.  1 = refresh
    #                               every iteration (the measured-safe
    #                               default).  Measured r5 at R=1024:
    #                               cadence 2 moved the ladder wall by
    #                               0.0 s -- the per-iteration cost is
    #                               likelihood launches, not the
    #                               Cholesky -- so the default stays 1;
    #                               the knob exists for regimes where
    #                               the balance differs (tiny R, huge
    #                               D).  Staleness degrades chain
    #                               mixing (see the refresh site), so
    #                               any cadence > 1 must re-verify the
    #                               D=12 lnZ bias pins
    stall_limit: int = 64         # consecutive zero-fill iterations
    #                               after which a run is abandoned
    #                               (marked done, not converged).
    #                               Without this, a run whose pending
    #                               slots cannot be filled (e.g. the
    #                               f32-saturated threshold leaves no
    #                               exceedable region) never records
    #                               deaths, so neither the tol nor the
    #                               max_iter death cap fires and the
    #                               whole batch grinds to the
    #                               iteration cap -- minutes of tail
    #                               for one stuck run
    n_repeats: int = 0            # slice steps per replacement for
    #                               method="slice"; 0 -> 2*ndim
    max_contract: int = 6         # shrinkage proposals per slice step.
    #                               The analytic bracket starts at the
    #                               bounding-ellipsoid chord (~10
    #                               whitened units), so typical chains
    #                               accept after 3-4 proposals; lanes
    #                               that exhaust the budget keep their
    #                               current point (a rare, valid
    #                               rejection -- mixing loss only).
    #                               Measured at D=12 forced-slice:
    #                               6 vs 8 leaves bias and evals/death
    #                               unchanged while cutting one
    #                               lockstep device round (proposals
    #                               are evaluated in speculative
    #                               pairs)
    spec_width: int = 2           # speculative proposals per likelihood
    #                               launch in the shrinkage loop.  The
    #                               bracket of proposal k depends only
    #                               on the VALUES and SIGNS of
    #                               proposals 1..k-1 (all drawn before
    #                               any likelihood is known), so a
    #                               whole chain prefix can be drawn
    #                               up-front and evaluated in ONE
    #                               launch; sequential first-accept
    #                               semantics are reproduced exactly
    #                               and later proposals count as
    #                               consumed only where every earlier
    #                               one rejected.  Width 3 cuts the
    #                               hottest loop's launch count by a
    #                               third vs pairs (2 rounds instead
    #                               of 3 at max_contract=6) at more
    #                               padding compute; measured r5 on an
    #                               idle (compute-bound) worker the
    #                               trade is a wash, so the default
    #                               stays 2 -- width 3 is for setups
    #                               where per-launch overhead owns the
    #                               wall (tiny R, high-latency
    #                               dispatch).
    cov_reg: float = 1e-10        # covariance diagonal regularizer
    ell_fudge: float = 1.05       # ellipsoid enlargement over max
    #                               Mahalanobis radius.  The radius
    #                               already covers the zombie shell
    #                               (outside the contour), so the
    #                               margin's role is small; 1.1 cost
    #                               (1.1/1.05)^12 ~ 1.75x candidate
    #                               acceptance at D=12 for no measured
    #                               accuracy gain
    efr: float = 0.0              # MultiNest sampling-efficiency knob
    #                               (core.pyx:748-751): > 0 enlarges
    #                               every bounding ellipsoid's VOLUME
    #                               by 1/efr (radius by
    #                               (1/efr)^(1/d)), on top of
    #                               ell_fudge; 0 -> disabled.  Values
    #                               > 1 are clamped to no-op (the
    #                               multiplier is max(1, .) so efr can
    #                               only enlarge, never truncate the
    #                               bound -- reference asserts
    #                               0 < efr <= 1, core.pyx:750)
    ceff: bool = False            # MultiNest constant-efficiency mode
    #                               (core.pyx:748-749): adapt each
    #                               run's ellipsoid VOLUME so candidate
    #                               acceptance tracks the ``efr``
    #                               target (default 0.3 when efr=0),
    #                               shrinking the proposal below the
    #                               live-point cover when needed.  As
    #                               in MultiNest this trades evidence
    #                               reliability for speed (the shrunk
    #                               proposal can truncate the contour,
    #                               biasing lnZ high): parameter
    #                               estimation only, keep off for
    #                               model selection.  Volume shrink is
    #                               floored at e^-6 and the auto
    #                               regime switch is disabled (ceff
    #                               keeps rejection sampling alive by
    #                               construction)
    dir_mode: str = "diff"        # slice direction set: "gauss"
    #                               (isotropic whitened), "diff"
    #                               (random survivor differences --
    #                               stretch-move style, adapts to
    #                               contour curvature), or "mix"
    #                               (alternate diff/gauss).  See
    #                               _slice_chains.  Default "diff",
    #                               measured on the NH3 bench cube
    #                               (validation/mode_loss_probe.py,
    #                               1024 px x 2 seeds): survivor
    #                               differences cut consumed evals 16%
    #                               (50.7k -> 42.9k/px) AND cut
    #                               nested-model floor violations 40%
    #                               (63/45 -> 33/38 per 1024 rung-2
    #                               runs) vs "mix" -- cross-mode
    #                               difference vectors let chains
    #                               re-seed a thinning mode, which
    #                               isotropic directions almost never
    #                               do at D=12.  Analytic-Gaussian lnZ
    #                               bias is unchanged (+0.40 both,
    #                               lower run-to-run sd); deeper
    #                               repeats shifted to "diff" keep the
    #                               same ceiling (+1.7 vs +1.6 forced).
    #                               repeats=3 with "diff" was measured
    #                               UNSAFE (bias +1.9, viol2 66/62) --
    #                               do not trade the saving for
    #                               shallower chains.
    fallback_repeats: int = 0     # slice steps per chain in the fill
    #                               passes; 0 -> ~ndim//3, floor 3
    #                               (see resolved()).
    #                               The residual lnZ bias of the
    #                               batched fills is ~5.3/repeats nats
    #                               at D=12 when EVERY insert is a
    #                               slice fill (measured, analytic
    #                               Gaussian; candidate-phase
    #                               independent inserts dilute it in
    #                               practice) -- pinned by
    #                               test_slice_fill_bias tests; see
    #                               docs/limitations.md
    log_zero: float = -1e90       # MultiNest logZero (reference
    #                               core.pyx:764-766): likelihoods at
    #                               or below this value mark excluded
    #                               regions -- they are floored to the
    #                               sampler's log-zero sentinel so no
    #                               such point can ever be accepted or
    #                               contribute evidence.  The default
    #                               (like MultiNest's -1e90) is below
    #                               any representable f32 likelihood,
    #                               i.e. disabled, and adds no op to
    #                               the traced program.  Caveat
    #                               (shared with MultiNest): the
    #                               floored region is a likelihood
    #                               plateau, and plateau deaths bias
    #                               lnZ high by ~ln(e^{-f}/f_above)
    #                               when the floor excludes a prior
    #                               fraction f (Fowlie+2020); see
    #                               test_log_zero_floor for the exact
    #                               model
    init_factor: int = 1          # oversampled-init multiplier: draw
    #                               init_factor * nlive initial points,
    #                               keep the best nlive as the live set
    #                               and record the worst
    #                               (init_factor-1) * nlive as REAL
    #                               deaths of a decreasing-live-count
    #                               phase (denominators L0, L0-1, ...,
    #                               nlive+1) -- standard variable-nlive
    #                               nested sampling, exact order
    #                               statistics, zero bias.  This is the
    #                               root fix for mode loss: a narrow
    #                               signal basin of prior fraction f is
    #                               born empty in (1-f)^L0 of runs
    #                               instead of (1-f)^nlive, while the
    #                               kill-down phase only compresses
    #                               lnX by ln(init_factor) and costs
    #                               (init_factor-1)*nlive extra
    #                               likelihood evals per run (~1% of a
    #                               rung-2 fit at 4x) with NO extra
    #                               iterations -- the init deaths are
    #                               recorded in one shot.  (The role of
    #                               MultiNest's per-pixel nlive boost,
    #                               reference main.py:444-447, without
    #                               paying the 4x run length.)
    init_stratified: bool = True  # Latin-hypercube initial live set:
    #                               per (run, dim) the L draws hit
    #                               every 1/L quantile bin exactly once
    #                               (random in-bin offsets, independent
    #                               random permutations per column).
    #                               Marginals stay exactly uniform, so
    #                               prior sampling is unchanged; the
    #                               within-column negative dependence
    #                               only guarantees coverage.  This
    #                               attacks mode loss at its root: with
    #                               iid init draws a narrow signal
    #                               basin (e.g. the ~1% vcen window of
    #                               an NH3 line) is born empty in
    #                               (1-f)^L of runs, and once the cube
    #                               start-up phase ends nothing can
    #                               rediscover it -- the dominant
    #                               failure behind the nested-model
    #                               floor violations the fitter
    #                               re-fits (fitter.py mode-loss
    #                               retries; VERDICT r3 item 3).
    init_chunk: int = 32          # live-point chunk for the init evals
    min_compact: int = 64         # smallest compacted batch (segmented
    #                               mode).  Compaction jumps to the
    #                               smallest power-of-two class
    #                               >= max(n_active, min_compact) and
    #                               only when that shrinks the batch
    #                               >= 4x: each size class is a fresh
    #                               XLA compile of the segment program
    #                               (30-90 s through remote-tunneled
    #                               TPU workers, amortized by the
    #                               persistent compile cache), so a
    #                               4x jump (1024 -> 256 -> 64 in
    #                               practice) beats a halving ladder

    def resolved(self, ndim: int) -> "NSConfig":
        # the auto death budget grows by the init kill-down's deaths so
        # oversampled init never eats into the main-phase budget
        max_iter = self.max_iter if self.max_iter > 0 \
            else 120 * self.nlive + self.n_init_dead()
        n_repeats = self.n_repeats if self.n_repeats > 0 else 2 * ndim
        # decorrelation depth of the slice fills: ~ndim/3 whitened
        # repeats per insert, floored at 3 (and never above ndim/2,
        # which keeps very low dimensions at their old depth).  The
        # depth was set empirically on the NH3 bench cube (D=12,
        # slice-dominated): repeats=4 is statistically
        # indistinguishable from repeats=6 run-to-run (median lnZ
        # shift -0.35 nat, inside pure-RNG scatter) at 2/3 the eval
        # cost, while repeats=3 crosses into measurable mass loss
        # (median -0.7 nat, fatter mode-loss tail).  The forced
        # all-slice ceiling is ~5.3/repeats nats biased HIGH (see
        # docs/limitations.md); both regimes are pinned by the
        # test_slice_fill_bias tests.
        if self.fallback_repeats > 0:
            fallback = self.fallback_repeats
        else:
            fallback = max(2, min(ndim // 2, max(3, ndim // 3)))
            # repeats=3 was only measured safe at D=6; at D=12 it
            # crosses into real mass loss, and its safety at D=8-11
            # was never measured -- floor those dimensions at 4 (the
            # measured-safe depth at D=12) rather than assert it
            if ndim >= 8:
                fallback = max(fallback, 4)
        if self.method == "slice":
            kill_k = 1
        elif self.kill_k > 0:
            kill_k = min(self.kill_k, self.nlive // 2)
        else:
            # Dimension-aware batched-deletion width (r5 measurement,
            # analytic D=6/D=12 Gaussians, f64, default path):
            #   D=6:  kill_k = nlive/2 bias +0.12 == nlive/4 -- SAFE
            #         (low-D runs are candidate-dominated; independent
            #         inserts carry no batch-width bias), and the NH3
            #         D=6 rung's wall falls 23% (14.5 -> 11.1 s at
            #         R=1024) from the halved iteration count;
            #   D=12: the slice-regime correlated-insert bias CLIFFS
            #         when the chain count approaches half the
            #         survivor count -- kill_k 25/32/33/40/50 of
            #         nlive=100 measured +0.26/+0.26/+0.84/+1.02/+1.48
            #         nats (chains/survivors 0.33/0.47/0.49/0.67/1.0):
            #         every fill-cycle then rebuilds the threshold
            #         shell from endpoints correlated to the same
            #         survivor set and the candidate-phase dilution
            #         stops.  The razor edge near 0.47-0.49 makes
            #         nlive/3 too dangerous to sit at; high-D keeps
            #         the measured-safe quarter width (and the NH3
            #         D=12 rung gains under 5% from wider batches
            #         anyway -- it is compute-bound, not
            #         iteration-bound, on an idle worker).
            frac = 2 if ndim <= 6 else 4
            kill_k = max(1, self.nlive // frac)
        return dataclasses.replace(
            self, max_iter=max_iter, n_repeats=n_repeats, kill_k=kill_k,
            fallback_repeats=fallback,
        )

    def n_cand(self) -> int:
        """Proposal candidates per iteration (requires resolved cfg)."""
        return max(1, self.cand_factor * self.kill_k)

    def n_init_dead(self) -> int:
        """Deaths recorded by the oversampled-init kill-down phase."""
        return max(0, (self.init_factor - 1) * self.nlive)


def _weight_tables(nlive: int, kill_k: int, max_iter: int,
                   n_init_dead: int = 0):
    """Static per-death compression tables.

    With ``n_init_dead > 0`` the first ``n_init_dead`` deaths belong to
    the oversampled-init kill-down phase (``NSConfig.init_factor``):
    death ``j`` there is the single worst of ``L0 - j`` live points
    (``L0 = nlive + n_init_dead``), compressing ``ln X`` by
    ``1/(L0 - j)`` -- standard decreasing-live-count nested sampling.
    Every later death ``t`` has within-batch rank
    ``(t - n_init_dead) % kill_k`` and compresses by
    ``d(t) = 1/(nlive - rank)`` (order statistics of the k-th worst of
    ``nlive`` uniform prior-volume draws).  Returns
    ``LNX[max_iter + 1]`` (ln volume after t deaths) and
    ``LNW[max_iter]`` (ln of the volume element assigned to death t:
    ``ln(X_t - X_{t+1})``).
    """
    n_init_dead = min(n_init_dead, max_iter)
    L0 = nlive + n_init_dead
    d_init = 1.0 / (L0 - np.arange(n_init_dead))
    n_main = max_iter - n_init_dead
    d_main = 1.0 / (nlive - (np.arange(n_main) % kill_k))
    d = np.concatenate([d_init, d_main])
    lnx = np.concatenate([[0.0], -np.cumsum(d)])
    lnw = lnx[:-1] + np.log1p(-np.exp(-d))
    return lnx, lnw


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "key", "u", "lnl", "lnl_shift", "lnz", "done", "converged",
        "n_deaths", "pending", "thresh", "zombie", "stall", "ncall",
        "dead_u", "dead_lnl", "i", "bounds", "acc_ema", "ceff_mult",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _State:
    key: jax.Array        # PRNG key (shared; draws are batched over R)
    u: jax.Array          # [R, L, D] live points (unit cube)
    lnl: jax.Array        # [R, L] shifted ln-likelihoods
    lnl_shift: jax.Array  # [R] per-run shift (initial live max)
    lnz: jax.Array        # [R] shifted accumulated evidence
    done: jax.Array       # [R] bool
    converged: jax.Array  # [R] bool (terminated by tol, not max_iter)
    n_deaths: jax.Array   # [R] deaths recorded so far
    pending: jax.Array    # [R] kill slots awaiting replacement
    thresh: jax.Array     # [R] frozen acceptance threshold (shifted)
    zombie: jax.Array     # [R, L] slots holding recorded-dead points
    stall: jax.Array      # [R] consecutive zero-progress iterations
    ncall: jax.Array      # [R] likelihood evaluations
    dead_u: jax.Array     # [R, max_iter, D]
    dead_lnl: jax.Array   # [R, max_iter]
    i: jax.Array          # scalar iteration counter
    bounds: tuple         # cached bounding geometry (_compute_bounds)
    acc_ema: jax.Array    # scalar EMA of candidate fills-per-proposal
    ceff_mult: jax.Array  # [R] ceff-mode ellipsoid volume multiplier
    #                       (stays 1 unless cfg.ceff)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "lnz", "lnz_err", "h", "lnl_shift", "n_dead", "ncall", "converged",
        "dead_u", "dead_lnl", "dead_lnw", "live_u", "live_lnl", "live_lnw",
        "max_loglike",
    ],
    meta_fields=["nlive", "ndim", "max_iter"],
)
@dataclasses.dataclass(frozen=True)
class NSResult:
    """Raw output of a batch of nested sampling runs.

    All log-likelihood arrays are *unshifted* (absolute).  Weights
    ``dead_lnw``/``live_lnw`` are log prior-mass widths (``lnw_k +
    lnL_k`` is the contribution to Z); entries beyond ``n_dead`` are
    masked to ``-1e30``.
    """

    lnz: jax.Array         # [R] ln evidence
    lnz_err: jax.Array     # [R] ln evidence error estimate sqrt(H/nlive)
    h: jax.Array           # [R] information (nats)
    lnl_shift: jax.Array   # [R]
    n_dead: jax.Array      # [R]
    ncall: jax.Array       # [R]
    converged: jax.Array   # [R]
    dead_u: jax.Array      # [R, max_iter, D]
    dead_lnl: jax.Array    # [R, max_iter]
    dead_lnw: jax.Array    # [R, max_iter] ln prior-mass weights
    live_u: jax.Array      # [R, L, D]
    live_lnl: jax.Array    # [R, L]
    live_lnw: jax.Array    # [R, L]
    max_loglike: jax.Array  # [R]
    nlive: int
    ndim: int
    max_iter: int

    @property
    def n_samples(self):
        return self.n_dead + self.nlive


def _wrap_vec(cfg: NSConfig, ndim: int):
    """[D] bool mask of periodic dims, or None when ``cfg.pwrap_dims``
    is empty (so the default path stays branch-free)."""
    if not cfg.pwrap_dims:
        return None
    m = np.zeros((ndim,), dtype=bool)
    m[np.asarray(cfg.pwrap_dims, dtype=np.int64)] = True
    return jnp.asarray(m)


def _wrap_pts(x, wrap):
    """Wrap periodic dims of cube points into [0, 1)."""
    if wrap is None:
        return x
    return jnp.where(wrap, x - jnp.floor(x), x)


def _recenter(u, wrap):
    """Express periodic dims of the live matrix ``u`` [R, L, D] in
    universal-cover coordinates around the per-run circular mean.

    Seam-split clouds (mass near both 0 and 1) become a single compact
    cloud in these coordinates, so the bounding covariance, whitening
    Cholesky, and ellipsoid-candidate draws all see the minimal image
    -- the analogue of MultiNest's pWrap handling (reference
    core.pyx:761-763).  Non-periodic dims pass through unchanged.
    """
    if wrap is None:
        return u
    two_pi = 2.0 * np.pi
    ang = u * two_pi
    theta = jnp.arctan2(
        jnp.mean(jnp.sin(ang), axis=1), jnp.mean(jnp.cos(ang), axis=1)
    ) / two_pi                                           # [R, D]
    d = u - theta[:, None, :]
    d = d - jnp.round(d)                                 # [-0.5, 0.5)
    return jnp.where(wrap, theta[:, None, :] + d, u)


def _line_bracket(x, dirv, z, nvec, rmax, wrap=None):
    """Analytic slice bracket: the t-interval of the line ``x + t *
    dirv`` inside both the global bounding ellipsoid (whitened coords
    ``z + t * nvec``, radius ``rmax``) and the unit cube.

    Replaces Neal stepping-out: the bounding ellipsoid already covers
    the whole constrained region (it covers every live and
    threshold-shell point, times ``ell_fudge``), so its chord is a
    bracket that needs zero likelihood evaluations to establish.  The
    interval depends only on the *line* -- not on where the current
    point sits along it -- so shrinkage from it is reversible
    (Neal 2003 sec. 4; the PolyChord bracket strategy).  t = 0 (the
    current point) is always inside.

    x : [..., D] cube coords; dirv : [..., D] cube-space direction
    (flat dims zero); z : [..., D] whitened coords of ``x``; nvec :
    [..., D] whitened direction (flat dims zero); rmax broadcastable
    to [...].
    """
    dtype = x.dtype
    big = jnp.asarray(1e30, dtype)
    a = jnp.sum(nvec**2, axis=-1)
    b = 2.0 * jnp.sum(z * nvec, axis=-1)
    c = jnp.sum(z**2, axis=-1) - rmax**2
    disc = jnp.sqrt(jnp.maximum(b * b - 4.0 * a * c, 0.0))
    a2 = jnp.maximum(2.0 * a, jnp.asarray(1e-30, dtype))
    te_lo = (-b - disc) / a2
    te_hi = (-b + disc) / a2
    eps = jnp.asarray(1e-12, dtype)
    pos = dirv > eps
    neg = dirv < -eps
    safe = jnp.where(pos | neg, dirv, 1.0)
    t_hi_d = jnp.where(pos, (1.0 - x) / safe,
                       jnp.where(neg, (0.0 - x) / safe, big))
    t_lo_d = jnp.where(neg, (1.0 - x) / safe,
                       jnp.where(pos, (0.0 - x) / safe, -big))
    if wrap is not None:
        # periodic dims have no cube walls: the chain walks the
        # universal cover and wraps at evaluation
        t_hi_d = jnp.where(wrap, big, t_hi_d)
        t_lo_d = jnp.where(wrap, -big, t_lo_d)
    t_lo = jnp.maximum(te_lo, jnp.max(t_lo_d, axis=-1))
    t_hi = jnp.minimum(te_hi, jnp.min(t_hi_d, axis=-1))
    return jnp.minimum(t_lo, 0.0), jnp.maximum(t_hi, 0.0)


def _shrink_slice(loglike2, data, shift, key, x0, lnl0, dirv, t_lo0,
                  t_hi0, lnl_star, done, cfg, wrap=None):
    """Shrinkage-only slice step from an analytic bracket.

    One likelihood trace (the compile-time hot spot: the old
    stepping-out variant traced the model three times per step).
    x0/lnl0: current chain point [..., D]/[...] (satisfies lnl0 >
    lnl_star); arbitrary leading batch dims.  Returns ``(x, lnl,
    t_acc, acc, ncall)`` where ``t_acc`` is the accepted step length
    (0 where rejected) so callers can update whitened coordinates
    incrementally.  With ``wrap`` set, periodic dims are stored in
    universal-cover coordinates (consistent with the whitened-coord
    bookkeeping) and wrapped into the cube only for the likelihood
    evaluation.

    **Speculative shrinkage**: each loop round evaluates
    ``cfg.spec_width`` sequential shrinkage proposals in one batched
    likelihood launch.  Proposal w's bracket is the bracket after
    rejecting proposals 0..w-1, which depends only on their VALUES
    (drawn before any likelihood is known): each rejection shrinks the
    side its sign selects.  If an earlier proposal accepts, the later
    evaluations are discarded padding (device work, never counted as
    consumed calls); otherwise the group reproduces the exact
    sequential shrinkage chain.  This divides the number of likelihood
    launches in the sampler's hottest loop by the width -- each launch
    is wide (chains x runs lanes) but launch/bookkeeping overhead per
    while_loop round dominated the slice regime's wall clock
    (measured: the 6-repeat x 8-round regime was ~2/3 of rung-2 wall
    at R=1024).
    """
    dtype = x0.dtype
    W = max(1, min(cfg.spec_width, cfg.max_contract))
    n_rounds = (cfg.max_contract + W - 1) // W
    # budgets not divisible by W: trailing speculative proposals would
    # exceed max_contract; they are masked per proposal so the
    # consumed-call budget is exact
    B = cfg.max_contract

    def pt(t):
        # the bracket is cube-intersected, so xp is in-cube up to
        # rounding; clip instead of penalizing
        xr = x0 + t[..., None] * dirv
        xp = jnp.clip(xr, 0.0, 1.0)
        if wrap is not None:
            xp = jnp.where(wrap, xr, xp)
        return xp

    def sh_cond(carry):
        j, _key, _t_lo, _t_hi, _x, _lnl, _t_acc, acc, _ncall = carry
        return (j < n_rounds) & jnp.any(~(acc | done))

    def sh_body(carry):
        j, key, t_lo, t_hi, x, lnl, t_acc, acc, ncall = carry
        keys = random.split(key, W + 1)
        key = keys[0]
        # draw the whole speculative chain prefix up-front: proposal
        # w's bracket is the bracket after rejecting proposals 0..w-1,
        # known from their values alone (no likelihood needed); the
        # sign of each rejected proposal decides which side shrinks
        tl, th = t_lo, t_hi
        ts, wbs = [], []
        for w in range(W):
            wb = (j * W + w) < B          # within the consumed budget
            t = tl + (th - tl) * random.uniform(
                keys[w + 1], lnl_star.shape, dtype=dtype
            )
            ts.append(t)
            wbs.append(wb)
            # out-of-budget proposals neither shrink nor evaluate
            tl = jnp.where(wb & (t < 0), t, tl)
            th = jnp.where(wb & (t >= 0), t, th)
        stack = jnp.concatenate([pt(t)[None] for t in ts], axis=0)
        lnlp = loglike2(
            _wrap_pts(stack, wrap).reshape((-1,) + x0.shape[1:]), data
        ).reshape((W,) + lnl_star.shape) - shift
        # sequential first-accept semantics; count only evaluations
        # the *algorithm* consumed: proposal w exists in the
        # sequential chain only where every earlier proposal of this
        # round rejected, and once a lane has accepted, further
        # lockstep rounds (the batch waits for its slowest lane) are
        # SIMD padding, not likelihood calls the sequential algorithm
        # would have made -- the reference's "~5k evals/fit"
        # (docs/overview.rst:7-11) counts calls in that per-run sense.
        live0 = ~(done | acc)
        taken = jnp.zeros_like(acc)
        for w in range(W):
            okw = (lnlp[w] > lnl_star) & wbs[w]
            new = okw & ~acc & ~taken
            x = jnp.where(new[..., None], pt(ts[w]), x)
            lnl = jnp.where(new, lnlp[w], lnl)
            t_acc = jnp.where(new, ts[w], t_acc)
            consumed = live0 & ~taken & wbs[w]
            ncall = ncall + jnp.where(consumed, 1, 0)
            taken = taken | new
        acc = acc | taken
        # every in-budget proposal rejected: the accumulated bracket
        # (tl, th) is the post-round bracket
        miss = ~acc
        t_lo = jnp.where(miss, tl, t_lo)
        t_hi = jnp.where(miss, th, t_hi)
        return j + 1, key, t_lo, t_hi, x, lnl, t_acc, acc, ncall

    acc0 = jnp.zeros_like(lnl_star, dtype=bool)
    zeros_t = jnp.zeros_like(lnl_star)
    _, _, _, _, x, lnl, t_acc, acc, ncall = lax.while_loop(
        sh_cond, sh_body,
        (jnp.int32(0), key, t_lo0, t_hi0, x0, lnl0, zeros_t, acc0,
         jnp.zeros_like(lnl_star, dtype=jnp.int32)),
    )
    return x, lnl, t_acc, acc, ncall


def _slice_chains(key, loglike2, data, shift, x, z, lnl_x, thr_b, dead_b,
                  chol, rmax, act, n_rep, cfg, u_all=None, order=None,
                  n_surv=None, wrap=None):
    """Advance ``[C, R]`` whitened slice chains by ``n_rep`` repeats.

    x/z/lnl_x: chain points in cube and whitened coords; thr_b/dead_b:
    [C, R] thresholds and dead-lane mask; chol/rmax: [R, D, D]/[R]
    global bounding geometry.  Whitened coordinates update
    incrementally (z' = z + t * nvec), so no per-repeat triangular
    solves.  Returns (x, lnl_x, ncall[R], moved[C, R]).

    Directions follow ``cfg.dir_mode``:

    * ``"gauss"`` -- isotropic in the whitened metric (classic
      whitened slice).
    * ``"diff"`` -- the difference of two random *survivors* (the
      stretch/differential-evolution direction set): moves ride the
      live cloud's instantaneous shape, including curvature the global
      covariance cannot see, which decorrelates warped contours in
      fewer repeats.  Requires ``u_all`` [R, L, D], ``order`` [R, L]
      (survivors listed first) and ``n_surv`` [R].
    * ``"mix"`` -- alternate diff/gauss by repeat parity (diff first);
      the gauss repeats guarantee full-rank direction coverage even
      when the live cloud degenerates.

    The direction distribution never depends on the chain's current
    position, so slice reversibility is preserved.
    """
    C, R, D = x.shape
    dtype = x.dtype
    mode = cfg.dir_mode
    if mode != "gauss" and (u_all is None or order is None
                            or n_surv is None):
        mode = "gauss"
    rr = jnp.arange(R)

    def gauss_dir(kd):
        nvec = random.normal(kd, (C, R, D), dtype=dtype) * act
        dirv = jnp.einsum("rde,cre->crd", chol, nvec)
        return nvec, dirv

    def diff_dir(kd):
        ka, kb = random.split(kd)
        ns = jnp.maximum(n_surv, 2)[None, :]               # [1, R]
        ia = random.randint(ka, (C, R), 0, 1 << 30) % ns
        ib = random.randint(kb, (C, R), 0, 1 << 30) % ns
        # avoid zero directions from a == b
        ib = jnp.where(ib == ia, (ib + 1) % ns, ib)
        ca = jnp.take_along_axis(order, jnp.swapaxes(ia, 0, 1), axis=1)
        cb = jnp.take_along_axis(order, jnp.swapaxes(ib, 0, 1), axis=1)
        ua = u_all[rr[:, None], ca]                        # [R, C, D]
        ub = u_all[rr[:, None], cb]
        dab = ua - ub
        if wrap is not None:
            # minimal image of the survivor difference on periodic dims
            dab = jnp.where(wrap, dab - jnp.round(dab), dab)
        dirv = jnp.swapaxes(dab, 0, 1) * act               # [C, R, D]
        nvec = _whiten(chol, dirv)
        # normalize to unit whitened length so the bracket and step
        # lengths live on the same scale as the gauss mode
        nrm = jnp.maximum(
            jnp.linalg.norm(nvec, axis=-1, keepdims=True), 1e-30
        )
        return nvec / nrm, dirv / nrm

    def rep(j, carry):
        x, z, lnl_x, ncall, key, moved = carry
        key, kd, ks = random.split(key, 3)
        if mode == "gauss":
            nvec, dirv = gauss_dir(kd)
        elif mode == "diff":
            nvec, dirv = diff_dir(kd)
        else:  # mix: diff on even repeats, gauss on odd
            nv_d, dv_d = diff_dir(kd)
            nv_g, dv_g = gauss_dir(kd)
            use_d = (j % 2) == 0
            nvec = jnp.where(use_d, nv_d, nv_g)
            dirv = jnp.where(use_d, dv_d, dv_g)
        t_lo, t_hi = _line_bracket(x, dirv, z, nvec, rmax[None, :],
                                   wrap=wrap)
        xn, lnln, t_acc, acc, nc = _shrink_slice(
            loglike2, data, shift, ks, x, lnl_x, dirv, t_lo, t_hi,
            thr_b, dead_b, cfg, wrap=wrap,
        )
        upd = (~dead_b) & acc
        x = jnp.where(upd[..., None], xn, x)
        z = z + jnp.where(upd, t_acc, 0.0)[..., None] * nvec
        lnl_x = jnp.where(upd, lnln, lnl_x)
        return (x, z, lnl_x, ncall + jnp.sum(nc, axis=0, dtype=jnp.int32),
                key, moved | upd)

    moved0 = jnp.zeros((C, R), dtype=bool)
    zero_nc = jnp.zeros((R,), dtype=jnp.int32)
    x, _z, lnl_x, nc, _key, moved = lax.fori_loop(
        0, n_rep, rep, (x, z, lnl_x, zero_nc, key, moved0)
    )
    return x, lnl_x, nc, moved


def _whiten(chol, du):
    """Whitened coords of ``du`` [C, R, D] under ``chol`` [R, D, D]."""
    b = jnp.moveaxis(du, 0, -1)                        # [R, D, C]
    zz = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jnp.moveaxis(zz, -1, 0)                     # [C, R, D]


def _act_arrays(cfg: NSConfig, ndim: int, dtype):
    """Active-dimension mask: likelihood-flat unit-cube dims are
    excluded from the bounding geometry and sampled uniformly."""
    act_np = np.ones(ndim, dtype=np.float64)
    for fd in cfg.flat_dims:
        if 0 <= int(fd) < ndim:
            act_np[int(fd)] = 0.0
    return jnp.asarray(act_np, dtype=dtype), act_np


def _efr_mult(cfg: NSConfig, d_act: float) -> float:
    """MultiNest's efr knob as a radius multiplier: enlarge ellipsoid
    volumes by 1/efr (core.pyx:748-751).  Clamped at 1 so efr > 1 can
    only be a no-op -- a sub-unity multiplier would shrink radii below
    the point-covering maximum and truncate the constrained region
    (the reference asserts 0 < efr <= 1 instead)."""
    if cfg.efr > 0:
        return max(1.0, (1.0 / cfg.efr) ** (1.0 / max(d_act, 1.0)))
    return 1.0


def _shrunk_cov(u, mean, live_w, n_live, act, act_np, cfg):
    """Sample covariance of the survivors with Ledoit-Wolf-style
    shrinkage toward the isotropic (mean-eigenvalue) target.

    At D=12 with nlive=100 the raw sample covariance's eigenvalue
    noise (~sqrt(D/n) ~ 35%) inflates the max-Mahalanobis bounding
    radius along the over-estimated axes, costing a measured ~5-10x
    in candidate acceptance; shrinking by lambda ~ D/n removes most
    of that noise while keeping the real anisotropy.  Flat dims get a
    unit diagonal so the Cholesky stays well-scaled (they carry no
    cross terms -- ``du`` is zeroed there).
    """
    dtype = u.dtype
    D = u.shape[-1]
    du = (u - mean[:, None, :]) * live_w[..., None] * act
    cov = jnp.einsum("rld,rle->rde", du, du) / n_live[:, None, None]
    d_act = max(float(act_np.sum()), 1.0)
    lam = jnp.clip(D / n_live, 0.0, 0.3)[:, None, None]    # [R, 1, 1]
    mean_eig = (
        jnp.sum(jnp.diagonal(cov, axis1=-2, axis2=-1) * act, axis=-1)
        / d_act
    )[:, None, None]
    eye_act = jnp.diag(act.astype(dtype))
    cov = (1.0 - lam) * cov + lam * mean_eig * eye_act
    cov = cov + jnp.diag(
        jnp.where(act > 0, cfg.cov_reg, 1.0).astype(dtype)
    )
    return cov


def _slim_bounds(u, zombie, act, act_np, cfg: NSConfig):
    """Global whitening + bounding radius only: ``(chol, mean, rmax)``.

    The kill+slice regime consumes just the global geometry (whitened
    directions + the analytic ellipsoid bracket), so the cluster
    machinery of :func:`_compute_bounds` would be wasted device time
    and compile time there.  Shape (mean/cov) comes from the
    survivors; the radius covers the zombie shell too (the killed
    points straddle the threshold contour -- bounding only the
    surviving interior truncates the contour boundary and biases lnZ
    high, verified at D=12).
    """
    dtype = u.dtype
    live_w = (~zombie).astype(dtype)                       # [R, L]
    n_live = jnp.maximum(jnp.sum(live_w, axis=1), 1.0)     # [R]
    mean = jnp.einsum("rl,rld->rd", live_w, u) / n_live[:, None]
    cov = _shrunk_cov(u, mean, live_w, n_live, act, act_np, cfg)
    chol = jnp.linalg.cholesky(cov)                        # [R, D, D]
    du_all = (u - mean[:, None, :]) * act
    dz = jax.scipy.linalg.solve_triangular(
        chol, jnp.swapaxes(du_all, 1, 2), lower=True
    )                                                      # [R, D, L]
    rmax = jnp.sqrt(jnp.max(jnp.sum(dz**2, axis=1), axis=1))
    mult = cfg.ell_fudge * _efr_mult(cfg, float(act_np.sum()))
    rmax = jnp.maximum(rmax, 0.1) * mult
    return chol, mean, rmax


def _compute_bounds(u, zombie, act, act_np, cfg: NSConfig):
    """Bounding geometry of the surviving live set (pytree of arrays).

    Cached in ``_State.bounds`` and recomputed every
    ``cfg.bound_every`` iterations: the live set turns over by only
    ``kill_k/nlive`` per iteration, so mild staleness costs proposal
    acceptance, never correctness -- candidates are always filtered by
    the *current* likelihood threshold, and the slice-fill pass is
    exact for any contour.  (The role of MultiNest's ``updInt``
    ellipsoid-refresh cadence, reference core.pyx:758-759.)

    For ``method == "ellipsoid"``/``"auto"`` the tuple is ``(mu_all,
    chol_all, rmax_all, lnvol_all, act_ell, use_cube, inv_chol)`` over
    the ellipsoid set (index 0 = single global bound, 1.. = k-means
    clusters); for ``method == "slice"`` it is the slim ``(chol, mean,
    rmax)`` global tuple of :func:`_slim_bounds`.
    """
    R, L, D = u.shape
    dtype = u.dtype

    if cfg.method == "slice":
        return _slim_bounds(u, zombie, act, act_np, cfg)

    # global moments over the *surviving* live points only: zombie
    # slots hold already-killed points below the threshold (the
    # outermost shell) and would inflate the bound
    live_w = (~zombie).astype(dtype)                       # [R, L]
    n_live = jnp.maximum(jnp.sum(live_w, axis=1), 1.0)     # [R]
    mean = jnp.einsum("rl,rld->rd", live_w, u) / n_live[:, None]
    cov = _shrunk_cov(u, mean, live_w, n_live, act, act_np, cfg)
    chol = jnp.linalg.cholesky(cov)                        # [R, D, D]

    # --- multi-ellipsoid bound: cluster the surviving live points,
    # fit one bounding ellipsoid per cluster -- the vectorizable
    # analogue of MultiNest's multimodal ellipsoidal decomposition
    # (reference core.pyx:746-747)
    KC = max(1, cfg.n_clusters)
    km_iters = max(1, cfg.km_iters)
    zorder = jnp.argsort(~zombie, axis=1, stable=True)     # [R, L]

    # k-means over non-zombie points in WHITENED coordinates (the
    # global-covariance metric): raw-cube distances are dominated by
    # the widest parameter directions, so k-means cells cut across the
    # contour's short axes and their bounding ellipsoids never beat
    # the single global bound (measured: the coverage guard never
    # engaged on the NH3 bench cube).  In the whitened metric a
    # curved or elongated contour segments along its length, which is
    # the decomposition that actually shrinks the union volume
    # (MultiNest clusters in a comparable shape-normalized space).
    # Centers are seeded from evenly-spaced survivors (zorder lists
    # zombies first); cluster moments are taken in cube space from the
    # final memberships.
    du0 = (u - mean[:, None, :]) * act
    zpts = jax.scipy.linalg.solve_triangular(
        chol, jnp.swapaxes(du0, 1, 2), lower=True
    )                                                   # [R, D, L]
    zpts = jnp.swapaxes(zpts, 1, 2)                     # [R, L, D]
    seed_frac = jnp.linspace(0.0, 1.0, KC)[None, :]
    seed_pos = (L - 1 - seed_frac * (n_live[:, None] - 1.0))
    seed_pos = jnp.clip(seed_pos.astype(jnp.int32), 0, L - 1)
    seed_ix = jnp.take_along_axis(zorder, seed_pos, axis=1)
    centers = jnp.take_along_axis(zpts, seed_ix[..., None], axis=1)
    big = jnp.asarray(1e10, dtype=dtype)
    for _ in range(km_iters):
        d2 = jnp.sum(
            (zpts[:, :, None, :] - centers[:, None, :, :]) ** 2,
            axis=-1,
        )                                               # [R, L, KC]
        assign = jnp.argmin(d2, axis=-1)                # [R, L]
        member = (
            assign[..., None] == jnp.arange(KC)[None, None, :]
        ) & (~zombie)[..., None]
        wk = member.astype(dtype)                       # [R, L, KC]
        cnt = jnp.sum(wk, axis=1)                       # [R, KC]
        new_c = jnp.einsum("rlk,rld->rkd", wk, zpts)
        new_c = new_c / jnp.maximum(cnt, 1.0)[..., None]
        # keep empty clusters where they were
        centers = jnp.where((cnt > 0)[..., None], new_c, centers)

    def cluster_geom(assign):
        """Per-cluster bounding ellipsoids from an assignment.

        Moments (IN CUBE SPACE -- centers live in the whitened metric)
        come from the surviving members, shrunk toward the global
        covariance when the cluster is too small to estimate its own;
        the radius covers every assigned point, zombies included
        (threshold-shell coverage, as for the global below).  Also
        returns the squared Mahalanobis distance of EVERY point to
        every cluster, which drives the refinement reassignment.
        """
        onehot = assign[..., None] == jnp.arange(KC)[None, None, :]
        wk = (onehot & (~zombie)[..., None]).astype(dtype)  # [R,L,KC]
        cnt = jnp.sum(wk, axis=1)                           # [R, KC]
        mu_k = jnp.einsum("rlk,rld->rkd", wk, u) \
            / jnp.maximum(cnt, 1.0)[..., None]
        mu_k = jnp.where((cnt > 0)[..., None], mu_k, mean[:, None])
        du_k = (u[:, :, None, :] - mu_k[:, None]) * wk[..., None] * act
        cov_k = jnp.einsum("rlkd,rlke->rkde", du_k, du_k)
        cov_k = cov_k / jnp.maximum(cnt, 1.0)[..., None, None]
        lam = jnp.clip((D + 1.0 - cnt) / (D + 1.0), 0.0, 1.0)
        cov_k = (
            (1.0 - lam)[..., None, None] * cov_k
            + lam[..., None, None] * cov[:, None]
        )
        # re-mask flat rows/cols (the blend re-introduces the global's
        # unit flat diagonal), then pin them to 1
        cov_k = cov_k * (act[:, None] * act[None, :])
        cov_k = cov_k + jnp.diag(
            jnp.where(act > 0, cfg.cov_reg, 1.0).astype(dtype)
        )
        chol_k = jnp.linalg.cholesky(cov_k)                 # [R,KC,D,D]
        du_all = (u[:, :, None, :] - mu_k[:, None]) * act   # [R,L,KC,D]
        dz_k = jax.scipy.linalg.solve_triangular(
            chol_k, jnp.swapaxes(du_all, 1, 2).swapaxes(2, 3),
            lower=True,
        )                                                   # [R,KC,D,L]
        d2 = jnp.swapaxes(jnp.sum(dz_k**2, axis=2), 1, 2)   # [R,L,KC]
        rmax2 = jnp.max(d2 * onehot.astype(dtype), axis=1)  # [R, KC]
        return cnt, mu_k, chol_k, d2, rmax2

    cnt, mu_k, chol_k, d2, rmax2 = cluster_geom(assign)
    for _ in range(max(0, cfg.km_refine)):
        # MultiNest-style ellipsoid-set refinement (Feroz & Hobson
        # 2008 sec. 5.2): reassign each point to the cluster whose
        # bounding boundary it sits deepest inside (relative squared
        # Mahalanobis distance), then refit.  k-means cells cut curved
        # contours across their short axes; letting elongated
        # ellipsoids claim the points they already cover is what
        # actually shrinks the union volume.
        # floor rmax2 at the sampling-radius floor (0.1, as applied
        # to rmax_k below) so a degenerate singleton cluster -- whose
        # member-derived rmax2 is ~0 -- scores with the ellipsoid it
        # actually samples from and can absorb neighbors it already
        # covers, instead of repelling every point
        score = d2 / jnp.maximum(rmax2, 0.01)[:, None, :]
        score = jnp.where((cnt > 0)[:, None, :], score, big)
        assign = jnp.argmin(score, axis=-1)                 # [R, L]
        cnt, mu_k, chol_k, d2, rmax2 = cluster_geom(assign)
    rmax_k = jnp.sqrt(rmax2)
    d_act = float(act_np.sum())
    efr_mult = _efr_mult(cfg, d_act)
    rmax_k = jnp.maximum(rmax_k, 0.1) * (cfg.ell_fudge * efr_mult)

    # global single ellipsoid.  Shape (mean/cov) comes from the
    # survivors, but the radius must cover the zombie shell too: the
    # killed points straddle the threshold contour, so bounding only
    # the surviving interior points truncates the contour boundary
    # and biases lnZ high (verified at D=12).
    du_all = (u - mean[:, None, :]) * act
    dz_g = jax.scipy.linalg.solve_triangular(
        chol, jnp.swapaxes(du_all, 1, 2), lower=True
    )                                                   # [R, D, L]
    rmax_g = jnp.sqrt(jnp.max(jnp.sum(dz_g**2, axis=1), axis=1))
    rmax_g = jnp.maximum(rmax_g, 0.1) * (cfg.ell_fudge * efr_mult)

    def ell_lnvol(rmax, chol_m):
        # volume over the active dims only (flat dims have unit
        # diagonal and are sampled uniformly regardless)
        return d_act * jnp.log(rmax) + jnp.sum(
            jnp.log(jnp.diagonal(chol_m, axis1=-2, axis2=-1)) * act,
            axis=-1,
        )

    lnvol_k = jnp.where(cnt > 0, ell_lnvol(rmax_k, chol_k), -big)
    lnvol_g = ell_lnvol(rmax_g, chol)                   # [R]

    # coverage guard (MultiNest's decomposition rule): use the
    # cluster set only where its total volume is genuinely smaller
    # than the single bounding ellipsoid -- k-means cells of a
    # unimodal cloud leave inter-cell gaps, so the single ellipsoid
    # is the safe default
    lnvol_sum = jax.scipy.special.logsumexp(lnvol_k, axis=-1)
    use_multi = lnvol_sum < lnvol_g + float(
        np.log(cfg.cluster_vol_frac)
    )                                                   # [R]

    # ellipsoid set: index 0 = global, 1.. = clusters
    mu_all = jnp.concatenate([mean[:, None], mu_k], axis=1)
    chol_all = jnp.concatenate([chol[:, None], chol_k], axis=1)
    rmax_all = jnp.concatenate([rmax_g[:, None], rmax_k], axis=1)
    act_ell = jnp.concatenate([
        (~use_multi)[:, None],
        use_multi[:, None] & (cnt > 0),
    ], axis=1)                                          # [R, KC+1]
    lnvol_all = jnp.where(
        act_ell,
        jnp.concatenate([lnvol_g[:, None], lnvol_k], axis=1),
        -big,
    )

    # Early phase: while the bounding ellipsoid is still larger than
    # the unit cube (an ellipsoid enclosing a near-full cube has
    # ~(sqrt(D)/2)^D * V_ball(D) times its volume -- hundreds at
    # D=10), sampling the *prior cube* uniformly is both correct (the
    # cube always contains the contour) and vastly more efficient.
    # This mirrors MultiNest's prior-sampling start-up phase.
    use_cube = lnvol_g >= 0.0                           # [R]

    inv_chol = jax.scipy.linalg.solve_triangular(
        chol_all, jnp.broadcast_to(
            jnp.eye(D, dtype=dtype), (R, KC + 1, D, D)
        ), lower=True,
    )                                                   # [R,KC+1,D,D]
    return (mu_all, chol_all, rmax_all, lnvol_all, act_ell, use_cube,
            inv_chol)


def _global_ell(bounds):
    """Global ``(chol, mean, rmax)`` from either bounds tuple (the
    7-tuple full geometry or the slim 3-tuple)."""
    if len(bounds) == 7:
        mu_all, chol_all, rmax_all = bounds[0], bounds[1], bounds[2]
        return chol_all[:, 0], mu_all[:, 0], rmax_all[:, 0]
    return bounds


def _global_chol(bounds, cfg: NSConfig = None):
    """Whitening Cholesky of the global bound from a bounds tuple."""
    return _global_ell(bounds)[0]


def ns_init(key, loglike2, data, ndim: int, n_runs: int, cfg: NSConfig,
            dtype=jnp.float32) -> _State:
    """Draw and evaluate the initial live-point set.

    With ``cfg.init_factor > 1``: draw ``L0 = init_factor * nlive``
    prior points, record the worst ``L0 - nlive`` as the deaths of a
    decreasing-live-count phase (exact order statistics; see
    ``_weight_tables``), and keep the best ``nlive`` as the live set.
    """
    cfg = cfg.resolved(ndim)
    R, L, D = n_runs, cfg.nlive, ndim
    n_id = min(cfg.n_init_dead(), cfg.max_iter)
    L0 = L + n_id
    key, k_init, k_perm = random.split(key, 3)
    u0 = random.uniform(k_init, (L0, R, D), dtype=dtype)
    if cfg.init_stratified and L0 > 1:
        # Latin-hypercube stratification (see NSConfig.init_stratified):
        # independent random permutation per (run, dim) column via the
        # rank of iid uniform scores; u0 becomes the in-bin offset
        ranks = jnp.argsort(
            jnp.argsort(random.uniform(k_perm, (L0, R, D)), axis=0),
            axis=0,
        )
        u0 = (ranks.astype(dtype) + u0) / L0
    # evaluate the L0 x R initial points in bounded equal chunks via a
    # scan (lax.map): ONE likelihood trace regardless of chunk count
    # -- the old unrolled Python loop traced the model L/init_chunk
    # times, a measurable share of the init program's compile time.
    # (lax.map's batch_size= path is avoided: it compiles
    # pathologically slowly on some TPU backends.)
    c = max(1, min(cfg.init_chunk, L0))
    n_pad = (-L0) % c
    u_ev = jnp.concatenate([u0, u0[:n_pad]], axis=0) if n_pad else u0
    lnl0 = lax.map(
        lambda uc: loglike2(uc, data), u_ev.reshape(-1, c, R, D)
    ).reshape(-1, R)[:L0]                                     # [L0, R]
    u0 = jnp.transpose(u0, (1, 0, 2))                         # [R,L0,D]
    lnl0 = jnp.transpose(lnl0)                                # [R, L0]
    shift = jnp.max(lnl0, axis=1)
    lnl0 = lnl0 - shift[:, None]
    dead_u = jnp.zeros((R, cfg.max_iter, D), dtype=dtype)
    dead_lnl = jnp.full((R, cfg.max_iter), _NEG, dtype=dtype)
    lnz0 = jnp.full((R,), _NEG, dtype=dtype)
    if n_id > 0:
        # kill-down: worst n_id points die in ascending-lnl order
        # (deaths 0..n_id-1 of the decreasing-live-count phase); the
        # best L survive as the live set
        neg_vals, worst_ix = lax.top_k(-lnl0, n_id)           # [R,n_id]
        worst_lnl = -neg_vals                                 # ascending
        worst_u = jnp.take_along_axis(u0, worst_ix[..., None], axis=1)
        dead_u = dead_u.at[:, :n_id].set(worst_u)
        dead_lnl = dead_lnl.at[:, :n_id].set(worst_lnl)
        _, lnw_np = _weight_tables(L, cfg.kill_k, cfg.max_iter, n_id)
        lnw_init = jnp.asarray(lnw_np[:n_id], dtype=dtype)
        lnz0 = jax.scipy.special.logsumexp(
            lnw_init[None, :] + worst_lnl, axis=1
        )
        live_lnl, live_ix = lax.top_k(lnl0, L)                # [R, L]
        live_u = jnp.take_along_axis(u0, live_ix[..., None], axis=1)
        u0, lnl0 = live_u, live_lnl
    act, act_np = _act_arrays(cfg, D, dtype)
    zombie0 = jnp.zeros((R, L), dtype=bool)
    bounds0 = _compute_bounds(u0, zombie0, act, act_np, cfg)
    return _State(
        key=key,
        u=u0,
        lnl=lnl0,
        lnl_shift=shift,
        lnz=lnz0,
        done=jnp.zeros((R,), dtype=bool),
        converged=jnp.zeros((R,), dtype=bool),
        n_deaths=jnp.full((R,), n_id, dtype=jnp.int32),
        pending=jnp.zeros((R,), dtype=jnp.int32),
        thresh=jnp.full((R,), _NEG, dtype=dtype),
        zombie=jnp.zeros((R, L), dtype=bool),
        stall=jnp.zeros((R,), dtype=jnp.int32),
        ncall=jnp.full((R,), L0, dtype=jnp.int32),
        dead_u=dead_u,
        dead_lnl=dead_lnl,
        i=jnp.int32(0),
        bounds=bounds0,
        acc_ema=jnp.asarray(1.0, dtype=dtype),
        ceff_mult=jnp.ones((R,), dtype=dtype),
    )


def _kill_record(s: _State, cfg: NSConfig, lnw_tab, rr):
    """One batched-deletion step: record the kill_k worst live points
    of every run whose previous fill-cycle completed.

    Returns the updated (dead_u, dead_lnl, lnz, n_deaths, pending,
    zombie, thresh) arrays.
    """
    R, L, D = s.u.shape
    K = cfg.kill_k
    max_iter = cfg.max_iter
    need_kill = (~s.done) & (s.pending == 0)
    neg_vals, worst_idx = lax.top_k(-s.lnl, K)             # [R, K]
    kill_lnl = -neg_vals                                   # ascending
    thresh_new = kill_lnl[:, -1]                           # k-th smallest
    kill_u = jnp.take_along_axis(s.u, worst_idx[..., None], axis=1)
    pos = s.n_deaths[:, None] + jnp.arange(K)              # [R, K]
    ok_w = need_kill[:, None] & (pos < max_iter)
    pos_w = jnp.where(ok_w, pos, max_iter)                 # OOB -> drop
    rrk = jnp.broadcast_to(rr[:, None], (R, K))
    dead_u = s.dead_u.at[rrk, pos_w].set(kill_u, mode="drop")
    dead_lnl = s.dead_lnl.at[rrk, pos_w].set(kill_lnl, mode="drop")
    lnw_k = lnw_tab[jnp.clip(pos, 0, max_iter - 1)]        # [R, K]
    contrib = jax.scipy.special.logsumexp(
        jnp.where(ok_w, lnw_k + kill_lnl, _NEG), axis=1
    )
    lnz = jnp.where(need_kill, jnp.logaddexp(s.lnz, contrib), s.lnz)
    n_deaths = jnp.where(
        need_kill, jnp.minimum(s.n_deaths + K, max_iter), s.n_deaths
    )
    pending = jnp.where(need_kill, K, s.pending)
    zmb_idx = jnp.where(need_kill[:, None], worst_idx, L)
    zombie = s.zombie.at[rrk, zmb_idx].set(True, mode="drop")
    thresh = jnp.where(need_kill, thresh_new, s.thresh)
    return dead_u, dead_lnl, lnz, n_deaths, pending, zombie, thresh


def _check_termination(cfg: NSConfig, lnx_tab, done, zombie, lnl, lnz,
                       n_deaths, dtype, stall=None):
    """Remaining-evidence + float-plateau + stuck-run termination."""
    max_iter = cfg.max_iter
    lnx = lnx_tab[n_deaths]
    live_lnl_m = jnp.where(zombie, _NEG, lnl)
    lnl_live_max = jnp.max(live_lnl_m, axis=1)
    dlogz = jnp.logaddexp(lnz, lnx + lnl_live_max) - lnz
    # floating-point plateau: when the live set's likelihood spread
    # falls below the representable resolution at its magnitude, no
    # proposal can exceed the threshold, and the remaining evidence
    # is exactly X * L_plateau -- which the finalize live-point
    # treatment adds.  Terminating here is exact at this precision
    # (the f32 likelihood itself carries no more information).
    lnl_live_min = jnp.min(jnp.where(zombie, -_NEG, lnl), axis=1)
    eps_plat = 16.0 * jnp.finfo(dtype).eps * jnp.maximum(
        jnp.abs(lnl_live_max), 1.0
    )
    plateau = (lnl_live_max - lnl_live_min) <= eps_plat
    newly_conv = (~done) & ((dlogz < cfg.tol) | plateau)
    newly_done = newly_conv | ((~done) & (n_deaths >= max_iter))
    if stall is not None and cfg.stall_limit > 0:
        # abandoned (flagged unconverged): no proposal mechanism has
        # filled a slot for stall_limit consecutive iterations -- the
        # run would otherwise grind the whole batch to the iteration
        # cap (its evidence up to the stuck threshold plus the live
        # remainder is still recorded by finalize)
        newly_done = newly_done | ((~done) & (stall >= cfg.stall_limit))
    return newly_done, newly_conv


def _segment_core(state: _State, loglike2, data, cfg: NSConfig,
                  seg_end) -> _State:
    """Advance all runs until ``i >= seg_end`` or every run is done,
    using kill/record + ellipsoid-candidate proposals only.

    One iteration of the loop body = one kill/record step (for runs
    whose previous fill-cycle completed) + one proposal round (a single
    batched candidate evaluation) + fills + termination checks.
    ``ns_segment`` interleaves this with ``ns_slice_fill`` passes that
    rescue runs whose candidate acceptance collapsed.
    """
    R, L, D = state.u.shape
    cfg = cfg.resolved(D)
    dtype = state.u.dtype
    K = cfg.kill_k
    T = cfg.n_cand()
    max_iter = cfg.max_iter
    lnx_tab_np, lnw_tab_np = _weight_tables(L, K, max_iter,
                                            cfg.n_init_dead())
    lnx_tab = jnp.asarray(lnx_tab_np, dtype=dtype)
    lnw_tab = jnp.asarray(lnw_tab_np, dtype=dtype)
    rr = jnp.arange(R)
    seg_end = jnp.asarray(seg_end, jnp.int32)
    # likelihood-flat dims are excluded from the bounding geometry
    # (their live coordinates stay uniform on [0,1], which would blow
    # the ellipsoid out of the cube) and sampled uniformly instead
    act, act_np = _act_arrays(cfg, D, dtype)
    any_flat = bool((act_np == 0.0).any())
    wrap = _wrap_vec(cfg, D)

    def cond(s: _State):
        return (~jnp.all(s.done)) & (s.i < seg_end)

    def body(s: _State):
        shift = s.lnl_shift

        # ---- 1. kill/record: runs whose fill-cycle completed ----
        (dead_u, dead_lnl, lnz, n_deaths, pending, zombie,
         thresh) = _kill_record(s, cfg, lnw_tab, rr)

        # ---- 2. proposals: one batched candidate launch ----
        active = (~s.done) & (pending > 0)
        key, k_dir, k_rad, k_fall = random.split(s.key, 4)

        # periodic dims: geometry sees minimal-image (recentered
        # universal-cover) coordinates; a no-op when pwrap is unused
        u_geo = _recenter(s.u, wrap)

        # bounding geometry: cached, refreshed every bound_every
        # iterations (see _compute_bounds for the staleness argument)
        bounds = lax.cond(
            (s.i % max(1, cfg.bound_every)) == 0,
            lambda: _compute_bounds(u_geo, zombie, act, act_np, cfg),
            lambda: s.bounds,
        )

        def clipped_eval(xp):
            xq = jnp.clip(xp, 0.0, 1.0)
            inb = jnp.all((xp >= 0.0) & (xp <= 1.0), axis=-1)
            return jnp.where(inb, loglike2(xq, data) - shift, _NEG)

        # zombie slots first (stable sort on ~zombie: False < True)
        zorder = jnp.argsort(~zombie, axis=1, stable=True)     # [R, L]

        if cfg.method != "slice":
            # sample candidates from the cached ellipsoid union
            # (volume-proportional cluster choice + 1/n_overlap
            # thinning keeps the proposal uniform over the union)
            (mu_all, chol_all, rmax_all, lnvol_all, act_ell, use_cube,
             inv_chol) = bounds
            KC = mu_all.shape[1] - 1
            key, k_cl, k_ov = random.split(key, 3)
            d_act = float(act_np.sum())
            if cfg.ceff:
                # constant-efficiency mode: per-run radius scale from
                # the adaptive volume multiplier (<= 1)
                s_ceff = s.ceff_mult ** (1.0 / max(d_act, 1.0))  # [R]
            else:
                s_ceff = None

            # volume-proportional ellipsoid choice per candidate, with
            # cheap redraw rounds for candidates that land outside the
            # unit cube: a draw costs einsums, an evaluated-but-doomed
            # candidate costs a likelihood slot.  Redrawing the whole
            # (ellipsoid, point) pair keeps the proposal uniform over
            # union-intersect-cube.
            d_exp = 1.0 / max(d_act, 1.0)

            def draw_round(k_j):
                kd, kr, kg = random.split(k_j, 3)
                gmb = random.gumbel(kg, (T, R, KC + 1), dtype=dtype)
                kc = jnp.argmax(gmb + lnvol_all[None], axis=-1)  # [T, R]
                chol_sel = jnp.take_along_axis(
                    chol_all, kc.T[..., None, None], axis=1
                )                                               # [R,T,D,D]
                mu_sel = jnp.take_along_axis(
                    mu_all, kc.T[..., None], axis=1
                )                                               # [R, T, D]
                r_sel = jnp.take_along_axis(rmax_all, kc.T, axis=1)
                if s_ceff is not None:
                    r_sel = r_sel * s_ceff[:, None]
                y = random.normal(kd, (T, R, D), dtype=dtype) * act
                y = y / jnp.maximum(
                    jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-30
                )
                rad = random.uniform(kr, (T, R), dtype=dtype) ** d_exp
                z = (r_sel.T * rad)[..., None] * y
                xj = mu_sel.swapaxes(0, 1) + jnp.einsum(
                    "rtde,tre->trd", chol_sel, z
                )                                               # [T, R, D]
                in_ok = ((xj >= 0.0) & (xj <= 1.0)) | (act <= 0.0)
                if wrap is not None:
                    # periodic dims wrap into the cube instead of
                    # rejecting the draw
                    in_ok = in_ok | wrap
                in_j = jnp.all(in_ok, axis=-1)
                return xj, in_j

            k_rounds = random.split(k_cl, max(1, cfg.cube_redraws) + 1)
            cand, got = draw_round(k_rounds[0])
            for k_j in k_rounds[1:-1]:
                xj, in_j = draw_round(k_j)
                fresh = (~got) & in_j
                cand = jnp.where(fresh[..., None], xj, cand)
                got = got | in_j
            ucube = random.uniform(k_rounds[-1], (T, R, D), dtype=dtype)
            cand = jnp.where(use_cube[None, :, None], ucube, cand)
            if any_flat:
                # flat dims: uniform draw, independent of the ellipsoid
                cand = jnp.where(act > 0, cand, ucube)
            cand = _wrap_pts(cand, wrap)

            # overlap thinning: accept with probability 1/n_ellipsoids
            # containing the candidate (keeps the union uniform);
            # periodic dims use the minimal image of the offset
            xc = cand[:, :, None, :] - mu_all[None]             # [T,R,KC+1,D]
            if wrap is not None:
                xc = jnp.where(wrap, xc - jnp.round(xc), xc)
            xc = xc * act
            m2 = jnp.sum(
                jnp.einsum("rkde,trke->trkd", inv_chol, xc) ** 2, axis=-1
            )                                                   # [T,R,KC+1]
            r_thin = rmax_all if s_ceff is None \
                else rmax_all * s_ceff[:, None]
            inside = (m2 <= r_thin[None] ** 2) & act_ell[None]
            n_e = jnp.maximum(jnp.sum(inside, axis=-1), 1)      # [T, R]
            thin = random.uniform(k_ov, (T, R), dtype=dtype) * n_e < 1.0
            # cube-phase draws are already uniform; no overlap thinning
            thin = thin | use_cube[None, :]

            cand_lnl = clipped_eval(cand)                       # [T, R]
            okc = (cand_lnl > thresh) & active[None, :] & thin
            n_eval = T
        else:
            # slice method: one slice chain per run yields one
            # guaranteed-accepted candidate (kill_k == 1)
            nz_cnt = jnp.maximum(L - pending, 1)
            jsel = random.randint(k_rad, (R,), 0, 1 << 30)
            sel = jnp.take_along_axis(
                zorder, (L - 1 - (jsel % nz_cnt))[:, None], axis=1
            )[:, 0]
            x0 = u_geo[rr, sel][None]                           # [1, R, D]
            lnl0 = jnp.take_along_axis(
                s.lnl, sel[:, None], axis=1
            )[:, 0][None]                                       # [1, R]

            chol_g, mu_g, rmax_g = _global_ell(bounds)
            z0 = _whiten(chol_g, (x0 - mu_g[None]) * act)
            x, lnl_x, nc, moved = _slice_chains(
                k_dir, loglike2, data, shift, x0, z0, lnl0,
                thresh[None, :], (~active)[None, :],
                chol_g, rmax_g, act, cfg.n_repeats, cfg,
                u_all=s.u, order=jnp.flip(zorder, axis=1),
                n_surv=nz_cnt, wrap=wrap,
            )
            cand = _wrap_pts(x, wrap)                           # [1, R, D]
            cand_lnl = lnl_x
            okc = moved & (cand_lnl > thresh) & active[None, :]
            n_eval = 0  # counted inside the shrink steps
            s = dataclasses.replace(s, ncall=s.ncall + nc)

        # ---- 3. fill zombie slots with accepted candidates ----
        rank = jnp.cumsum(okc, axis=0, dtype=jnp.int32)         # [T', R]
        use = okc & (rank <= pending[None, :])
        Tc = cand.shape[0]
        rrt = jnp.broadcast_to(rr[None, :], (Tc, R))
        slot = jnp.take_along_axis(
            zorder, jnp.swapaxes(jnp.clip(rank - 1, 0, L - 1), 0, 1),
            axis=1,
        )                                                       # [R, T']
        slot = jnp.swapaxes(slot, 0, 1)                         # [T', R]
        slot_w = jnp.where(use, slot, L)
        u_new = s.u.at[rrt, slot_w].set(cand, mode="drop")
        lnl_new = s.lnl.at[rrt, slot_w].set(cand_lnl, mode="drop")
        zombie = zombie.at[rrt, slot_w].set(False, mode="drop")
        n_take = jnp.sum(use, axis=0, dtype=jnp.int32)
        pending = pending - n_take
        ncall = s.ncall + jnp.where(active, n_eval, 0)
        stall = jnp.where(
            active & (n_take == 0) & (pending > 0), s.stall + 1, 0
        )

        # candidate-acceptance EMA (drives the host-side auto regime
        # switch; only candidate proposals produce a meaningful
        # signal).  Measure threshold-passing proposals (okc), NOT
        # slot fills: fills are capped by `pending`, which would drag
        # the EMA down on slot-starved iterations where candidates are
        # fine.  Runs still in the uniform-cube start-up phase are
        # EXCLUDED from the signal: their acceptance is the raw prior
        # mass above threshold, which says nothing about how well the
        # ellipsoid union fits the contour -- mixing them in delayed
        # the regime switch by ~100 iterations (~5k wasted evals/px,
        # measured on the NH3 bench cube) because their early high
        # acceptance props the EMA up while union-proposal runs have
        # already collapsed.
        if cfg.method != "slice":
            sig = active & ~use_cube
            n_sig = jnp.sum(sig.astype(dtype))
            acc = jnp.sum(
                (okc & sig[None, :]).astype(dtype)
            ) / jnp.maximum(n_sig * T, 1.0)
            acc_ema = jnp.where(
                n_sig > 0, 0.8 * s.acc_ema + 0.2 * acc, s.acc_ema
            )
        else:
            acc_ema = s.acc_ema
        if cfg.ceff and cfg.method != "slice":
            # constant-efficiency controller: multiplicative volume
            # update toward the target acceptance, per run
            target = cfg.efr if cfg.efr > 0 else 0.3
            acc_r = jnp.sum(okc.astype(dtype), axis=0) / float(T)  # [R]
            ceff_mult = jnp.where(
                active & ~use_cube,
                jnp.clip(
                    s.ceff_mult * jnp.exp(0.5 * (acc_r - target)),
                    float(np.exp(-6.0)), 1.0,
                ),
                s.ceff_mult,
            )
        else:
            ceff_mult = s.ceff_mult

        # ---- 4. termination ----
        newly_done, newly_conv = _check_termination(
            cfg, lnx_tab, s.done, zombie, lnl_new, lnz, n_deaths, dtype,
            stall=stall,
        )

        return _State(
            key=key,
            u=u_new,
            lnl=lnl_new,
            lnl_shift=shift,
            lnz=lnz,
            done=s.done | newly_done,
            converged=s.converged | newly_conv,
            n_deaths=n_deaths,
            pending=pending,
            thresh=thresh,
            zombie=zombie,
            stall=stall,
            ncall=ncall,
            dead_u=dead_u,
            dead_lnl=dead_lnl,
            i=s.i + 1,
            bounds=bounds,
            acc_ema=acc_ema,
            ceff_mult=ceff_mult,
        )

    return lax.while_loop(cond, body, state)


def ns_segment_slice(state: _State, loglike2, data, cfg: NSConfig,
                     seg_end) -> _State:
    """Advance runs with kill + multi-chain slice iterations until
    ``i >= seg_end`` or every run is done.

    The PolyChord-style regime for contours no ellipsoid union bounds
    tightly: every iteration opens ``kill_k`` slots per run and fills
    them with one batched multi-chain whitened slice pass -- measured
    ~3x faster per death than candidate blocks once candidate
    acceptance collapses below ~13% (mid-run hyperfine posteriors sit
    at ~0.2%).  In segmented "auto" mode the host switches to this
    program one-way when the candidate-acceptance EMA drops below
    ``cand_min_acc``; it is also the segmented engine for
    ``method == "slice"``.

    Deliberately slim: only the global whitening Cholesky + bounding
    radius are computed (no k-means / cluster Cholesky factors -- the
    regime never consumes them), and the slice kernel traces the
    likelihood exactly once, so this -- the program that runs for the
    bulk of every fit -- compiles several times faster than the full
    candidate program.
    """
    R, L, D = state.u.shape
    cfg = cfg.resolved(D)
    dtype = state.u.dtype
    C = cfg.kill_k
    max_iter = cfg.max_iter
    lnx_tab_np, lnw_tab_np = _weight_tables(L, C, max_iter,
                                            cfg.n_init_dead())
    lnx_tab = jnp.asarray(lnx_tab_np, dtype=dtype)
    lnw_tab = jnp.asarray(lnw_tab_np, dtype=dtype)
    rr = jnp.arange(R)
    rrc = jnp.broadcast_to(rr[None, :], (C, R))
    seg_end = jnp.asarray(seg_end, jnp.int32)
    act, act_np = _act_arrays(cfg, D, dtype)
    wrap = _wrap_vec(cfg, D)
    n_rep = (cfg.n_repeats if cfg.method == "slice"
             else cfg.fallback_repeats)

    def cond(s: _State):
        return (~jnp.all(s.done)) & (s.i < seg_end)

    def body(s: _State):
        shift = s.lnl_shift
        (dead_u, dead_lnl, lnz, n_deaths, pending, zombie,
         thresh) = _kill_record(s, cfg, lnw_tab, rr)
        u_geo = _recenter(s.u, wrap)
        # refresh the whitening geometry every slice_bound_every
        # iterations (default 1 = every iteration): one kill+slice
        # iteration turns over kill_k/nlive of the live set -- the
        # staleness tolerated by the candidate regime's bound_every
        # cadence (4 cycles) would leave the slice brackets whitened
        # by a covariance ~e^2 too wide, which degrades chain mixing
        # enough to bias lnZ (observed at D=12).  A cadence of 2 at
        # kill_k=nlive/4 keeps staleness at half that bound and is
        # re-verified against the D=12 bias pins
        # (tests/test_sampler.py slice-fill pins).
        sbe = max(1, cfg.slice_bound_every)
        if sbe == 1:
            chol, mu, rmax = _slim_bounds(u_geo, zombie, act, act_np,
                                          cfg)
        else:
            chol, mu, rmax = lax.cond(
                (s.i % sbe) == 0,
                lambda: _slim_bounds(u_geo, zombie, act, act_np, cfg),
                lambda: s.bounds,
            )
        need = (~s.done) & (pending > 0)

        key, k1, k2 = random.split(s.key, 3)
        # ONE randomized sort serves both chain starts and fill slots:
        # ascending rscore lists the survivors in random order first
        # (columns 0..C-1 = DISTINCT random survivors -- sampling with
        # replacement would insert correlated near-duplicates and bias
        # lnZ high, measured +0.8 nats at D=12) and the zombie slots
        # last (column L-r = the r-th fill slot).
        rscore = random.uniform(k1, (R, L), dtype=dtype) + zombie.astype(
            dtype
        ) * 2.0
        order = jnp.argsort(rscore, axis=1)                  # [R, L]
        sel = jnp.swapaxes(order[:, :C], 0, 1)               # [C, R]
        x = u_geo[rrc, sel]                                  # [C, R, D]
        lnl_x = s.lnl[rrc, sel]                              # [C, R]
        z = _whiten(chol, (x - mu[None]) * act)
        thr_b = jnp.broadcast_to(thresh[None, :], (C, R))
        dead_b = jnp.broadcast_to((~need)[None, :], (C, R))
        x, lnl_x, nc, moved = _slice_chains(
            k2, loglike2, data, shift, x, z, lnl_x, thr_b, dead_b,
            chol, rmax, act, n_rep, cfg,
            u_all=s.u, order=order, n_surv=L - pending, wrap=wrap,
        )
        x = _wrap_pts(x, wrap)

        # insert moved chain endpoints into the pending zombie slots
        okf = moved & need[None, :]
        rankf = jnp.cumsum(okf, axis=0, dtype=jnp.int32)     # [C, R]
        usef = okf & (rankf <= pending[None, :])
        pos = jnp.clip(L - rankf, 0, L - 1)
        slotf = jnp.swapaxes(
            jnp.take_along_axis(order, jnp.swapaxes(pos, 0, 1), axis=1),
            0, 1,
        )                                                    # [C, R]
        slotf_w = jnp.where(usef, slotf, L)
        u_new = s.u.at[rrc, slotf_w].set(x, mode="drop")
        lnl_new = s.lnl.at[rrc, slotf_w].set(lnl_x, mode="drop")
        zombie = zombie.at[rrc, slotf_w].set(False, mode="drop")
        n_ins = jnp.sum(usef, axis=0, dtype=jnp.int32)
        pending = pending - n_ins
        stall = jnp.where(
            need & (n_ins == 0) & (pending > 0), s.stall + 1,
            jnp.where(n_ins > 0, 0, s.stall),
        )

        newly_done, newly_conv = _check_termination(
            cfg, lnx_tab, s.done, zombie, lnl_new, lnz, n_deaths, dtype,
            stall=stall,
        )
        return _State(
            key=key,
            u=u_new,
            lnl=lnl_new,
            lnl_shift=shift,
            lnz=lnz,
            done=s.done | newly_done,
            converged=s.converged | newly_conv,
            n_deaths=n_deaths,
            pending=pending,
            thresh=thresh,
            zombie=zombie,
            stall=stall,
            ncall=s.ncall + nc,
            dead_u=dead_u,
            dead_lnl=dead_lnl,
            i=s.i + 1,
            bounds=(chol, mu, rmax),
            acc_ema=s.acc_ema,
            ceff_mult=s.ceff_mult,
        )

    return lax.while_loop(cond, body, state)


def ns_rebuild_bounds(state: _State, cfg: NSConfig):
    """Rebuild the full candidate bounding geometry from the current
    live set and ESTIMATE the would-be candidate acceptance -- with
    ZERO likelihood evaluations.

    Drives the host's two-way regime switch (``run_nested``): candidate
    blocks draw uniformly from the ellipsoid set with overlap thinning
    and every draw is evaluated, so their acceptance is, in
    expectation, exactly ``X / V_prop`` -- the threshold contour's
    prior volume over the proposal measure's total volume.  Both
    factors are already known without touching the likelihood: ``X``
    from the order-statistic compression table at each run's death
    count, ``V`` from the rebuilt union's per-ellipsoid volumes (plus
    the unit-ball constant that ``_compute_bounds``' relative
    log-volumes omit).  A pessimistic estimate costs nothing (no
    switch), unlike probing with a live candidate block
    (``switch_iters * n_cand`` wasted evals per run when acceptance
    stayed collapsed).

    Returns the state carrying the full 7-tuple bounds plus the
    active-run mean estimate as a scalar.  The estimate is a COARSE
    upper bound in practice: slice-mixing under-dispersion makes the
    true contour ~2x smaller than the order-statistic table's X on a
    clean D=8 Gaussian, and up to ~50x on the D=12 NH3 posterior --
    so the host primes the candidate EMA to the break-even threshold
    (not the estimate) and lets a short probation segment measure the
    realized acceptance.
    """
    R, L, D = state.u.shape
    cfg = cfg.resolved(D)
    dtype = state.u.dtype
    act, act_np = _act_arrays(cfg, D, dtype)
    wrap = _wrap_vec(cfg, D)
    u_geo = _recenter(state.u, wrap)
    bounds = _compute_bounds(u_geo, state.zombie, act, act_np, cfg)
    # total proposal volume: overlap-thinned draws are uniform w.r.t.
    # the SUM of ellipsoid volumes (thinned candidates are evaluated
    # and discarded), so the sum -- not the union -- is the cost model
    lnvol_sum = jax.scipy.special.logsumexp(bounds[3], axis=-1)  # [R]
    d_act = float(act_np.sum())
    lnball = float(
        0.5 * d_act * np.log(np.pi) - math.lgamma(0.5 * d_act + 1.0)
    )
    lnx_np, _ = _weight_tables(L, cfg.kill_k, cfg.max_iter,
                               cfg.n_init_dead())
    lnx = jnp.asarray(lnx_np, dtype)[
        jnp.clip(state.n_deaths, 0, cfg.max_iter)
    ]                                                            # [R]
    est = jnp.exp(jnp.clip(lnx - (lnvol_sum + lnball), -60.0, 0.0))
    active = ~state.done
    n_act = jnp.maximum(jnp.sum(active.astype(dtype)), 1.0)
    est_mean = (jnp.sum(jnp.where(active, est, 0.0)) / n_act).astype(
        dtype
    )
    return dataclasses.replace(state, bounds=bounds), est_mean


def ns_slice_fill(state: _State, loglike2, data, cfg: NSConfig) -> _State:
    """Fill pending kill slots with batched multi-chain whitened slice
    sampling.

    Runs whose candidate acceptance collapsed (webs of narrow modes
    that no ellipsoid union bounds tightly, e.g. hyperfine velocity
    aliasing) are served by ``kill_k`` slice chains per run, batched as
    one ``[n_chains, R]`` launch per likelihood evaluation -- correct
    for any contour shape and wide enough to keep the device busy (the
    PolyChord regime).  Unconditional and masked: when nothing is
    pending the internal loops exit without a single likelihood
    evaluation, so ``ns_segment`` can interleave it freely.

    Chain starts are DISTINCT random survivors -- already valid draws
    from the constrained region.  Chain endpoints stay correlated with
    their starts at finite repeats, which biases lnZ high by
    ~5.3/repeats nats at D=12 when EVERY insert is a slice fill
    (measured on the analytic Gaussian; pinned by the
    test_slice_fill_bias tests).  The default ~ndim//3 repeats
    (floor 3; 4 at D=12) put the worst-case systematic at ~1.3-1.5
    nats -- MultiNest-class (ellipsoidal rejection at efr=0.3 carries
    comparable error) and far inside the 11-nat model-selection gates
    the application uses -- and the
    candidate phase's independent inserts dilute it well below that in
    practice; raise ``fallback_repeats`` further for precision
    evidence work (see docs/limitations.md for the measured curve).
    """
    R, L, D = state.u.shape
    cfg = cfg.resolved(D)
    dtype = state.u.dtype
    C = cfg.kill_k
    rr = jnp.arange(R)
    act, act_np = _act_arrays(cfg, D, dtype)
    wrap = _wrap_vec(cfg, D)
    n_fall = cfg.fallback_repeats

    s = state
    need = (~s.done) & (s.pending > 0)
    pending = s.pending
    zombie = s.zombie

    # global geometry from the cached bounds (slice correctness does
    # not depend on the whitening quality -- only the mixing rate
    # does, so reusing the bounded-staleness Cholesky is free
    # performance)
    chol, mu, rmax = _global_ell(s.bounds)
    u_geo = _recenter(s.u, wrap)

    key, k1, k2 = random.split(s.key, 3)
    # one randomized sort: random survivors first, zombies last (see
    # ns_segment_slice)
    rscore = random.uniform(k1, (R, L), dtype=dtype) + zombie.astype(
        dtype
    ) * 2.0
    order = jnp.argsort(rscore, axis=1)                      # [R, L]
    sel = jnp.swapaxes(order[:, :C], 0, 1)                   # [C, R]
    rrc = jnp.broadcast_to(rr[None, :], (C, R))
    x = u_geo[rrc, sel]                                      # [C, R, D]
    lnl_x = s.lnl[rrc, sel]                                  # [C, R]
    z = _whiten(chol, (x - mu[None]) * act)
    thr_b = jnp.broadcast_to(s.thresh[None, :], (C, R))
    dead_b = jnp.broadcast_to((~need)[None, :], (C, R))
    x, lnl_x, nc, moved = _slice_chains(
        k2, loglike2, data, s.lnl_shift, x, z, lnl_x, thr_b, dead_b,
        chol, rmax, act, n_fall, cfg,
        u_all=s.u, order=order, n_surv=L - pending, wrap=wrap,
    )
    x = _wrap_pts(x, wrap)

    # insert moved chain endpoints into pending zombie slots
    okf = moved & need[None, :]
    rankf = jnp.cumsum(okf, axis=0, dtype=jnp.int32)
    usef = okf & (rankf <= pending[None, :])
    pos = jnp.clip(L - rankf, 0, L - 1)
    slotf = jnp.swapaxes(
        jnp.take_along_axis(order, jnp.swapaxes(pos, 0, 1), axis=1), 0, 1,
    )                                                        # [C, R]
    slotf_w = jnp.where(usef, slotf, L)
    u_new = s.u.at[rrc, slotf_w].set(x, mode="drop")
    lnl_new = s.lnl.at[rrc, slotf_w].set(lnl_x, mode="drop")
    zombie = zombie.at[rrc, slotf_w].set(False, mode="drop")
    n_ins = jnp.sum(usef, axis=0, dtype=jnp.int32)
    pending = pending - n_ins
    stall = jnp.where(n_ins > 0, 0, s.stall)
    return dataclasses.replace(
        s, key=key, u=u_new, lnl=lnl_new, zombie=zombie, pending=pending,
        ncall=s.ncall + nc, stall=stall,
    )


def ns_segment(state: _State, loglike2, data, cfg: NSConfig,
               seg_end) -> _State:
    """Advance all runs until ``i >= seg_end`` or every run is done:
    blocks of ``block_iters`` ellipsoid-candidate iterations
    (``_segment_core``) each followed by a multi-chain slice-fill
    rescue pass.

    This is the *candidate* program -- cheap while the bounding union
    fits the contour (early compression: ~3 likelihood evals per
    replacement).  When candidate acceptance collapses (warped
    mid-run contours), the segmented "auto" driver in ``run_nested``
    retires it in favour of :func:`ns_segment_slice`; in traced mode
    the per-block slice-fill pass keeps runs progressing regardless,
    at higher cost.
    """
    R, L, D = state.u.shape
    cfg = cfg.resolved(D)
    block = max(1, cfg.block_iters)
    seg_end = jnp.asarray(seg_end, jnp.int32)

    def cond(s: _State):
        return (~jnp.all(s.done)) & (s.i < seg_end)

    def body(s: _State):
        blk_end = jnp.minimum(s.i + block, seg_end)
        s = _segment_core(s, loglike2, data, cfg, blk_end)
        return ns_slice_fill(s, loglike2, data, cfg)

    return lax.while_loop(cond, body, state)


def ns_finalize(state: _State, cfg: NSConfig) -> NSResult:
    """Weights, live-point contribution, information, and error."""
    R, L, D = state.u.shape
    cfg = cfg.resolved(D)
    dtype = state.u.dtype
    max_iter = cfg.max_iter
    shift = state.lnl_shift
    lnx_tab_np, lnw_tab_np = _weight_tables(L, cfg.kill_k, max_iter,
                                            cfg.n_init_dead())

    n_dead = jnp.minimum(state.n_deaths, max_iter)
    dead_lnw = jnp.broadcast_to(
        jnp.asarray(lnw_tab_np, dtype=dtype), (R, max_iter)
    )
    valid = jnp.arange(max_iter)[None, :] < n_dead[:, None]
    dead_lnw = jnp.where(valid, dead_lnw, _NEG)
    dead_lnl_s = jnp.where(valid, state.dead_lnl, _NEG)

    # remaining prior volume split among the non-zombie live points
    lnx_final = jnp.asarray(lnx_tab_np, dtype=dtype)[n_dead]
    n_live_eff = jnp.maximum(L - state.pending, 1).astype(dtype)
    live_lnw = jnp.broadcast_to(
        (lnx_final - jnp.log(n_live_eff))[:, None], (R, L)
    )
    live_lnw = jnp.where(state.zombie, _NEG, live_lnw)
    live_lnl_s = jnp.where(state.zombie, _NEG, state.lnl)

    all_lnwl = jnp.concatenate(
        [dead_lnw + dead_lnl_s, live_lnw + live_lnl_s], axis=1
    )
    lnz_s = jax.scipy.special.logsumexp(all_lnwl, axis=1)

    all_lnl = jnp.concatenate([dead_lnl_s, live_lnl_s], axis=1)
    p = jnp.exp(all_lnwl - lnz_s[:, None])
    h = jnp.sum(jnp.where(all_lnl > _NEG / 2, p * all_lnl, 0.0), axis=1) - lnz_s
    # evidence error: var(lnZ) ~ H * <d>, the classic H/nlive
    # (Skilling 2006) generalized to batched deletion -- each death j
    # compresses ln X by d_j = 1/(live count at its rank), so the
    # per-death variance is d_j^2 and crossing the H nats of bulk
    # takes H/<d> deaths: var ~ H * <d>.  <d> is read off the exact
    # compression table as -lnX(n_dead)/n_dead.  For kill_k=1 this is
    # exactly H/nlive; at kill_k=nlive/2 it is ~1.4x larger (the
    # resolution really is coarser) -- quoting H/nlive there would
    # overstate precision.
    lnx_fin_tab = jnp.asarray(lnx_tab_np, dtype=dtype)
    mean_d = -lnx_fin_tab[n_dead] / jnp.maximum(n_dead, 1).astype(dtype)
    lnz_err = jnp.sqrt(jnp.maximum(h, 0.0) * mean_d)

    max_loglike = jnp.maximum(
        jnp.max(dead_lnl_s, axis=1), jnp.max(live_lnl_s, axis=1)
    ) + shift

    return NSResult(
        lnz=lnz_s + shift,
        lnz_err=lnz_err,
        h=h,
        lnl_shift=shift,
        n_dead=n_dead,
        ncall=state.ncall,
        converged=state.converged,
        dead_u=state.dead_u,
        dead_lnl=jnp.where(valid, state.dead_lnl + shift[:, None], _NEG),
        dead_lnw=dead_lnw,
        live_u=state.u,
        live_lnl=jnp.where(state.zombie, _NEG, state.lnl + shift[:, None]),
        live_lnw=live_lnw,
        max_loglike=max_loglike,
        nlive=L,
        ndim=D,
        max_iter=max_iter,
    )


# Cap for the id-keyed program caches below (and fit.py's): a
# long-lived process fitting many cubes would otherwise grow them
# without bound (each entry pins a jit program + closures).  Eviction
# is insertion-order (oldest first) and safe against id() recycling:
# every cache entry holds a strong reference to the object its key's
# id() refers to, so an id can only be recycled once no cache keys it.
_CACHE_CAP = 512


def _cache_put(cache: dict, key, value, cap: int = 0):
    """Insert with oldest-first eviction once the cache exceeds cap."""
    cap = cap or _CACHE_CAP
    while len(cache) >= cap:
        cache.pop(next(iter(cache)))
    cache[key] = value


# memoized _normalize_loglike wrappers: the wrapper's id() keys
# _JIT_CACHE/_AOT_CACHE, so a fresh closure per run_nested call would
# silently defeat compile reuse across pixel batches (every fit_batch
# call would retrace and redispatch through the persistent cache) and
# no AOT-precompiled executable could ever be matched
_NORM_CACHE = {}


def _normalize_loglike(loglike, data):
    """Accept either loglike(u) or loglike(u, data), and route rank-2
    calls through a leading unit axis (works around pathological XLA
    compile times observed for fused rank-2 transform+predict+chi2
    graphs on some TPU backends).  The wrapper is memoized per
    (likelihood identity, has-data) so its own identity is stable."""
    key = (id(loglike), data is None)
    if key not in _NORM_CACHE:
        if data is None:
            base = lambda u, _data: loglike(u)  # noqa: E731
        else:
            base = loglike

        def wrapped(u, d):
            if u.ndim == 2:
                return base(u[None], d)[0]
            return base(u, d)

        # hold a strong ref to loglike so its id stays unique
        _cache_put(_NORM_CACHE, key, (wrapped, loglike))
    return _NORM_CACHE[key][0], data


# jit cache for the segmented path: keyed by likelihood identity,
# config, input structure, and program kind so repeated pixel batches
# reuse compiles.  Programs are built lazily per kind so e.g. the
# kill+slice program for a batch size that never leaves the candidate
# phase is never compiled.
_JIT_CACHE = {}

# logZero-floored likelihood wrappers, keyed (id(base), floor) so the
# wrapper identity is stable across run_nested calls (compile reuse)
_LOGZERO_CACHE = {}

# ahead-of-time compiled executables (sampling.aot): same key space as
# _JIT_CACHE; consulted first by _get_jit so a precompiled program is
# dispatched without retracing.  Values are _AotDispatch wrappers that
# fall back to the jit path on any call-signature mismatch.
_AOT_CACHE = {}


def _jit_key(loglike2, cfg, ndim, n_runs, dtype, kind):
    return (id(loglike2), cfg, ndim, n_runs, jnp.dtype(dtype).name, kind)


class _AotDispatch:
    """Call an AOT-compiled executable; on aval/signature mismatch
    (which XLA raises *before* running anything) permanently fall back
    to the lazily-built jit wrapper for this program."""

    __slots__ = ("name", "compiled", "fallback", "failed")

    def __init__(self, name, compiled, fallback):
        self.name = name
        self.compiled = compiled
        self.fallback = fallback
        self.failed = False

    def _is_signature_mismatch(self, args):
        """Verify a TypeError/ValueError really is a call-signature
        mismatch by comparing the call's avals against the avals the
        executable was compiled for -- a data-dependent or transient
        error with matching avals must propagate, not silently retire
        the AOT program for the rest of the process."""
        try:
            compiled_info = jax.tree_util.tree_leaves(
                self.compiled.args_info
            )
            call_info = [
                (np.shape(x), jnp.result_type(x))
                for x in jax.tree_util.tree_leaves(args)
            ]
            if len(compiled_info) != len(call_info):
                return True
            return any(
                tuple(ci.shape) != tuple(s) or jnp.dtype(ci.dtype) != d
                for ci, (s, d) in zip(compiled_info, call_info)
            )
        except Exception:
            # cannot introspect -> preserve the old permissive behavior
            return True

    def __call__(self, *args):
        if not self.failed:
            try:
                return self.compiled(*args)
            except (TypeError, ValueError) as exc:
                if not self._is_signature_mismatch(args):
                    raise
                self.failed = True
                import warnings

                warnings.warn(
                    f"AOT program {self.name!r} signature mismatch "
                    f"({exc}); falling back to jit"
                )
        return self.fallback(*args)


def _get_jit(loglike2, cfg, ndim, n_runs, dtype, kind):
    key = _jit_key(loglike2, cfg, ndim, n_runs, dtype, kind)
    aot = _AOT_CACHE.get(key)
    if isinstance(aot, _AotDispatch):
        return aot
    if key not in _JIT_CACHE:
        if kind == "init":
            fn = jax.jit(
                lambda k, data: _pin_dp(
                    ns_init(k, loglike2, data, ndim, n_runs, cfg, dtype),
                    n_runs,
                )
            )
        elif kind == "fin":
            fn = jax.jit(lambda st: _pin_dp(ns_finalize(st, cfg), n_runs))
        elif kind == "rebuild":
            # two-way switch probe: no likelihood in the graph (small
            # HLO, compiles in seconds), donate the state for in-place
            # buffer reuse
            fn = jax.jit(
                lambda st: _pin_dp(
                    ns_rebuild_bounds(st, cfg), n_runs
                ),
                donate_argnums=(0,),
            )
        else:
            seg = ns_segment if kind == "cand" else ns_segment_slice

            def run_seg(st, data, seg_end, _seg=seg):
                st = _pin_dp(st, n_runs)
                return _pin_dp(
                    _seg(st, loglike2, data, cfg, seg_end), n_runs
                )

            # donate the state: the host loop never reuses an input
            # state, and in-place buffer reuse roughly halves the
            # segment's working set
            fn = jax.jit(run_seg, donate_argnums=(0,))
        # keep a strong reference to loglike2 so id() stays unique
        _cache_put(_JIT_CACHE, key, (fn, loglike2))
    fn = _JIT_CACHE[key][0]
    if aot is not None:
        # first use of a freshly AOT-compiled program: wire the jit
        # wrapper in as the mismatch fallback and memoize the dispatch
        name, compiled = aot
        disp = _AotDispatch(name, compiled, fn)
        _cache_put(_AOT_CACHE, key, disp)
        return disp
    return fn


def _pin_dp(tree, n_runs):
    """Constrain every per-run leaf's leading axis to the mesh's
    data-parallel axis (no-op without a mesh or without a ``dp`` axis).

    Per-pixel runs are embarrassingly parallel (SURVEY.md section 2.3),
    so the run axis must shard over ``dp`` with ZERO communication.
    Left to sharding propagation alone, XLA re-shards interior
    intermediates whose run axis moved through transposes/reshapes
    (e.g. the init ``lax.map`` chunking or the k-means scratch) and
    inserts cross-dp all-gathers -- measured 26 collectives on a pure
    dp mesh before these pins (tests/test_parallel.py::
    test_dp_axis_is_communication_free).  Pinning the state at program
    boundaries anchors propagation to the run axis everywhere.

    Applied only when a mesh is ambient, so single-chip programs (the
    bench path) are untouched.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty or "dp" not in mesh.axis_names:
        return tree

    def pin(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            return x
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == n_runs \
                and x.shape[0] % mesh.shape["dp"] == 0:
            return jax.lax.with_sharding_constraint(
                x, jax.sharding.PartitionSpec(
                    "dp", *([None] * (x.ndim - 1))))
        return x

    return jax.tree_util.tree_map(pin, tree)


def _gather_rows(tree, idx, n_rows):
    """Gather leading-axis rows of every per-run leaf, on device.

    Leaves whose leading axis is not the run axis (scalars, typed PRNG
    keys, unbatched data) pass through untouched.  ``idx`` may be a
    numpy array; the gather itself runs on device so no large buffers
    cross the host boundary (device transfers can be very slow on
    remote-tunneled workers).
    """
    idx = jnp.asarray(idx)

    def g(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            return x
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == n_rows:
            return jnp.asarray(x)[idx]
        return x

    return jax.tree_util.tree_map(g, tree)


def _scatter_rows(acc, cur, idx, n_acc):
    """Scatter ``cur``'s run rows into accumulator ``acc`` at positions
    ``idx`` (on device; rows with ``idx < 0`` are dropped).  Scalar
    leaves (PRNG key, loop counter) are taken from ``cur``."""
    idx = jnp.asarray(np.where(idx >= 0, idx, n_acc))

    def sc(a, c):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            return c
        if getattr(a, "ndim", 0) >= 1 and a.shape[0] == n_acc:
            return jnp.asarray(a).at[idx].set(c, mode="drop")
        return c

    return jax.tree_util.tree_map(sc, acc, cur)


def _strip_bounds(state: _State) -> _State:
    """Drop the cached bounding geometry from a state.

    The bounds tuple's arity differs between regimes (7-tuple candidate
    geometry vs the slim 3-tuple), so carrying it through the host-side
    compaction accumulator would tree_map tuples of different arity
    (ValueError) whenever a bank and a regime switch interleave.  No
    consumer needs it across programs: the candidate segment refreshes
    bounds on its ``bound_every`` cadence, the slice segment recomputes
    them every iteration, and finalize never reads them -- stripping
    also gives ``ns_finalize`` a single trace signature regardless of
    which regime a run ended in (one compile instead of two).
    """
    return dataclasses.replace(state, bounds=())


def _run_traced_shard_map(key, loglike2, ndim, n_runs, cfg, dtype,
                          data, active):
    """Traced-mode multi-chip path: the whole nested-sampling run
    wrapped in ``shard_map`` over the mesh's ``dp`` axis.

    Per-pixel runs are embarrassingly parallel, and ``shard_map`` makes
    that a guarantee the compiler cannot break: inside the manual-SPMD
    region every top_k / gather / scatter is shard-local by
    construction, where GSPMD's partitioner punts on batch-sharded
    top_k/scatter and inserts per-iteration cross-dp all-gathers
    (measured: 26 collectives in the jit-partitioned fit at R=16,
    tests/test_parallel.py::test_dp_axis_is_communication_free).  Each
    shard also terminates its own ``while_loop`` as soon as ITS runs
    are done instead of riding the global straggler.

    Requirements (else returns ``None`` and the caller falls back to
    the jit+GSPMD path): an ambient mesh whose ``dp`` axis divides
    ``n_runs``, no channel (``sp``) sharding larger than 1 (channel
    reductions then genuinely need cross-device collectives, which are
    GSPMD's job), and per-run ``data`` passed explicitly (closure data
    cannot be re-sharded into the manual region).

    Each shard derives its own PRNG stream (``random.split`` of the
    run key), so mesh and no-mesh runs of the same key draw different
    proposal streams -- same contract as the reference's per-process
    MultiNest seeds (core.pyx:757-760).
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty or "dp" not in mesh.axis_names:
        return None
    dp = mesh.shape["dp"]
    if dp <= 1 or n_runs % dp != 0 or data is None:
        return None
    P = jax.sharding.PartitionSpec

    def dspec(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == n_runs:
            return P("dp", *([None] * (x.ndim - 1)))
        return P()

    data_specs = jax.tree_util.tree_map(dspec, data)
    n_local = n_runs // dp
    active_arr = (
        jnp.ones((n_runs,), dtype=bool) if active is None
        else jnp.asarray(active, dtype=bool)
    )

    def shard_run(keys, data_sh, active_sh):
        st = ns_init(keys[0], loglike2, data_sh, ndim, n_local, cfg,
                     dtype)
        st = dataclasses.replace(st, done=st.done | ~active_sh)
        st = ns_segment(st, loglike2, data_sh, cfg, cfg.max_iter)
        return ns_finalize(st, cfg)

    # check_vma off: model kernels build scan carries from replicated
    # channel-axis constants, which trips the varying-manual-axes
    # strictness (the suggested pcast would have to thread through
    # every model); the region performs no dp collectives either way.
    # Only dp is manual -- any other mesh axis (e.g. the optional
    # channel ``sp`` axis) stays automatic, so GSPMD still inserts its
    # channel-reduction collectives inside the shard
    return jax.shard_map(
        shard_run,
        mesh=mesh,
        axis_names={"dp"},
        in_specs=(P("dp"), data_specs, P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )(random.split(key, dp), data, active_arr)


def run_nested(
    key,
    loglike: Callable,
    ndim: int,
    n_runs: int,
    config: NSConfig = NSConfig(),
    dtype=jnp.float32,
    data=None,
    segment_iters: int = 0,
    compact: bool = True,
    active=None,
) -> NSResult:
    """Run ``n_runs`` independent nested-sampling fits in lockstep.

    Parameters
    ----------
    key : PRNG key
    loglike : callable
        ``loglike(u: dtype[n_runs, ndim]) -> dtype[n_runs]`` (or
        ``loglike(u, data)`` when ``data`` is given); includes the
        prior transform, i.e. the function MultiNest would call back
        (core.pyx:622-624).
    ndim : int
        Unit-cube dimensionality (``n_params * ncomp``).
    n_runs : int
        Batch size R (pixels fit concurrently).
    data : pytree, optional
        Per-run data passed through to ``loglike``; threading it as an
        argument (rather than a closure) lets repeated calls with new
        data reuse the compiled sampler.
    segment_iters : int
        0 -> single traced computation (jittable).  >0 -> host loop of
        bounded device segments (recommended on real hardware).  In
        segmented mode ``method="auto"`` additionally runs the
        host-driven two-regime schedule: short candidate segments
        (``switch_iters``) while the candidate-acceptance EMA is
        healthy, then a switch to the slim kill+slice program -- with
        periodic zero-eval geometry probes (``switch_back*`` knobs,
        see ns_rebuild_bounds) that return to the candidate program
        when the estimated acceptance recovers past break-even and a
        short probation segment confirms it.  Splitting the regimes
        into two
        separately compiled programs (instead of a fused lax.cond)
        roughly halves XLA compile time of the hot path and lets each
        regime drop the machinery it does not use.
    compact : bool
        In segmented mode, gather unfinished runs into a
        ``min_compact``-sized batch once the active count fits, so
        straggler pixels do not pay full-batch compute.  A single
        jump: each batch-size class is a fresh XLA compile of the
        segment program (30-90 s through remote-tunneled workers),
        so one coarse class beats a ladder of halvings.
    active : bool[n_runs], optional
        Rows marked False are born done: static batch shapes force
        callers to pad partial batches (pow2 classes, retry subsets)
        with copies of real pixels, and without the mask each copy
        runs a full nested-sampling fit and can set the lockstep
        straggler tail.  Masked rows pay only the init evaluation;
        their results are meaningless and must be ignored by the
        caller.
    """
    cfg = config.resolved(ndim)
    loglike2, data = _normalize_loglike(loglike, data)
    if cfg.log_zero > -1e60:
        # non-default logZero: floor excluded-region likelihoods to
        # the log-zero sentinel (cached per (likelihood, floor) so the
        # wrapper identity -- and with it compile reuse -- is stable)
        lz_key = (id(loglike2), float(cfg.log_zero))
        if lz_key not in _LOGZERO_CACHE:
            base, lz = loglike2, cfg.log_zero

            def loglike_lz(u, d):
                v = base(u, d)
                return jnp.where(v > lz, v, jnp.asarray(_NEG, v.dtype))

            _cache_put(_LOGZERO_CACHE, lz_key, (loglike_lz, base))
        loglike2 = _LOGZERO_CACHE[lz_key][0]

    def apply_active(state):
        if active is None:
            return state
        return dataclasses.replace(
            state, done=state.done | ~jnp.asarray(active, dtype=bool)
        )

    if not (segment_iters and segment_iters > 0):
        res = _run_traced_shard_map(
            key, loglike2, ndim, n_runs, cfg, dtype, data, active
        )
        if res is not None:
            return res
        state = ns_init(key, loglike2, data, ndim, n_runs, cfg, dtype)
        state = apply_active(state)
        state = _pin_dp(state, n_runs)
        state = ns_segment(state, loglike2, data, cfg, cfg.max_iter)
        state = _pin_dp(state, n_runs)
        return _pin_dp(ns_finalize(state, cfg), n_runs)

    # ceff mode keeps rejection sampling alive by construction (the
    # adaptive shrink holds acceptance at the target), so the one-way
    # slice switch is disabled
    auto = cfg.method == "auto" and not cfg.ceff
    mode = "slice" if cfg.method == "slice" else "cand"
    # default switch point relative to the break-even with the slice
    # engine's actual per-death cost (see NSConfig.cand_min_acc).  At
    # deep repeats (high D) candidates are kept up to ~1.7x the slice
    # cost (margin 0.6): they are independent draws while slice
    # chains carry the correlated-insert lnZ bias, and switching at
    # exact break-even (measured, analytic D=12 Gaussian) fires in
    # the evidence-bulk tail of well-conditioned runs and triples the
    # default-path bias for zero eval saving.  At shallow repeats
    # (<= 3, i.e. D <= 11 at defaults) exact break-even is safe and
    # cheaper: measured at D=6, the analytic-Gaussian bias and eval
    # count are identical under either threshold (the EMA never dips
    # that low on ellipsoid-friendly contours) while NH3 rung 1 saves
    # ~1.5k evals/px (18.2k -> 16.7k) at lnZ identical to 4 digits.
    margin = 1.0 if cfg.fallback_repeats <= 3 else 0.6
    acc_thresh = cfg.cand_min_acc if cfg.cand_min_acc > 0 \
        else margin / (cfg.fallback_repeats * 2.6 + 0.6)

    state = _get_jit(loglike2, cfg, ndim, n_runs, dtype, "init")(key, data)
    state = apply_active(state)

    # Host loop with regime switching and straggler compaction.  All
    # row movement happens on device: ``acc`` banks the full-size
    # state at compaction time and receives the compacted batch's rows
    # (by original index) at the end, so finished runs are never
    # shipped to the host (remote-tunneled workers transfer at MB/s).
    # The host only ever fetches the [R] ``done`` mask, the loop
    # counter, and (in auto mode) the acceptance EMA scalar.
    acc = None                            # full-size accumulator
    orig_idx = np.arange(n_runs)          # current row -> original run
    cur_data = data
    r_cur = n_runs
    iter_cap = cfg.max_iter
    # two-way switch state (see NSConfig.switch_back): probes estimate
    # the would-be candidate acceptance from geometry alone, so a
    # declined probe is nearly free; a switch-back that the measured
    # EMA then refutes costs one short probation segment of candidate
    # blocks, and each refuted attempt doubles the probe backoff
    auto_back = auto and cfg.switch_back and cfg.switch_back_every > 0
    n_back = 0         # completed switch-backs (drives probe backoff)
    probation = False  # first candidate segment after a switch-back
    probe_at = 0       # earliest iteration for the next probe
    while True:
        i = int(state.i)
        done_np = np.asarray(state.done)
        if done_np.all() or i >= iter_cap:
            break
        active_rows = np.flatnonzero(~done_np)
        n_active = active_rows.size
        if compact and 0 < n_active and cfg.min_compact < r_cur:
            # repeated straggler compaction: jump to the smallest
            # power-of-FOUR class >= max(n_active, min_compact), and
            # only when it shrinks the batch by at least 4x -- each
            # size class is a fresh XLA compile of the segment
            # program, so the class set is kept to {min_compact * 4^k}
            # (64/256/1024 at the defaults): the extra padding compute
            # vs a power-of-two ladder is bounded at 2x of a short
            # straggler phase (~seconds), while every avoided class is
            # a 30-90+ s remote-worker compile that the AOT
            # precompiler (sampling.aot) would otherwise have to
            # include speculatively
            tgt = cfg.min_compact
            while tgt < n_active:
                tgt *= 4
            if tgt <= r_cur // 4:
                # bank the current rows into the full-size
                # accumulator, then re-gather just the active runs
                # (padded with copies of the first active row, marked
                # done).  The accumulator holds NO bounds (arity
                # differs between regimes; see _strip_bounds) -- the
                # compacted batch's bounds are gathered from the
                # current state's rows instead.
                if acc is None:
                    acc = _strip_bounds(state)
                else:
                    acc = _scatter_rows(acc, _strip_bounds(state),
                                        orig_idx, n_runs)
                active_orig = orig_idx[active_rows]
                pad = np.full(tgt - n_active, active_orig[0],
                              dtype=np.int64)
                sel = np.concatenate([active_orig, pad])
                sel_cur = np.concatenate([
                    active_rows,
                    np.full(len(pad), active_rows[0], dtype=np.int64),
                ])
                new_bounds = _gather_rows(state.bounds, sel_cur, r_cur)
                state = _gather_rows(acc, sel, n_runs)
                state = dataclasses.replace(
                    state,
                    bounds=new_bounds,
                    done=jnp.asarray(np.concatenate(
                        [np.zeros(n_active, bool),
                         np.ones(len(pad), bool)]
                    )),
                )
                orig_idx = np.concatenate(
                    [active_orig, np.full(len(pad), -1, dtype=np.int64)]
                )
                cur_data = _gather_rows(data, sel, n_runs)
                r_cur = tgt
        if mode == "cand":
            step = min(cfg.switch_iters, segment_iters) if auto \
                else segment_iters
            if probation:
                # validate a switch-back quickly: the EMA starts at the
                # probe's prediction and must survive a short segment
                # before the regime earns full-length segments again
                step = min(step, 4)
            seg_j = _get_jit(loglike2, cfg, ndim, r_cur, dtype, "cand")
            if _NS_DEBUG:
                import time as _time
                _t0 = _time.perf_counter()
            state = seg_j(state, cur_data,
                          jnp.int32(min(i + step, iter_cap)))
            if _NS_DEBUG:
                jax.block_until_ready(state.i)
                print(f"ns-debug: cand seg i={i}->{int(state.i)} "
                      f"R={r_cur} wall={_time.perf_counter()-_t0:.2f}s "
                      f"ncall_mean={np.asarray(state.ncall).mean():.0f}",
                      flush=True)
            if auto and len(state.bounds) == 7:
                # one-way switch once the bounding union stops paying:
                # candidate acceptance (measured over union-proposal
                # runs only -- cube start-up runs carry no signal)
                # below the slice break-even.  The small iteration
                # floor lets the EMA see a few bound refreshes before
                # it is trusted.
                if _NS_DEBUG:
                    in_cube = float(np.asarray(state.bounds[5]).mean())
                    print(f"ns-debug: i={int(state.i)} mode=cand "
                          f"acc_ema={float(state.acc_ema):.4f} "
                          f"in_cube={in_cube:.2f} "
                          f"done={int(np.asarray(state.done).sum())}",
                          flush=True)
                i_floor = max(2 * cfg.bound_every, 8)
                if int(state.i) >= i_floor \
                        and float(state.acc_ema) < acc_thresh:
                    b = state.bounds
                    state = dataclasses.replace(
                        state, bounds=(b[1][:, 0], b[0][:, 0], b[2][:, 0])
                    )
                    mode = "slice"
                    # each refuted switch-back doubles the backoff
                    # before the next probe (the estimate ran ahead of
                    # the measured acceptance -- union under-coverage)
                    probe_at = int(state.i) + cfg.switch_back_every * (
                        1 << min(n_back, 4)
                    )
                probation = False
        else:
            if auto_back and i >= probe_at:
                # two-way switch probe: rebuild the full bound and
                # estimate the would-be candidate acceptance (no
                # likelihood evals; see ns_rebuild_bounds).  Switch
                # back only when the estimate clears the break-even
                # threshold with margin AND the candidate program for
                # this batch size is already compiled (it always is at
                # the full batch size; a compacted class would pay a
                # fresh 30-90 s remote-worker compile, which no
                # straggler tail amortizes unless the AOT plan included
                # it).
                reb = _get_jit(loglike2, cfg, ndim, r_cur, dtype,
                               "rebuild")
                state, est = reb(state)
                est_v = float(est)
                ck = _jit_key(loglike2, cfg, ndim, r_cur, dtype, "cand")
                cand_ready = ck in _AOT_CACHE or ck in _JIT_CACHE
                if _NS_DEBUG:
                    print(f"ns-debug: probe i={i} R={r_cur} "
                          f"est={est_v:.4f} thresh={acc_thresh:.4f} "
                          f"cand_ready={cand_ready}", flush=True)
                if cand_ready and est_v > (
                        cfg.switch_back_margin * acc_thresh):
                    # prime the EMA to EXACTLY the break-even
                    # threshold: after the 4-iteration probation
                    # segment the EMA sits at 0.41*thresh +
                    # 0.59*acc_realized, so the away-switch check
                    # becomes an unbiased acc_realized < thresh test
                    # -- priming with the (optimistic) estimate
                    # instead let bad switch-backs coast through
                    # probation on the estimate's momentum (measured
                    # on NH3 rung 2: est 0.59, realized 0.01)
                    state = dataclasses.replace(
                        state,
                        acc_ema=jnp.asarray(acc_thresh, state.u.dtype),
                    )
                    mode = "cand"
                    probation = True
                    n_back += 1
                    continue
                b = state.bounds
                state = dataclasses.replace(
                    state, bounds=(b[1][:, 0], b[0][:, 0], b[2][:, 0])
                )
                probe_at = i + cfg.switch_back_every
            # shorter slice segments while compaction is still
            # possible: ``seg_end`` is a traced argument (no
            # recompile), and checking back with the host every ~64
            # iterations lets straggler compaction fire as soon as the
            # active count drops below the next size class (measured
            # ~10% of rung wall at R=1024).  At or below
            # ``min_compact`` no further compaction can fire, so long
            # segments avoid paying tunnel round-trip latency on every
            # 64 iterations of a small straggler batch
            step_s = min(segment_iters, 64) if r_cur > cfg.min_compact \
                else segment_iters
            seg_j = _get_jit(loglike2, cfg, ndim, r_cur, dtype, "slice")
            if _NS_DEBUG:
                import time as _time
                _t0 = _time.perf_counter()
            state = seg_j(state, cur_data,
                          jnp.int32(min(i + step_s, iter_cap)))
            if _NS_DEBUG:
                jax.block_until_ready(state.i)
                print(f"ns-debug: slice seg i={i}->{int(state.i)} "
                      f"R={r_cur} wall={_time.perf_counter()-_t0:.2f}s "
                      f"done={int(np.asarray(state.done).sum())} "
                      f"ncall_mean={np.asarray(state.ncall).mean():.0f}",
                      flush=True)

    if acc is not None:
        state = _scatter_rows(acc, _strip_bounds(state), orig_idx, n_runs)
    return _get_jit(loglike2, cfg, ndim, n_runs, dtype, "fin")(
        _strip_bounds(state)
    )
