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
from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, random


_NEG = -1e30  # sentinel for log-zero; avoids inf-inf NaNs in f32


@dataclasses.dataclass(frozen=True)
class NSConfig:
    """Nested sampling knobs.

    Maps onto the MultiNest knob set the reference exposes
    (core.pyx:727-776): ``nlive`` and ``tol`` are the same quantities;
    ``efr``'s role (proposal aggressiveness) is covered by
    ``ell_fudge``/``cand_factor``.  ``kill_k`` is the batched-deletion
    width (no MultiNest analogue; it trades iteration count for
    per-iteration batch size on the MXU).
    """

    nlive: int = 100
    tol: float = 1.0              # remaining-evidence termination (dlogz)
    max_iter: int = 0             # max deaths per run; 0 -> auto: 120 * nlive
    method: str = "ellipsoid"     # "ellipsoid" (fast) or "slice" (robust)
    kill_k: int = 0               # points killed per fill-cycle; 0 -> auto
    cand_factor: int = 2          # proposal candidates per kill slot
    stall_limit: int = 6          # zero-progress iters before slice fallback
    n_repeats: int = 0            # slice steps per replacement; 0 -> 2*ndim
    max_expand: int = 4           # stepping-out rounds per slice step
    max_contract: int = 12        # shrinkage rounds per slice step
    step_scale: float = 2.0       # initial slice width (whitened units)
    cov_reg: float = 1e-10        # covariance diagonal regularizer
    ell_fudge: float = 1.1        # ellipsoid enlargement over max Mahalanobis
    ell_cands: int = 0            # legacy alias: overrides cand_factor*kill_k
    ell_tries: int = 8            # retained for API compat (unused)
    fallback_repeats: int = 0     # slice steps for stragglers; 0 -> 2
    init_chunk: int = 32          # live-point chunk for the init evals
    min_compact: int = 32        # smallest compacted batch (segmented mode)

    def resolved(self, ndim: int) -> "NSConfig":
        max_iter = self.max_iter if self.max_iter > 0 else 120 * self.nlive
        n_repeats = self.n_repeats if self.n_repeats > 0 else 2 * ndim
        if self.method == "slice":
            kill_k = 1
        elif self.kill_k > 0:
            kill_k = min(self.kill_k, self.nlive // 2)
        else:
            # kill a quarter of the live set per fill-cycle: sequential
            # depth per information nat is ~(nlive/kill_k), so a large
            # fixed fraction keeps the device busy with wide candidate
            # batches instead of many tiny sequential proposal rounds
            kill_k = max(1, self.nlive // 4)
        return dataclasses.replace(
            self, max_iter=max_iter, n_repeats=n_repeats, kill_k=kill_k
        )

    def n_cand(self) -> int:
        """Proposal candidates per iteration (requires resolved cfg)."""
        if self.ell_cands > 0:
            return self.ell_cands
        return max(1, self.cand_factor * self.kill_k)


def _weight_tables(nlive: int, kill_k: int, max_iter: int):
    """Static per-death compression tables.

    Death ``t`` (0-based, per run) has within-batch rank ``t % kill_k``
    and compresses ``ln X`` by ``d(t) = 1/(nlive - t % kill_k)`` (order
    statistics of the k-th worst of ``nlive`` uniform prior-volume
    draws).  Returns ``LNX[max_iter + 1]`` (ln volume after t deaths)
    and ``LNW[max_iter]`` (ln of the volume element assigned to death
    t: ``ln(X_t - X_{t+1})``).
    """
    d = 1.0 / (nlive - (np.arange(max_iter) % kill_k))
    lnx = np.concatenate([[0.0], -np.cumsum(d)])
    lnw = lnx[:-1] + np.log1p(-np.exp(-d))
    return lnx, lnw


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "key", "u", "lnl", "lnl_shift", "lnz", "done", "converged",
        "n_deaths", "pending", "thresh", "zombie", "stall", "ncall",
        "dead_u", "dead_lnl", "i",
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


def _shrink_step(loglike2, data, shift, x0, lnl0, dirv, lnl_star, done, cfg):
    """One slice: stepping-out then shrinkage along direction ``dirv``.

    x0/lnl0: current chain point [R, D]/[R] (satisfies lnl0 > lnl_star).
    """

    def clipped_eval(xp):
        xq = jnp.clip(xp, 0.0, 1.0)
        inb = jnp.all((xp >= 0.0) & (xp <= 1.0), axis=-1)
        lnl = loglike2(xq, data) - shift
        return jnp.where(inb, lnl, _NEG)

    def make(key):
        k_off, k_shrink = random.split(key)
        r0 = random.uniform(k_off, lnl_star.shape, dtype=x0.dtype)
        w = jnp.asarray(cfg.step_scale, dtype=x0.dtype)
        t_lo0 = -w * r0
        t_hi0 = t_lo0 + w

        # --- stepping out (Neal 2003), bounded rounds w/ early exit
        def expand_cond(carry):
            j, t_lo, t_hi, open_lo, open_hi, ncall = carry
            return (j < cfg.max_expand) & jnp.any(
                (open_lo | open_hi) & ~done
            )

        def expand_body(carry):
            j, t_lo, t_hi, open_lo, open_hi, ncall = carry
            lnl_lo = clipped_eval(x0 + t_lo[:, None] * dirv)
            lnl_hi = clipped_eval(x0 + t_hi[:, None] * dirv)
            open_lo = open_lo & (lnl_lo > lnl_star)
            open_hi = open_hi & (lnl_hi > lnl_star)
            t_lo = jnp.where(open_lo, t_lo - w, t_lo)
            t_hi = jnp.where(open_hi, t_hi + w, t_hi)
            ncall = ncall + 2 * jnp.where(done, 0, 1)
            return j + 1, t_lo, t_hi, open_lo, open_hi, ncall

        ones = jnp.ones_like(lnl_star, dtype=bool)
        _, t_lo, t_hi, _, _, ncall = lax.while_loop(
            expand_cond, expand_body,
            (jnp.int32(0), t_lo0, t_hi0, ones, ones,
             jnp.zeros_like(lnl_star, dtype=jnp.int32)),
        )

        # --- shrinkage
        def sh_cond(carry):
            j, key, t_lo, t_hi, x, lnl, acc, ncall = carry
            return (j < cfg.max_contract) & jnp.any(~(acc | done))

        def sh_body(carry):
            j, key, t_lo, t_hi, x, lnl, acc, ncall = carry
            key, kt = random.split(key)
            t = t_lo + (t_hi - t_lo) * random.uniform(
                kt, lnl_star.shape, dtype=x0.dtype
            )
            xp = x0 + t[:, None] * dirv
            lnlp = clipped_eval(xp)
            ok = lnlp > lnl_star
            newly = ok & ~acc
            x = jnp.where(newly[:, None], xp, x)
            lnl = jnp.where(newly, lnlp, lnl)
            acc = acc | ok
            miss = ~acc
            t_lo = jnp.where(miss & (t < 0), t, t_lo)
            t_hi = jnp.where(miss & (t >= 0), t, t_hi)
            ncall = ncall + jnp.where(done, 0, 1)
            return j + 1, key, t_lo, t_hi, x, lnl, acc, ncall

        acc0 = jnp.zeros_like(lnl_star, dtype=bool)
        _, _, _, _, x, lnl, acc, ncall = lax.while_loop(
            sh_cond, sh_body,
            (jnp.int32(0), k_shrink, t_lo, t_hi, x0, lnl0, acc0, ncall),
        )
        return x, lnl, acc, ncall

    return make


def ns_init(key, loglike2, data, ndim: int, n_runs: int, cfg: NSConfig,
            dtype=jnp.float32) -> _State:
    """Draw and evaluate the initial live-point set."""
    cfg = cfg.resolved(ndim)
    R, L, D = n_runs, cfg.nlive, ndim
    key, k_init = random.split(key)
    u0 = random.uniform(k_init, (L, R, D), dtype=dtype)
    # evaluate the L x R initial points in bounded equal chunks
    # (static Python loop -- lax.map(batch_size=...) compiles
    # pathologically slowly on some TPU backends); loglike2 broadcasts
    # over the extra leading chunk axis
    c = max(1, min(cfg.init_chunk, L))
    while L % c:
        c -= 1
    chunks = [
        loglike2(u0[lo:lo + c], data) for lo in range(0, L, c)
    ]
    lnl0 = jnp.concatenate(chunks, axis=0)                    # [L, R]
    u0 = jnp.transpose(u0, (1, 0, 2))
    lnl0 = jnp.transpose(lnl0)
    shift = jnp.max(lnl0, axis=1)
    lnl0 = lnl0 - shift[:, None]
    return _State(
        key=key,
        u=u0,
        lnl=lnl0,
        lnl_shift=shift,
        lnz=jnp.full((R,), _NEG, dtype=dtype),
        done=jnp.zeros((R,), dtype=bool),
        converged=jnp.zeros((R,), dtype=bool),
        n_deaths=jnp.zeros((R,), dtype=jnp.int32),
        pending=jnp.zeros((R,), dtype=jnp.int32),
        thresh=jnp.full((R,), _NEG, dtype=dtype),
        zombie=jnp.zeros((R, L), dtype=bool),
        stall=jnp.zeros((R,), dtype=jnp.int32),
        ncall=jnp.full((R,), L, dtype=jnp.int32),
        dead_u=jnp.zeros((R, cfg.max_iter, D), dtype=dtype),
        dead_lnl=jnp.full((R, cfg.max_iter), _NEG, dtype=dtype),
        i=jnp.int32(0),
    )


def ns_segment(state: _State, loglike2, data, cfg: NSConfig,
               seg_end) -> _State:
    """Advance all runs until ``i >= seg_end`` or every run is done.

    One iteration of the loop body = one kill/record step (for runs
    whose previous fill-cycle completed) + one proposal round (a single
    batched candidate evaluation) + fills + termination checks.
    """
    R, L, D = state.u.shape
    cfg = cfg.resolved(D)
    dtype = state.u.dtype
    K = cfg.kill_k
    T = cfg.n_cand()
    max_iter = cfg.max_iter
    lnx_tab_np, lnw_tab_np = _weight_tables(L, K, max_iter)
    lnx_tab = jnp.asarray(lnx_tab_np, dtype=dtype)
    lnw_tab = jnp.asarray(lnw_tab_np, dtype=dtype)
    rr = jnp.arange(R)
    seg_end = jnp.asarray(seg_end, jnp.int32)

    def cond(s: _State):
        return (~jnp.all(s.done)) & (s.i < seg_end)

    def body(s: _State):
        shift = s.lnl_shift

        # ---- 1. kill/record: runs whose fill-cycle completed ----
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

        # ---- 2. proposals: one batched candidate launch ----
        active = (~s.done) & (pending > 0)
        key, k_dir, k_rad, k_fall = random.split(s.key, 4)

        mean = jnp.mean(s.u, axis=1)                           # [R, D]
        du = s.u - mean[:, None, :]
        cov = jnp.einsum("rld,rle->rde", du, du) / L
        cov = cov + cfg.cov_reg * jnp.eye(D, dtype=dtype)
        chol = jnp.linalg.cholesky(cov)                        # [R, D, D]

        def clipped_eval(xp):
            xq = jnp.clip(xp, 0.0, 1.0)
            inb = jnp.all((xp >= 0.0) & (xp <= 1.0), axis=-1)
            return jnp.where(inb, loglike2(xq, data) - shift, _NEG)

        # zombie slots first (stable sort on ~zombie: False < True)
        zorder = jnp.argsort(~zombie, axis=1, stable=True)     # [R, L]

        if cfg.method == "ellipsoid":
            dz = jax.scipy.linalg.solve_triangular(
                chol, jnp.swapaxes(du, 1, 2), lower=True
            )                                                   # [R, D, L]
            rmax = jnp.sqrt(jnp.max(jnp.sum(dz * dz, axis=1), axis=1))
            rmax = rmax * cfg.ell_fudge                         # [R]
            y = random.normal(k_dir, (T, R, D), dtype=dtype)
            y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
            rad = random.uniform(k_rad, (T, R), dtype=dtype) ** (1.0 / D)
            z = (rmax * rad)[..., None] * y
            cand = mean + jnp.einsum("rde,tre->trd", chol, z)   # [T, R, D]
            cand_lnl = clipped_eval(cand)                       # [T, R]
            okc = (cand_lnl > thresh) & active[None, :]
            n_eval = T
        else:
            # slice method: one slice chain per run yields one
            # guaranteed-accepted candidate (kill_k == 1)
            nz_cnt = jnp.maximum(L - pending, 1)
            jsel = random.randint(k_rad, (R,), 0, 1 << 30)
            sel = jnp.take_along_axis(
                zorder, (L - 1 - (jsel % nz_cnt))[:, None], axis=1
            )[:, 0]
            x0 = s.u[rr, sel]
            lnl0 = jnp.take_along_axis(s.lnl, sel[:, None], axis=1)[:, 0]

            def repeat_body(j, carry):
                x, lnl_x, ncall, key = carry
                key, kd, ks = random.split(key, 3)
                nvec = random.normal(kd, (R, D), dtype=dtype)
                dirv = jnp.einsum("rde,re->rd", chol, nvec)
                step = _shrink_step(
                    loglike2, data, shift, x, lnl_x, dirv, thresh,
                    ~active, cfg,
                )
                xn, lnln, acc, nc = step(ks)
                x = jnp.where((active & acc)[:, None], xn, x)
                lnl_x = jnp.where(active & acc, lnln, lnl_x)
                return x, lnl_x, ncall + nc, key

            zero_nc = jnp.zeros((R,), dtype=jnp.int32)
            x, lnl_x, nc, _ = lax.fori_loop(
                0, cfg.n_repeats, repeat_body, (x0, lnl0, zero_nc, k_dir)
            )
            cand = x[None]                                      # [1, R, D]
            cand_lnl = lnl_x[None]
            okc = (cand_lnl > thresh) & active[None, :]
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

        # ---- 4. stall fallback: slice sampling for stuck runs ----
        stalled = (~s.done) & (pending > 0) & (stall >= cfg.stall_limit)
        n_fall = cfg.fallback_repeats or 2

        def fallback(args):
            u, lnl, zombie, pending, ncall, stall, key = args
            zord = jnp.argsort(~zombie, axis=1, stable=True)
            k1, k2 = random.split(key)
            nz_cnt = jnp.maximum(L - pending, 1)
            jsel = random.randint(k1, (R,), 0, 1 << 30)
            sel = jnp.take_along_axis(
                zord, (L - 1 - (jsel % nz_cnt))[:, None], axis=1
            )[:, 0]
            x = u[rr, sel]
            lnl_x = jnp.take_along_axis(lnl, sel[:, None], axis=1)[:, 0]

            def rep(j, carry):
                x, lnl_x, ncall, key, got = carry
                key, kd, ks = random.split(key, 3)
                nvec = random.normal(kd, (R, D), dtype=dtype)
                dirv = jnp.einsum("rde,re->rd", chol, nvec)
                step = _shrink_step(
                    loglike2, data, shift, x, lnl_x, dirv, thresh,
                    ~stalled, cfg,
                )
                xn, lnln, acc, nc = step(ks)
                upd = stalled & acc
                x = jnp.where(upd[:, None], xn, x)
                lnl_x = jnp.where(upd, lnln, lnl_x)
                return x, lnl_x, ncall + nc, key, got | upd

            got0 = jnp.zeros((R,), dtype=bool)
            zero_nc = jnp.zeros((R,), dtype=jnp.int32)
            x, lnl_x, nc, _, got = lax.fori_loop(
                0, n_fall, rep, (x, lnl_x, zero_nc, k2, got0)
            )
            ins = stalled & got
            slot0 = zord[:, 0]
            slot0_w = jnp.where(ins, slot0, L)
            u = u.at[rr, slot0_w].set(x, mode="drop")
            lnl = lnl.at[rr, slot0_w].set(lnl_x, mode="drop")
            zombie = zombie.at[rr, slot0_w].set(False, mode="drop")
            pending = pending - ins.astype(jnp.int32)
            stall = jnp.where(ins, 0, stall)
            return u, lnl, zombie, pending, ncall + nc, stall, key

        u_new, lnl_new, zombie, pending, ncall, stall, _ = lax.cond(
            jnp.any(stalled),
            fallback,
            lambda args: args,
            (u_new, lnl_new, zombie, pending, ncall, stall, k_fall),
        )

        # ---- 5. termination ----
        lnx = lnx_tab[n_deaths]
        lnl_live_max = jnp.max(jnp.where(zombie, _NEG, lnl_new), axis=1)
        dlogz = jnp.logaddexp(lnz, lnx + lnl_live_max) - lnz
        newly_conv = (~s.done) & (dlogz < cfg.tol)
        newly_done = newly_conv | ((~s.done) & (n_deaths >= max_iter))

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
        )

    return lax.while_loop(cond, body, state)


def ns_finalize(state: _State, cfg: NSConfig) -> NSResult:
    """Weights, live-point contribution, information, and error."""
    R, L, D = state.u.shape
    cfg = cfg.resolved(D)
    dtype = state.u.dtype
    max_iter = cfg.max_iter
    shift = state.lnl_shift
    lnx_tab_np, lnw_tab_np = _weight_tables(L, cfg.kill_k, max_iter)

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
    lnz_err = jnp.sqrt(jnp.maximum(h, 0.0) / L)

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


def _normalize_loglike(loglike, data):
    """Accept either loglike(u) or loglike(u, data), and route rank-2
    calls through a leading unit axis (works around pathological XLA
    compile times observed for fused rank-2 transform+predict+chi2
    graphs on some TPU backends)."""
    if data is None:
        base = lambda u, _data: loglike(u)  # noqa: E731
    else:
        base = loglike

    def wrapped(u, d):
        if u.ndim == 2:
            return base(u[None], d)[0]
        return base(u, d)

    return wrapped, data


# jit cache for the segmented path: keyed by likelihood identity,
# config, and input structure so repeated pixel batches reuse compiles
_JIT_CACHE = {}


def _get_segment_jits(loglike2, cfg, ndim, n_runs, dtype):
    key = (id(loglike2), cfg, ndim, n_runs, jnp.dtype(dtype).name)
    if key not in _JIT_CACHE:
        init_j = jax.jit(
            lambda k, data: ns_init(k, loglike2, data, ndim, n_runs, cfg,
                                    dtype)
        )
        seg_j = jax.jit(
            lambda st, data, seg_end: ns_segment(st, loglike2, data, cfg,
                                                 seg_end)
        )
        fin_j = jax.jit(lambda st: ns_finalize(st, cfg))
        # keep a strong reference to loglike2 so id() stays unique
        _JIT_CACHE[key] = (init_j, seg_j, fin_j, loglike2)
    return _JIT_CACHE[key][:3]


def _gather_rows(tree, idx, n_rows):
    """Gather leading-axis rows of every per-run leaf (host-side).

    Leaves whose leading axis is not the run axis (scalars, typed PRNG
    keys, unbatched data) pass through untouched.
    """
    def g(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            return x
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n_rows:
            return x[idx]
        return x

    return jax.tree_util.tree_map(g, tree)


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
        bounded device segments (recommended on real hardware).
    compact : bool
        In segmented mode, gather unfinished runs into a smaller
        power-of-two batch when most of the batch has finished, so
        straggler pixels do not pay full-batch compute.
    """
    cfg = config.resolved(ndim)
    loglike2, data = _normalize_loglike(loglike, data)

    if not (segment_iters and segment_iters > 0):
        state = ns_init(key, loglike2, data, ndim, n_runs, cfg, dtype)
        state = ns_segment(state, loglike2, data, cfg, cfg.max_iter)
        return ns_finalize(state, cfg)

    init_j, seg_j, fin_j = _get_segment_jits(
        loglike2, cfg, ndim, n_runs, dtype
    )
    state = init_j(key, data)

    # host loop with straggler compaction: parked rows (finished) are
    # pulled to host; active rows continue in a smaller batch
    orig_idx = np.arange(n_runs)          # current row -> original run
    parked = []                           # (orig_indices, host-state rows)
    cur_data = data
    r_cur = n_runs
    # hard iteration cap: deaths advance by kill_k per fill-cycle; a
    # generous multiple of the minimum iteration count bounds stalls
    iter_cap = cfg.max_iter
    while True:
        i = int(state.i)
        done_np = np.asarray(state.done)
        if done_np.all() or i >= iter_cap:
            break
        n_active = int((~done_np).sum())
        r_new = max(cfg.min_compact, 1 << max(0, (n_active - 1).bit_length()))
        if compact and n_active > 0 and r_new <= r_cur // 2:
            host = jax.device_get(state)
            act = np.flatnonzero(~done_np)
            fin = np.flatnonzero(done_np)
            parked.append((orig_idx[fin], _gather_rows(host, fin, r_cur)))
            # pad the active set to the power-of-two batch with copies
            # of the first active row, marked done (frozen + discarded)
            pad = np.full(r_new - len(act), act[0], dtype=np.int64)
            sel = np.concatenate([act, pad])
            new_host = _gather_rows(host, sel, r_cur)
            new_host = dataclasses.replace(
                new_host,
                done=np.concatenate(
                    [np.zeros(len(act), bool), np.ones(len(pad), bool)]
                ),
            )
            state = jax.tree_util.tree_map(jnp.asarray, new_host)
            orig_idx = np.concatenate(
                [orig_idx[act], np.full(len(pad), -1, dtype=np.int64)]
            )
            cur_data = _gather_rows(cur_data, sel, r_cur)
            r_cur = r_new
            init_j, seg_j, fin_j = _get_segment_jits(
                loglike2, cfg, ndim, r_cur, dtype
            )
        state = seg_j(state, cur_data,
                      jnp.int32(min(i + segment_iters, iter_cap)))

    if parked:
        host = jax.device_get(state)
        parked.append((orig_idx, _gather_rows(host, np.arange(r_cur), r_cur)))
        # drop padding rows (orig index -1) parked by later compactions
        parked = [
            (idx[idx >= 0], _gather_rows(rows, np.flatnonzero(idx >= 0),
                                         len(idx)))
            for idx, rows in parked
        ]
        all_idx = np.concatenate([p[0] for p in parked])
        order = np.argsort(all_idx)
        assert len(all_idx) == n_runs, (len(all_idx), n_runs)

        def merge(*leaves):
            if getattr(leaves[0], "ndim", 0) == 0:
                return jnp.asarray(leaves[-1])
            return jnp.asarray(np.concatenate(leaves, axis=0)[order])

        state = jax.tree_util.tree_map(merge, *[p[1] for p in parked])
        _, _, fin_j = _get_segment_jits(loglike2, cfg, ndim, n_runs, dtype)
    return fin_j(state)
