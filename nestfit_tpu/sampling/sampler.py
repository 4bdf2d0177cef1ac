"""Vectorized nested sampler.

TPU-native replacement for the external MultiNest Fortran library the
reference links against (reference: core/cmultinest.pxd:4-33,
core/core.pyx:727-823).  Instead of one sequential sampler per pixel
driven by callbacks, a *batch* of R independent nested-sampling runs
(one per pixel) advances in lockstep on device:

* live points are a ``[R, nlive, ndim]`` matrix in the unit cube;
* each iteration records every run's worst live point as a dead point,
  accumulates the evidence with the standard deterministic
  prior-volume compression ``X_i = exp(-i/nlive)``, and replaces the
  worst point with a new draw above the likelihood threshold;
* replacement uses MultiNest-style bounding-ellipsoid rejection with
  parallel candidates (fast path) or whitened random-direction slice
  sampling with stepping-out/shrinkage (robust path; also the fallback
  when rejection fails), both free of data-dependent shapes so they
  vmap/shard cleanly;
* per-run termination follows the remaining-evidence criterion
  ``logaddexp(lnZ, lnX + max lnL_live) - lnZ < tol`` (the role of
  MultiNest's ``tol``, core.pyx:752-753); finished runs freeze via
  masking until the whole batch is done.

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
    ``ell_fudge``/``ell_cands``; ellipsoidal mode-separation knobs have
    no analogue (a single conservative bound plus the slice fallback
    covers multimodality at an efficiency, not correctness, cost).
    """

    nlive: int = 100
    tol: float = 1.0              # remaining-evidence termination (dlogz)
    max_iter: int = 0             # 0 -> auto: 60 * nlive
    method: str = "ellipsoid"     # "ellipsoid" (fast) or "slice" (robust)
    n_repeats: int = 0            # slice steps per replacement; 0 -> 2*ndim
    max_expand: int = 4           # stepping-out rounds per slice step
    max_contract: int = 12        # shrinkage rounds per slice step
    step_scale: float = 2.0       # initial slice width (whitened units)
    cov_reg: float = 1e-10        # covariance diagonal regularizer
    ell_fudge: float = 1.1        # ellipsoid enlargement over max Mahalanobis
    ell_cands: int = 8            # parallel candidates per rejection round
    ell_tries: int = 8            # rejection rounds before slice fallback
    fallback_repeats: int = 0     # slice steps for stragglers; 0 -> ndim
    init_chunk: int = 32          # live-point chunk for the init evals

    def resolved(self, ndim: int) -> "NSConfig":
        max_iter = self.max_iter if self.max_iter > 0 else 60 * self.nlive
        n_repeats = self.n_repeats if self.n_repeats > 0 else 2 * ndim
        return dataclasses.replace(self, max_iter=max_iter, n_repeats=n_repeats)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "key", "u", "lnl", "lnl_shift", "lnz", "done", "converged",
        "n_dead", "ncall", "dead_u", "dead_lnl", "i",
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
    n_dead: jax.Array     # [R] iterations completed when run finished
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
        return x, lnl, ncall

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
        n_dead=jnp.full((R,), cfg.max_iter, dtype=jnp.int32),
        ncall=jnp.full((R,), L, dtype=jnp.int32),
        dead_u=jnp.zeros((R, cfg.max_iter, D), dtype=dtype),
        dead_lnl=jnp.full((R, cfg.max_iter), _NEG, dtype=dtype),
        i=jnp.int32(0),
    )


def ns_segment(state: _State, loglike2, data, cfg: NSConfig,
               seg_end) -> _State:
    """Advance all runs until ``i >= seg_end`` or every run is done."""
    R, L, D = state.u.shape
    cfg = cfg.resolved(D)
    dtype = state.u.dtype
    inv_l = 1.0 / L
    ln_comp = float(np.log1p(-np.exp(-inv_l)))
    rr = jnp.arange(R)
    seg_end = jnp.minimum(jnp.asarray(seg_end, jnp.int32), cfg.max_iter)

    def cond(s: _State):
        return (~jnp.all(s.done)) & (s.i < seg_end)

    def body(s: _State):
        shift = s.lnl_shift
        worst = jnp.argmin(s.lnl, axis=1)                      # [R]
        lnl_star = s.lnl[rr, worst]                            # [R]
        u_worst = s.u[rr, worst]                               # [R, D]

        # record dead point (positions beyond a finished run's n_dead
        # are ignored downstream)
        zero = jnp.int32(0)
        dead_u = lax.dynamic_update_slice(
            s.dead_u, u_worst[:, None, :], (zero, s.i, zero)
        )
        dead_lnl = lax.dynamic_update_slice(
            s.dead_lnl,
            jnp.where(s.done, s.dead_lnl[:, s.i], lnl_star)[:, None],
            (zero, s.i),
        )

        # evidence update: w_i = X_{i-1} - X_i, X_i = exp(-i/L)
        lnw = -s.i.astype(dtype) * inv_l + ln_comp
        lnz_new = jnp.logaddexp(s.lnz, lnw + lnl_star)
        lnz_new = jnp.where(s.done, s.lnz, lnz_new)

        # --- replacement proposals
        key, k_start, k_prop = random.split(s.key, 3)
        mean = jnp.mean(s.u, axis=1)                           # [R, D]
        du = s.u - mean[:, None, :]
        cov = jnp.einsum("rld,rle->rde", du, du) / L
        cov = cov + cfg.cov_reg * jnp.eye(D, dtype=dtype)
        chol = jnp.linalg.cholesky(cov)                        # [R, D, D]

        start = random.randint(k_start, (R,), 0, L)
        start = jnp.where(start == worst, (start + 1) % L, start)
        x = s.u[rr, start]
        lnl_x = s.lnl[rr, start]

        def clipped_eval(xp):
            xq = jnp.clip(xp, 0.0, 1.0)
            inb = jnp.all((xp >= 0.0) & (xp <= 1.0), axis=-1)
            return jnp.where(inb, loglike2(xq, data) - shift, _NEG)

        def slice_chain(x, lnl_x, ncall, key, active, n_repeats):
            def repeat_body(j, carry):
                x, lnl_x, ncall, key = carry
                key, k_dir, k_step = random.split(key, 3)
                nvec = random.normal(k_dir, (R, D), dtype=dtype)
                dirv = jnp.einsum("rde,re->rd", chol, nvec)
                step = _shrink_step(
                    loglike2, data, shift, x, lnl_x, dirv, lnl_star,
                    s.done | ~active, cfg,
                )
                xn, lnln, nc = step(k_step)
                x = jnp.where(active[:, None], xn, x)
                lnl_x = jnp.where(active, lnln, lnl_x)
                return x, lnl_x, ncall + nc, key

            return lax.fori_loop(
                0, n_repeats, repeat_body, (x, lnl_x, ncall, key)
            )

        if cfg.method == "ellipsoid":
            T = cfg.ell_cands
            dz = jax.scipy.linalg.solve_triangular(
                chol, jnp.swapaxes(du, 1, 2), lower=True
            )                                                   # [R, D, L]
            rmax = jnp.sqrt(jnp.max(jnp.sum(dz * dz, axis=1), axis=1))
            rmax = rmax * cfg.ell_fudge                         # [R]

            def rej_cond(carry):
                j, key, x, lnl_x, acc, ncall = carry
                return (j < cfg.ell_tries) & jnp.any(~(acc | s.done))

            def rej_body(carry):
                j, key, x, lnl_x, acc, ncall = carry
                key, k_dir, k_rad = random.split(key, 3)
                y = random.normal(k_dir, (T, R, D), dtype=dtype)
                y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
                r = random.uniform(k_rad, (T, R), dtype=dtype) ** (1.0 / D)
                z = (rmax * r)[..., None] * y
                xp = mean + jnp.einsum("rde,tre->trd", chol, z)
                lnlp = clipped_eval(xp)                         # [T, R]
                ok = lnlp > lnl_star
                first = jnp.argmax(ok, axis=0)                  # [R]
                any_ok = jnp.any(ok, axis=0)
                xb = jnp.take_along_axis(
                    xp, first[None, :, None], axis=0
                )[0]
                lnlb = jnp.take_along_axis(lnlp, first[None, :], axis=0)[0]
                newly = any_ok & ~acc
                x = jnp.where(newly[:, None], xb, x)
                lnl_x = jnp.where(newly, lnlb, lnl_x)
                ncall = ncall + jnp.where(s.done, 0, T)
                return j + 1, key, x, lnl_x, acc | any_ok, ncall

            k_rej, k_fall = random.split(k_prop)
            acc0 = jnp.zeros((R,), dtype=bool)
            _, _, x, lnl_x, acc, ncall = lax.while_loop(
                rej_cond, rej_body,
                (jnp.int32(0), k_rej, x, lnl_x, acc0, s.ncall),
            )

            # stragglers (rare): full slice chain, skipped entirely
            # when every run accepted
            n_fall = cfg.fallback_repeats or D

            def fallback(args):
                x, lnl_x, ncall, key, acc = args
                x, lnl_x, ncall, _ = slice_chain(
                    x, lnl_x, ncall, key, ~acc, n_fall
                )
                return x, lnl_x, ncall

            x, lnl_x, ncall = lax.cond(
                jnp.any(~(acc | s.done)),
                fallback,
                lambda args: (args[0], args[1], args[2]),
                (x, lnl_x, ncall, k_fall, acc),
            )
        else:
            x, lnl_x, ncall, _ = slice_chain(
                x, lnl_x, s.ncall, k_prop,
                jnp.ones((R,), dtype=bool), cfg.n_repeats,
            )

        # replace worst live point (frozen for finished runs)
        u_new = s.u.at[rr, worst].set(
            jnp.where(s.done[:, None], u_worst, x)
        )
        lnl_new = s.lnl.at[rr, worst].set(
            jnp.where(s.done, lnl_star, lnl_x)
        )

        # termination: remaining evidence below tol
        lnx_next = -(s.i + 1).astype(dtype) * inv_l
        lnl_max = jnp.max(lnl_new, axis=1)
        dlogz = jnp.logaddexp(lnz_new, lnx_next + lnl_max) - lnz_new
        newly_conv = (~s.done) & (dlogz < cfg.tol)
        newly_done = newly_conv | ((~s.done) & (s.i + 1 >= cfg.max_iter))
        n_dead = jnp.where(newly_done, s.i + 1, s.n_dead)

        return _State(
            key=key,
            u=u_new,
            lnl=lnl_new,
            lnl_shift=shift,
            lnz=lnz_new,
            done=s.done | newly_done,
            converged=s.converged | newly_conv,
            n_dead=n_dead,
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
    inv_l = 1.0 / L
    shift = state.lnl_shift

    n_dead = jnp.minimum(state.n_dead, state.i)
    idx = jnp.arange(cfg.max_iter, dtype=dtype)
    dead_lnw = -(idx + 1.0) * inv_l + float(np.log(np.expm1(inv_l)))
    dead_lnw = jnp.broadcast_to(dead_lnw, (R, cfg.max_iter))
    valid = jnp.arange(cfg.max_iter)[None, :] < n_dead[:, None]
    dead_lnw = jnp.where(valid, dead_lnw, _NEG)
    dead_lnl_s = jnp.where(valid, state.dead_lnl, _NEG)

    lnx_final = -n_dead.astype(dtype) * inv_l
    live_lnw = jnp.broadcast_to(
        (lnx_final - float(np.log(L)))[:, None], (R, L)
    )
    live_lnl_s = state.lnl

    all_lnwl = jnp.concatenate(
        [dead_lnw + dead_lnl_s, live_lnw + live_lnl_s], axis=1
    )
    lnz_s = jax.scipy.special.logsumexp(all_lnwl, axis=1)

    all_lnl = jnp.concatenate([dead_lnl_s, live_lnl_s], axis=1)
    p = jnp.exp(all_lnwl - lnz_s[:, None])
    h = jnp.sum(jnp.where(all_lnl > _NEG / 2, p * all_lnl, 0.0), axis=1) - lnz_s
    lnz_err = jnp.sqrt(jnp.maximum(h, 0.0) * inv_l)

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
        live_lnl=state.lnl + shift[:, None],
        live_lnw=live_lnw,
        max_loglike=max_loglike,
        nlive=L,
        ndim=D,
        max_iter=cfg.max_iter,
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


def run_nested(
    key,
    loglike: Callable,
    ndim: int,
    n_runs: int,
    config: NSConfig = NSConfig(),
    dtype=jnp.float32,
    data=None,
    segment_iters: int = 0,
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
    """
    cfg = config.resolved(ndim)
    loglike2, data = _normalize_loglike(loglike, data)

    if segment_iters and segment_iters > 0:
        init_j, seg_j, fin_j = _get_segment_jits(
            loglike2, cfg, ndim, n_runs, dtype
        )
        state = init_j(key, data)
        while True:
            i = int(state.i)
            if i >= cfg.max_iter or bool(np.asarray(state.done).all()):
                break
            state = seg_j(state, data,
                          jnp.int32(min(i + segment_iters, cfg.max_iter)))
        return fin_j(state)

    state = ns_init(key, loglike2, data, ndim, n_runs, cfg, dtype)
    state = ns_segment(state, loglike2, data, cfg, cfg.max_iter)
    return ns_finalize(state, cfg)
