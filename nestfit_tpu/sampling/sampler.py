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
* replacement uses whitened random-direction slice sampling
  (PolyChord-style): directions are drawn from the live-point
  empirical covariance, with Neal's stepping-out and shrinkage.  This
  is robust on the correlated, bounded posteriors nested sampling is
  used for and contains no data-dependent shapes, so it vmaps/shards
  cleanly;
* per-run termination follows the remaining-evidence criterion
  ``logaddexp(lnZ, lnX + max lnL_live) - lnZ < tol`` (the role of
  MultiNest's ``tol``, core.pyx:752-753); finished runs freeze via
  masking until the whole batch is done.

Numerics: log-likelihoods are shifted per run by the initial live-point
maximum so float32 ``logaddexp`` accumulation keeps ~1e-5 absolute
accuracy regardless of the raw lnL magnitude; the shift cancels in the
information integral H and is added back to the returned lnZ.

The likelihood callable must satisfy ``loglike(u: f32[R, ndim]) ->
f32[R]`` and be pure JAX (it is called inside ``lax.while_loop``).
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
    ``step_scale``/``n_repeats``; ellipsoidal decomposition /
    mode-separation knobs have no analogue because slice sampling does
    not need a bounding geometry.
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
    ell_tries: int = 3            # rejection rounds before slice fallback
    init_chunk: int = 32          # live-point chunk for the init evals

    def resolved(self, ndim: int) -> "NSConfig":
        max_iter = self.max_iter if self.max_iter > 0 else 60 * self.nlive
        n_repeats = self.n_repeats if self.n_repeats > 0 else 2 * ndim
        return dataclasses.replace(self, max_iter=max_iter, n_repeats=n_repeats)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "key", "u", "lnl", "lnz", "done", "converged", "n_dead", "ncall",
        "dead_u", "dead_lnl", "i",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _State:
    key: jax.Array        # PRNG key (shared; draws are batched over R)
    u: jax.Array          # [R, L, D] live points (unit cube)
    lnl: jax.Array        # [R, L] shifted ln-likelihoods
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
    ``dead_lnw``/``live_lnw`` are un-normalized log posterior masses
    ``lnw_k + lnL_k`` is the contribution to Z); entries beyond
    ``n_dead`` are masked to ``-1e30``.
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


def _shrink_step(loglike, shift, x0, lnl0, dirv, lnl_star, done, cfg):
    """One slice: stepping-out then shrinkage along direction ``dirv``.

    x0/lnl0: current chain point [R, D]/[R] (satisfies lnl0 > lnl_star).
    Returns new chain point (x, lnl, ncall_add, key-consumed handled by
    caller passing fresh keys).
    """

    def clipped_eval(xp):
        xq = jnp.clip(xp, 0.0, 1.0)
        inb = jnp.all((xp >= 0.0) & (xp <= 1.0), axis=-1)
        lnl = loglike(xq) - shift
        return jnp.where(inb, lnl, _NEG)

    def make(key):
        k_off, k_exp, k_shrink = random.split(key, 3)
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


def run_nested(
    key,
    loglike: Callable,
    ndim: int,
    n_runs: int,
    config: NSConfig = NSConfig(),
    dtype=jnp.float32,
) -> NSResult:
    """Run ``n_runs`` independent nested-sampling fits in lockstep.

    Parameters
    ----------
    key : PRNG key
    loglike : callable
        ``loglike(u: dtype[n_runs, ndim]) -> dtype[n_runs]``; includes
        the prior transform (unit cube in, ln-likelihood out), i.e. the
        function MultiNest would call back (core.pyx:622-624).
    ndim : int
        Unit-cube dimensionality (``n_params * ncomp``).
    n_runs : int
        Batch size R (pixels fit concurrently).
    """
    cfg = config.resolved(ndim)
    R, L, D = n_runs, cfg.nlive, ndim
    inv_l = 1.0 / L
    ln_comp = float(np.log1p(-np.exp(-inv_l)))   # log(1 - e^{-1/L})

    # --- initialize live points
    key, k_init = random.split(key)
    u0 = random.uniform(k_init, (L, R, D), dtype=dtype)
    lnl0 = lax.map(loglike, u0, batch_size=min(cfg.init_chunk, L))  # [L, R]
    u0 = jnp.transpose(u0, (1, 0, 2))            # [R, L, D]
    lnl0 = jnp.transpose(lnl0)                   # [R, L]
    shift = jnp.max(lnl0, axis=1)                # [R]
    lnl0 = lnl0 - shift[:, None]

    state = _State(
        key=key,
        u=u0,
        lnl=lnl0,
        lnz=jnp.full((R,), _NEG, dtype=dtype),
        done=jnp.zeros((R,), dtype=bool),
        converged=jnp.zeros((R,), dtype=bool),
        n_dead=jnp.full((R,), cfg.max_iter, dtype=jnp.int32),
        ncall=jnp.full((R,), L, dtype=jnp.int32),
        dead_u=jnp.zeros((R, cfg.max_iter, D), dtype=dtype),
        dead_lnl=jnp.full((R, cfg.max_iter), _NEG, dtype=dtype),
        i=jnp.int32(0),
    )

    rr = jnp.arange(R)

    def cond(s: _State):
        return (~jnp.all(s.done)) & (s.i < cfg.max_iter)

    def body(s: _State):
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
            return jnp.where(inb, loglike(xq) - shift, _NEG)

        def slice_chain(x, lnl_x, ncall, key, active, n_repeats):
            """n_repeats whitened slice steps from (x, lnl_x)."""
            def repeat_body(j, carry):
                x, lnl_x, ncall, key = carry
                key, k_dir, k_step = random.split(key, 3)
                nvec = random.normal(k_dir, (R, D), dtype=dtype)
                dirv = jnp.einsum("rde,re->rd", chol, nvec)
                step = _shrink_step(
                    loglike, shift, x, lnl_x, dirv, lnl_star,
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
            # MultiNest-style bounding-ellipsoid rejection: enclose the
            # live set in the covariance ellipsoid scaled to the
            # maximum Mahalanobis radius (times a fudge), and draw
            # uniformly inside it until above the threshold.  Each
            # round evaluates ``ell_cands`` candidates per run in one
            # batched call; the first acceptable candidate wins.
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
                lnlp = lax.map(clipped_eval, xp, batch_size=T)  # [T, R]
                ok = lnlp > lnl_star                            # [T, R]
                # first acceptable candidate per run
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
            def fallback(args):
                x, lnl_x, ncall, key, acc = args
                x, lnl_x, ncall, _ = slice_chain(
                    x, lnl_x, ncall, key, ~acc, cfg.n_repeats
                )
                return x, lnl_x, ncall

            x, lnl_x, ncall = lax.cond(
                jnp.any(~(acc | s.done)),
                fallback,
                lambda args: (args[0], args[1], args[2]),
                (x, lnl_x, ncall, k_fall, acc),
            )
            key = k_fall
        else:
            x, lnl_x, ncall, key = slice_chain(
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
            lnz=lnz_new,
            done=s.done | newly_done,
            converged=s.converged | newly_conv,
            n_dead=n_dead,
            ncall=ncall,
            dead_u=dead_u,
            dead_lnl=dead_lnl,
            i=s.i + 1,
        )

    state = lax.while_loop(cond, body, state)

    # --- finalization: weights, live contribution, H, error
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

    # total (shifted) evidence over dead + live contributions
    all_lnwl = jnp.concatenate(
        [dead_lnw + dead_lnl_s, live_lnw + live_lnl_s], axis=1
    )
    lnz_s = jax.scipy.special.logsumexp(all_lnwl, axis=1)

    # information H = sum p_k lnL_k - lnZ (shift-invariant)
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
