"""Posterior products from nested-sampling results.

On-device computation of everything the reference's ``mn_dump``
callback extracts from MultiNest (reference: core/core.pyx:627-687):
equal-weight posterior samples, marginal quantiles, best-fit and MAP
parameter vectors, and the information criteria.  All functions are
batched over the run axis R and jittable.
"""

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import random

from nestfit_tpu.sampling.sampler import NSResult, _NEG

# 15 fixed quantiles incl. the +-1/2/3 sigma credible bounds
# (reference: core.pyx:585-594)
QUANTILES = np.array([
    0.00, 0.01, 0.10, 0.25, 0.50, 0.75, 0.90, 0.99, 1.00,
    1.58655254e-1, 0.84134475,
    2.27501319e-2, 0.97724987,
    1.34989803e-3, 0.99865010,
])
MARGINAL_COLS = [
    "min", "p01", "p10", "p25", "p50", "p75", "p90", "p99", "max",
    "1s_lo", "1s_hi", "2s_lo", "2s_hi", "3s_lo", "3s_hi",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "posteriors", "marginals", "bestfit_params", "map_params",
        "mean_params", "std_params",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PosteriorProducts:
    """Per-run posterior summaries (physical parameter space).

    ``posteriors`` matches the MultiNest layout consumed by the store:
    columns are the ndim parameters, then ``-2 lnL``, then the sample's
    normalized posterior mass (reference core.pyx:596-598, 677-680).
    """

    posteriors: jax.Array       # [R, n_post, D+2]
    marginals: jax.Array        # [R, n_quantiles, D]
    bestfit_params: jax.Array   # [R, D]
    map_params: jax.Array       # [R, D]
    mean_params: jax.Array      # [R, D]
    std_params: jax.Array       # [R, D]


def _chunked_transform(transform, u_all, chunk=256):
    """Apply the prior transform over ``u_all[R, N, D]`` in bounded
    sample chunks.

    The transform of some priors (``ResolvedPlacementPrior``'s
    ``cdf_over_interval``, reference core.pyx:109-161) materializes
    grid-sized intermediates per evaluated point; at full dead+live
    sample counts (N ~ max_iter + nlive) a single dense call would
    allocate tens of GB.  ``lax.map`` over fixed-size chunks keeps the
    peak footprint at ``R * chunk * grid`` while tracing the transform
    body once.
    """
    R, N, D = u_all.shape
    chunk = min(chunk, N)
    n_pad = (-N) % chunk
    if n_pad:
        u_all = jnp.pad(
            u_all, ((0, 0), (0, n_pad), (0, 0)), constant_values=0.5
        )
    k = (N + n_pad) // chunk
    uc = jnp.swapaxes(u_all.reshape(R, k, chunk, D), 0, 1)  # [k, R, c, D]
    th = jax.lax.map(transform, uc)
    th = jnp.swapaxes(th, 0, 1).reshape(R, N + n_pad, D)
    return th[:, :N, :]


def _weighted_quantiles(theta, lnp, qs):
    """Weighted quantiles along the sample axis.

    theta : [N] parameter values; lnp : [N] unnormalized log weights
    (masked entries at -1e30); qs : [Q] quantile levels.
    """
    order = jnp.argsort(theta)
    ts = theta[order]
    ws = jnp.exp(lnp[order] - jnp.max(lnp))
    cw = jnp.cumsum(ws)
    cw = cw / cw[-1]
    return jnp.interp(qs, cw, ts)


def posterior_products(
    result: NSResult,
    transform,
    key,
    n_post: int = 512,
    quantiles=QUANTILES,
) -> PosteriorProducts:
    """Compute posterior summaries for every run in the batch.

    Parameters
    ----------
    result : NSResult
    transform : callable
        ``u[..., D] -> theta[..., D]`` prior transform (vectorized).
    key : PRNG key for the systematic resampling jitter.
    n_post : int
        Number of equal-weight posterior samples (the analogue of
        MultiNest's variable ``n_samples``; fixed for static shapes).
    """
    R = result.lnz.shape[0]
    # all samples: dead + live
    u_all = jnp.concatenate([result.dead_u, result.live_u], axis=1)
    lnl_all = jnp.concatenate([result.dead_lnl, result.live_lnl], axis=1)
    lnw_all = jnp.concatenate([result.dead_lnw, result.live_lnw], axis=1)
    # masked entries have lnl = -1e30: make their posterior mass zero
    lnp = jnp.where(lnl_all > _NEG / 2, lnw_all + lnl_all, _NEG)
    lnp = lnp - jax.scipy.special.logsumexp(lnp, axis=1, keepdims=True)

    theta_all = _chunked_transform(transform, u_all)  # [R, N, D]

    # --- marginals: weighted quantiles per parameter
    qs = jnp.asarray(quantiles, dtype=theta_all.dtype)
    # mask: push zero-weight samples to +inf so they sort to the end
    masked_theta = jnp.where(
        (lnp > _NEG / 2)[..., None], theta_all, jnp.inf
    )
    marg = jax.vmap(                                 # over runs
        jax.vmap(_weighted_quantiles, in_axes=(1, None, None)),
        in_axes=(0, 0, None),
    )(masked_theta, lnp, qs)                         # [R, D, Q]
    marginals = jnp.swapaxes(marg, 1, 2)             # [R, Q, D]

    # --- equal-weight posterior via systematic resampling
    w = jnp.exp(lnp)                                 # [R, N] normalized
    cw = jnp.cumsum(w, axis=1)
    jitter = random.uniform(key, (R, 1), dtype=w.dtype)
    pos = (jnp.arange(n_post, dtype=w.dtype)[None, :] + jitter) / n_post
    take = jax.vmap(jnp.searchsorted)(cw, pos)       # [R, n_post]
    take = jnp.clip(take, 0, cw.shape[1] - 1)
    theta_post = jnp.take_along_axis(theta_all, take[..., None], axis=1)
    lnl_post = jnp.take_along_axis(lnl_all, take, axis=1)
    w_post = jnp.take_along_axis(w, take, axis=1)
    posteriors = jnp.concatenate(
        [theta_post, -2.0 * lnl_post[..., None], w_post[..., None]], axis=-1
    )

    # --- point estimates
    best_ix = jnp.argmax(lnl_all, axis=1)
    bestfit = jnp.take_along_axis(
        theta_all, best_ix[:, None, None], axis=1
    )[:, 0, :]
    # MAP: the sample carrying the largest posterior mass (argmax of
    # lnw + lnl), distinct from the max-likelihood point -- the
    # analogue of MultiNest's separate MAP vector (reference
    # core.pyx:677-687, pcon_arr[3] vs pcon_arr[2]).  The max-L point
    # is typically a deep late-iteration sample with negligible
    # weight; the max-mass sample sits in the posterior bulk.
    map_ix = jnp.argmax(lnp, axis=1)
    map_params = jnp.take_along_axis(
        theta_all, map_ix[:, None, None], axis=1
    )[:, 0, :]
    mean = jnp.sum(w[..., None] * theta_all, axis=1)
    var = jnp.sum(w[..., None] * (theta_all - mean[:, None, :]) ** 2, axis=1)
    return PosteriorProducts(
        posteriors=posteriors,
        marginals=marginals,
        bestfit_params=bestfit,
        map_params=map_params,
        mean_params=mean,
        std_params=jnp.sqrt(var),
    )


def information_criteria(max_loglike, null_lnz, n_chan_tot, n_params):
    """BIC/AIC/AICc and their null-model variants
    (reference: core.pyx:661-676)."""
    n = jnp.asarray(n_chan_tot, dtype=jnp.result_type(max_loglike))
    k = jnp.asarray(n_params, dtype=n.dtype)
    maxl = max_loglike
    nulll = null_lnz
    bic = jnp.log(n) * k - 2 * maxl
    aic = 2 * k - 2 * maxl
    aicc = aic + (2 * k**2 + 2 * k) / (n - k - 1)
    null_bic = jnp.log(n) * k - 2 * nulll
    null_aic = 2 * k - 2 * nulll
    null_aicc = null_aic + (2 * k**2 + 2 * k) / (n - k - 1)
    return {
        "BIC": bic, "AIC": aic, "AICc": aicc,
        "null_BIC": null_bic, "null_AIC": null_aic, "null_AICc": null_aicc,
    }
