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
from jax import lax, random

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


def resolve_n_post(n_post: int, nlive: int) -> int:
    """Resolve the stored-posterior sample count (0 -> auto).

    The reference stores MultiNest's full variable-size weighted
    posterior (core.pyx:677-680), whose row count scales with the dead
    set (~ nlive * H).  Static shapes need a fixed count, so auto mode
    scales it with the information content the run can actually
    resolve: ``16 * nlive`` rounded up to a power of two, clamped to
    [512, 4096].  At the cube-fit default nlive=100 this is 2048 --
    enough that the 3-sigma band (two-sided tail mass 2.7e-3) carries
    ~5 expected samples, where the old fixed 512 carried ~1.4 (VERDICT
    r3 item 8: stored tail quantiles were resampling noise).  The
    marginals are unaffected either way (always computed from the full
    weighted dead+live set).
    """
    if n_post and n_post > 0:
        return int(n_post)
    return int(min(4096, max(512, 2 ** int(np.ceil(np.log2(16 * nlive))))))


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


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "n_modes", "mode_lnz", "mode_mean", "mode_sigma", "mode_map",
        "mode_frac", "membership",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ModeProducts:
    """Per-mode posterior decomposition (the TPU-native analogue of
    MultiNest's ``mmodal`` mode separation, reference core.pyx:746-747
    and the multinest README's per-mode statistics).

    Modes are found on the weighted posterior sample set (unit-cube
    coordinates, per-dimension standardized): farthest-point seeding +
    weighted k-means into ``max_modes`` clusters, then single-linkage
    merging of clusters whose centroid separation is within
    ``merge_fact`` times the sum of their radii, so a unimodal
    posterior reports one mode no matter how many k-means pieces it
    was cut into.  Empty mode slots carry ``mode_lnz = -inf`` and zero
    statistics.

    ``mode_lnz`` are *local* evidences: ``logsumexp`` of the member
    samples' posterior mass plus the global ``lnz``, so
    ``logsumexp(mode_lnz, axis=-1) == lnz`` up to masked slots.
    """

    n_modes: jax.Array     # [R] number of distinct modes found
    mode_lnz: jax.Array    # [R, K] local ln evidence per mode slot
    mode_mean: jax.Array   # [R, K, D] posterior mean (physical theta)
    mode_sigma: jax.Array  # [R, K, D] posterior std (physical theta)
    mode_map: jax.Array    # [R, K, D] max-posterior-mass member
    mode_frac: jax.Array   # [R, K] posterior mass fraction per mode
    membership: jax.Array  # [R, N] mode slot id per sample (-1 masked)


def _modes_single(u, theta, lnp, lnz, max_modes, n_iter, merge_fact):
    """Mode separation for ONE run (vmapped over R by caller).

    u : [N, D] unit-cube samples; theta : [N, D] physical samples;
    lnp : [N] normalized ln posterior mass (masked entries ~ -1e30).
    """
    N, D = u.shape
    K = max_modes
    dtype = u.dtype
    w = jnp.exp(lnp)                                   # [N], sums to 1
    live = lnp > _NEG / 2
    # standardize: distances in units of the global posterior std
    mean = jnp.sum(w[:, None] * u, axis=0)
    std = jnp.sqrt(
        jnp.sum(w[:, None] * (u - mean) ** 2, axis=0)
    )
    x = (u - mean) / jnp.maximum(std, 1e-6)            # [N, D]
    x = jnp.where(live[:, None], x, 1e6)               # park masked rows

    # farthest-point seeding from the MAP sample (deterministic)
    seed0 = x[jnp.argmax(lnp)]
    seeds0 = jnp.tile(seed0[None], (K, 1))

    def seed_step(k, seeds):
        d2 = jnp.min(
            jnp.sum((x[:, None, :] - seeds[None]) ** 2, axis=-1), axis=1
        )
        # only meaningfully-weighted samples can seed a mode: stray
        # low-mass outliers would otherwise claim slots
        score = jnp.where(w > 1e-4 / N * jnp.sum(live), d2, -1.0)
        return seeds.at[k].set(x[jnp.argmax(score)])

    seeds = lax.fori_loop(1, K, seed_step, seeds0)

    def km_step(_, carry):
        cent, _assign = carry
        d2 = jnp.sum((x[:, None, :] - cent[None]) ** 2, axis=-1)  # [N,K]
        assign = jnp.argmin(d2, axis=1).astype(jnp.int32)         # [N]
        onehot = (assign[:, None] == jnp.arange(K)[None]) & live[:, None]
        wk = jnp.sum(w[:, None] * onehot, axis=0)                 # [K]
        new = jnp.einsum("n,nk,nd->kd", w, onehot.astype(dtype), x)
        new = new / jnp.maximum(wk, 1e-30)[:, None]
        cent = jnp.where((wk > 0)[:, None], new, cent)
        return cent, assign

    cent, assign = lax.fori_loop(
        0, n_iter, km_step, (seeds, jnp.zeros((N,), jnp.int32))
    )
    d2 = jnp.sum((x[:, None, :] - cent[None]) ** 2, axis=-1)
    assign = jnp.argmin(d2, axis=1).astype(jnp.int32)
    onehot = (assign[:, None] == jnp.arange(K)[None]) & live[:, None]
    wk = jnp.sum(w[:, None] * onehot, axis=0)                     # [K]
    # cluster radius: rms standardized distance of members to centroid
    d2_own = jnp.take_along_axis(d2, assign[:, None], axis=1)[:, 0]
    r2 = jnp.sum(
        w[:, None] * onehot * d2_own[:, None], axis=0
    ) / jnp.maximum(wk, 1e-30)
    rad = jnp.sqrt(r2)                                            # [K]

    # single-linkage merge: clusters closer than merge_fact * (r_i +
    # r_j) belong to one mode; transitive closure via K boolean steps
    cdist = jnp.sqrt(
        jnp.sum((cent[:, None, :] - cent[None]) ** 2, axis=-1)
    )
    nonempty = wk > 1e-12
    link = (
        cdist <= merge_fact * (rad[:, None] + rad[None, :])
    ) & nonempty[:, None] & nonempty[None, :]
    link = link | jnp.eye(K, dtype=bool)

    def closure(_, m):
        mi = m.astype(jnp.int32)
        return ((mi @ mi) > 0) | m

    link = lax.fori_loop(0, int(np.ceil(np.log2(max(K, 2)))) + 1,
                         closure, link)
    # component label = smallest linked cluster index
    comp = jnp.min(
        jnp.where(link, jnp.arange(K)[None, :], K), axis=1
    )                                                             # [K]
    comp = jnp.where(nonempty, comp, K)
    mode_of_sample = jnp.where(live, comp[assign], K)

    # per-mode statistics over the K slots (slot k = component label k;
    # slots that are not a component root stay empty)
    slot_hot = (
        mode_of_sample[:, None] == jnp.arange(K)[None]
    )                                                             # [N,K]
    frac = jnp.sum(w[:, None] * slot_hot, axis=0)                 # [K]
    used = frac > 1e-12
    lnp_k = jnp.where(slot_hot, lnp[:, None], _NEG)               # [N,K]
    mode_lnz = jax.scipy.special.logsumexp(lnp_k, axis=0) + lnz
    mode_lnz = jnp.where(used, mode_lnz, -jnp.inf)
    wh = w[:, None] * slot_hot / jnp.maximum(frac, 1e-30)[None, :]
    m_mean = jnp.einsum("nk,nd->kd", wh, theta)
    m_var = jnp.einsum(
        "nk,nkd->kd", wh, (theta[:, None, :] - m_mean[None]) ** 2
    )
    map_ix = jnp.argmax(lnp_k, axis=0)                            # [K]
    m_map = theta[map_ix]
    zero = jnp.zeros_like(m_mean)
    return (
        jnp.sum(used.astype(jnp.int32)),
        mode_lnz,
        jnp.where(used[:, None], m_mean, zero),
        jnp.where(used[:, None], jnp.sqrt(m_var), zero),
        jnp.where(used[:, None], m_map, zero),
        jnp.where(used, frac, 0.0),
        jnp.where(live, mode_of_sample, -1).astype(jnp.int32),
    )


def posterior_modes(
    result: NSResult,
    transform,
    max_modes: int = 6,
    n_iter: int = 12,
    merge_fact: float = 2.0,
    ztol: float = None,
) -> ModeProducts:
    """Decompose each run's posterior into isolated modes and report
    per-mode local evidences and statistics.

    The capability analogue of running MultiNest with ``mmodal=True``
    (reference core.pyx:727-776 knob set; the reference persists only
    the global lnZ, so this is additional capability, not a store
    requirement).  Batched over runs and jittable; cost is one
    O(N * K) pass over the weighted samples, off the sampling hot
    path.

    ``ztol`` maps MultiNest's ``Ztol`` knob (reference
    core.pyx:756-757: "null log-evidence" floor -- modes whose local
    evidence falls below it are not reported): mode slots with
    ``mode_lnz < ztol`` are masked from the report (lnz -> -inf,
    frac -> 0, members -> -1, n_modes decremented).  ``None`` (the
    default, like the reference pipeline which never sets it) reports
    every mode.
    """
    u_all = jnp.concatenate([result.dead_u, result.live_u], axis=1)
    lnl_all = jnp.concatenate([result.dead_lnl, result.live_lnl], axis=1)
    lnw_all = jnp.concatenate([result.dead_lnw, result.live_lnw], axis=1)
    lnp = jnp.where(lnl_all > _NEG / 2, lnw_all + lnl_all, _NEG)
    lnp = lnp - jax.scipy.special.logsumexp(lnp, axis=1, keepdims=True)
    theta_all = _chunked_transform(transform, u_all)

    out = jax.vmap(
        lambda u, th, lp, lz: _modes_single(
            u, th, lp, lz, max_modes, n_iter, merge_fact
        )
    )(u_all, theta_all, lnp, result.lnz)
    mp = ModeProducts(
        n_modes=out[0], mode_lnz=out[1], mode_mean=out[2],
        mode_sigma=out[3], mode_map=out[4], mode_frac=out[5],
        membership=out[6],
    )
    if ztol is None:
        return mp
    keep = mp.mode_lnz >= ztol                          # [R, K]
    neg = jnp.asarray(-jnp.inf, dtype=mp.mode_lnz.dtype)
    keep_m = jnp.take_along_axis(
        keep, jnp.clip(mp.membership, 0, None), axis=1
    )                                                    # [R, N]
    return dataclasses.replace(
        mp,
        n_modes=jnp.sum(keep, axis=1).astype(mp.n_modes.dtype),
        mode_lnz=jnp.where(keep, mp.mode_lnz, neg),
        mode_frac=jnp.where(keep, mp.mode_frac, 0.0),
        membership=jnp.where(
            (mp.membership >= 0) & keep_m, mp.membership, -1
        ),
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
