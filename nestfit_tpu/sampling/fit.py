"""Fit orchestration: runner + nested sampler + posterior products.

The per-pixel fit pipeline of the reference --
``run_multinest(runner, dumper)`` plus the ``mn_dump`` output capture
(reference: core/core.pyx:727-823, 627-687) -- as one jitted batched
function: a batch of R pixels' spectra goes in, a complete set of
per-pixel evidences, posteriors, marginals, and information criteria
comes out.
"""

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import random

from nestfit_tpu.models.runner import Runner
from nestfit_tpu.sampling.results import (
    PosteriorProducts,
    information_criteria,
    posterior_products,
)
from nestfit_tpu.sampling.sampler import NSConfig, NSResult, run_nested


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ns", "products", "null_lnz", "ics"],
    meta_fields=["ncomp", "n_params", "n_chan_tot"],
)
@dataclasses.dataclass(frozen=True)
class FitResult:
    """Everything ``mn_dump`` persists, for a batch of R runs
    (reference core.pyx:645-687)."""

    ns: NSResult
    products: PosteriorProducts
    null_lnz: jax.Array     # [R]
    ics: dict               # BIC/AIC/AICc + null variants, each [R]
    ncomp: int
    n_params: int
    n_chan_tot: int

    @property
    def lnz(self):
        return self.ns.lnz

    @property
    def lnz_err(self):
        return self.ns.lnz_err


# caches for the segmented path (stable identity per runner template
# -> compile reuse across pixel batches with fresh data)
_LOGLIKE_CACHE = {}
_FINALIZE_CACHE = {}
# AOT-compiled finalize executables installed by sampling.aot, keyed
# (id(runner), n_post, dtype name, n_runs); consulted by fit_batch
# with the jit path as mismatch fallback
_FINALIZE_AOT = {}


def _loglike2_for(runner: Runner, dtype):
    key = (id(runner), jnp.dtype(dtype).name)
    if key not in _LOGLIKE_CACHE:
        def loglike2(u, data):
            return runner.with_data(data).loglike_unit(u).astype(dtype)

        from nestfit_tpu.sampling.sampler import _cache_put

        _cache_put(_LOGLIKE_CACHE, key, (loglike2, runner))
    return _LOGLIKE_CACHE[key][0]


def _finalize_for(runner: Runner, n_post, dtype):
    key = (id(runner), n_post, jnp.dtype(dtype).name)
    if key not in _FINALIZE_CACHE:
        def finalize(ns, data, k_post):
            r2 = runner.with_data(data)
            products = posterior_products(
                ns, lambda u: r2.transform(u), k_post, n_post=n_post
            )
            null_lnz = jnp.broadcast_to(
                jnp.asarray(r2.null_lnZ, dtype=dtype), ns.lnz.shape
            )
            ics = information_criteria(
                ns.max_loglike, null_lnz, r2.n_chan_tot, r2.n_params
            )
            return products, null_lnz, ics

        from nestfit_tpu.sampling.sampler import _cache_put

        _cache_put(_FINALIZE_CACHE, key, (jax.jit(finalize), runner))
    return _FINALIZE_CACHE[key][0]


def fit_batch(
    key,
    runner: Runner,
    n_runs: int,
    config: NSConfig = NSConfig(),
    n_post: int = 0,
    dtype=jnp.float32,
    segment_iters: int = 0,
    data=None,
    active=None,
) -> FitResult:
    """Fit a batch of pixels with nested sampling.

    The runner's spectra must hold per-pixel data with leading batch
    dim ``n_runs`` (or unbatched data broadcast to every run).  This is
    the batched analogue of one ``run_multinest`` call per pixel
    (reference main.py:448-472 inner loop).

    With ``segment_iters > 0`` the sampler runs as a host-driven loop
    of bounded device segments (robust on real hardware, not jittable
    from outside); pass ``data`` (``runner.data_tree()``-structured)
    to substitute fresh pixel data while reusing the compiled sampler
    of this runner template.  ``active`` marks padding rows of a
    partial batch as born-done (their results are meaningless; see
    ``run_nested``).

    ``n_post`` is the stored equal-weight posterior sample count;
    0 (default) scales it with ``config.nlive`` (see
    ``results.resolve_n_post``).
    """
    from nestfit_tpu.sampling.results import resolve_n_post

    n_post = resolve_n_post(n_post, config.nlive)
    k_ns, k_post = random.split(key)

    # likelihood-flat unit-cube dims (ConstantPrior rows etc.): let the
    # sampler skip bounding them
    if not config.flat_dims and runner.utrans is not None:
        flat = getattr(runner.utrans, "flat_dims", None)
        if flat is not None:
            config = dataclasses.replace(
                config, flat_dims=tuple(flat(runner.ncomp))
            )

    if segment_iters and segment_iters > 0:
        if data is None:
            data = runner.data_tree()
        loglike2 = _loglike2_for(runner, dtype)
        ns = run_nested(
            k_ns, loglike2, runner.ndim, n_runs, config, dtype=dtype,
            data=data, segment_iters=segment_iters, active=active,
        )
        fin = _finalize_for(runner, n_post, dtype)
        fkey = (id(runner), n_post, jnp.dtype(dtype).name, n_runs)
        aot = _FINALIZE_AOT.get(fkey)
        if aot is not None:
            from nestfit_tpu.sampling.sampler import _AotDispatch

            if not isinstance(aot, _AotDispatch):
                # (name, compiled, runner) installed by sampling.aot;
                # the runner ref keeps the id()-key from being reused.
                # The dispatch wrapper pins it transitively via the
                # _FINALIZE_CACHE fallback closure built above.
                aot = _AotDispatch(aot[0], aot[1], fin)
                _FINALIZE_AOT[fkey] = aot
            fin = aot
        products, null_lnz, ics = fin(ns, data, k_post)
    else:
        assert data is None, (
            "data substitution requires segment_iters > 0; in traced "
            "mode the runner's own spectra are used"
        )

        # route the runner's own per-pixel data through the explicit
        # (loglike2, data) form: run_nested's traced multi-chip path
        # (shard_map over dp) needs the data as arguments, not closure
        ns = run_nested(k_ns, _loglike2_for(runner, dtype), runner.ndim,
                        n_runs, config, dtype=dtype,
                        data=runner.data_tree(), active=active)
        products = posterior_products(
            ns, lambda u: runner.transform(u), k_post, n_post=n_post
        )
        null_lnz = jnp.broadcast_to(
            jnp.asarray(runner.null_lnZ, dtype=dtype), (n_runs,)
        )
        ics = information_criteria(
            ns.max_loglike, null_lnz, runner.n_chan_tot, runner.n_params
        )
    return FitResult(
        ns=ns,
        products=products,
        null_lnz=null_lnz,
        ics=ics,
        ncomp=runner.ncomp,
        n_params=runner.n_params,
        n_chan_tot=runner.n_chan_tot,
    )


def align_fit_meta(fit_b: FitResult, like: FitResult) -> FitResult:
    """Rewrite ``fit_b``'s NSResult pytree METADATA (nlive, ndim,
    max_iter) to match ``like``'s so ``merge_fit_rows`` can tree_map
    the two (register_dataclass meta fields are part of the treedef).

    Used by the boundary refinement, where the refined batch ran at a
    higher ``nlive``: live-point arrays whose length disagrees are
    truncated to ``like``'s (their rows become an arbitrary subset --
    harmless, the posterior products were already computed from the
    full set inside ``fit_batch`` and the store persists only those
    products plus scalar attrs).  ``n_samples`` of refined rows then
    undercounts by the nlive difference; the scalar record attrs
    (lnz, ncall, n_dead) are exact.
    """
    ns_b, ns_a = fit_b.ns, like.ns
    if (ns_b.nlive, ns_b.ndim, ns_b.max_iter) == (
            ns_a.nlive, ns_a.ndim, ns_a.max_iter):
        return fit_b
    L = ns_a.nlive
    ns_new = dataclasses.replace(
        ns_b,
        live_u=ns_b.live_u[:, :L],
        live_lnl=ns_b.live_lnl[:, :L],
        live_lnw=ns_b.live_lnw[:, :L],
        dead_u=ns_b.dead_u[:, : ns_a.max_iter],
        dead_lnl=ns_b.dead_lnl[:, : ns_a.max_iter],
        dead_lnw=ns_b.dead_lnw[:, : ns_a.max_iter],
        nlive=ns_a.nlive,
        ndim=ns_a.ndim,
        max_iter=ns_a.max_iter,
    )
    return dataclasses.replace(fit_b, ns=ns_new)


def merge_fit_rows(fit_a: FitResult, fit_b: FitResult, dst_rows,
                   src_rows, n_rows_a: int, n_rows_b: int) -> FitResult:
    """Replace run rows ``dst_rows`` of ``fit_a`` with rows
    ``src_rows`` of ``fit_b``, leaf by leaf (on device).

    Used by the mode-loss retry: when a rerun of a failed pixel
    produces a consistent evidence, its entire per-run record
    (posteriors, products, ICs) replaces the failed one.  Leaves whose
    leading axis is not the run axis pass through from ``fit_a``.
    """
    dst = jnp.asarray(np.asarray(dst_rows, dtype=np.int64))
    src = jnp.asarray(np.asarray(src_rows, dtype=np.int64))

    def mg(a, b):
        if (getattr(a, "ndim", 0) >= 1 and a.shape[0] == n_rows_a
                and getattr(b, "ndim", 0) >= 1
                and b.shape[0] == n_rows_b
                and a.shape[1:] == b.shape[1:]):
            return jnp.asarray(a).at[dst].set(jnp.asarray(b)[src])
        return a

    return jax.tree_util.tree_map(mg, fit_a, fit_b)


def fit_single(key, runner: Runner, config: NSConfig = NSConfig(nlive=400, tol=0.5),
               n_post: int = 0, dtype=jnp.float32) -> FitResult:
    """Single-spectrum fit, the ``test_nested`` entry point equivalent
    (reference main.py:1279-1294; single-fit defaults nlive=400,
    tol=0.5 per core.pyx:729-731)."""
    return fit_batch(key, runner, 1, config, n_post=n_post, dtype=dtype)
