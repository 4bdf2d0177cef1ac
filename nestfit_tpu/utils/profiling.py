"""Profiling and timing utilities.

Rebuild of the reference's ad-hoc profiling entry points
(reference: main.py:1297-1334 ``profile_nested``; the cache-perturbed
kernel microbenchmarks ammonia.pyx:524-532) on ``jax.profiler`` and
simple wall-clock harnesses.
"""

import contextlib
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir="/tmp/nestfit_trace"):
    """Capture a jax.profiler trace (viewable in XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, n_repeat=10, warmup=2, **kwargs):
    """Median wall time of a jitted function (blocks on the result)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(n_repeat):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def profile_predict(runner, ncomp=None, batch=1024, n_repeat=10, seed=0):
    """Microbenchmark the batched model-predict + chi-square path
    (the role of ``test_profile_predict``, ammonia.pyx:524-532)."""
    import jax.numpy as jnp
    from jax import random

    ncomp = ncomp or runner.ncomp
    ndim = runner.n_model * ncomp
    u = random.uniform(random.key(seed), (batch, ndim), dtype=jnp.float32)
    fn = jax.jit(lambda uu: runner.loglike_unit(uu))
    dt = time_fn(fn, u, n_repeat=n_repeat)
    return {
        "batch": batch,
        "sec_per_call": dt,
        "evals_per_sec": batch / dt,
    }
