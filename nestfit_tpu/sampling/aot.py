"""Ahead-of-time parallel precompilation of the sampler's programs.

Why this exists: through a remote-tunneled TPU worker a single XLA
compile of one sampler segment takes 25-600 s (measured variance), and
a warmup pass that discovers its programs *serially* -- each compile
triggered only when the host loop first needs it -- pays the SUM of
those walls.  In the round-1/2 driver runs that was ~1,000 s of a
1,500 s bench budget, with the persistent compile cache silently
missing (VERDICT r2, weak item 1).  XLA compilation happens outside
the GIL (and, on tunneled backends, on the server side), so compiling
the full program set CONCURRENTLY costs roughly the *max* program
wall instead of the sum -- measured 4.5x on four mid-size programs,
more at bench scale.

This module enumerates the exact ``(program kind, batch-size class)``
set a segmented :func:`~nestfit_tpu.sampling.sampler.run_nested` fit
will dispatch, lowers and compiles each in a thread pool, and installs
the compiled executables into the sampler's AOT cache
(``sampler._AOT_CACHE``, consulted by ``_get_jit``) and the fit
finalizer's (``fit._FINALIZE_AOT``).  A dispatch wrapper falls back to
the ordinary jit path on any call-signature mismatch, so a stale plan
can never break a run -- it only costs the compile it was meant to
hide.

It also counts persistent-compile-cache hits and misses per program
(via the ``jax._src.compiler`` log messages, attributed by compiling
thread), so a slow warmup in a driver environment is *diagnosable*
from the bench JSON instead of invisible.

The program plan (bench defaults, per ncomp rung):

==============  =======================================================
``init@R``      initial live-set draw + chunked evaluation
``cand@R``      candidate (ellipsoid-rejection) segment, R = full batch
``slice@R``     kill+slice segment at the full batch size
``slice@c``     straggler-compaction classes c = min_compact * 4^k
``fin@R``       evidence finalization (single signature, bounds-free)
``finalize@R``  posterior products + information criteria (fit.py)
==============  =======================================================

Programs whose traced HLO coincides (e.g. a retry template's
``slice@64`` vs the main batch's compaction class ``slice@64``)
deduplicate through the persistent compile cache: the second compile
of an identical serialized module is a cache hit, not a new compile.
"""

import dataclasses
import logging
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import wait as futures_wait
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import random

from nestfit_tpu.sampling import sampler as _S


# thread-id -> program name, for attributing persistent-cache log
# records (emitted by jax._src.compiler on the compiling thread)
_CURRENT = {}


class _CacheLogCounter(logging.Handler):
    """Counts persistent-compile-cache hit/miss log records, attributed
    to the program whose compile is running on the emitting thread."""

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.hits = {}
        self.misses = {}

    def emit(self, record):  # noqa: D102
        msg = record.getMessage()
        name = _CURRENT.get(record.thread, "<other>")
        if "Persistent compilation cache hit" in msg:
            self.hits[name] = self.hits.get(name, 0) + 1
        elif "PERSISTENT COMPILATION CACHE MISS" in msg:
            self.misses[name] = self.misses.get(name, 0) + 1


@dataclasses.dataclass
class _Task:
    name: str
    fn: object          # jit-wrapped callable
    templates: tuple    # ShapeDtypeStruct pytrees (positional args)
    install: object     # callable(compiled) -> None


def _install_sampler(key, name, compiled):
    _S._cache_put(_S._AOT_CACHE, key, (name, compiled))


def _install_finalize(key, name, runner, compiled):
    from nestfit_tpu.sampling import fit as _F

    # the runner rides along as a strong reference: the cache key is
    # id(runner), so without it a garbage-collected runner could free
    # its id for reuse by a NEW runner that would then silently hit
    # this entry (the other fit-level caches pin their runner the same
    # way)
    _S._cache_put(_F._FINALIZE_AOT, key, (name, compiled, runner))


def _sds(x):
    return jax.ShapeDtypeStruct(tuple(np.shape(x)), jnp.result_type(x))


def build_plan(
    runner,
    n_runs,
    config=None,
    *,
    n_post=0,
    dtype=jnp.float32,
    data=None,
    r_classes=None,
    kinds_full=("init", "cand", "slice", "fin", "finalize", "rebuild"),
    kinds_classes=("slice", "rebuild"),
    label=None,
):
    """Enumerate the AOT tasks for one segmented ``fit_batch`` call.

    Mirrors the dispatch of ``run_nested(segment_iters>0)`` +
    ``fit_batch``: full-batch init/cand/slice/fin/finalize programs
    plus the straggler-compaction classes ``min_compact * 4^k``
    (``kinds_classes`` controls which segment kinds are speculatively
    compiled per class; the candidate program rarely survives to
    compaction under the auto regime switch, so only the slice kind is
    included by default).
    """
    from nestfit_tpu.sampling import fit as _F
    from nestfit_tpu.sampling.sampler import NSConfig

    from nestfit_tpu.sampling.results import resolve_n_post

    config = config if config is not None else NSConfig()
    n_post = resolve_n_post(n_post, config.nlive)
    if not config.flat_dims and runner.utrans is not None:
        flat = getattr(runner.utrans, "flat_dims", None)
        if flat is not None:
            config = dataclasses.replace(
                config, flat_dims=tuple(flat(runner.ncomp))
            )
    ndim = runner.ndim
    rcfg = config.resolved(ndim)
    if data is None:
        data = runner.data_tree()
    # the SAME normalized wrapper run_nested will key its program
    # cache on (memoized; see sampler._normalize_loglike)
    loglike2, data = _S._normalize_loglike(
        _F._loglike2_for(runner, dtype), data
    )
    label = label or f"n{runner.ncomp}"
    key_t = jax.eval_shape(lambda: random.key(0))
    i32_t = jax.ShapeDtypeStruct((), jnp.int32)

    def data_t(r):
        def cut(x):
            shp = tuple(np.shape(x))
            if len(shp) >= 1 and shp[0] == n_runs:
                return jax.ShapeDtypeStruct((r,) + shp[1:],
                                            jnp.result_type(x))
            return _sds(x)

        return jax.tree_util.tree_map(cut, data)

    def to_slice(s):
        b = s.bounds
        return dataclasses.replace(
            s, bounds=(b[1][:, 0], b[0][:, 0], b[2][:, 0])
        )

    def seg_fn(kind, r):
        return _S._get_jit(loglike2, rcfg, ndim, r, dtype, kind)

    if r_classes is None:
        r_classes, c = [], rcfg.min_compact
        while c <= n_runs // 4:
            r_classes.append(c)
            c *= 4

    tasks = []

    def add(kind, r, fn, templates, install=None):
        key = _S._jit_key(loglike2, rcfg, ndim, r, dtype, kind)
        name = f"{label}:{kind}@{r}"
        tasks.append(_Task(
            name, fn, templates,
            install or partial(_install_sampler, key, name),
        ))

    init_fn = seg_fn("init", n_runs)
    st_cand = jax.eval_shape(init_fn, key_t, data_t(n_runs))
    st_slice = jax.eval_shape(to_slice, st_cand)
    st_fin = dataclasses.replace(st_cand, bounds=())

    if "init" in kinds_full:
        add("init", n_runs, init_fn, (key_t, data_t(n_runs)))
    if "cand" in kinds_full:
        add("cand", n_runs, seg_fn("cand", n_runs),
            (st_cand, data_t(n_runs), i32_t))
    if "slice" in kinds_full:
        add("slice", n_runs, seg_fn("slice", n_runs),
            (st_slice, data_t(n_runs), i32_t))
    if "fin" in kinds_full:
        add("fin", n_runs, seg_fn("fin", n_runs), (st_fin,))
    if "rebuild" in kinds_full:
        # two-way switch probe (run_nested's slice branch): no
        # likelihood in the graph, so this compiles in seconds and
        # dedups across retry families sharing (config, ndim, R)
        add("rebuild", n_runs, seg_fn("rebuild", n_runs), (st_slice,))
    if "finalize" in kinds_full:
        ns_t = jax.eval_shape(seg_fn("fin", n_runs), st_fin)
        fin_jit = _F._finalize_for(runner, n_post, dtype)
        fkey = (id(runner), n_post, jnp.dtype(dtype).name, n_runs)
        name = f"{label}:finalize@{n_runs}"
        tasks.append(_Task(
            name, fin_jit, (ns_t, data_t(n_runs), key_t),
            partial(_install_finalize, fkey, name, runner),
        ))

    for r in r_classes:
        st_cand_r = jax.eval_shape(seg_fn("init", r), key_t, data_t(r))
        if "cand" in kinds_classes:
            add("cand", r, seg_fn("cand", r),
                (st_cand_r, data_t(r), i32_t))
        if "slice" in kinds_classes:
            st_slice_r = jax.eval_shape(to_slice, st_cand_r)
            add("slice", r, seg_fn("slice", r),
                (st_slice_r, data_t(r), i32_t))
        if "rebuild" in kinds_classes:
            st_slice_r = jax.eval_shape(to_slice, st_cand_r)
            add("rebuild", r, seg_fn("rebuild", r), (st_slice_r,))
    return tasks


def compile_plan(tasks, max_workers=12, verbose=None, timeout=None):
    """Lower + compile every task concurrently; install executables.

    Tasks whose lowered StableHLO is byte-identical (e.g. a retry
    template's ``slice@64`` vs the main batch's compaction class)
    share ONE backend compile: the first worker to lower a given
    module owns the compile, the rest block on its future and install
    the same executable under their own cache key.

    ``timeout`` (seconds) bounds the WHOLE phase: tasks still running
    when it expires are abandoned (their worker threads keep running
    detached; if one later finishes, its executable still installs)
    and reported as ``n_abandoned``.  Precompilation is an
    optimization -- an abandoned program simply compiles lazily on
    first use -- so a wedged backend compile RPC (observed once on
    the axon TPU tunnel: zero-CPU futex wait with the remote compile
    never returning) must not hang the caller forever.

    Returns a report dict: per-program walls, persistent-cache
    hit/miss counts, error strings for tasks that failed (a failed
    task is non-fatal -- the program just compiles lazily later).
    """
    import hashlib
    from concurrent.futures import Future

    counter = _CacheLogCounter()
    jlog = logging.getLogger("jax._src.compiler")
    old_level, old_prop = jlog.level, jlog.propagate
    jlog.addHandler(counter)
    if not jlog.isEnabledFor(logging.DEBUG):
        jlog.setLevel(logging.DEBUG)
        # keep the DEBUG flood out of the root handlers while counting
        jlog.propagate = False

    hlo_futures, hf_lock = {}, threading.Lock()

    def work(task):
        tid = threading.get_ident()
        _CURRENT[tid] = task.name
        t0 = time.perf_counter()
        err, deduped = None, False
        try:
            lowered = task.fn.lower(*task.templates)
            h = hashlib.sha256(
                lowered.as_text().encode()
            ).hexdigest()
            with hf_lock:
                fut = hlo_futures.get(h)
                owner = fut is None
                if owner:
                    fut = hlo_futures[h] = Future()
            if owner:
                try:
                    fut.set_result(lowered.compile())
                except Exception as exc:
                    fut.set_exception(exc)
                    raise
            else:
                deduped = True
            task.install(fut.result())
        except Exception as exc:  # pragma: no cover - backend-specific
            err = f"{type(exc).__name__}: {exc}"
        finally:
            _CURRENT.pop(tid, None)
        wall = time.perf_counter() - t0
        rec = {"name": task.name, "wall_s": round(wall, 1)}
        if deduped:
            rec["deduped"] = True
        if err:
            rec["error"] = err[:300]
        if verbose:
            verbose(f"aot: {task.name} {wall:.1f}s"
                    + (" (hlo-dedup)" if deduped else "")
                    + (f" ERROR {err[:120]}" if err else ""))
        return rec

    t_all = time.perf_counter()
    n_abandoned = 0
    try:
        ex = ThreadPoolExecutor(max_workers=max_workers)
        try:
            futs = {ex.submit(work, t): t for t in tasks}
            ordered = list(futs)
            done, not_done = futures_wait(futs, timeout=timeout)
            # submission order, not set order: keeps the bench JSON's
            # "programs" list stable run-to-run for diffing
            recs = [f.result() for f in ordered if f in done]
            n_abandoned = len(not_done)
            if not_done and verbose:
                names = sorted(futs[f].name for f in not_done)
                verbose(
                    f"aot: TIMEOUT after {timeout:.0f}s -- abandoning "
                    f"{n_abandoned} in-flight compiles "
                    f"({', '.join(names[:8])}"
                    + ("..." if len(names) > 8 else "") + ")"
                )
        finally:
            # wait only when everything finished; abandoned threads
            # are left running detached (they may still install their
            # executables later, which is harmless)
            ex.shutdown(wait=(n_abandoned == 0), cancel_futures=True)
            if n_abandoned:
                # detach the wedged workers from concurrent.futures'
                # atexit bookkeeping: the interpreter-exit handler
                # joins every registered worker thread, so leaving
                # them registered re-creates at exit the exact hang
                # the timeout exists to prevent (callers other than
                # bench.py do not os._exit)
                try:
                    from concurrent.futures import thread as _cft

                    for t in list(ex._threads):
                        _cft._threads_queues.pop(t, None)
                except Exception:
                    pass
    finally:
        jlog.removeHandler(counter)
        jlog.setLevel(old_level)
        jlog.propagate = old_prop

    for r in recs:
        r["cache_hits"] = counter.hits.get(r["name"], 0)
        r["cache_misses"] = counter.misses.get(r["name"], 0)
    report = {
        "wall_s": round(time.perf_counter() - t_all, 1),
        "n_programs": len(tasks),
        "n_errors": sum(1 for r in recs if "error" in r),
        "n_deduped": sum(1 for r in recs if r.get("deduped")),
        "n_abandoned": n_abandoned,
        "cache_hits": sum(counter.hits.values()),
        "cache_misses": sum(counter.misses.values()),
        "programs": recs,
    }
    return report


def precompile_fit(runner, n_runs, config=None, **kw):
    """Build and compile the full AOT plan for one runner template.

    Convenience wrapper: ``compile_plan(build_plan(...))``.  Keyword
    arguments split between the two (``max_workers``/``verbose`` to
    compile_plan, the rest to build_plan).
    """
    cp = {k: kw.pop(k) for k in ("max_workers", "verbose", "timeout")
          if k in kw}
    return compile_plan(build_plan(runner, n_runs, config, **kw), **cp)
