"""Worker process for the two-process multi-host store-shard test.

Launched by tests/test_parallel.py::test_two_process_store_shards as
``python _dist_worker.py <coord_addr> <process_id> <num_processes>
<store_name>``.  Each worker initializes ``jax.distributed`` (CPU
backend), fits its ``host_pixel_shard`` of the shared synthetic cube,
and writes per-host chunk shards (``chunk_h<pid>_*.hdf``) without ever
opening ``table.hdf`` -- the multi-host layout of
parallel/distributed.py (reference analogue: one chunk per process,
docs/store_spec.rst:12-20).  The parent links the shards afterwards.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))


def main():
    coord, pid, nproc, store_name = sys.argv[1:5]
    pid, nproc = int(pid), int(nproc)

    import jax

    # the environment may pin JAX_PLATFORMS to a TPU plugin via a site
    # hook that wins over os.environ (see tests/conftest.py); the
    # config route always works, and the CPU backend is required for
    # multi-process process_count/collectives here
    jax.config.update("jax_platforms", "cpu")

    # same persistent compile cache the main suite uses: cold two-
    # process compiles are the dominant wall here, and asymmetric
    # cache hits between the workers are absorbed by the explicit
    # done-barrier below
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_cpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from nestfit_tpu.parallel.distributed import initialize_distributed

    mode = "jax.distributed"
    try:
        initialize_distributed(
            coordinator_address=coord, num_processes=nproc, process_id=pid,
        )
        assert jax.process_count() == nproc
        proc_kwargs = {}
    except Exception as exc:  # pragma: no cover - env-dependent
        # fall back to explicit ids: still a genuine 2-process shard
        # run, just without the jax.distributed control plane
        mode = f"explicit ({exc!r})"
        proc_kwargs = {"process_id": pid, "process_count": nproc}

    import numpy as np

    from nestfit_tpu import oracle
    from nestfit_tpu.cube import CubeFitter, CubeStack, DataCube
    from nestfit_tpu.models import AmmoniaRunner
    from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS
    from nestfit_tpu.priors import get_irdc_priors
    from nestfit_tpu.utils import freq_axis_from_velocity

    # identical cube on every host (same seed)
    n_lon, n_lat, n_chan = 4, 2, 64
    noise = 0.1
    rng = np.random.default_rng(9)
    vaxis = np.linspace(-10, 10, n_chan)
    params = np.array([0.3, 11.0, 5.5, 14.5, 0.4, 0.0])
    cubes = []
    for tid in (1, 2):
        xarr = freq_axis_from_velocity(vaxis, AMMONIA_TRANSITIONS[tid - 1].nu)
        data = rng.normal(scale=noise, size=(n_lon, n_lat, n_chan))
        truth = oracle.amm_predict(xarr, params, trans_id=tid)
        for (lo, b) in [(0, 0), (2, 1)]:
            data[lo, b] += truth
        cubes.append(DataCube(data, xarr, noise_map=noise, trans_id=tid))
    stack = CubeStack(cubes)
    fitter = CubeFitter(
        stack, get_irdc_priors(vsys=0.0), AmmoniaRunner, ncomp_max=1,
        ns_kwargs={"nlive": 40, "tol": 1.0}, batch_size=4, n_post=64,
        nlive_buckets=1,
    )
    fitter.fit_cube(
        store_name=store_name, seed=4, host_shard=True, link=False,
        **proc_kwargs,
    )
    if mode == "jax.distributed":
        # host_shard fits run independently per process, so compile-
        # cache asymmetry can skew completion by many minutes; without
        # an explicit long-deadline rendezvous the fast worker times
        # out jax.distributed's fixed ~5-min SHUTDOWN barrier and the
        # whole run aborts.  Rendezvous here with a generous deadline
        # so both processes reach shutdown together.
        from jax._src import distributed as _jdist

        _jdist.global_state.client.wait_at_barrier(
            "nestfit_dist_worker_done", timeout_in_ms=14 * 60 * 1000,
        )
    print(f"worker {pid}/{nproc} done via {mode}", flush=True)


if __name__ == "__main__":
    main()
