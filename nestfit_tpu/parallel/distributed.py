"""Multi-host execution utilities.

The reference's parallelism is single-host multiprocessing with one
HDF5 chunk file per process (reference main.py:505-523;
docs/store_spec.rst:12-20).  The TPU-native multi-host analogue: each
host process runs the same program under ``jax.distributed``, global
device mesh axes span hosts over ICI/DCN, and each host writes its own
store chunk file (the chunk-per-writer layout maps one-to-one onto
hosts).  Collectives stay inside XLA; the filesystem "reduce" is the
same external-link step as single-host.
"""

import numpy as np

import jax

from nestfit_tpu.utils import get_logger

log = get_logger("nestfit_tpu.distributed")


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize multi-host JAX (no-op for a single process).

    Wraps ``jax.distributed.initialize``: on TPU pods the arguments
    are discovered from the environment; elsewhere pass them
    explicitly.  Safe to call unconditionally -- a single-process run
    skips initialization.
    """
    if num_processes in (None, 1) and coordinator_address is None:
        if jax.process_count() == 1:
            log.info("single-process run; jax.distributed not initialized")
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def host_pixel_shard(n_pix, process_index=None, process_count=None):
    """Contiguous flat-pixel range owned by this host.

    Returns (lo, hi) bounds into the flattened pixel index space.
    Prefer :func:`host_pixel_stripe` for fitting work: a contiguous
    range hands one host all the slow pixels when signal clusters
    spatially; this helper remains for consumers that need contiguous
    IO extents.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    bounds = np.linspace(0, n_pix, pc + 1).astype(int)
    return int(bounds[pi]), int(bounds[pi + 1])


def host_pixel_stripe(n_pix, process_index=None, process_count=None):
    """Interleaved flat-pixel indices owned by this host.

    Striping (pixel ``i`` -> host ``i % process_count``) balances
    spatially clustered signal across hosts -- the multi-host analogue
    of the reference's longitude-interleaved worker striping
    (reference main.py:565-571).  Each host fits its own stripe and
    writes its own chunk files with no inter-host communication.

    Returns an int index array into the flattened pixel index space;
    the stripes of all hosts partition ``range(n_pix)`` exactly.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return np.arange(pi, n_pix, pc)


def host_chunk_name(prefix="chunk"):
    """Per-host chunk file stem (``chunk<process_index>``)."""
    return f"{prefix}{jax.process_index()}"
