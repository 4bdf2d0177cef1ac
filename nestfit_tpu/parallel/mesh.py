"""Device-mesh utilities for multi-chip cube fitting.

TPU-native equivalent of the reference's process-level data
parallelism (reference: main.py:505-523 -- pixel lists striped over
forked processes with no inter-process communication).  Here the pixel
batch axis is sharded over a ``jax.sharding.Mesh``:

* ``dp`` (data-parallel) axis: pixels.  Every sampler/fit operation is
  independent per pixel, so the fit must span chips with ZERO
  collectives on this axis.  Traced-mode fits enforce that with a
  ``shard_map`` manual region over ``dp`` (sampler.
  _run_traced_shard_map): left to GSPMD alone, the partitioner punts
  on batch-sharded top_k/gather/scatter and inserts per-iteration
  cross-dp all-gathers (measured; pinned by tests/test_parallel.py::
  test_dp_axis_is_communication_free).  Host-driven segmented fits
  stay on GSPMD with per-run state pinned to ``dp`` at program
  boundaries (sampler._pin_dp).
* ``sp`` (sequence/channel-parallel) axis: optional sharding of the
  spectral channel axis.  The chi-square channel reduction then
  lowers to an sp-grouped all-reduce (rides ICI); inside the
  traced-mode manual region the ``sp`` axis stays automatic
  (``shard_map(axis_names={"dp"})``), so GSPMD still inserts exactly
  those reductions.  Useful only for very long spectra; for the
  reference's 100-1000 channels a single chip holds the channel axis
  comfortably (SURVEY.md section 2.3), so the default mesh is
  1 x n_devices on ``dp``.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, sp=1, devices=None) -> Mesh:
    """Build a ``(dp, sp)`` mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices % sp == 0, (n_devices, sp)
    dp = n_devices // sp
    arr = np.asarray(devices[:n_devices]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def pixel_sharding(mesh: Mesh, shard_channels: bool = False) -> NamedSharding:
    """Sharding for per-pixel arrays ``[R, ...]`` (leading pixel axis
    on ``dp``; optionally trailing channel axis on ``sp``)."""
    if shard_channels:
        return NamedSharding(mesh, P("dp", "sp"))
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pixel_batch(mesh: Mesh, tree, shard_channels: bool = False):
    """Place a pytree of per-pixel arrays on the mesh with the pixel
    axis sharded over ``dp``.

    Arrays whose leading dimension is not divisible by the ``dp`` size
    must be padded first (see ``pad_to_multiple``).
    """
    sh = pixel_sharding(mesh, shard_channels)

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        spec = [None] * x.ndim
        spec[0] = "dp"
        if shard_channels and x.ndim >= 2:
            spec[-1] = "sp"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)


def pad_to_multiple(arr, multiple, axis=0, fill=0.0):
    """Pad ``axis`` up to the next multiple (returns array, n_valid)."""
    arr = np.asarray(arr)
    n = arr.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - n)
    return np.pad(arr, widths, constant_values=fill), n
