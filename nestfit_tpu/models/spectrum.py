"""Spectrum data containers.

TPU-native equivalent of the reference ``Spectrum`` /
``HyperfineSpectrum`` Cython extension types (reference:
nestfit/core/core.pyx:486-550, core.pxd:47-60).

Differences from the reference, by design:

* **Immutable pytree, no scratch buffers.**  The reference mutates
  preallocated ``pred``/``tarr`` arrays in place; here model prediction
  is a pure function returning new arrays, so the container only holds
  data.
* **Relative frequency axis.**  The reference keeps the absolute
  frequency axis in float64.  On TPU we compute in float32, where
  absolute ~24 GHz values have ~2 kHz quantization -- comparable to a
  channel width.  We therefore store ``dnu = xarr - rest_freq`` (the
  subtraction done in float64 on the host) and evaluate all line
  centers relative to ``rest_freq``; values are then ~1e7 Hz with ~1 Hz
  resolution in float32.
* **Batched.**  ``data``/``noise`` may carry leading batch (pixel)
  dimensions; the channel axis is always last (lane axis on TPU).
"""

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from nestfit_tpu.constants import H, KB, TCMB


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["dnu", "data", "noise", "t0", "tbg"],
    meta_fields=["rest_freq", "trans_id", "nu_chan", "size"],
)
@dataclasses.dataclass(frozen=True)
class Spectrum:
    """One transition's observed spectrum plus precomputed channel terms.

    Attributes
    ----------
    dnu : f32[S]
        Frequency offsets from ``rest_freq`` in Hz, ascending, uniform.
    data : f32[..., S]
        Observed brightness temperature in K.  Leading dims are batch
        (pixel) dims.
    noise : f32[...]
        RMS noise in K per batch element (scalar if unbatched).
    t0 : f32[S]
        ``H * nu / KB`` per channel [K] (hyperfine RT term).
    tbg : f32[S]
        ``1 / expm1(T0 / TCMB)`` per channel, the CMB background
        occupation term (reference: ammonia.pyx:272-277).
    rest_freq : float
        Rest frequency in Hz (static).
    trans_id : int
        Transition ID (static; model-specific numbering).
    nu_chan : float
        Channel width in Hz (static).
    size : int
        Number of channels (static).
    """

    dnu: jax.Array
    data: jax.Array
    noise: jax.Array
    t0: jax.Array
    tbg: jax.Array
    rest_freq: float
    trans_id: int
    nu_chan: float
    size: int

    @property
    def xarr(self) -> np.ndarray:
        """Absolute frequency axis in Hz (float64, host-side)."""
        return np.asarray(self.dnu, dtype=np.float64) + self.rest_freq

    @property
    def null_lnZ(self) -> jax.Array:
        """Log-likelihood of the all-zero model (reference core.pyx:518-520)."""
        dev = self.data
        return -jnp.sum(dev * dev, axis=-1) / (2.0 * self.noise**2)

    def loglikelihood(self, pred: jax.Array) -> jax.Array:
        """Gaussian chi-square log-likelihood of a predicted spectrum.

        ``-sum((data - pred)^2) / (2 noise^2)`` over the channel axis
        (reference: core.pyx:522-530; as there, the Gaussian
        normalization prefactor is computed separately and *not*
        included).
        """
        dev = self.data - pred
        return -jnp.sum(dev * dev, axis=-1) / (2.0 * self.noise**2)

    @property
    def prefactor(self) -> jax.Array:
        """Gaussian normalization term (reference core.pyx:517)."""
        return -self.size / 2.0 * jnp.log(2.0 * jnp.pi * self.noise**2)


def make_spectrum(
    xarr,
    data,
    noise,
    rest_freq=None,
    trans_id=-1,
    tcmb: float = TCMB,
    dtype=jnp.float32,
) -> Spectrum:
    """Build a :class:`Spectrum` from host arrays.

    Parameters mirror the reference ``Spectrum.__init__``
    (core.pyx:488-520): ``xarr`` is the absolute frequency axis in Hz
    (ascending, uniform channels), ``data`` the brightness temperatures
    in K, ``noise`` the RMS noise in K.  The CMB background array is
    precomputed here in float64, matching ``AmmoniaSpectrum.__init__``
    (ammonia.pyx:272-277).
    """
    xarr = np.asarray(xarr, dtype=np.float64)
    assert xarr.ndim == 1
    nu_chan = float(xarr[1] - xarr[0])
    assert nu_chan > 0, "frequency axis must be ascending"
    if rest_freq is None:
        rest_freq = float(xarr[xarr.shape[0] // 2])
    # data/noise may be JAX tracers (the batched fitter passes them as
    # jitted-function arguments); validate only when concrete.
    assert data.shape[-1] == xarr.shape[0]
    if isinstance(noise, (int, float, np.ndarray)):
        assert np.all(np.asarray(noise) > 0)
    t0 = H * xarr / KB
    tbg = 1.0 / np.expm1(t0 / tcmb)
    return Spectrum(
        dnu=jnp.asarray(xarr - rest_freq, dtype=dtype),
        data=jnp.asarray(data, dtype=dtype),
        noise=jnp.asarray(noise, dtype=dtype),
        t0=jnp.asarray(t0, dtype=dtype),
        tbg=jnp.asarray(tbg, dtype=dtype),
        rest_freq=float(rest_freq),
        trans_id=int(trans_id),
        nu_chan=nu_chan,
        size=int(xarr.shape[0]),
    )
