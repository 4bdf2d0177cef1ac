"""Tabulated 1-D prior distributions.

TPU-native rebuild of the reference ``Distribution`` extension type
(reference: nestfit/core/core.pyx:23-161).  Construction happens on the
host with float64 (cumulative trapezoid CDF + spline-inverted PPF on a
uniform quantile grid, core.pyx:34-45); evaluation is pure JAX:

* ``ppf_interp`` -- linear interpolation of the PPF table on the
  uniform quantile grid (core.pyx:47-63), a vectorized gather.
* ``cdf_interp`` -- inverse interpolation of the tabulated CDF onto the
  parameter axis.  The reference bisects (core.pyx:65-107); here we use
  an O(N) masked comparison-sum over the grid axis, which vectorizes
  over arbitrary batches with no data-dependent control flow and also
  works for *batched* CDF arrays (needed by the sequential placement
  prior).
* ``cdf_over_interval`` -- re-normalized, power-law-tapered CDF over a
  sub-interval (core.pyx:109-161).  The reference mutates the stored
  CDF in place; here it is a pure function returning a fresh batched
  CDF array.
"""

import dataclasses
from functools import partial

import numpy as np
from scipy import integrate, interpolate

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["xax", "pdf", "cdf", "ppf", "t0", "t1c", "t2c"],
    meta_fields=["size", "dx", "du", "xmin", "xmax"],
)
@dataclasses.dataclass(frozen=True)
class Distribution:
    """Tabulated distribution: x-axis, PDF, CDF, and PPF tables.

    ``t0``/``t1c``/``t2c`` are cumulative index-moment tables of the
    trapezoid weights (moments centered at the grid midpoint for f32
    range), which let :func:`tapered_interval_invert` evaluate the
    power-law-tapered interval CDF in O(1) memory for integer taper
    exponents -- the hot path of the sequential placement prior.
    """

    xax: jax.Array    # [N] uniform parameter grid
    pdf: jax.Array    # [N]
    cdf: jax.Array    # [N] cumulative probability at xax
    ppf: jax.Array    # [N] parameter value on uniform quantile grid
    t0: jax.Array     # [N] cumsum of trap_i
    t1c: jax.Array    # [N] cumsum of trap_i * (i - center)
    t2c: jax.Array    # [N] cumsum of trap_i * (i - center)^2
    size: int
    dx: float
    du: float
    xmin: float
    xmax: float

    @property
    def center(self) -> float:
        return (self.size - 1) / 2.0


def make_distribution(xax, pdf, dtype=jnp.float32) -> Distribution:
    """Build a :class:`Distribution` from PDF samples on a uniform grid.

    Mirrors reference ``Distribution.__init__`` (core.pyx:25-45):
    cumulative-trapezoid CDF normalized to 1, an epsilon ramp to break
    CDF ties, and a cubic-spline inversion evaluated on a uniform
    quantile grid for the PPF.
    """
    xax = np.asarray(xax, dtype=np.float64)
    pdf = np.asarray(pdf, dtype=np.float64)
    assert xax.ndim == 1 and xax.shape == pdf.shape
    assert xax[1] > xax[0]
    size = xax.shape[0]
    cdf = integrate.cumulative_trapezoid(pdf, xax, initial=0)
    cdf = cdf / cdf.max()
    # strictly-ascending hack for the spline inversion (core.pyx:37-40)
    eps_cdf = cdf + np.arange(size) * 1e-16
    eps_cdf = eps_cdf / eps_cdf.max()
    inv_cdf = interpolate.UnivariateSpline(eps_cdf, xax, k=3, s=0)
    u = np.linspace(0, 1, size)
    ppf = inv_cdf(u)
    # cumulative index-moment tables of the trapezoid weights (f64 on
    # the host; entry 0 is zero -- interval sums never include it)
    trap = 0.5 * (pdf + np.roll(pdf, 1))
    trap[0] = 0.0
    center = (size - 1) / 2.0
    ic = np.arange(size) - center
    t0 = np.cumsum(trap)
    t1c = np.cumsum(trap * ic)
    t2c = np.cumsum(trap * ic * ic)
    return Distribution(
        xax=jnp.asarray(xax, dtype=dtype),
        pdf=jnp.asarray(pdf, dtype=dtype),
        cdf=jnp.asarray(cdf, dtype=dtype),
        ppf=jnp.asarray(ppf, dtype=dtype),
        t0=jnp.asarray(t0, dtype=dtype),
        t1c=jnp.asarray(t1c, dtype=dtype),
        t2c=jnp.asarray(t2c, dtype=dtype),
        size=size,
        dx=float(xax[1] - xax[0]),
        du=float(u[1] - u[0]),
        xmin=float(xax.min()),
        xmax=float(xax.max()),
    )


#: table-lookup backend: None -> auto (Pallas kernels on accelerator
#: backends for f32; plain XLA gathers otherwise), True/False forces
USE_PALLAS_TABLES = None


def _pallas_tables_enabled(dtype) -> bool:
    if USE_PALLAS_TABLES is not None:
        return bool(USE_PALLAS_TABLES)
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return jax.default_backend() not in ("cpu",)


def ppf_interp(dist: Distribution, u):
    """Linear PPF interpolation on the uniform quantile grid
    (reference core.pyx:47-63).  ``u`` may have any shape.

    On accelerator backends the lookup runs as an in-VMEM Pallas
    contraction (:func:`nestfit_tpu.ops.tables.table_lerp`) -- same
    values, no per-element gathers (which run at scalar rate on TPU).
    """
    u = jnp.asarray(u)
    scaled = u * (dist.size - 1)
    if _pallas_tables_enabled(dist.ppf.dtype):
        from nestfit_tpu.ops.tables import table_lerp

        return table_lerp(dist.ppf, scaled)
    i_lo = jnp.clip(scaled.astype(jnp.int32), 0, dist.size - 2)
    y_lo = jnp.take(dist.ppf, i_lo)
    y_hi = jnp.take(dist.ppf, i_lo + 1)
    frac = scaled - i_lo
    return y_lo + (y_hi - y_lo) * frac


def cdf_interp(dist_or_cdf, u, xax=None, dx=None, cdf=None):
    """Inverse-interpolate cumulative probability ``u`` onto the
    parameter axis (reference core.pyx:65-107).

    Accepts either a :class:`Distribution` (static CDF) or a batched
    CDF array ``[..., N]`` (with ``xax``/``dx`` given), as produced by
    :func:`cdf_over_interval`.  ``u`` broadcasts against the CDF batch
    dims.
    """
    if isinstance(dist_or_cdf, Distribution):
        cdf = dist_or_cdf.cdf
        xax = dist_or_cdf.xax
        dx = dist_or_cdf.dx
    else:
        cdf = dist_or_cdf
        assert xax is not None and dx is not None
    u = jnp.asarray(u)
    size = cdf.shape[-1]
    # Guard u below the leading CDF value (core.pyx:77-82)
    u = jnp.maximum(u, jnp.asarray(1e-30, dtype=cdf.dtype))
    # First index with cdf >= u, in [1, size-1]
    i_hi = jnp.sum((cdf < u[..., None]).astype(jnp.int32), axis=-1)
    i_hi = jnp.clip(i_hi, 1, size - 1)
    i_lo = i_hi - 1
    y_lo = jnp.take_along_axis(
        jnp.broadcast_to(cdf, u.shape + (size,)), i_lo[..., None], axis=-1
    )[..., 0]
    y_hi = jnp.take_along_axis(
        jnp.broadcast_to(cdf, u.shape + (size,)), i_hi[..., None], axis=-1
    )[..., 0]
    x_lo = jnp.take(xax, i_lo)
    denom = jnp.maximum(y_hi - y_lo, jnp.asarray(1e-30, dtype=cdf.dtype))
    return x_lo + (u - y_lo) * (dx / denom)


def cdf_over_interval(dist: Distribution, x_lo, x_hi, sfact):
    """Re-normalized, tapered CDF over ``[x_lo, x_hi]`` -- pure version
    of reference ``Distribution.cdf_over_interval`` (core.pyx:109-161).

    The CDF is rebuilt from the PDF by trapezoidal accumulation with a
    reverse power-law taper ``(1 - t)^sfact`` that compensates the
    rightward over-weighting of sequential component placement.

    Parameters
    ----------
    x_lo, x_hi : f32[...]
        Interval bounds (batched; swapped if inverted).
    sfact : float or f32[...]
        Taper exponent (``ncomp - 1 - i`` in the placement prior).

    Returns
    -------
    cdf : f32[..., N]
        0 below the interval, 1 at/above its end, monotonic within.
    """
    x_lo = jnp.asarray(x_lo)
    x_hi = jnp.asarray(x_hi)
    lo = jnp.minimum(x_lo, x_hi)
    hi = jnp.maximum(x_lo, x_hi)
    size = dist.size
    dtype = dist.pdf.dtype
    i_lo = jnp.clip(((lo - dist.xmin) / dist.dx).astype(jnp.int32), 0, size - 1)
    i_hi = ((hi - dist.xmin) / dist.dx).astype(jnp.int32)
    i_hi = jnp.where(i_hi == i_lo, i_lo + 1, i_hi)
    i_hi = jnp.clip(i_hi, 1, size)

    idx = jnp.arange(size)
    # broadcast: [..., N]
    i_lo_b = i_lo[..., None]
    i_hi_b = i_hi[..., None]
    span = jnp.maximum(i_hi_b - i_lo_b, 1).astype(dtype)
    t = (idx - i_lo_b).astype(dtype) / span
    taper = jnp.clip(1.0 - t, 0.0, 1.0) ** jnp.asarray(sfact, dtype=dtype)[..., None]
    # trapezoid terms 0.5*(pdf[i] + pdf[i-1]) * taper_i for i_lo < i < i_hi
    pdf = dist.pdf
    trap = 0.5 * (pdf + jnp.roll(pdf, 1))      # trap[i] = 0.5*(pdf[i]+pdf[i-1])
    interior = (idx > i_lo_b) & (idx < i_hi_b)
    terms = jnp.where(interior, trap * taper, 0.0)
    csum = jnp.cumsum(terms, axis=-1)
    total = jnp.maximum(csum[..., -1:], jnp.asarray(1e-30, dtype=dtype))
    cdf = csum / total
    # exact plateau values outside the interval
    cdf = jnp.where(idx < i_lo_b, 0.0, cdf)
    cdf = jnp.where(idx >= i_hi_b, 1.0, cdf)
    # degenerate single-cell interval: delta at i_lo (core.pyx:140-141)
    degenerate = (i_hi_b - i_lo_b) == 1
    cdf = jnp.where(degenerate & (idx >= i_lo_b), 1.0, cdf)
    return cdf


def tapered_interval_invert(dist: Distribution, u, x_lo, x_hi, sfact: int):
    """Invert the tapered interval CDF at ``u`` in O(1) memory.

    Computes the same quantity as ``cdf_interp(cdf_over_interval(dist,
    x_lo, x_hi, sfact), u)`` but without materializing the ``[..., N]``
    grid axis: for an *integer* taper exponent ``s`` the tapered
    trapezoid cumulative

        G(j) = sum_{i_lo < i <= j} trap_i * ((i_hi - i) / span)^s

    expands into the precomputed index-moment tables ``t0/t1c/t2c``
    (binomial in the centered index), so any G(j) is a handful of
    gathers; the inverse is a fixed-depth bisection.  This is the hot
    path of :class:`~nestfit_tpu.priors.priors.ResolvedPlacementPrior`
    -- the dense formulation moves O(batch * N) HBM traffic per prior
    transform, which dominated the whole likelihood evaluation.

    Supports ``sfact in (0, 1, 2)`` (components ``ncomp - 1 - i`` of an
    ``ncomp <= 3`` fit); callers fall back to the dense path above for
    higher exponents.

    Precision class: the float32 moment tables ``t0/t1c/t2c`` are
    cumulative, so a *narrow* interval far from the grid center is
    evaluated as a difference of two nearly equal sums and suffers
    cancellation -- the f32 result is guaranteed only to ~2.5 grid
    cells of the f64 reference (looser than the dense path's
    per-interval cumsum, which is accurate to ~1 cell).  Callers with
    fine placement windows (interval spans of only a few grid cells)
    should use the dense ``cdf_over_interval`` path or widen the grid
    resolution.
    """
    s = int(sfact)
    assert 0 <= s <= 2, "tapered_interval_invert supports sfact in (0,1,2)"
    if _pallas_tables_enabled(dist.pdf.dtype):
        from nestfit_tpu.ops.tables import tapered_invert

        shape = jnp.broadcast_shapes(
            jnp.shape(u), jnp.shape(x_lo), jnp.shape(x_hi)
        )
        return tapered_invert(
            dist.t0, dist.t1c, dist.t2c, dist.xax,
            jnp.broadcast_to(u, shape), jnp.broadcast_to(x_lo, shape),
            jnp.broadcast_to(x_hi, shape), s, dist.size, dist.xmin,
            dist.dx, dist.center,
        )
    x_lo = jnp.asarray(x_lo)
    x_hi = jnp.asarray(x_hi)
    lo = jnp.minimum(x_lo, x_hi)
    hi = jnp.maximum(x_lo, x_hi)
    size = dist.size
    dtype = dist.pdf.dtype
    tiny = jnp.asarray(1e-30, dtype=dtype)
    i_lo = jnp.clip(((lo - dist.xmin) / dist.dx).astype(jnp.int32),
                    0, size - 1)
    i_hi = ((hi - dist.xmin) / dist.dx).astype(jnp.int32)
    i_hi = jnp.where(i_hi == i_lo, i_lo + 1, i_hi)
    i_hi = jnp.clip(i_hi, 1, size)
    degenerate = (i_hi - i_lo) == 1
    ch = (i_hi.astype(dtype) - dist.center)     # centered i_hi
    t0_lo = jnp.take(dist.t0, i_lo)
    t1_lo = jnp.take(dist.t1c, i_lo) if s >= 1 else None
    t2_lo = jnp.take(dist.t2c, i_lo) if s >= 2 else None

    def g_raw(j):
        """Unnormalized tapered cumulative at index j (span^s factor
        omitted -- it cancels in the normalization)."""
        jj = jnp.clip(j, i_lo, i_hi - 1)
        d0 = jnp.take(dist.t0, jj) - t0_lo
        if s == 0:
            return d0
        d1 = jnp.take(dist.t1c, jj) - t1_lo
        if s == 1:
            return ch * d0 - d1
        d2 = jnp.take(dist.t2c, jj) - t2_lo
        return ch * ch * d0 - 2.0 * ch * d1 + d2

    total = jnp.maximum(g_raw(i_hi - 1), tiny)

    def g_norm(j):
        g = g_raw(j) / total
        g = jnp.where(j < i_lo, jnp.asarray(0.0, dtype), g)
        g = jnp.where(j >= i_hi, jnp.asarray(1.0, dtype), g)
        g = jnp.where(degenerate & (j >= i_lo), jnp.asarray(1.0, dtype), g)
        return g

    u = jnp.maximum(jnp.asarray(u), tiny).astype(dtype)
    # lower_bound bisection: first j in [0, size-1] with g_norm(j) >= u
    lo_j = jnp.zeros(jnp.broadcast_shapes(u.shape, i_lo.shape),
                     dtype=jnp.int32)
    hi_j = jnp.full_like(lo_j, size - 1)
    for _ in range(int(np.ceil(np.log2(size)))):
        mid = (lo_j + hi_j) // 2
        below = g_norm(mid) < u
        lo_j = jnp.where(below, mid + 1, lo_j)
        hi_j = jnp.where(below, hi_j, mid)
    i_hi_idx = jnp.clip(lo_j, 1, size - 1)
    y_lo = g_norm(i_hi_idx - 1)
    y_hi = g_norm(i_hi_idx)
    x_left = jnp.take(dist.xax, i_hi_idx - 1)
    denom = jnp.maximum(y_hi - y_lo, tiny)
    return x_left + (u - y_lo) * (dist.dx / denom)
