"""Pallas table-lookup kernels for the prior transforms.

Dynamic per-element gathers are pathologically slow on TPU (~20 ns per
element -- scalar rate; the VPU has no vector gather), and the prior
system is built on tabulated distributions (reference
core.pyx:23-161), so the transform inside every likelihood evaluation
was gather-bound.  These kernels keep the *exact* table-interpolation
semantics but evaluate each lookup as an in-VMEM weight-matrix
contraction against the (small, resident) table -- the ``[B, N]``
intermediates never touch HBM:

* :func:`table_lerp` -- linear interpolation ``table[scaled]`` via a
  triangular "hat" weight row per element (exactly linear
  interpolation, exactly the endpoints at integer indices).
* :func:`tapered_invert` -- the sequential-placement prior's tapered
  interval-CDF inversion (reference core.pyx:109-161, 392-434) for
  integer taper exponents s in (0, 1, 2): the tapered cumulative is a
  binomial combination of cumulative index-moment tables, evaluated
  for all grid cells in VMEM, counted against ``u`` (vectorized
  lower-bound), and interpolated within the bracketing cell -- the
  same values as ``distributions.tapered_interval_invert``.

Both fall back to interpret mode for CPU testing via ``INTERPRET``.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# set True to run kernels in the Pallas interpreter (CPU testing)
INTERPRET = False


def _pad1(x, n, value=0.0):
    pad = n - x.shape[-1]
    if pad <= 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                   constant_values=value)


@functools.partial(jax.jit, static_argnames=("block_b",))
def table_lerp(table, scaled, block_b: int = 1024):
    """Linear interpolation of a 1-D ``table`` at positions ``scaled``.

    Exact equivalent of the gather-based two-point lerp
    (``distributions.ppf_interp`` body): ``scaled`` is the fractional
    index in ``[0, N-1]`` (clipped), any shape; returns the same shape.
    """
    table = jnp.asarray(table, dtype=jnp.float32)
    N = table.shape[0]
    n_pad = -(-N // LANE) * LANE
    # pad with the end value so clipped positions stay exact
    table_p = _pad1(table, n_pad, value=table[-1])

    shape = jnp.shape(scaled)
    flat = jnp.clip(
        jnp.asarray(scaled, dtype=jnp.float32).reshape(-1), 0.0, N - 1.0
    )
    B = flat.shape[0]
    bb = min(block_b, max(LANE, -(-B // LANE) * LANE))
    b_pad = -(-B // bb) * bb
    flat_p = _pad1(flat[None], b_pad, 0.0)[0][:, None]       # [b_pad, 1]

    def kernel(s_ref, tbl_ref, out_ref):
        s = s_ref[:]                                          # [bb, 1]
        iota = lax.broadcasted_iota(
            jnp.int32, (bb, n_pad), 1
        ).astype(jnp.float32)
        w = jnp.maximum(1.0 - jnp.abs(iota - s), 0.0)         # hat
        out_ref[:] = jnp.sum(w * tbl_ref[:], axis=1, keepdims=True)

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((bb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        interpret=INTERPRET,
    )(flat_p, table_p[None])
    return out[:B, 0].reshape(shape)


@functools.partial(
    jax.jit,
    static_argnames=("sfact", "size", "xmin", "dx", "center", "block_b"),
)
def tapered_invert(t0, t1c, t2c, xax, u, x_lo, x_hi, sfact: int,
                   size: int, xmin: float, dx: float, center: float,
                   block_b: int = 512):
    """Invert the power-law-tapered interval CDF at ``u`` in VMEM.

    Same values as ``distributions.tapered_interval_invert`` (which
    documents the algebra); ``sfact`` must be 0, 1, or 2.  All of
    ``u/x_lo/x_hi`` share a flat shape ``[B]``.
    """
    s = int(sfact)
    assert 0 <= s <= 2
    N = size
    n_pad = -(-N // LANE) * LANE
    # pad moment tables with their end value: padded columns then
    # contribute the plateau value and never alter counts (they sit at
    # iota >= i_hi where the CDF is pinned to 1)
    t0_p = _pad1(jnp.asarray(t0, jnp.float32), n_pad, t0[-1])[None]
    t1_p = _pad1(jnp.asarray(t1c, jnp.float32), n_pad, t1c[-1])[None]
    t2_p = _pad1(jnp.asarray(t2c, jnp.float32), n_pad, t2c[-1])[None]
    xax_p = _pad1(jnp.asarray(xax, jnp.float32), n_pad, xax[-1])[None]

    shape = jnp.shape(u)
    u_f = jnp.asarray(u, jnp.float32).reshape(-1)
    lo_f = jnp.asarray(x_lo, jnp.float32).reshape(-1)
    hi_f = jnp.asarray(x_hi, jnp.float32).reshape(-1)
    B = u_f.shape[0]
    bb = min(block_b, max(LANE, -(-B // LANE) * LANE))
    b_pad = -(-B // bb) * bb
    u_p = _pad1(u_f[None], b_pad, 0.5)[0][:, None]
    lo_p = _pad1(lo_f[None], b_pad, xmin)[0][:, None]
    hi_p = _pad1(hi_f[None], b_pad, xmin + dx * (N - 1))[0][:, None]
    tiny = np.float32(1e-30)
    cn = np.float32(center)
    one = np.float32(1.0)

    def kernel(u_ref, lo_ref, hi_ref, t0_ref, t1_ref, t2_ref, xax_ref,
               out_ref):
        uu = jnp.maximum(u_ref[:], tiny)                     # [bb, 1]
        a = jnp.minimum(lo_ref[:], hi_ref[:])
        b = jnp.maximum(lo_ref[:], hi_ref[:])
        i_lo = jnp.clip(
            jnp.floor((a - np.float32(xmin)) / np.float32(dx)), 0, N - 1
        )
        i_hi = jnp.floor((b - np.float32(xmin)) / np.float32(dx))
        i_hi = jnp.where(i_hi == i_lo, i_lo + 1.0, i_hi)
        i_hi = jnp.clip(i_hi, 1.0, float(N))
        degen = (i_hi - i_lo) == 1.0                         # [bb, 1]
        ch = i_hi - cn

        iota = lax.broadcasted_iota(
            jnp.int32, (bb, n_pad), 1
        ).astype(jnp.float32)
        T0 = t0_ref[:]                                       # [1, n_pad]
        sel_lo = iota == i_lo                                # [bb, n_pad]
        t0_lo = jnp.sum(jnp.where(sel_lo, T0, 0.0), axis=1,
                        keepdims=True)
        d0 = T0 - t0_lo                                      # [bb, n_pad]
        if s == 0:
            g = d0
        else:
            T1 = t1_ref[:]
            t1_lo = jnp.sum(jnp.where(sel_lo, T1, 0.0), axis=1,
                            keepdims=True)
            d1 = T1 - t1_lo
            if s == 1:
                g = ch * d0 - d1
            else:
                T2 = t2_ref[:]
                t2_lo = jnp.sum(jnp.where(sel_lo, T2, 0.0), axis=1,
                                keepdims=True)
                g = ch * ch * d0 - 2.0 * ch * d1 + (T2 - t2_lo)

        sel_he = iota == (i_hi - 1.0)
        total = jnp.maximum(
            jnp.sum(jnp.where(sel_he, g, 0.0), axis=1, keepdims=True),
            tiny,
        )
        gn = g / total
        gn = jnp.where(iota < i_lo, 0.0, gn)
        gn = jnp.where(iota >= i_hi, one, gn)
        gn = jnp.where(degen & (iota >= i_lo), one, gn)

        count = jnp.sum((gn < uu).astype(jnp.float32), axis=1,
                        keepdims=True)
        ihx = jnp.clip(count, 1.0, float(N - 1))
        sel_c1 = iota == (ihx - 1.0)
        sel_c2 = iota == ihx
        y_lo = jnp.sum(jnp.where(sel_c1, gn, 0.0), axis=1, keepdims=True)
        y_hi = jnp.sum(jnp.where(sel_c2, gn, 0.0), axis=1, keepdims=True)
        x_left = jnp.sum(jnp.where(sel_c1, xax_ref[:], 0.0), axis=1,
                         keepdims=True)
        denom = jnp.maximum(y_hi - y_lo, tiny)
        out_ref[:] = x_left + (uu - y_lo) * (np.float32(dx) / denom)

    col = pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bb,),
        in_specs=[col, col, col, row, row, row, row],
        out_specs=col,
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        interpret=INTERPRET,
    )(u_p, lo_p, hi_p, t0_p, t1_p, t2_p, xax_p)
    return out[:B, 0].reshape(shape)
