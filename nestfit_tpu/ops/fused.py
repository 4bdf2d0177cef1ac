"""Fused Pallas likelihood kernels.

The sampler's wall-clock on TPU is dominated by the *number of
sequential ops* per likelihood evaluation, not FLOPs: the XLA graph for
one hyperfine predict is ~150 small kernels (per-line exp/mul/add over
``[B, S]``).  These Pallas kernels fuse the entire spectrum synthesis +
chi-square reduction for one transition into a single VMEM-resident
kernel: the opacity accumulator and predicted spectrum never touch HBM
(the equivalent of the reference's single C loop,
hyperfine.pyx:52-118 + core.pyx:522-530, but batched over pixels on
the VPU lanes).

Layout: the channel axis is padded to a multiple of 128 (lanes) with
``dnu`` sentinel values far off-resonance so padded channels contribute
exactly zero opacity, prediction, and chi-square.  The batch axis is
blocked over the grid.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nestfit_tpu.constants import CKMS
from nestfit_tpu.models.tables import Transition

LANE = 128
_DNU_PAD = 1.0e12  # off-resonance sentinel for padded channels

# set True to run kernels in the Pallas interpreter (CPU testing)
INTERPRET = False


def _pad_to(x, n, value=0.0, axis=-1):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("trans", "block_b"))
def hf_chi2_fused(trans: Transition, dnu, t0, tbg, data,
                  voff, tex, tau_main, sigm, block_b: int = 256):
    """Summed squared residual for one hyperfine transition.

    Parameters
    ----------
    trans : Transition (static tables)
    dnu, t0, tbg : f32[S] channel-axis terms
    data : f32[R, S] or f32[S] observed spectra
    voff, tex, tau_main, sigm : f32[B, C] per-component parameters,
        where B = T*R (leading proposal axes flattened) and the data
        row for flat index b is ``b % R``.

    Returns
    -------
    chi2 : f32[B] -- sum over channels of (data - pred)^2
    """
    B, C = voff.shape
    S = dnu.shape[-1]
    s_pad = -(-S // LANE) * LANE

    dnu_p = _pad_to(dnu.astype(jnp.float32), s_pad, _DNU_PAD)
    t0_p = _pad_to(t0.astype(jnp.float32), s_pad, 1.0)
    tbg_p = _pad_to(tbg.astype(jnp.float32), s_pad, 0.0)
    if data.ndim == 1:
        data = data[None]
    R = data.shape[0]
    assert B % R == 0, (B, R)
    T = B // R
    data_p = _pad_to(data.astype(jnp.float32), s_pad, 0.0)

    b_pad = -(-B // block_b) * block_b
    # pad batch by tiling (params only; indexing below keeps data rows
    # aligned through the R axis)
    def pad_b(x):
        return _pad_to(x.astype(jnp.float32), b_pad, 1.0, axis=0)

    voff_p, tex_p, tau_p, sigm_p = map(pad_b, (voff, tex, tau_main, sigm))
    # clamp away zero/negative widths from padding
    sigm_p = jnp.maximum(sigm_p, 1e-6)
    tex_p = jnp.maximum(tex_p, 1e-3)

    # static per-line tables, folded into the kernel
    hf_freq = (1.0 - trans.voff / CKMS) * trans.nu   # (nhf,) float64
    rel_base = trans.nu * trans.voff / CKMS
    wts = trans.tau_wts

    def kernel(voff_ref, tex_ref, tau_ref, sigm_ref, data_ref,
               dnu_ref, t0_ref, tbg_ref, out_ref):
        dnu_v = dnu_ref[:]            # [1, s_pad]
        pred = jnp.zeros((block_b, s_pad), jnp.float32)
        for c in range(C):
            voff_c = voff_ref[:, c][:, None]     # [bb, 1]
            sigm_c = sigm_ref[:, c][:, None]
            tau0_c = tau_ref[:, c][:, None]
            tau = jnp.zeros((block_b, s_pad), jnp.float32)
            for j in range(trans.nhf):
                f_j = np.float32(hf_freq[j] / CKMS)
                rb_j = np.float32(rel_base[j])
                w_j = np.float32(wts[j])
                rel_nucen = -rb_j - voff_c * f_j
                hw = sigm_c * f_j
                idenom = 0.5 / (hw * hw)
                d = dnu_v - rel_nucen
                tau = tau + (tau0_c * w_j) * jnp.exp(-(d * d) * idenom)
            tex_c = tex_ref[:, c][:, None]
            # expm1 is not lowered by Mosaic; the plain forms lose no
            # precision at these argument ranges (t0/tex ~ 0.1-0.5,
            # tau >= 0)
            iemtex = 1.0 / (jnp.exp(t0_ref[:] / tex_c) - 1.0)
            pred = pred + t0_ref[:] * (iemtex - tbg_ref[:]) * (
                1.0 - jnp.exp(-tau)
            )
        dev = data_ref[:] - pred
        out_ref[:] = jnp.sum(dev * dev, axis=1, keepdims=True)

    grid = (b_pad // block_b,)

    # data rows repeat with period R along the flat batch axis; when
    # the batch block spans whole R-multiples this is exact tiling.
    if block_b % R == 0 or R % block_b == 0:
        if R % block_b == 0:
            def data_index(i):
                return ((i % (R // block_b)), 0)
            data_spec = pl.BlockSpec(
                (block_b, s_pad), data_index, memory_space=pltpu.VMEM
            )
            data_arg = data_p
        else:
            # block covers T-tiles of the full data
            reps = block_b // R
            data_arg = jnp.tile(data_p, (reps, 1))
            data_spec = pl.BlockSpec(
                (block_b, s_pad), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            )
    else:
        # general case: materialize the tiled data (rare; B = T*R with
        # block_b | B keeps us in the fast paths above)
        data_arg = jnp.tile(data_p, (T, 1))
        data_arg = _pad_to(data_arg, b_pad, 0.0, axis=0)
        data_spec = pl.BlockSpec(
            (block_b, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    par_spec = pl.BlockSpec(
        (block_b, C), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    chan_spec = pl.BlockSpec(
        (1, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[par_spec, par_spec, par_spec, par_spec, data_spec,
                  chan_spec, chan_spec, chan_spec],
        out_specs=pl.BlockSpec(
            (block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        interpret=INTERPRET,
    )(voff_p, tex_p, tau_p, sigm_p, data_arg,
      dnu_p[None], t0_p[None], tbg_p[None])
    return out[:B, 0]


@functools.partial(
    jax.jit, static_argnames=("rest_freq_over_c", "block_b")
)
def gauss_chi2_fused(rest_freq_over_c, dnu, data, voff, sigm, peak,
                     block_b: int = 256):
    """Summed squared residual for the Gaussian model
    (fused equivalent of gaussian.pyx:17-50 + chi-square)."""
    B, C = voff.shape
    S = dnu.shape[-1]
    s_pad = -(-S // LANE) * LANE
    dnu_p = _pad_to(dnu.astype(jnp.float32), s_pad, _DNU_PAD)
    if data.ndim == 1:
        data = data[None]
    R = data.shape[0]
    assert B % R == 0
    T = B // R
    data_p = _pad_to(data.astype(jnp.float32), s_pad, 0.0)
    b_pad = -(-B // block_b) * block_b

    def pad_b(x):
        return _pad_to(x.astype(jnp.float32), b_pad, 1.0, axis=0)

    voff_p, sigm_p, peak_p = map(pad_b, (voff, sigm, peak))
    sigm_p = jnp.maximum(sigm_p, 1e-6)
    fc = np.float32(rest_freq_over_c)

    def kernel(voff_ref, sigm_ref, peak_ref, data_ref, dnu_ref, out_ref):
        pred = jnp.zeros((block_b, s_pad), jnp.float32)
        for c in range(C):
            rel_cen = -voff_ref[:, c][:, None] * fc
            hw = sigm_ref[:, c][:, None] * fc
            idenom = 0.5 / (hw * hw)
            d = dnu_ref[:] - rel_cen
            pred = pred + peak_ref[:, c][:, None] * jnp.exp(
                -(d * d) * idenom
            )
        dev = data_ref[:] - pred
        out_ref[:] = jnp.sum(dev * dev, axis=1, keepdims=True)

    grid = (b_pad // block_b,)
    if R % block_b == 0:
        data_spec = pl.BlockSpec(
            (block_b, s_pad), lambda i: ((i % (R // block_b)), 0),
            memory_space=pltpu.VMEM,
        )
        data_arg = data_p
    elif block_b % R == 0:
        data_arg = jnp.tile(data_p, (block_b // R, 1))
        data_spec = pl.BlockSpec(
            (block_b, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
    else:
        data_arg = _pad_to(jnp.tile(data_p, (T, 1)), b_pad, 0.0, axis=0)
        data_spec = pl.BlockSpec(
            (block_b, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    par_spec = pl.BlockSpec(
        (block_b, C), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[par_spec, par_spec, par_spec, data_spec,
                  pl.BlockSpec((1, s_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        interpret=INTERPRET,
    )(voff_p, sigm_p, peak_p, data_arg, dnu_p[None])
    return out[:B, 0]
