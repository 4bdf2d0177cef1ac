"""Analysis and visualization.

Rebuild of the reference plotting layer (reference: nestfit/plotting.py)
on plain matplotlib: map products out of the store, per-pixel spectrum
overlays, posterior corner plots (hand-rolled; the reference uses
getdist, plotting.py:891-958), and the kernel-precision verification
plot (plotting.py:1031-1060, against the float64 oracle instead of
pyspeckit).

Axes are labeled in pixel coordinates with the linear sky offsets from
the simple header when available (the reference draws full WCS axes via
astropy; astropy is not available in this environment).
"""

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib import colors as mcolors

from nestfit_tpu.sampling.results import MARGINAL_COLS


_CMAP = "viridis"


class StorePlotter:
    """Map plotting over store products (reference plotting.py:147-336)."""

    def __init__(self, store, plot_dir="plots"):
        from pathlib import Path

        self.store = store
        self.hdf = store.hdf
        self.plot_dir = Path(plot_dir)
        self.plot_dir.mkdir(parents=True, exist_ok=True)
        self.dpath = store.dpath
        self.n_lon = int(self.hdf.attrs["naxis1"])
        self.n_lat = int(self.hdf.attrs["naxis2"])
        self.par_names = list(self.hdf.attrs.get("par_names", []))

    def _save(self, fig, name):
        path = self.plot_dir / f"{name}.pdf"
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        return path

    def _imshow(self, ax, img, **kwargs):
        # img in (b, l); origin lower to match sky maps
        im = ax.imshow(img, origin="lower", cmap=kwargs.pop("cmap", _CMAP),
                       **kwargs)
        ax.set_xlabel("longitude pixel")
        ax.set_ylabel("latitude pixel")
        return im

    def plot_nbest(self, name="map_nbest", conv=False):
        """N-best component map (reference plotting.py:377-398)."""
        dset = "conv_nbest" if conv else "nbest"
        data = self.hdf[f"{self.dpath}/{dset}"][...].astype(float)
        data[data < 0] = np.nan
        fig, ax = plt.subplots(figsize=(5, 4))
        im = self._imshow(ax, data, cmap="magma",
                          norm=mcolors.BoundaryNorm(
                              np.arange(-0.5, np.nanmax(data) + 1.5),
                              plt.get_cmap("magma").N))
        fig.colorbar(im, ax=ax, label="N components")
        ax.set_title(dset)
        return self._save(fig, name)

    def plot_evidence_diff(self, name="map_evdiff", m_hi=1, m_lo=0,
                           conv=False):
        """Evidence-difference map (reference plotting.py:343-374)."""
        dset = "conv_evidence" if conv else "evidence"
        ev = self.hdf[f"{self.dpath}/{dset}"][...]
        diff = ev[m_hi] - ev[m_lo]
        fig, ax = plt.subplots(figsize=(5, 4))
        im = self._imshow(ax, diff, cmap="RdBu_r",
                          norm=mcolors.TwoSlopeNorm(0.0))
        fig.colorbar(im, ax=ax, label=rf"$\ln Z_{m_hi} - \ln Z_{m_lo}$")
        return self._save(fig, name)

    def plot_param_map(self, p_ix, m_ix=0, kind="MAP", name=None):
        """Dense parameter map from nbest products
        (reference plotting.py:468-596)."""
        if kind == "MAP":
            data = self.hdf[f"{self.dpath}/nbest_MAP"][m_ix, p_ix]
        elif kind == "median":
            data = self.hdf[f"{self.dpath}/nbest_marginals"][m_ix, p_ix, 4]
        elif kind == "error":
            margs = self.hdf[f"{self.dpath}/nbest_marginals"]
            data = (margs[m_ix, p_ix, 10] - margs[m_ix, p_ix, 9]) / 2
        else:
            raise ValueError(kind)
        pname = (self.par_names[p_ix] if p_ix < len(self.par_names)
                 else f"p{p_ix}")
        fig, ax = plt.subplots(figsize=(5, 4))
        im = self._imshow(ax, data)
        fig.colorbar(im, ax=ax, label=f"{pname} ({kind})")
        name = name or f"map_{pname}_{kind}_m{m_ix}"
        return self._save(fig, name)

    def plot_intensity(self, kind="peak", trans_ix=0, m_ix=0, name=None):
        """Peak / integrated intensity maps
        (reference plotting.py:401-441)."""
        dset = ("peak_intensity" if kind == "peak"
                else "integrated_intensity")
        data = self.hdf[f"{self.dpath}/{dset}"][trans_ix, m_ix]
        fig, ax = plt.subplots(figsize=(5, 4))
        im = self._imshow(ax, data, cmap="inferno")
        unit = "K" if kind == "peak" else "K km/s"
        fig.colorbar(im, ax=ax, label=f"{kind} intensity [{unit}]")
        name = name or f"map_{kind}_t{trans_ix}_m{m_ix}"
        return self._save(fig, name)

    def plot_spec_fit(self, i_lon, i_lat, stack, runner, name=None,
                      ncomp=None):
        """Per-pixel spectrum with the MAP model overlaid
        (reference plotting.py:611-741)."""
        group = self.hdf[f"/pix/{i_lon}/{i_lat}"]
        nbest = ncomp or max(int(group.attrs["nbest"]), 1)
        sub = group[f"{nbest}"]
        params = sub["map_params"][...]
        preds = runner_predict_full(runner, params, nbest)
        n_t = stack.n_cubes
        fig, axes = plt.subplots(
            nrows=n_t, figsize=(8, 2.5 * n_t), sharex=False, squeeze=False
        )
        for i_t, (dcube, pred) in enumerate(zip(stack.cubes, preds)):
            ax = axes[i_t, 0]
            _, arr, noise, tid, _ = dcube.get_spec_data(i_lon, i_lat)
            ax.step(dcube.varr, arr, color="0.4", lw=0.8,
                    label=f"data t{tid}")
            ax.plot(dcube.varr, pred, color="tab:red", lw=1.2, label="MAP")
            ax.axhline(0, color="0.8", lw=0.5)
            ax.legend(loc="upper right", fontsize=7)
            ax.set_ylabel(r"$T_\mathrm{b}$ [K]")
        axes[-1, 0].set_xlabel(r"$v_\mathrm{lsr}$ [km/s]")
        name = name or f"spec_fit_{i_lon}_{i_lat}"
        return self._save(fig, name)

    def plot_corner(self, i_lon, i_lat, ncomp=None, name=None):
        """Posterior corner plot from stored samples (replaces the
        getdist triangle plots, reference plotting.py:891-958)."""
        group = self.hdf[f"/pix/{i_lon}/{i_lat}"]
        nbest = ncomp or max(int(group.attrs["nbest"]), 1)
        sub = group[f"{nbest}"]
        post = sub["posteriors"][...]
        samples = post[:, :-2]
        ndim = samples.shape[1]
        labels = [
            f"{p}{i+1}" for p in
            (self.par_names or [f"p{i}" for i in range(ndim)])
            for i in range(nbest)
        ][:ndim]
        fig = corner_plot(samples, labels=labels)
        name = name or f"corner_{i_lon}_{i_lat}_n{nbest}"
        return self._save(fig, name)


def runner_predict_full(runner, params, ncomp):
    """MAP model spectra per transition as numpy arrays."""
    import jax.numpy as jnp

    r = runner
    if r.ncomp != ncomp:
        r = type(runner)(runner.spectra, runner.utrans, ncomp=ncomp,
                         **getattr(runner, "predict_kwargs", {}))
    preds = r.predict(jnp.asarray(params, dtype=jnp.float32))
    return [np.asarray(p) for p in preds]


def corner_plot(samples, labels=None, bins=40, figsize=None):
    """Simple corner plot: 1-D histograms on the diagonal, 2-D density
    below (replacement for getdist, reference plotting.py:891-958)."""
    samples = np.asarray(samples)
    ndim = samples.shape[1]
    figsize = figsize or (1.6 * ndim, 1.6 * ndim)
    fig, axes = plt.subplots(ndim, ndim, figsize=figsize, squeeze=False)
    for i in range(ndim):
        for j in range(ndim):
            ax = axes[i, j]
            if j > i:
                ax.set_visible(False)
                continue
            if i == j:
                ax.hist(samples[:, i], bins=bins, color="0.3",
                        histtype="step", density=True)
            else:
                ax.hist2d(samples[:, j], samples[:, i], bins=bins,
                          cmap="Blues", norm=mcolors.PowerNorm(0.5))
            if i == ndim - 1 and labels:
                ax.set_xlabel(labels[j], fontsize=7)
            else:
                ax.set_xticklabels([])
            if j == 0 and i > 0 and labels:
                ax.set_ylabel(labels[i], fontsize=7)
            else:
                ax.set_yticklabels([])
            ax.tick_params(labelsize=6)
    fig.subplots_adjust(hspace=0.08, wspace=0.08)
    return fig


def plot_amm_predict_precision(out_path="amm_precision.pdf",
                               trans_id=1, params=None):
    """Kernel-precision verification plot: JAX float32 kernel vs the
    float64 oracle (the role of ``test_amm_predict_precision``,
    reference plotting.py:1031-1060)."""
    import jax.numpy as jnp

    from nestfit_tpu import oracle
    from nestfit_tpu.models import ammonia
    from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS
    from nestfit_tpu.utils import freq_axis_from_velocity

    if params is None:
        params = np.array([-1.0, 1.5, 10.0, 15.0, 4.0, 6.0,
                           14.5, 15.0, 0.3, 0.6, 0.0, 0.0])
    vaxis = np.arange(-30, 30, 0.158)
    xarr = freq_axis_from_velocity(vaxis, AMMONIA_TRANSITIONS[trans_id - 1].nu)
    spec = ammonia.make_ammonia_spectrum(
        xarr, np.zeros_like(xarr), 0.1, trans_id=trans_id
    )
    pred = np.asarray(ammonia.amm_predict(spec, params.astype(np.float32)))
    truth = oracle.amm_predict(xarr, params, trans_id=trans_id)
    diff = np.abs(pred - truth)
    fig, (ax0, ax1) = plt.subplots(nrows=2, figsize=(8, 5), sharex=True)
    varr = vaxis[::-1]
    ax0.plot(varr, truth, "k-", lw=1.0, label="oracle (f64)")
    ax0.plot(varr, pred, "r--", lw=0.8, label="jax kernel (f32)")
    ax0.set_ylabel(r"$T_\mathrm{b}$ [K]")
    ax0.legend()
    with np.errstate(divide="ignore"):
        ax1.semilogy(varr, diff, "0.3", lw=0.7)
    ax1.set_ylabel(r"$|\Delta T_\mathrm{b}|$ [K]")
    ax1.set_xlabel(r"$v_\mathrm{lsr}$ [km/s]")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path
