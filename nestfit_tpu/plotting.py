"""Analysis and visualization.

Rebuild of the reference plotting layer (reference: nestfit/plotting.py)
on plain matplotlib: map products out of the store, per-pixel spectrum
overlays, posterior corner plots (hand-rolled; the reference uses
getdist, plotting.py:891-958), and the kernel-precision verification
plot (plotting.py:1031-1060, against the float64 oracle instead of
pyspeckit).

Maps carry absolute world-coordinate (RA/Dec or GLON/GLAT) tick labels
computed from the stored header via the in-repo exact celestial WCS
(:mod:`nestfit_tpu.wcs`; the reference uses astropy WCS projection
axes, plotting.py:162).  When the header carries no usable WCS the
axes fall back to linear sky offsets, then to raw pixel indices.
Figure layout follows the reference's absolute-inches
:class:`PaddingConfig` system (reference plotting.py:93-145).
"""

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib import colors as mcolors
from matplotlib import ticker as mticker

from nestfit_tpu.sampling.results import MARGINAL_COLS


_CMAP = "viridis"


def format_ra_hms(ra_deg):
    """Right ascension [deg] -> ``h:mm:ss.s`` sexagesimal string."""
    h = (ra_deg % 360.0) / 15.0
    hh = int(h)
    m = (h - hh) * 60.0
    mm = int(m)
    ss = (m - mm) * 60.0
    return f"{hh:d}:{mm:02d}:{ss:04.1f}"


def format_dec_dms(dec_deg):
    """Declination [deg] -> ``+d:mm:ss`` sexagesimal string."""
    sign = "-" if dec_deg < 0 else "+"
    d = abs(dec_deg)
    dd = int(d)
    m = (d - dd) * 60.0
    mm = int(m)
    ss = (m - mm) * 60.0
    return f"{sign}{dd:d}:{mm:02d}:{ss:02.0f}"


class PaddingConfig:
    """Absolute-inches figure layout (reference plotting.py:93-145).

    Edge paddings, subplot separations, and the colorbar width are
    specified in inches and converted to figure fractions at layout
    time, so panel sizes stay constant across map shapes.
    """

    def __init__(self, edge_pads=(0.7, 0.8, 0.6, 0.3),
                 sep_pads=(0.2, 0.2), cbar_width=0.15,
                 inch_per_pix=1.8e-2):
        self.edge_pads = edge_pads
        self.sep_pads = sep_pads
        self.cbar_width = cbar_width
        self.inch_per_pix = inch_per_pix

    def get_figsize(self, shape, nrows=1, ncols=1):
        """Figure size for an ``nrows x ncols`` grid of ``shape`` =
        (n_lon, n_lat) panels at ``inch_per_pix`` scale."""
        n_lon, n_lat = shape
        p_l, p_r, p_b, p_t = self.edge_pads
        p_w, p_h = self.sep_pads
        panel_w = max(n_lon * self.inch_per_pix, 1.0)
        panel_h = max(n_lat * self.inch_per_pix, 1.0)
        width = p_l + p_r + ncols * panel_w + (ncols - 1) * p_w
        height = p_b + p_t + nrows * panel_h + (nrows - 1) * p_h
        return width, height

    def get_colorbar_axis(self, fig=None):
        """(left, bottom, width, height) figure-fraction rect for a
        right-edge colorbar axes."""
        fig = fig or plt.gcf()
        f_w, f_h = fig.get_size_inches()
        p_l, p_r, p_b, p_t = self.edge_pads
        p_w, p_h = self.sep_pads
        left = 1 - (p_r + self.cbar_width - p_w) / f_w
        bottom = p_b / f_h
        width = self.cbar_width / f_w
        height = 1 - (p_b + p_t) / f_h
        return left, bottom, width, height

    def subplots_adjust(self, fig=None, colorbar=False):
        fig = fig or plt.gcf()
        f_w, f_h = fig.get_size_inches()
        p_l, p_r, p_b, p_t = self.edge_pads
        p_w, p_h = self.sep_pads
        right = 1 - p_r / f_w
        if colorbar:
            right -= self.cbar_width / f_w
        fig.subplots_adjust(
            left=p_l / f_w, right=right, bottom=p_b / f_h,
            top=1 - p_t / f_h, wspace=p_w / f_w, hspace=p_h / f_h,
        )


class StorePlotter:
    """Map plotting over store products (reference plotting.py:147-336)."""

    def __init__(self, store, plot_dir="plots", pad=None):
        from pathlib import Path

        self.store = store
        self.hdf = store.hdf
        self.plot_dir = Path(plot_dir)
        self.plot_dir.mkdir(parents=True, exist_ok=True)
        self.dpath = store.dpath
        self.n_lon = int(self.hdf.attrs["naxis1"])
        self.n_lat = int(self.hdf.attrs["naxis2"])
        self.par_names = list(self.hdf.attrs.get("par_names", []))
        self.pad = PaddingConfig() if pad is None else pad
        # absolute world-coordinate axes via the in-repo exact WCS
        # (the reference uses astropy projection axes,
        # plotting.py:162); falls back to linear sky offsets, then to
        # plain pixel indices
        self.wcs = None
        self.sky_extent = None
        self.sky_labels = ("longitude pixel", "latitude pixel")
        try:
            hdr = store.read_header(full=False)
        except Exception:
            hdr = {}
        try:
            from nestfit_tpu.wcs import CelestialWCS

            self.wcs = CelestialWCS(hdr)
            names = {"RA": "Right Ascension (J2000)",
                     "DEC": "Declination (J2000)",
                     "GLON": "Galactic Longitude",
                     "GLAT": "Galactic Latitude"}
            self.sky_labels = (
                names.get(self.wcs.lon_name, self.wcs.lon_name),
                names.get(self.wcs.lat_name, self.wcs.lat_name),
            )
        except Exception:
            try:
                cd1 = float(hdr.get("CDELT1", 0.0)) * 60.0  # deg->arcmin
                cd2 = float(hdr.get("CDELT2", 0.0)) * 60.0
                cr1 = float(hdr.get("CRPIX1", 1.0)) - 1.0   # FITS 1-based
                cr2 = float(hdr.get("CRPIX2", 1.0)) - 1.0
                if cd1 != 0.0 and cd2 != 0.0:
                    self.sky_extent = (
                        (-0.5 - cr1) * cd1,
                        (self.n_lon - 0.5 - cr1) * cd1,
                        (-0.5 - cr2) * cd2,
                        (self.n_lat - 0.5 - cr2) * cd2,
                    )
                    ct1 = str(hdr.get("CTYPE1", "RA"))[:8].split("-")[0]
                    ct2 = str(hdr.get("CTYPE2", "DEC"))[:8].split("-")[0]
                    self.sky_labels = (
                        f"{ct1} offset (arcmin)", f"{ct2} offset (arcmin)"
                    )
            except Exception:
                pass

    def _save(self, fig, name):
        path = self.plot_dir / f"{name}.pdf"
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        return path

    def _world_formatters(self):
        """Tick formatters mapping pixel index -> absolute world
        coordinate along the field center row/column (exact at the
        center; the curvature across these small fields is far below a
        tick width)."""
        wcs = self.wcs
        c_lat = (self.n_lat - 1) / 2.0
        c_lon = (self.n_lon - 1) / 2.0
        sexa = wcs.lon_name == "RA"

        def fx(p, _pos):
            lon, _ = wcs.pixel_to_world(p + 1.0, c_lat + 1.0)
            return format_ra_hms(float(lon)) if sexa \
                else f"{float(lon):.3f}"

        def fy(p, _pos):
            _, lat = wcs.pixel_to_world(c_lon + 1.0, p + 1.0)
            return format_dec_dms(float(lat)) if sexa \
                else f"{float(lat):.3f}"

        return mticker.FuncFormatter(fx), mticker.FuncFormatter(fy)

    def _imshow(self, ax, img, **kwargs):
        # img in (b, l); origin lower to match sky maps.  Axes carry
        # absolute world tick labels via the exact WCS when available
        # (reference plotting.py:162), else linear sky offsets.
        if self.wcs is None and self.sky_extent is not None:
            kwargs.setdefault("extent", self.sky_extent)
            kwargs.setdefault("aspect", "auto")
        im = ax.imshow(img, origin="lower", cmap=kwargs.pop("cmap", _CMAP),
                       **kwargs)
        if self.wcs is not None:
            fx, fy = self._world_formatters()
            ax.xaxis.set_major_formatter(fx)
            ax.yaxis.set_major_formatter(fy)
            ax.xaxis.set_major_locator(mticker.MaxNLocator(4))
            ax.yaxis.set_major_locator(mticker.MaxNLocator(5))
            for lab in ax.get_xticklabels():
                lab.set_fontsize(8)
        ax.set_xlabel(self.sky_labels[0])
        ax.set_ylabel(self.sky_labels[1])
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

    def plot_deblend_peak(self, name="hf_deblend_peak"):
        """Deblended peak-intensity figure: per transition, the max
        over components of the MAP-model peak brightness (reference
        plotting.py:415-433)."""
        data = self.hdf[f"{self.dpath}/peak_intensity"][...]  # (t,m,b,l)
        data = np.nanmax(data, axis=1)                        # (t,b,l)
        n_trans = data.shape[0]
        figsize = self.pad.get_figsize((self.n_lon, self.n_lat),
                                       ncols=n_trans)
        fig, axes = plt.subplots(1, n_trans, figsize=figsize,
                                 squeeze=False)
        vmax = np.nanmax(data) if np.isfinite(data).any() else 1.0
        for i_t, ax in enumerate(axes[0]):
            im = self._imshow(ax, data[i_t], cmap="afmhot", vmin=0,
                              vmax=vmax)
            if i_t:
                ax.set_ylabel("")
                ax.set_yticklabels([])
        self.pad.subplots_adjust(fig, colorbar=True)
        cax = fig.add_axes(self.pad.get_colorbar_axis(fig))
        fig.colorbar(im, cax=cax,
                     label=r"$\mathrm{max}(\tilde{T}_\mathrm{b})$ [K]")
        path = self.plot_dir / f"{name}.pdf"
        fig.savefig(path)
        plt.close(fig)
        return path

    def plot_deblend_intintens(self, vmax=10.0,
                               name="hf_deblend_intintens"):
        """Deblended integrated-intensity figure: per transition, the
        component-summed MAP integrated intensity, masked to pixels
        with a detected first component (reference plotting.py:437-471,
        matching Keown et al. 2019 fig. 19 preferences)."""
        data = self.hdf[f"{self.dpath}/integrated_intensity"][...]
        mask = self.hdf[f"{self.dpath}/peak_intensity"][:, 0]  # (t,b,l)
        data = np.nansum(data, axis=1)                         # (t,b,l)
        data[np.isnan(mask)] = np.nan
        n_trans = data.shape[0]
        figsize = self.pad.get_figsize((self.n_lon, self.n_lat),
                                       ncols=n_trans)
        fig, axes = plt.subplots(1, n_trans, figsize=figsize,
                                 squeeze=False)
        if vmax is None:
            vmax = np.nanmax(data) if np.isfinite(data).any() else 1.0
            extend = "neither"
        else:
            extend = "max"
        for i_t, ax in enumerate(axes[0]):
            im = self._imshow(ax, data[i_t], cmap="cividis", vmin=0,
                              vmax=vmax)
            if i_t:
                ax.set_ylabel("")
                ax.set_yticklabels([])
        self.pad.subplots_adjust(fig, colorbar=True)
        cax = fig.add_axes(self.pad.get_colorbar_axis(fig))
        fig.colorbar(
            im, cax=cax, extend=extend,
            label=r"$\int \tilde{T}_\mathrm{b}\,dv$ [K km s$^{-1}$]",
        )
        path = self.plot_dir / f"{name}.pdf"
        fig.savefig(path)
        plt.close(fig)
        return path

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

    def plot_mext_evidence(self, name="map_mext_evdiff"):
        """Masked extended-evidence map (reference plotting.py:369-386)."""
        data = self.hdf[f"{self.dpath}/mext_evidence"][...]
        fig, ax = plt.subplots(figsize=(5, 4))
        im = self._imshow(ax, data, cmap="RdBu_r",
                          norm=mcolors.TwoSlopeNorm(0.0))
        fig.colorbar(im, ax=ax, label=r"masked $\Delta \ln Z$")
        return self._save(fig, name)

    def plot_ncomp_metrics(self, name="map_ncomp_metrics", lnz_thresh=None):
        """Preferred component count per information criterion
        (reference plotting.py:472-500): lnZ Bayes factor vs BIC/AIC/
        AICc minima, side by side."""
        if lnz_thresh is None:
            lnz_thresh = float(self.hdf.attrs.get("lnZ_threshold", 11.0))
        ev = self.hdf[f"{self.dpath}/evidence"][...]       # [M+1, b, l]
        metrics = {"lnZ": None}
        n_models = ev.shape[0] - 1
        nb_ev = np.zeros(ev.shape[1:], dtype=float)
        for i in range(n_models):
            nb_ev += (nb_ev == i) & (ev[i + 1] - ev[i] > lnz_thresh)
        nb_ev[np.isnan(ev[0])] = np.nan
        metrics["lnZ"] = nb_ev
        for crit in ("BIC", "AIC", "AICc"):
            if f"{self.dpath}/{crit}" not in self.hdf:
                continue
            arr = self.hdf[f"{self.dpath}/{crit}"][...]
            nb = np.nanargmin(
                np.where(np.isnan(arr), np.inf, arr), axis=0
            ).astype(float)
            nb[np.isnan(arr[0])] = np.nan
            metrics[crit] = nb
        fig, axes = plt.subplots(
            ncols=len(metrics), figsize=(3.2 * len(metrics), 3),
            squeeze=False,
        )
        for ax, (label, img) in zip(axes[0], metrics.items()):
            im = self._imshow(ax, img, cmap="magma", vmin=0,
                              vmax=n_models)
            ax.set_title(label, fontsize=9)
            fig.colorbar(im, ax=ax, fraction=0.046)
        return self._save(fig, name)

    def _prop_grid(self, img_fn, title, name):
        """Parameter x component grid of sky maps."""
        n_par = len(self.par_names) or int(self.hdf.attrs["n_params"])
        ncomp_max = int(self.hdf.attrs["n_max_components"])
        fig, axes = plt.subplots(
            nrows=ncomp_max, ncols=n_par,
            figsize=(2.4 * n_par, 2.2 * ncomp_max), squeeze=False,
        )
        for m_ix in range(ncomp_max):
            for p_ix in range(n_par):
                ax = axes[m_ix, p_ix]
                img = img_fn(m_ix, p_ix)
                im = ax.imshow(img, origin="lower", cmap=_CMAP)
                fig.colorbar(im, ax=ax, fraction=0.046)
                pname = (self.par_names[p_ix]
                         if p_ix < len(self.par_names) else f"p{p_ix}")
                if m_ix == 0:
                    ax.set_title(pname, fontsize=8)
                if p_ix == 0:
                    ax.set_ylabel(f"comp {m_ix + 1}", fontsize=8)
                ax.set_xticks([])
                ax.set_yticks([])
        fig.suptitle(title, fontsize=10)
        return self._save(fig, name)

    def plot_map_props(self, name="map_props"):
        """All-parameter MAP map grid (reference plotting.py:503-525)."""
        data = self.hdf[f"{self.dpath}/nbest_MAP"][...]
        return self._prop_grid(
            lambda m, p: data[m, p], "MAP parameter maps", name
        )

    def plot_quan_props(self, quan_ix=4, name="quan_props", conv=True):
        """Quantile parameter map grid (reference plotting.py:528-559);
        ``quan_ix=4`` is the median."""
        dset = "conv_marginals" if conv else "nbest_marginals"
        data = self.hdf[f"{self.dpath}/{dset}"][...]
        if conv:
            # [r, m, p, M, b, l]: take the (r==m) diagonal per comp
            def img_fn(m, p):
                return data[m, m, p, quan_ix]
        else:
            def img_fn(m, p):
                return data[m, p, quan_ix]
        return self._prop_grid(
            img_fn, f"quantile {quan_ix} parameter maps", name
        )

    def plot_err_props(self, name="err_props", conv=True):
        """Half-width 1-sigma error map grid
        (reference plotting.py:562-596)."""
        dset = "conv_marginals" if conv else "nbest_marginals"
        data = self.hdf[f"{self.dpath}/{dset}"][...]
        lo, hi = MARGINAL_COLS.index("1s_lo"), MARGINAL_COLS.index("1s_hi")
        if conv:
            def img_fn(m, p):
                return (data[m, m, p, hi] - data[m, m, p, lo]) / 2
        else:
            def img_fn(m, p):
                return (data[m, p, hi] - data[m, p, lo]) / 2
        return self._prop_grid(img_fn, "1-sigma half-width maps", name)

    def plot_3d_volume(self, name="volume_field", thresh_frac=0.1,
                       trans_ix=0):
        """3-D (l, b, v) rendering of the deblended intensity field
        (reference plotting.py:599-608): voxels above a fraction of the
        peak, colored by brightness."""
        hfdb = self.hdf[f"{self.dpath}/hf_deblended"][...]
        cube = np.nansum(hfdb[trans_ix], axis=0)   # [v, b, l]
        vmax = np.nanmax(cube)
        if not np.isfinite(vmax) or vmax <= 0:
            vmax = 1.0
        iv, ib, il = np.nonzero(cube > thresh_frac * vmax)
        fig = plt.figure(figsize=(6, 5))
        ax = fig.add_subplot(projection="3d")
        vals = cube[iv, ib, il]
        p = ax.scatter(il, ib, iv, c=vals, cmap="inferno", s=4,
                       alpha=0.5, linewidths=0)
        ax.set_xlabel("lon pix")
        ax.set_ylabel("lat pix")
        ax.set_zlabel("velocity chan")
        fig.colorbar(p, ax=ax, shrink=0.6, label=r"$T_\mathrm{b}$ [K]")
        return self._save(fig, name)

    def plot_post_stack(self, i_lon, i_lat, name=None):
        """Per-pixel stacked posterior histograms: one row per
        parameter, one curve per component and per model run
        (reference plotting.py:611-648)."""
        group = self.hdf[f"/pix/{i_lon}/{i_lat}"]
        runs = sorted(int(k) for k in group)
        n_par = len(self.par_names) or int(self.hdf.attrs["n_params"])
        fig, axes = plt.subplots(
            nrows=n_par, figsize=(6, 1.6 * n_par), squeeze=False,
        )
        for n_run in runs:
            post = group[str(n_run)]["posteriors"][...]
            for p_ix in range(n_par):
                ax = axes[p_ix, 0]
                for i_m in range(n_run):
                    vals = post[:, p_ix * n_run + i_m]
                    ax.hist(
                        vals, bins=60, histtype="step", density=True,
                        lw=0.9, alpha=0.9,
                        label=f"N={n_run} c{i_m + 1}",
                    )
        for p_ix in range(n_par):
            pname = (self.par_names[p_ix]
                     if p_ix < len(self.par_names) else f"p{p_ix}")
            axes[p_ix, 0].set_ylabel(pname, fontsize=8)
            axes[p_ix, 0].tick_params(labelsize=7)
        axes[0, 0].legend(fontsize=6, ncol=2)
        name = name or f"post_stack_{i_lon}_{i_lat}"
        return self._save(fig, name)

    def plot_spec_fit_draws(self, i_lon, i_lat, stack, runner, n_draw=30,
                            ncomp=None, name=None, animate=False):
        """Spectrum with MAP model plus posterior-draw overlays; with
        ``animate=True`` also writes a GIF cycling through the draws
        (reference plotting.py:696-768)."""
        group = self.hdf[f"/pix/{i_lon}/{i_lat}"]
        nbest = ncomp or max(int(group.attrs["nbest"]), 1)
        sub = group[f"{nbest}"]
        post = sub["posteriors"][...]
        map_params = sub["map_params"][...]
        rng = np.random.default_rng(0)
        take = rng.choice(post.shape[0], size=min(n_draw, post.shape[0]),
                          replace=False)
        draws = post[take, :-2]
        map_preds = runner_predict_full(runner, map_params, nbest)
        draw_preds = [
            runner_predict_full(runner, draws[i], nbest)
            for i in range(draws.shape[0])
        ]
        n_t = stack.n_cubes
        fig, axes = plt.subplots(
            nrows=n_t, figsize=(8, 2.5 * n_t), squeeze=False,
        )
        for i_t, dcube in enumerate(stack.cubes):
            ax = axes[i_t, 0]
            _, arr, _, tid, _ = dcube.get_spec_data(i_lon, i_lat)
            ax.step(dcube.varr, arr, color="0.4", lw=0.8)
            for dp in draw_preds:
                ax.plot(dcube.varr, dp[i_t], color="tab:blue", lw=0.4,
                        alpha=0.25)
            ax.plot(dcube.varr, map_preds[i_t], color="tab:red", lw=1.2)
            ax.set_ylabel(rf"$T_\mathrm{{b}}$ t{dcube.trans_id} [K]")
        axes[-1, 0].set_xlabel(r"$v_\mathrm{lsr}$ [km/s]")
        name = name or f"spec_draws_{i_lon}_{i_lat}"
        path = self._save(fig, name)
        if animate:
            path = self._animate_draws(
                i_lon, i_lat, stack, draw_preds, map_preds, name
            )
        return path

    def _animate_draws(self, i_lon, i_lat, stack, draw_preds, map_preds,
                       name):
        """GIF cycling through posterior-draw model curves
        (reference plotting.py:741-768 animation branch)."""
        from matplotlib.animation import FuncAnimation, PillowWriter

        dcube = stack.cubes[0]
        _, arr, _, _, _ = dcube.get_spec_data(i_lon, i_lat)
        fig, ax = plt.subplots(figsize=(8, 3))
        ax.step(dcube.varr, arr, color="0.4", lw=0.8)
        ax.plot(dcube.varr, map_preds[0], color="tab:red", lw=1.0)
        line, = ax.plot(dcube.varr, draw_preds[0][0], color="tab:blue",
                        lw=0.9)
        ax.set_xlabel(r"$v_\mathrm{lsr}$ [km/s]")
        ax.set_ylabel(r"$T_\mathrm{b}$ [K]")

        def update(i):
            line.set_ydata(draw_preds[i % len(draw_preds)][0])
            return (line,)

        anim = FuncAnimation(fig, update, frames=len(draw_preds))
        path = self.plot_dir / f"{name}.gif"
        anim.save(path, writer=PillowWriter(fps=5))
        plt.close(fig)
        return path

    def plot_spec_grid(self, stack, pix, rlon=2, rlat=2, trans_ix=0,
                       name=None):
        """Postage-stamp grid of spectra around a central pixel
        (reference plotting.py:771-888)."""
        i_lon0, i_lat0 = pix
        dcube = stack.cubes[trans_ix]
        n_lon, n_lat = stack.spatial_shape
        nr, nc = 2 * rlat + 1, 2 * rlon + 1
        fig, axes = plt.subplots(
            nrows=nr, ncols=nc, figsize=(1.6 * nc, 1.1 * nr),
            sharex=True, sharey=True, squeeze=False,
        )
        for dy in range(-rlat, rlat + 1):
            for dx in range(-rlon, rlon + 1):
                # grid rows top-to-bottom = decreasing latitude
                ax = axes[rlat - dy, dx + rlon]
                i_lon, i_lat = i_lon0 + dx, i_lat0 + dy
                ax.tick_params(labelsize=5)
                if not (0 <= i_lon < n_lon and 0 <= i_lat < n_lat):
                    ax.set_facecolor("0.9")
                    continue
                _, arr, _, _, has_nans = dcube.get_spec_data(i_lon, i_lat)
                if has_nans:
                    ax.set_facecolor("0.9")
                    continue
                ax.step(dcube.varr, arr, color="0.2", lw=0.5)
                if dx == 0 and dy == 0:
                    for spine in ax.spines.values():
                        spine.set_color("tab:red")
        fig.subplots_adjust(hspace=0, wspace=0)
        name = name or f"spec_grid_{i_lon0}_{i_lat0}"
        return self._save(fig, name)

    def plot_velo_2corr(self, i_lon, i_lat, name=None):
        """Joint posterior of the two component centroids for a 2-comp
        fit (reference plotting.py:930-959)."""
        group = self.hdf[f"/pix/{i_lon}/{i_lat}"]
        if "2" not in group:
            raise ValueError(f"no 2-comp run at ({i_lon}, {i_lat})")
        post = group["2"]["posteriors"][...]
        v1, v2 = post[:, 0], post[:, 1]
        fig, ax = plt.subplots(figsize=(4, 4))
        ax.hist2d(v1, v2, bins=50, cmap="Blues",
                  norm=mcolors.PowerNorm(0.5))
        lo = min(v1.min(), v2.min())
        hi = max(v1.max(), v2.max())
        ax.plot([lo, hi], [lo, hi], "k--", lw=0.6)
        ax.set_xlabel(r"$v_1$ [km/s]")
        ax.set_ylabel(r"$v_2$ [km/s]")
        name = name or f"velo_2corr_{i_lon}_{i_lat}"
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


def _kde_density_2d(x, y, bins=64, smooth=1.5):
    """Gaussian-KDE-smoothed 2-D density on a regular grid.

    Histogram the samples, then convolve with a Gaussian whose width is
    ``smooth`` grid cells scaled by Silverman's n^(-1/6) factor -- the
    getdist-style smoothing the reference's corner plots get from the
    getdist package (reference plotting.py:891-958), without the
    dependency.  Returns (xc, yc, density, levels) where ``levels``
    are the highest-density contour thresholds enclosing 39.3% / 86.5%
    of the posterior mass (the 2-D 1- and 2-sigma equivalents getdist
    draws).
    """
    from scipy.ndimage import gaussian_filter

    h, xe, ye = np.histogram2d(x, y, bins=bins)
    n = max(x.size, 2)
    sig = smooth * (n / 100.0) ** (-1.0 / 6.0)
    h = gaussian_filter(h, sigma=max(sig, 0.6), mode="constant")
    # highest-density levels by mass fraction
    flat = np.sort(h.ravel())[::-1]
    csum = np.cumsum(flat)
    csum /= max(csum[-1], 1e-30)
    levels = []
    for frac in (0.865, 0.393):     # 2-sigma first (lower threshold)
        k = int(np.searchsorted(csum, frac))
        levels.append(flat[min(k, flat.size - 1)])
    xc = 0.5 * (xe[:-1] + xe[1:])
    yc = 0.5 * (ye[:-1] + ye[1:])
    return xc, yc, h.T, sorted(set(levels))


def corner_plot(samples, labels=None, bins=40, figsize=None,
                contours=True, smooth=1.5):
    """Corner plot: KDE-smoothed 1-D marginals on the diagonal,
    smoothed 2-D density with 1/2-sigma highest-density contours below
    (getdist-grade replacement, reference plotting.py:891-958;
    ``contours=False`` reverts to the plain 2-D histogram)."""
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
                if contours:
                    from scipy.ndimage import gaussian_filter1d

                    h, edges = np.histogram(samples[:, i], bins=2 * bins,
                                            density=True)
                    h = gaussian_filter1d(h, sigma=max(
                        smooth * (samples.shape[0] / 100.0) ** (-1 / 5.0),
                        0.6,
                    ), mode="constant")
                    ax.plot(0.5 * (edges[:-1] + edges[1:]), h,
                            color="0.25", lw=1.0)
                    ax.fill_between(0.5 * (edges[:-1] + edges[1:]), h,
                                    color="0.8", alpha=0.6)
                else:
                    ax.hist(samples[:, i], bins=bins, color="0.3",
                            histtype="step", density=True)
            elif contours:
                xc, yc, dens, levels = _kde_density_2d(
                    samples[:, j], samples[:, i], bins=max(bins, 48),
                    smooth=smooth,
                )
                ax.contourf(xc, yc, dens,
                            levels=list(levels) + [dens.max() + 1e-30],
                            colors=["#b3cde3", "#6497bf"], alpha=0.85)
                ax.contour(xc, yc, dens, levels=levels,
                           colors="#30557f", linewidths=0.7)
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


def plot_info_kernel(sigma_pix, nrad, clip_radius=None,
                     out_path="info_kernel.pdf"):
    """Visualize the independent-information convolution kernel
    (reference plotting.py:962-990)."""
    from nestfit_tpu.cube.products import (
        apply_circular_mask, get_indep_info_kernel,
    )

    kernel = get_indep_info_kernel(sigma_pix, nrad=nrad)
    if clip_radius is not None:
        kernel = apply_circular_mask(kernel, radius=clip_radius)
    fig, ax = plt.subplots(figsize=(4.5, 4))
    im = ax.imshow(kernel, origin="lower", cmap="cividis")
    fig.colorbar(im, ax=ax, label="weight")
    ax.set_xlabel("pixel offset")
    ax.set_ylabel("pixel offset")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_synth_spectra(spectra, out_path="synth_spectra.pdf"):
    """Overview plot of synthetic truth spectra
    (reference plotting.py:993-1028)."""
    fig, axes = plt.subplots(
        nrows=len(spectra), figsize=(8, 2.2 * len(spectra)), squeeze=False,
    )
    for ax, syn in zip(axes[:, 0], spectra):
        ax.step(syn.varr, syn.sampled_spec, color="0.5", lw=0.7,
                label="sampled")
        ax.plot(syn.varr, syn.sum_spec, color="tab:red", lw=1.0,
                label="truth")
        ax.set_ylabel(r"$T_\mathrm{b}$ [K]")
    axes[0, 0].legend(fontsize=7)
    axes[-1, 0].set_xlabel(r"$v_\mathrm{lsr}$ [km/s]")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


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
