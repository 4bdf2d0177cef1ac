"""Post-processing: dense map products from the store.

Rebuild of the reference post-processing suite
(reference: main.py:529-1272) with identical product names, dataset
shapes, and semantics (store layout spec docs/store_spec.rst:100-126),
but a vectorized implementation: the store is walked **once** into a
struct-of-arrays table, dense maps are filled by index scatters,
histograms are computed by batched bincount, spatial PDF smoothing is
one batched FFT convolution, and quantile inversion is vectorized over
all pixels -- no per-pixel Python loops (the reference iterates
``itertools.product`` over every pixel/run/param plane,
main.py:885-1061).

Convolution helpers replace astropy.convolution (not available here):
``convolve_nan`` implements astropy's NaN-interpolating ``convolve``
with ``boundary='extend'``; ``convolve_fft_unnorm`` implements the
unnormalized FFT convolution used for log-space PDF smoothing.
"""

import numpy as np
from scipy import ndimage, signal, special

import jax
import jax.numpy as jnp

from nestfit_tpu.utils import get_logger

log = get_logger("nestfit_tpu.products")


def nans(shape, dtype=None):
    return np.full(shape, np.nan, dtype=dtype)


# ---------------------------------------------------------------------------
# convolution primitives (astropy.convolution equivalents)
# ---------------------------------------------------------------------------

def gaussian_kernel_2d(sigma):
    """Normalized 2-D Gaussian kernel, odd-sized at 8 sigma like
    ``astropy.convolution.Gaussian2DKernel``."""
    size = int(8 * sigma + 0.5)
    size = size + 1 if size % 2 == 0 else size
    size = max(size, 3)
    ax = np.arange(size) - size // 2
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    k = np.outer(g, g)
    return k / k.sum()


def _as_kernel(kernel):
    if isinstance(kernel, (int, float)):
        return gaussian_kernel_2d(kernel)
    return np.asarray(kernel)


def convolve_nan(data, kernel, boundary="extend"):
    """NaN-aware normalized convolution (astropy ``convolve``
    semantics: NaN treated as missing and interpolated over; edge
    handling via replication).

    ``data`` may carry leading batch axes; the kernel acts on the two
    trailing (sky) axes of every plane in one call.
    """
    kernel = _as_kernel(kernel)
    kernel = kernel / kernel.sum()
    if data.ndim > 2:
        kernel = kernel.reshape((1,) * (data.ndim - 2) + kernel.shape)
    valid = np.isfinite(data)
    filled = np.where(valid, data, 0.0)
    mode = "nearest" if boundary == "extend" else "constant"
    num = ndimage.convolve(filled, kernel, mode=mode)
    den = ndimage.convolve(valid.astype(float), kernel, mode=mode)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = num / den
    out[den == 0] = np.nan
    return out


def convolve_fft_unnorm(data, kernel):
    """Unnormalized FFT convolution with NaNs zero-filled (the
    reference's ``convolve_fft(..., normalize_kernel=False)`` use;
    NaN positions are re-masked by the caller, main.py:1008-1015).

    Batched: the kernel acts on the two trailing axes.
    """
    kernel = _as_kernel(kernel)
    if data.ndim > 2:
        kernel = kernel.reshape((1,) * (data.ndim - 2) + kernel.shape)
    filled = np.where(np.isfinite(data), data, 0.0)
    return signal.fftconvolve(filled, kernel, mode="same",
                              axes=(-2, -1))


# ---------------------------------------------------------------------------
# selection / kernel utilities
# ---------------------------------------------------------------------------

def take_by_components(data, comps, axis=0, incl_zero=True):
    """Per map pixel, pick the model plane matching its component
    count (semantics of reference main.py:529-562).

    ``data`` has a model axis ``axis`` of size ncomp_max and trailing
    sky axes matching ``comps``; pixels whose count is below the
    inclusion floor come back NaN.
    """
    comps = np.asarray(comps)
    planes = np.moveaxis(data, axis, 0)            # [M, ..., *sky]
    run_ix = np.clip(comps - 1, 0, planes.shape[0] - 1)
    # broadcast the pixel index map over any middle axes
    mid = planes.ndim - 1 - comps.ndim
    gather = run_ix.reshape((1,) * (mid + 1) + comps.shape)
    out = np.take_along_axis(planes, gather, axis=0)[0]
    floor = 0 if incl_zero else 1
    out[..., comps < floor] = np.nan
    return out


def apply_circular_mask(kernel, radius=None):
    """Exact circular-aperture weighting of a kernel
    (reference: main.py:574-610; implemented without photutils via
    subpixel supersampling)."""
    kernel = np.asarray(kernel, dtype=float)
    nx, ny = kernel.shape
    if radius is None:
        radius = min(nx, ny) / 2
    corner_dist = np.sqrt((nx / 2) ** 2 + (ny / 2) ** 2)
    if radius > corner_dist:
        return kernel
    if nx % 2 == 0 or ny % 2 == 0:
        raise ValueError(f"Kernel dimensions must be odd: ({nx}, {ny})")
    # subpixel-sampled circular overlap fraction per cell
    sub = 10
    yy, xx = np.mgrid[0:nx * sub, 0:ny * sub]
    xc = (xx + 0.5) / sub - nx / 2
    yc = (yy + 0.5) / sub - ny / 2
    inside = (xc**2 + yc**2) <= radius**2
    frac = inside.reshape(nx, sub, ny, sub).mean(axis=(1, 3))
    return frac * kernel


def get_indep_info_kernel(sigma, nrad=1, sigma_taper=None):
    """Independent-information weights for convolving maps produced
    with a Gaussian beam of width ``sigma`` (pixels).

    Each offset cell is weighted by one minus the fraction of the
    beam's information it shares with the center pixel, normalized by
    the points-per-beam, with the center pinned to 1 (semantics of
    reference main.py:613-661).
    """
    assert isinstance(nrad, int) and nrad >= 0
    if nrad == 0:
        return np.array([[1.0]])
    side = np.arange(-nrad, nrad + 1, dtype=float)
    # integral of the unit Gaussian over each unit cell, per axis:
    # Phi((x+1/2)/sigma) - Phi((x-1/2)/sigma) via the normal CDF
    cell = special.ndtr((side + 0.5) / sigma) - special.ndtr(
        (side - 0.5) / sigma
    )
    shared = np.outer(cell, cell)                  # beam mass per cell
    peak_amp = 1.0 / (2 * np.pi * sigma**2)
    ppbeam = max(1.0, 2 * np.pi * sigma**2)
    weights = (1.0 - shared / peak_amp) / ppbeam
    if sigma_taper is not None:
        yy, xx = np.meshgrid(side, side, indexing="ij")
        weights = weights * np.exp(
            -0.5 * (xx**2 + yy**2) / sigma_taper**2
        )
    weights[nrad, nrad] = 1.0
    return weights


# ---------------------------------------------------------------------------
# store -> struct-of-arrays collection (single pass)
# ---------------------------------------------------------------------------

class FitTable:
    """Struct-of-arrays view of every fit in the store.

    ``pix``: dict of [n_pix] arrays (i_lon, i_lat, nbest).
    ``runs[ncomp]``: dict with [n_fit] attr arrays, [n_fit, ...]
    dataset stacks, and ``pix_row`` linking each fit to its pixel.
    """

    ATTR_KEYS = (
        "null_lnZ", "global_lnZ", "global_lnZ_err", "BIC", "AIC", "AICc",
        "null_BIC", "null_AIC", "null_AICc",
    )
    DSET_KEYS = ("map_params", "bestfit_params", "marginals", "posteriors")

    def __init__(self, store, with_posteriors=False):
        dsets = self.DSET_KEYS if with_posteriors else self.DSET_KEYS[:3]
        pix_cols = {"i_lon": [], "i_lat": [], "nbest": []}
        runs = {}
        for row, group in enumerate(store.iter_pix_groups()):
            pix_cols["i_lon"].append(group.attrs["i_lon"])
            pix_cols["i_lat"].append(group.attrs["i_lat"])
            pix_cols["nbest"].append(group.attrs.get("nbest", -1))
            for name in group:
                sub = group[name]
                ncomp = int(sub.attrs["ncomp"])
                rec = runs.setdefault(ncomp, {"pix_row": []})
                rec["pix_row"].append(row)
                for key in self.ATTR_KEYS:
                    rec.setdefault(key, []).append(sub.attrs[key])
                for key in dsets:
                    rec.setdefault(key, []).append(sub[key][...])
        self.pix = {k: np.asarray(v) for k, v in pix_cols.items()}
        self.runs = {
            n: {k: np.asarray(v) for k, v in rec.items()}
            for n, rec in runs.items()
        }
        self.marg_quantiles = None
        for group in store.iter_pix_groups():
            for name in group:
                self.marg_quantiles = group[name].attrs["marg_quantiles"]
                break
            if self.marg_quantiles is not None:
                break

    @property
    def n_pix(self):
        return self.pix["i_lon"].size


# ---------------------------------------------------------------------------
# aggregation products
# ---------------------------------------------------------------------------

def aggregate_run_attributes(store):
    """Dense nbest/evidence/err/AIC/AICc/BIC maps
    (semantics of reference main.py:664-721), via one store pass and
    vectorized index scatters."""
    log.info("Aggregating store attributes")
    hdf = store.hdf
    dpath = store.dpath
    n_lon = hdf.attrs["naxis1"]
    n_lat = hdf.attrs["naxis2"]
    ncomp_max = hdf.attrs["n_max_components"]
    tab = FitTable(store)
    lons, lats = tab.pix["i_lon"], tab.pix["i_lat"]

    nbest_map = np.full((n_lon, n_lat), -1, dtype=np.int32)
    nbest_map[lons, lats] = tab.pix["nbest"]

    planes = {
        name: nans((n_lon, n_lat, ncomp_max + 1))
        for name in ("lnz", "lnzerr", "bic", "aic", "aicc")
    }
    for ncomp, rec in tab.runs.items():
        rl = lons[rec["pix_row"]]
        rb = lats[rec["pix_row"]]
        planes["lnz"][rl, rb, ncomp] = rec["global_lnZ"]
        planes["lnzerr"][rl, rb, ncomp] = rec["global_lnZ_err"]
        planes["bic"][rl, rb, ncomp] = rec["BIC"]
        planes["aic"][rl, rb, ncomp] = rec["AIC"]
        planes["aicc"][rl, rb, ncomp] = rec["AICc"]
        if ncomp == 1:
            # plane 0 holds the null (zero-component) model figures
            planes["lnz"][rl, rb, 0] = rec["null_lnZ"]
            planes["bic"][rl, rb, 0] = rec["null_BIC"]
            planes["aic"][rl, rb, 0] = rec["null_AIC"]
            planes["aicc"][rl, rb, 0] = rec["null_AICc"]

    store.create_dataset("nbest", nbest_map.transpose(), group=dpath)
    store.create_dataset("evidence", planes["lnz"].transpose(), group=dpath)
    store.create_dataset(
        "evidence_err", planes["lnzerr"].transpose(), group=dpath
    )
    store.create_dataset("BIC", planes["bic"].transpose(), group=dpath)
    store.create_dataset("AIC", planes["aic"].transpose(), group=dpath)
    store.create_dataset("AICc", planes["aicc"].transpose(), group=dpath)


def convolve_evidence(store, kernel):
    """Spatially convolved evidence + re-selected conv_nbest with the
    one-step jump guard (semantics of reference main.py:724-774)."""
    log.info("Convolving evidence maps")
    hdf = store.hdf
    dpath = store.dpath
    ncomp_max = hdf.attrs["n_max_components"]
    lnz_thresh = hdf.attrs["lnZ_threshold"]
    evidence = hdf[f"{dpath}/evidence"][...]
    nbest = hdf[f"{dpath}/nbest"][...]

    smoothed = convolve_nan(evidence, _as_kernel(kernel))

    # climb the model ladder wherever each rung's Bayes factor clears
    # the threshold on the smoothed evidence
    chosen = np.zeros(smoothed.shape[1:], dtype=np.int32)
    for rung in range(ncomp_max):
        clears = smoothed[rung + 1] - smoothed[rung] > lnz_thresh
        chosen += ((chosen == rung) & clears).astype(np.int32)
    chosen[nbest == -1] = -1
    # guard: smoothing may only promote a pixel one step past its own
    # unsmoothed selection
    cap = nbest + 1
    np.minimum(chosen, cap, out=chosen, where=chosen - nbest >= 2)
    store.create_dataset("conv_nbest", chosen, group=dpath)
    store.create_dataset("conv_evidence", smoothed, group=dpath)


def extended_masked_evidence(store, kernel, conv=True, lnz_thresh=3):
    """Masked second convolution to surface weak extended features
    (semantics of reference main.py:777-816)."""
    log.info("Convolving masked evidence")
    hdf = store.hdf
    dpath = store.dpath
    evidence = hdf[f"{dpath}/evidence"][...]
    src = "conv_evidence" if conv else "evidence"
    gain = hdf[f"{dpath}/{src}"][...]
    gain = gain[1] - gain[0]
    detected = gain > lnz_thresh
    # blank confidently-detected pixels, then re-smooth what remains
    masked = np.where(detected[None], np.nan, evidence)
    smoothed = convolve_nan(masked, _as_kernel(kernel))
    mext = smoothed[1] - smoothed[0]
    mext[np.isnan(gain) | detected] = np.nan
    store.create_dataset("mext_evidence", mext, group=dpath)


def aggregate_run_products(store):
    """Dense MAP/bestfit/marginals cubes (semantics of reference
    main.py:819-882), filled by vectorized scatters from one pass."""
    log.info("Aggregating store products")
    hdf = store.hdf
    dpath = store.dpath
    n_lon = hdf.attrs["naxis1"]
    n_lat = hdf.attrs["naxis2"]
    nbest_data = hdf[f"{dpath}/conv_nbest"][...].transpose()
    ncomp_max = hdf.attrs["n_max_components"]
    n_params = hdf.attrs["n_params"]
    tab = FitTable(store)
    marg_quan = tab.marg_quantiles
    n_margs = len(marg_quan)
    lons, lats = tab.pix["i_lon"], tab.pix["i_lat"]

    mapdata = nans((n_lon, n_lat, n_params, ncomp_max))
    bfdata = nans((n_lon, n_lat, n_params, ncomp_max))
    pardata = nans((n_lon, n_lat, n_margs, n_params, ncomp_max))
    for ncomp, rec in tab.runs.items():
        rows = rec["pix_row"]
        rl, rb = lons[rows], lats[rows]
        # only pixels whose (convolved) selection equals this run count
        sel = nbest_data[rl, rb] == ncomp
        if not sel.any():
            continue
        rl, rb = rl[sel], rb[sel]
        mapdata[rl, rb, :, :ncomp] = (
            rec["map_params"][sel].reshape(-1, n_params, ncomp)
        )
        bfdata[rl, rb, :, :ncomp] = (
            rec["bestfit_params"][sel].reshape(-1, n_params, ncomp)
        )
        pardata[rl, rb, :, :, :ncomp] = (
            rec["marginals"][sel].reshape(-1, n_margs, n_params, ncomp)
        )
    store.create_dataset("marg_quantiles", marg_quan, group=dpath)
    store.create_dataset("nbest_MAP", mapdata.transpose(), group=dpath)
    store.create_dataset("nbest_bestfit", bfdata.transpose(), group=dpath)
    store.create_dataset("nbest_marginals", pardata.transpose(), group=dpath)


def _batched_histogram(values, edges):
    """Row-wise histogram: ``values[N, S]`` against shared ``edges[B]``
    -> counts ``[N, B-1]`` matching ``np.histogram`` bin semantics
    (right-closed final bin)."""
    n_rows, _ = values.shape
    n_bins = edges.size - 1
    idx = np.searchsorted(edges, values, side="right") - 1
    # np.histogram puts values equal to the last edge into the final bin
    idx[values == edges[-1]] = n_bins - 1
    ok = (idx >= 0) & (idx < n_bins)
    row = np.broadcast_to(np.arange(n_rows)[:, None], values.shape)
    flat = (row * n_bins + idx)[ok]
    counts = np.bincount(flat, minlength=n_rows * n_bins)
    return counts.reshape(n_rows, n_bins)


def aggregate_run_pdfs(store, par_bins=None):
    """Histogrammed 1-D posterior PDFs per pixel/run/parameter
    (semantics of reference main.py:885-953), via batched bincount
    histograms instead of per-pixel ``np.histogram`` calls."""
    log.info("Aggregating marginalized posterior PDFs")
    hdf = store.hdf
    dpath = store.dpath
    n_lon = hdf.attrs["naxis1"]
    n_lat = hdf.attrs["naxis2"]
    ncomp_max = hdf.attrs["n_max_components"]
    n_params = hdf.attrs["n_params"]
    if par_bins is None:
        n_bins = 200
        margdata = hdf[f"{dpath}/nbest_marginals"][...]
        vmins = np.nanmin(margdata[:, :, 0, :, :], axis=(0, 2, 3))
        vmaxs = np.nanmax(margdata[:, :, 8, :, :], axis=(0, 2, 3))
        par_bins = np.array([
            np.linspace(lo, hi, n_bins) for lo, hi in zip(vmins, vmaxs)
        ])
    else:
        n_bins = par_bins.shape[1]

    tab = FitTable(store, with_posteriors=True)
    lons, lats = tab.pix["i_lon"], tab.pix["i_lat"]
    histdata = nans(
        (n_lon, n_lat, ncomp_max, n_params, ncomp_max, n_bins - 1)
    )
    for ncomp, rec in tab.runs.items():
        rows = rec["pix_row"]
        rl, rb = lons[rows], lats[rows]
        post = rec["posteriors"]               # [N, n_post, ndim + 2]
        for i_p in range(n_params):
            for i_m in range(ncomp):
                vals = post[:, :, i_p * ncomp + i_m]
                counts = _batched_histogram(vals, par_bins[i_p])
                histdata[rl, rb, ncomp - 1, i_p, i_m, :] = counts
    with np.errstate(invalid="ignore", divide="ignore"):
        histdata /= np.nansum(histdata, axis=5, keepdims=True)
    bin_mids = (par_bins[:, :-1] + par_bins[:, 1:]) / 2
    store.create_dataset("pdf_bins", bin_mids, group=dpath)
    histdata = histdata.transpose((2, 4, 3, 5, 1, 0)).astype("float32")
    store.create_dataset("post_pdfs", histdata, group=dpath)


def convolve_post_pdfs(store, kernel, evid_weight=True):
    """Evidence-weighted log-space spatial PDF smoothing
    (semantics of reference main.py:956-1017) as one batched FFT
    convolution over all (run, comp, param, bin) planes at once."""
    log.info("Convolving posterior PDFs")
    hdf = store.hdf
    dpath = store.dpath
    pdfs = hdf[f"{dpath}/post_pdfs"][...]     # [r, m, p, h, b, l]
    logp = np.log(np.where(pdfs > 0, pdfs, 1e-32))
    logp[np.isnan(pdfs)] = np.nan
    if evid_weight:
        evid = hdf[f"{dpath}/evidence"][...]
        nbest = hdf[f"{dpath}/conv_nbest"][...]
        z_best = take_by_components(evid[1:, :, :], nbest)
        rel = z_best - evid[0, :, :]
        rel = rel - np.nanmin(rel)
        rel = rel / np.nanmax(rel)
        logp = logp * rel[None, None, None, None, :, :]
    smoothed = convolve_fft_unnorm(logp, kernel)
    # planes with comp index beyond the run count carry no data (NaN
    # in the input); re-mask them after the batched transform
    out = np.exp(smoothed)
    with np.errstate(invalid="ignore"):
        out /= np.nansum(out, axis=3, keepdims=True)
    out[np.isnan(pdfs)] = np.nan
    store.create_dataset(
        "conv_post_pdfs", out.astype("float32"), group=dpath
    )


def _invert_cdf_rows(cdf, xs, qs):
    """Vectorized CDF inversion: ``cdf[..., H]`` monotone rows against
    shared abscissa ``xs[H]`` at quantiles ``qs[Q]`` -> ``[..., Q]``
    (the batched form of ``np.interp(qs, cdf_row, xs)``)."""
    H = cdf.shape[-1]
    flat = cdf.reshape(-1, H)
    bad = ~np.isfinite(flat).all(axis=1)
    safe = np.where(bad[:, None], np.linspace(0, 1, H)[None, :], flat)
    out = np.empty((flat.shape[0], qs.size))
    for i_q, q in enumerate(qs):
        k = np.clip((safe < q).sum(axis=1), 1, H - 1)
        rows = np.arange(flat.shape[0])
        c0 = safe[rows, k - 1]
        c1 = safe[rows, k]
        with np.errstate(invalid="ignore", divide="ignore"):
            t = np.clip((q - c0) / (c1 - c0), 0.0, 1.0)
        t = np.where(c1 > c0, t, 0.0)
        out[:, i_q] = xs[k - 1] + t * (xs[k] - xs[k - 1])
        # clamp outside the table like np.interp
        out[safe[:, 0] >= q, i_q] = xs[0]
        out[safe[:, -1] < q, i_q] = xs[-1]
    out[bad] = np.nan
    return out.reshape(cdf.shape[:-1] + (qs.size,))


def quantize_conv_marginals(store):
    """Weighted quantiles of the convolved marginals by CDF inversion
    (semantics of reference main.py:1020-1061), vectorized over all
    pixels at once."""
    log.info("Calculating convolved PDF quantiles")
    hdf = store.hdf
    dpath = store.dpath
    bins = hdf[f"{dpath}/pdf_bins"][...]
    quan = hdf[f"{dpath}/marg_quantiles"][...]
    pdfs = hdf[f"{dpath}/conv_post_pdfs"][...]   # [r, m, p, h, b, l]
    pdfs = pdfs.transpose((0, 1, 2, 4, 5, 3))    # [r, m, p, b, l, h]
    with np.errstate(invalid="ignore", divide="ignore"):
        cdf = np.cumsum(pdfs, axis=5) / np.sum(pdfs, axis=5, keepdims=True)
    n_r, n_m, n_p = cdf.shape[:3]
    margs = nans(cdf.shape[:-1] + (quan.size,))
    for i_p in range(n_p):
        margs[:, :, i_p] = _invert_cdf_rows(cdf[:, :, i_p], bins[i_p], quan)
    margs = margs.transpose((0, 1, 2, 5, 3, 4)).astype("float32")
    store.create_dataset("conv_marginals", margs, group=dpath)


def _batched_map_predict(store, stack, runner):
    """Batched model prediction at the MAP parameters for every valid
    pixel (vectorizes the reference's per-pixel loops,
    main.py:1100-1113 and 1177-1188).

    Returns (pmap [l,b,p,m], valid mask [l,b,m], preds: list per
    transition of [n_valid, S]).
    """
    hdf = store.hdf
    dpath = store.dpath
    pmap = hdf[f"{dpath}/nbest_MAP"][...].transpose()  # (l, b, p, m)
    n_lon, n_lat, n_params, ncomp_max = pmap.shape
    valid = ~np.isnan(pmap).any(axis=2)                # (l, b, m)
    # build [N, n_params] single-component parameter rows
    l_ix, b_ix, m_ix = np.nonzero(valid)
    params_1c = pmap[l_ix, b_ix, :, m_ix]              # [N, p]
    if params_1c.shape[0] == 0:
        return pmap, valid, (l_ix, b_ix, m_ix), []
    params_dev = jnp.asarray(params_1c, dtype=jnp.float32)
    preds = []
    predict = _predict_jit(runner.model)
    for spec in runner.spectra:
        pred = predict(spec, params_dev)
        preds.append(np.asarray(pred))
    return pmap, valid, (l_ix, b_ix, m_ix), preds


# memoized per model module: a fresh jax.jit wrapper per call would
# retrace model_predict on every postprocess invocation
_PREDICT_JIT = {}


def _predict_jit(model):
    key = id(model)
    if key not in _PREDICT_JIT:
        _PREDICT_JIT[key] = (jax.jit(model.model_predict), model)
    return _PREDICT_JIT[key][0]


def deblend_hf_intensity(store, stack, runner):
    """Peak/integrated intensity + hyperfine-deblended cube from MAP
    parameters (reference: main.py:1064-1133)."""
    assert runner.ncomp == 1
    log.info("Deblending HF structure in intensity map")
    hdf = store.hdf
    dpath = store.dpath
    bins = hdf[f"{dpath}/pdf_bins"][...]
    pmap, valid, (l_ix, b_ix, m_ix), preds = _batched_map_predict(
        store, stack, runner
    )
    n_lon, n_lat, n_params, ncomp_max = pmap.shape
    nspec = stack.n_cubes
    intint = nans((n_lon, n_lat, ncomp_max, nspec))
    pkint = nans(intint.shape)
    for i_t, pred in enumerate(preds):
        pkint[l_ix, b_ix, m_ix, i_t] = np.nanmax(pred, axis=1)
        intint[l_ix, b_ix, m_ix, i_t] = np.nansum(pred, axis=1)
    for i_t, cube in enumerate(stack.cubes):
        intint[:, :, :, i_t] *= cube.dv
    dv_bin = abs(bins[0, 1] - bins[0, 0])
    vaxis = bins[0].reshape(1, 1, 1, 1, -1)
    ix_vcen = store.model.IX_VCEN
    ix_sigm = store.model.IX_SIGM
    vcen = np.expand_dims(pmap[:, :, ix_vcen, :], (3, 4))
    sigm = np.expand_dims(pmap[:, :, ix_sigm, :], (3, 4))
    norm_fact = dv_bin / (sigm * np.sqrt(2 * np.pi))
    amp = intint[..., np.newaxis]
    hfdb = norm_fact * amp * np.exp(-0.5 * ((vaxis - vcen) / sigm) ** 2)
    store.create_dataset("peak_intensity", pkint.transpose(), group=dpath)
    store.create_dataset(
        "integrated_intensity", intint.transpose(), group=dpath
    )
    hfdb = hfdb.transpose((3, 2, 4, 1, 0)).astype("float32")
    store.create_dataset("hf_deblended", hfdb, group=dpath)


def generate_predicted_profiles(store, stack, runner):
    """MAP model spectra cubes per transition
    (reference: main.py:1136-1193)."""
    assert runner.ncomp == 1
    log.info("Generating MAP model spectral profiles")
    dpath = store.dpath
    pmap, valid, (l_ix, b_ix, m_ix), preds = _batched_map_predict(
        store, stack, runner
    )
    n_lon, n_lat, n_params, ncomp_max = pmap.shape
    for pred, dcube in zip(preds, stack):
        mcube = nans((n_lon, n_lat, ncomp_max, dcube.nchan))
        mcube[l_ix, b_ix, m_ix, :] = pred
        mcube = mcube.transpose((2, 3, 1, 0)).astype("float32")
        group = f"{dpath}/model_spec"
        store.create_dataset(f"trans{dcube.trans_id}", mcube, group=group)


def create_fits_from_store(store, prefix="source"):
    """FITS export of the deblended cubes (reference: main.py:1196-1237)."""
    from nestfit_tpu.cube.fits_io import write_fits

    cube_header = store.read_header(full=True)
    hdf = store.hdf
    dpath = store.dpath
    bins = hdf[f"{dpath}/pdf_bins"][...]
    vaxis = bins[store.model.IX_VCEN]
    hfdb = hdf[f"{dpath}/hf_deblended"][...]
    hfdb = hfdb.transpose((1, 2, 0, 3, 4))
    paths = []
    for i_t in range(hfdb.shape[0]):
        data = np.nansum(hfdb[i_t], axis=0)
        header = dict(cube_header)
        header.update({
            "BUNIT": "K",
            "NAXIS3": vaxis.size,
            "CRPIX3": 1,
            "CDELT3": vaxis[1] - vaxis[0],
            "CUNIT3": "km/s",
            "CTYPE3": "VRAD",
            "CRVAL3": vaxis[0],
            "SPECSYS": "LSRK",
        })
        path = f"{prefix}_hf_deblended_trans{i_t}.fits"
        write_fits(path, data, header)
        paths.append(path)
    return paths


def postprocess_run(store, stack, runner, par_bins=None, evid_kernel=None,
                    post_kernel=None, evid_weight=True):
    """Run all post-processing steps (reference: main.py:1240-1272)."""
    aggregate_run_attributes(store)
    convolve_evidence(store, evid_kernel)
    aggregate_run_products(store)
    aggregate_run_pdfs(store, par_bins=par_bins)
    convolve_post_pdfs(store, post_kernel, evid_weight=evid_weight)
    quantize_conv_marginals(store)
    deblend_hf_intensity(store, stack, runner)
    generate_predicted_profiles(store, stack, runner)
