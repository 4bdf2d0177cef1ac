"""Post-processing: dense map products from the store.

Rebuild of the reference post-processing suite
(reference: main.py:529-1272) with identical product names, shapes,
and semantics (store layout spec docs/store_spec.rst:100-126).  The
reference's per-pixel Python loops over ``runner.predict``
(main.py:1106-1113, 1182-1188) are replaced by batched JAX predicts.

Convolution helpers replace astropy.convolution (not available here):
``convolve_nan`` implements astropy's NaN-interpolating ``convolve``
with ``boundary='extend'``; ``convolve_fft_unnorm`` implements the
unnormalized FFT convolution used for log-space PDF smoothing.
"""

import itertools

import numpy as np
from scipy import ndimage, signal

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
    handling via replication)."""
    kernel = _as_kernel(kernel)
    kernel = kernel / kernel.sum()
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
    NaN positions are re-masked by the caller, main.py:1008-1015)."""
    kernel = _as_kernel(kernel)
    filled = np.where(np.isfinite(data), data, 0.0)
    return signal.fftconvolve(filled, kernel, mode="same")


# ---------------------------------------------------------------------------
# aggregation products
# ---------------------------------------------------------------------------

def take_by_components(data, comps, axis=0, incl_zero=True):
    """Select model-plane elements by the per-pixel component count
    (reference: main.py:529-562)."""
    take = comps.copy()
    take -= 1
    take[take < 0] = 0
    new_axes = list(range(data.ndim - take.ndim))
    take = np.expand_dims(take, axis=new_axes)
    data = np.take_along_axis(data, take, axis=axis)
    data = np.squeeze(data, axis=axis)
    if incl_zero:
        mask = comps < 0
    else:
        mask = comps < 1
    data[..., mask] = np.nan
    return data


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
    """Independent-information weights for a Gaussian beam
    (reference: main.py:613-661)."""
    from scipy import special

    assert isinstance(nrad, int) and nrad >= 0
    if nrad == 0:
        return np.array([[1.0]])
    ppbeam = 2 * np.pi * sigma**2
    ppbeam = max(1, ppbeam)
    i_n = 2 * nrad + 1
    Y, X = np.indices((i_n, i_n))
    X -= nrad
    Y -= nrad
    X_lo, X_hi = X - 0.5, X + 0.5
    Y_lo, Y_hi = Y - 0.5, Y + 0.5

    def phi(z):
        return 0.5 * (1 + special.erf(z / sigma / np.sqrt(2)))

    peak_amp = 1 / (2 * np.pi * sigma**2)
    kernel = 1 - (phi(X_hi) - phi(X_lo)) * (phi(Y_hi) - phi(Y_lo)) / peak_amp
    kernel /= ppbeam
    if sigma_taper is not None:
        kernel *= np.exp(-0.5 * (X**2 + Y**2) / sigma_taper**2)
    kernel[nrad, nrad] = 1
    return kernel


def aggregate_run_attributes(store):
    """Dense nbest/evidence/err/AIC/AICc/BIC maps
    (reference: main.py:664-721)."""
    log.info("Aggregating store attributes")
    hdf = store.hdf
    dpath = store.dpath
    n_lon = hdf.attrs["naxis1"]
    n_lat = hdf.attrs["naxis2"]
    ncomp_max = hdf.attrs["n_max_components"]
    shape = (n_lon, n_lat, ncomp_max + 1)
    lnz_data = nans(shape)
    lnzerr_data = nans(shape)
    bic_data = nans(shape)
    aic_data = nans(shape)
    aicc_data = nans(shape)
    nb_data = np.full((n_lon, n_lat), -1, dtype=np.int32)
    for group in store.iter_pix_groups():
        i_lon = group.attrs["i_lon"]
        i_lat = group.attrs["i_lat"]
        nb_data[i_lon, i_lat] = group.attrs["nbest"]
        for model in group:
            subg = group[model]
            ncomp = subg.attrs["ncomp"]
            if ncomp == 1:
                lnz_data[i_lon, i_lat, 0] = subg.attrs["null_lnZ"]
                bic_data[i_lon, i_lat, 0] = subg.attrs["null_BIC"]
                aic_data[i_lon, i_lat, 0] = subg.attrs["null_AIC"]
                aicc_data[i_lon, i_lat, 0] = subg.attrs["null_AICc"]
            lnz_data[i_lon, i_lat, ncomp] = subg.attrs["global_lnZ"]
            lnzerr_data[i_lon, i_lat, ncomp] = subg.attrs["global_lnZ_err"]
            bic_data[i_lon, i_lat, ncomp] = subg.attrs["BIC"]
            aic_data[i_lon, i_lat, ncomp] = subg.attrs["AIC"]
            aicc_data[i_lon, i_lat, ncomp] = subg.attrs["AICc"]
    store.create_dataset("nbest", nb_data.transpose(), group=dpath)
    store.create_dataset("evidence", lnz_data.transpose(), group=dpath)
    store.create_dataset("evidence_err", lnzerr_data.transpose(), group=dpath)
    store.create_dataset("BIC", bic_data.transpose(), group=dpath)
    store.create_dataset("AIC", aic_data.transpose(), group=dpath)
    store.create_dataset("AICc", aicc_data.transpose(), group=dpath)


def convolve_evidence(store, kernel):
    """Spatially convolved evidence + re-selected conv_nbest with the
    +1-jump guard (reference: main.py:724-774)."""
    log.info("Convolving evidence maps")
    kernel = _as_kernel(kernel)
    hdf = store.hdf
    dpath = store.dpath
    ncomp_max = hdf.attrs["n_max_components"]
    lnZ_thresh = hdf.attrs["lnZ_threshold"]
    data = hdf[f"{dpath}/evidence"][...]
    nbest = hdf[f"{dpath}/nbest"][...]
    cdata = np.zeros_like(data)
    for i in range(data.shape[0]):
        cdata[i, :, :] = convolve_nan(data[i, :, :], kernel)
    conv_nbest = np.full(cdata[0].shape, 0, dtype=np.int32)
    for i in range(ncomp_max):
        conv_nbest[
            (conv_nbest == i) & (cdata[i + 1] - cdata[i] > lnZ_thresh)
        ] += 1
    conv_nbest[nbest == -1] = -1
    overshot = conv_nbest - nbest >= 2
    conv_nbest[overshot] = nbest[overshot] + 1
    store.create_dataset("conv_nbest", conv_nbest, group=dpath)
    store.create_dataset("conv_evidence", cdata, group=dpath)


def extended_masked_evidence(store, kernel, conv=True, lnz_thresh=3):
    """Masked second convolution to surface weak extended features
    (reference: main.py:777-816)."""
    log.info("Convolving masked evidence")
    kernel = _as_kernel(kernel)
    hdf = store.hdf
    dpath = store.dpath
    data = hdf[f"{dpath}/evidence"][...]
    ev_name = "conv_evidence" if conv else "evidence"
    mdata = hdf[f"{dpath}/{ev_name}"][...]
    mdata = mdata[1] - mdata[0]
    mask = mdata > lnz_thresh
    cdata = nans(data.shape)
    for i in range(data.shape[0]):
        data[i, mask] = np.nan
        cdata[i, :, :] = convolve_nan(data[i, :, :], kernel)
    mext = cdata[1] - cdata[0]
    mext[np.isnan(mdata) | mask] = np.nan
    store.create_dataset("mext_evidence", mext, group=dpath)


def aggregate_run_products(store):
    """Dense MAP/bestfit/marginals cubes (reference: main.py:819-882)."""
    log.info("Aggregating store products")
    hdf = store.hdf
    dpath = store.dpath
    n_lon = hdf.attrs["naxis1"]
    n_lat = hdf.attrs["naxis2"]
    nbest_data = hdf[f"{dpath}/conv_nbest"][...].transpose()
    ncomp_max = hdf.attrs["n_max_components"]
    n_params = hdf.attrs["n_params"]
    test_group = store.find_first_valid_group()
    marg_quan = test_group.attrs["marg_quantiles"]
    n_margs = len(marg_quan)
    mapdata = nans((n_lon, n_lat, n_params, ncomp_max))
    bfdata = nans((n_lon, n_lat, n_params, ncomp_max))
    pardata = nans((n_lon, n_lat, n_margs, n_params, ncomp_max))
    for group in store.iter_pix_groups():
        i_lon = group.attrs["i_lon"]
        i_lat = group.attrs["i_lat"]
        nbest = nbest_data[i_lon, i_lat]
        if nbest == 0:
            continue
        if str(nbest) not in group:
            continue
        nb_group = group[f"{nbest}"]
        p_shape = (n_params, nbest)
        mapvs = nb_group["map_params"][...].reshape(p_shape)
        mapdata[i_lon, i_lat, :p_shape[0], :p_shape[1]] = mapvs
        bfvs = nb_group["bestfit_params"][...].reshape(p_shape)
        bfdata[i_lon, i_lat, :p_shape[0], :p_shape[1]] = bfvs
        m_shape = (n_margs, n_params, nbest)
        margs = nb_group["marginals"][...].reshape(m_shape)
        pardata[i_lon, i_lat, :m_shape[0], :m_shape[1], :m_shape[2]] = margs
    store.create_dataset("marg_quantiles", marg_quan, group=dpath)
    store.create_dataset("nbest_MAP", mapdata.transpose(), group=dpath)
    store.create_dataset("nbest_bestfit", bfdata.transpose(), group=dpath)
    store.create_dataset("nbest_marginals", pardata.transpose(), group=dpath)


def aggregate_run_pdfs(store, par_bins=None):
    """Histogrammed 1-D posterior PDFs per pixel/run/parameter
    (reference: main.py:885-953)."""
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
    histdata = nans(
        (n_lon, n_lat, ncomp_max, n_params, ncomp_max, n_bins - 1)
    )
    for group in store.iter_pix_groups():
        i_l = group.attrs["i_lon"]
        i_b = group.attrs["i_lat"]
        for i_r in range(ncomp_max):
            n_run = i_r + 1
            if str(n_run) not in group:
                continue
            post = group[f"{n_run}"]["posteriors"][...]
            for i_p, bins in enumerate(par_bins):
                for i_m in range(n_run):
                    ix = i_p * n_run + i_m
                    hist, _ = np.histogram(post[:, ix], bins=bins)
                    histdata[i_l, i_b, i_r, i_p, i_m, :] = hist
    with np.errstate(invalid="ignore", divide="ignore"):
        histdata /= np.nansum(histdata, axis=5, keepdims=True)
    bin_mids = (par_bins[:, :-1] + par_bins[:, 1:]) / 2
    store.create_dataset("pdf_bins", bin_mids, group=dpath)
    histdata = histdata.transpose((2, 4, 3, 5, 1, 0)).astype("float32")
    store.create_dataset("post_pdfs", histdata, group=dpath)


def convolve_post_pdfs(store, kernel, evid_weight=True):
    """Evidence-weighted log-space spatial PDF convolution
    (reference: main.py:956-1017)."""
    log.info("Convolving posterior PDFs")
    kernel = _as_kernel(kernel)
    hdf = store.hdf
    dpath = store.dpath
    data = hdf[f"{dpath}/post_pdfs"][...]
    cdata = np.zeros_like(data)
    data[data == 0] = 1e-32
    ldata = np.log(data)
    if evid_weight:
        evid = hdf[f"{dpath}/evidence"][...]
        nbest = hdf[f"{dpath}/conv_nbest"][...]
        z_best = take_by_components(evid[1:, :, :], nbest)
        d_evid = z_best - evid[0, :, :]
        d_evid -= np.nanmin(d_evid)
        d_evid /= np.nanmax(d_evid)
        d_evid = d_evid.reshape((1, 1, 1, 1, *d_evid.shape))
        ldata *= d_evid
    for i_r, i_m, i_p, i_h in itertools.product(
        range(data.shape[0]), range(data.shape[1]),
        range(data.shape[2]), range(data.shape[3]),
    ):
        if i_m > i_r:
            continue
        cdata[i_r, i_m, i_p, i_h, :, :] = convolve_fft_unnorm(
            ldata[i_r, i_m, i_p, i_h, :, :], kernel
        )
    cdata = np.exp(cdata)
    with np.errstate(invalid="ignore"):
        cdata /= np.nansum(cdata, axis=3, keepdims=True)
    cdata[np.isnan(data)] = np.nan
    cdata = cdata.astype("float32")
    store.create_dataset("conv_post_pdfs", cdata, group=dpath)


def quantize_conv_marginals(store):
    """Weighted quantiles of the convolved marginals by CDF inversion
    (reference: main.py:1020-1061)."""
    log.info("Calculating convolved PDF quantiles")
    hdf = store.hdf
    dpath = store.dpath
    bins = hdf[f"{dpath}/pdf_bins"][...]
    quan = hdf[f"{dpath}/marg_quantiles"][...]
    data = hdf[f"{dpath}/conv_post_pdfs"][...]
    data = data.transpose((0, 1, 2, 4, 5, 3))
    with np.errstate(invalid="ignore", divide="ignore"):
        data = np.cumsum(data, axis=5) / np.sum(data, axis=5, keepdims=True)
    margs_shape = list(data.shape)
    margs_shape[-1] = len(quan)
    margs = nans(margs_shape)
    for i_p, x in enumerate(bins):
        for i_r, i_m, i_b, i_l in itertools.product(
            range(data.shape[0]), range(data.shape[1]),
            range(data.shape[3]), range(data.shape[4]),
        ):
            y = data[i_r, i_m, i_p, i_b, i_l]
            if np.isnan(y).all():
                continue
            margs[i_r, i_m, i_p, i_b, i_l, :] = np.interp(quan, y, x)
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
    ii = np.nonzero(valid.reshape(-1, ncomp_max).any(axis=1))
    params_flat = pmap.reshape(-1, n_params, ncomp_max)
    preds = []
    flat_sel = np.nonzero(valid.reshape(-1))  # not used; kept simple below
    # build [N, n_params] single-component parameter rows
    l_ix, b_ix, m_ix = np.nonzero(valid)
    params_1c = pmap[l_ix, b_ix, :, m_ix]              # [N, p]
    if params_1c.shape[0] == 0:
        return pmap, valid, (l_ix, b_ix, m_ix), []
    params_dev = jnp.asarray(params_1c, dtype=jnp.float32)
    for spec in runner.spectra:
        pred = jax.jit(runner.model.model_predict)(spec, params_dev)
        preds.append(np.asarray(pred))
    return pmap, valid, (l_ix, b_ix, m_ix), preds


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
