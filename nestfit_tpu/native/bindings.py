"""ctypes bindings for the native C++ engine (cpp/nestfit_native.cpp).

Auto-builds the shared library on first use (g++ via the Makefile);
every entry point degrades gracefully when no compiler is available
(``available()`` -> False).
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from nestfit_tpu.constants import H, KB, TCMB
from nestfit_tpu.models.ammonia import BROT, CROT
from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS

_CPP_DIR = Path(__file__).resolve().parents[2] / "cpp"
_LIB_PATH = _CPP_DIR / "libnestfit_native.so"
_LIB = None
_TRIED = False

_D = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_I = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = _CPP_DIR / "nestfit_native.cpp"
    stale = (_LIB_PATH.exists() and src.exists()
             and _LIB_PATH.stat().st_mtime < src.stat().st_mtime)
    if not _LIB_PATH.exists() or stale:
        try:
            subprocess.run(
                ["make", "-B", "-C", str(_CPP_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            if not _LIB_PATH.exists():
                return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.nf_ns_gaussian.argtypes = [
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_double,
        ctypes.c_long, ctypes.c_uint64, _D,
    ]
    lib.nf_ns_spectral.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _D, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, _D, _D, ctypes.c_int,
        ctypes.c_int,
        _D, _D, _D, _D, _I, _D,
        _I, _D, _D,
        _D, _I, _I, _D, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_double, ctypes.c_long, ctypes.c_uint64,
        ctypes.c_double,
        _D, _D,
    ]
    lib.nf_amm_predict.argtypes = [
        _D, _D, _D, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, _D, _D,
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double,
        _D, ctypes.c_int, _D,
    ]
    lib.nf_transform.argtypes = [
        ctypes.c_int, ctypes.c_int,
        _D, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, _D, _D, ctypes.c_int,
        _D, ctypes.c_int, _D,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def ns_gaussian(ndim, sigma, nlive=200, tol=0.1, max_iter=100000, seed=0):
    """Sequential C++ nested sampling on the analytic Gaussian problem.

    Returns dict with lnz, lnz_err, h, n_dead, ncall, max_loglike.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    out = np.zeros(6)
    lib.nf_ns_gaussian(ndim, sigma, nlive, tol, max_iter, seed, out)
    return dict(zip(
        ["lnz", "lnz_err", "h", "n_dead", "ncall", "max_loglike"], out
    ))


def _chan_terms(xarr):
    xarr = np.ascontiguousarray(xarr, dtype=np.float64)
    t0 = H * xarr / KB
    tbg = 1.0 / np.expm1(t0 / TCMB)
    return xarr, t0, tbg


def ppf_tables_from_utrans(utrans, ncomp, n=2001):
    """Independent per-dimension PPF tables approximating a
    PriorTransformer (exact for independent priors).

    Joint priors are NOT representable this way: a
    ``ResolvedPlacementPrior``'s centroid dims depend on the sigma
    draws and on each other, and the per-dim tables silently drop the
    minimum-separation constraint (the engine would then integrate a
    *different, wider* prior -- measured at up to thousands of nats of
    spurious lnZ2 on high-SNR close-pair pixels).  Pass the spec from
    :func:`placement_spec_from_utrans` alongside these tables so the
    C++ engine applies the exact joint placement transform to the
    centroid dims (their table rows are then ignored for ncomp >= 2).
    """
    import jax.numpy as jnp

    u = np.linspace(0.0, 1.0, n)
    ndim = utrans.n_param * ncomp
    # one batched (n, ndim) transform: row i is the constant-u_i cube.
    # (The per-row loop this replaces issued n separate device
    # dispatches, which through a remote-tunneled backend took
    # unbounded wall -- the cause of the r3 bench timeout.)
    cube = np.broadcast_to(u[:, None], (n, ndim))
    theta = np.asarray(
        utrans.transform(jnp.asarray(np.ascontiguousarray(cube)), ncomp)
    )
    return np.ascontiguousarray(theta.T, dtype=np.float64)


def placement_spec_from_utrans(utrans):
    """Extract the joint resolved-placement spec (if any) from a
    PriorTransformer for the C++ engine: ``(p_voff, p_sigm, sep_scale,
    xax, pdf)`` in float64, or None when the transformer holds no
    ResolvedPlacementPrior."""
    from nestfit_tpu.priors.priors import ResolvedPlacementPrior

    for pr in getattr(utrans, "priors", []):
        if isinstance(pr, ResolvedPlacementPrior):
            dist = pr.vcen_prior.dist
            return (
                int(pr.vcen_prior.p_ix),
                int(pr.sigm_prior.p_ix),
                float(pr.sep_scale),
                np.ascontiguousarray(np.asarray(dist.xax, dtype=np.float64)),
                np.ascontiguousarray(np.asarray(dist.pdf, dtype=np.float64)),
            )
    return None


def transform_native(utrans, ncomp, u, ppf=None, placement=None, n_tab=2001):
    """Apply the C++ engine's prior transform (per-dim PPF tables plus
    the joint resolved-placement overwrite) to unit cubes ``u``
    [n_pts, ndim] -- the exact code path ``nf_ns_spectral`` integrates,
    exposed for parity tests against ``PriorTransformer.transform``."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n_params = utrans.n_param
    if ppf is None:
        ppf = ppf_tables_from_utrans(utrans, ncomp, n=n_tab)
    if placement is None:
        placement = placement_spec_from_utrans(utrans)
    u = np.ascontiguousarray(u, dtype=np.float64)
    assert u.ndim == 2 and u.shape[1] == n_params * ncomp
    theta = np.zeros_like(u)
    if placement is not None:
        p_voff, p_sigm, sep_scale, plc_xax, plc_pdf = placement
        plc_n = plc_xax.shape[0]
    else:
        p_voff, p_sigm, sep_scale = -1, -1, 0.0
        plc_xax = plc_pdf = np.zeros(1)
        plc_n = 0
    lib.nf_transform(
        ncomp, n_params,
        np.ascontiguousarray(ppf, dtype=np.float64), ppf.shape[1],
        p_voff, p_sigm, sep_scale,
        np.ascontiguousarray(plc_xax, dtype=np.float64),
        np.ascontiguousarray(plc_pdf, dtype=np.float64), plc_n,
        u, u.shape[0], theta,
    )
    return theta


def ns_spectral_ammonia(spectra_data, ppf, ncomp=1, nlive=100, tol=1.0,
                        max_iter=200000, seed=0, placement=None,
                        max_wall_s=0.0):
    """Sequential C++ ammonia fit.

    spectra_data: list of (xarr, data, noise, trans_id).
    ppf: [6*ncomp, N] per-dimension PPF tables.
    placement: optional joint resolved-placement spec from
        :func:`placement_spec_from_utrans`; REQUIRED for correct
        ncomp >= 2 evidences under placement priors (the independent
        tables drop the minimum-separation constraint).
    max_wall_s: wall-clock box for the run (<= 0: unbounded).  A boxed
        run that did not reach the evidence tolerance returns with
        ``truncated=True`` (its lnZ is a lower bound, not an estimate).
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    xarr_cat, t0_cat, tbg_cat, data_cat = [], [], [], []
    n_chan, nu, nhf, voff_cat, wts_cat = [], [], [], [], []
    noise_l, para, level_n, ea = [], [], [], []
    for (xarr, data, noise, tid) in spectra_data:
        t = AMMONIA_TRANSITIONS[tid - 1]
        xa, t0, tbg = _chan_terms(xarr)
        xarr_cat.append(xa)
        t0_cat.append(t0)
        tbg_cat.append(tbg)
        data_cat.append(np.ascontiguousarray(data, dtype=np.float64))
        n_chan.append(xa.shape[0])
        nu.append(t.nu)
        nhf.append(t.nhf)
        voff_cat.append(t.voff)
        wts_cat.append(t.tau_wts)
        noise_l.append(float(noise))
        para.append(1 if t.para else 0)
        level_n.append(t.n)
        ea.append(t.ea)
    out = np.zeros(7)
    bestfit = np.zeros(6 * ncomp)
    if placement is not None and ncomp > 16:
        # the C++ engine caps the placement spec at 16 components and
        # would silently integrate the (wider) independent-table prior
        raise ValueError(
            f"placement spec supports ncomp <= 16, got {ncomp}: the "
            "engine would silently integrate a different prior"
        )
    if placement is not None:
        p_voff, p_sigm, sep_scale, plc_xax, plc_pdf = placement
        plc_n = plc_xax.shape[0]
    else:
        p_voff, p_sigm, sep_scale = -1, -1, 0.0
        plc_xax = plc_pdf = np.zeros(1)
        plc_n = 0
    lib.nf_ns_spectral(
        1, ncomp, 6,
        np.ascontiguousarray(ppf, dtype=np.float64), ppf.shape[1],
        p_voff, p_sigm, sep_scale,
        np.ascontiguousarray(plc_xax, dtype=np.float64),
        np.ascontiguousarray(plc_pdf, dtype=np.float64), plc_n,
        len(spectra_data),
        np.concatenate(xarr_cat), np.concatenate(t0_cat),
        np.concatenate(tbg_cat), np.concatenate(data_cat),
        np.asarray(n_chan, dtype=np.int32),
        np.asarray(nu, dtype=np.float64),
        np.asarray(nhf, dtype=np.int32),
        np.concatenate(voff_cat), np.concatenate(wts_cat),
        np.asarray(noise_l, dtype=np.float64),
        np.asarray(para, dtype=np.int32),
        np.asarray(level_n, dtype=np.int32),
        np.asarray(ea, dtype=np.float64),
        BROT, CROT,
        nlive, tol, max_iter, seed,
        float(max_wall_s),
        out, bestfit,
    )
    res = dict(zip(
        ["lnz", "lnz_err", "h", "n_dead", "ncall", "max_loglike"],
        out[:6],
    ))
    res["truncated"] = bool(out[6])
    res["bestfit"] = bestfit
    return res


def amm_predict_native(xarr, params, trans_id=1):
    """Native ammonia spectrum prediction (independent C++ path)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    t = AMMONIA_TRANSITIONS[trans_id - 1]
    xa, t0, tbg = _chan_terms(xarr)
    params = np.ascontiguousarray(params, dtype=np.float64)
    ncomp = params.shape[0] // 6
    pred = np.zeros_like(xa)
    lib.nf_amm_predict(
        xa, t0, tbg, xa.shape[0], t.nu, t.nhf, t.voff, t.tau_wts,
        1 if t.para else 0, t.n, t.ea, BROT, CROT, params, ncomp, pred,
    )
    return pred
