"""Generate the committed FITS test fixtures.

The reference ships real 20x20x379-channel NH3 (1,1)/(2,2) telescope
cutouts as test data (reference: nestfit/test/__init__.py:11-27).  No
real data can ship here, so these fixtures are *realistic* synthetic
cutouts instead: spatially smooth parameter fields (a clump with a
velocity gradient) rendered through the float64 oracle, plus the
header quirks real cubes carry that the loaders must survive:

- 4-D data with a degenerate leading Stokes axis,
- a descending VRAD spectral axis in m/s (not ascending FREQ in Hz),
- NaN-blanked unobserved corner pixels,
- a primary-beam response image for ``NoiseMap.from_pbimg``.

Run from the repo root to (re)generate::

    python tests/data/make_fixtures.py
"""

import os

import numpy as np

from nestfit_tpu import oracle
from nestfit_tpu.constants import CKMS
from nestfit_tpu.cube.fits_io import write_fits
from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS

HERE = os.path.dirname(os.path.abspath(__file__))

N_LON, N_LAT, N_CHAN = 20, 20, 379
RMS = 0.35  # K, per channel


def _param_fields(rng):
    """Smooth single-component parameter maps over the (lat, lon) grid:
    a centrally condensed clump with a linear velocity gradient."""
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, N_LAT), np.linspace(-1, 1, N_LON), indexing="ij"
    )
    r2 = xx**2 + yy**2
    clump = np.exp(-r2 / (2 * 0.45**2))
    voff = 0.8 * xx + 0.3 * yy                   # km/s gradient
    trot = 8.0 + 6.0 * clump                     # K
    tex = 3.2 + 2.5 * clump                      # K
    ntot = 13.6 + 1.3 * clump                    # log cm^-2
    sigm = 0.35 + 0.25 * clump                   # km/s
    return voff, trot, tex, ntot, sigm


def main():
    rng = np.random.default_rng(42)
    vchan = 0.158  # km/s
    vaxis = (np.arange(N_CHAN) - N_CHAN // 2) * vchan  # ascending km/s

    voff, trot, tex, ntot, sigm = _param_fields(rng)

    # unobserved corners (blanked, like a mosaic edge)
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, N_LAT), np.linspace(-1, 1, N_LON), indexing="ij"
    )
    blank = (xx**2 + yy**2) > 1.9

    # primary-beam response: 1 at center, rolling off outward
    pb = np.exp(-(xx**2 + yy**2) / (2 * 0.9**2)).astype(np.float32)
    pb[blank] = np.nan

    for tag, trans in (("11", AMMONIA_TRANSITIONS[0]),
                       ("22", AMMONIA_TRANSITIONS[1])):
        xarr = trans.nu * (1.0 - vaxis / CKMS)   # descending Hz
        xarr_asc = xarr[::-1].copy()
        cube = np.empty((N_LAT, N_LON, N_CHAN), dtype=np.float64)
        for ib in range(N_LAT):
            for il in range(N_LON):
                pars = np.array([
                    voff[ib, il], trot[ib, il], tex[ib, il],
                    ntot[ib, il], sigm[ib, il], 0.0,
                ])
                cube[ib, il] = oracle.amm_predict(
                    xarr_asc, pars, trans_id=int(trans.n)
                )[::-1]
        cube += rng.normal(scale=RMS, size=cube.shape)
        cube[blank] = np.nan

        # FITS layout (stokes, chan, lat, lon); VRAD axis in m/s,
        # descending velocity = ascending frequency reversed twice --
        # store channel 0 at +v (descending VRAD, ascending freq order
        # is NOT assumed by the loader)
        data4 = cube.transpose(2, 0, 1)[None].astype(np.float32)
        header = {
            "OBJECT": "SYNTHCLUMP",
            "TELESCOP": "SYNTH",
            "BUNIT": "K",
            "CTYPE1": "RA---TAN", "CRPIX1": 10.0, "CRVAL1": 52.2675,
            "CDELT1": -2.45e-3, "CUNIT1": "deg",
            "CTYPE2": "DEC--TAN", "CRPIX2": 10.0, "CRVAL2": 31.268,
            "CDELT2": 2.45e-3, "CUNIT2": "deg",
            "CTYPE3": "VRAD", "CRPIX3": 1.0,
            "CRVAL3": float(vaxis[-1] * 1000.0),      # m/s, descending
            "CDELT3": float(-vchan * 1000.0),
            "CUNIT3": "m/s",
            "CTYPE4": "STOKES", "CRPIX4": 1.0, "CRVAL4": 1.0, "CDELT4": 1.0,
            "RESTFRQ": float(trans.nu),
            "RADESYS": "ICRS", "EQUINOX": 2000.0,
            "RMS": float(RMS),
        }
        # write the cube with channel 0 = most-positive velocity
        write_fits(os.path.join(HERE, f"nh3_{tag}_cutout.fits"),
                   data4[:, ::-1], header)

    write_fits(os.path.join(HERE, "pb_cutout.fits"), pb, {
        "BUNIT": "", "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN",
    })
    # truth parameter planes for recovery checks (voff/trot/tex/ntot/sigm)
    truth = np.stack([voff, trot, tex, ntot, sigm]).astype(np.float32)
    write_fits(os.path.join(HERE, "truth_params.fits"), truth, {})
    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()
