"""Tests over the committed FITS cutout fixtures.

Mirrors the reference's formal pytest suite, which runs against real
20x20x379-channel NH3 (1,1)/(2,2) telescope cutouts shipped as test
data (reference: nestfit/test/__init__.py:11-27, test/test_main.py).
The fixtures here are realistic synthetic cutouts (see
tests/data/make_fixtures.py) carrying the header quirks real cubes
have: degenerate Stokes axis, descending VRAD axis in m/s, NaN-blanked
corners, and a primary-beam image.
"""

import os

import numpy as np
import pytest

from nestfit_tpu import (
    AmmoniaRunner,
    CubeStack,
    DataCube,
    NoiseMap,
    NoiseMapUniform,
)
from nestfit_tpu.cube.fits_io import read_fits
from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
PATH_11 = os.path.join(DATA_DIR, "nh3_11_cutout.fits")
PATH_22 = os.path.join(DATA_DIR, "nh3_22_cutout.fits")
PATH_PB = os.path.join(DATA_DIR, "pb_cutout.fits")
PATH_TRUTH = os.path.join(DATA_DIR, "truth_params.fits")
RMS = 0.35


@pytest.fixture(scope="module")
def nmap():
    pb, _ = read_fits(PATH_PB)
    return NoiseMap.from_pbimg(RMS, pb)


@pytest.fixture(scope="module")
def dcube(nmap):
    return DataCube.from_fits(PATH_11, noise_map=nmap, trans_id=1)


@pytest.fixture(scope="module")
def stack(nmap):
    return CubeStack([
        DataCube.from_fits(PATH_11, noise_map=nmap, trans_id=1),
        DataCube.from_fits(PATH_22, noise_map=nmap, trans_id=2),
    ])


def test_noise_map_from_pbimg(nmap):
    assert nmap.shape == (20, 20)
    # center of the beam: noise ~= RMS; unobserved corners: inf
    assert nmap.get_noise(10, 10) == pytest.approx(RMS, rel=0.05)
    assert np.isinf(nmap.get_noise(0, 0))
    # rolloff: edge noise is strictly larger than center noise
    assert nmap.get_noise(10, 1) > nmap.get_noise(10, 10)


def test_noise_map_uniform():
    nm = NoiseMapUniform(RMS)
    assert nm.get_noise(3, 7) == RMS
    assert nm.shape is None


def test_datacube_axes(dcube):
    """Loader must flatten the Stokes axis, convert the descending m/s
    VRAD axis to ascending Hz, and transpose to (l, b, S)."""
    assert dcube.shape == (20, 20, 379)
    assert dcube.spatial_shape == (20, 20)
    assert dcube.nchan == 379
    assert np.all(np.diff(dcube.xarr) > 0)
    # frequency axis brackets the rest frequency
    nu0 = AMMONIA_TRANSITIONS[0].nu
    assert dcube.xarr[0] < nu0 < dcube.xarr[-1]
    # velocity axis paired to ascending frequency is descending
    assert np.all(np.diff(dcube.varr) < 0)
    assert dcube.dv == pytest.approx(0.158, rel=1e-3)


def test_datacube_simple_header(dcube):
    h = dcube.simple_header
    assert h["NAXIS"] == 2
    assert h["CTYPE1"] == "RA---TAN"
    assert "CTYPE3" not in h
    assert h["CRVAL2"] == pytest.approx(31.268)


def test_datacube_spec_data(dcube):
    xarr, arr, noise, trans_id, has_nans = dcube.get_spec_data(10, 10)
    assert xarr.shape == arr.shape == (379,)
    assert trans_id == 1
    assert not has_nans
    assert noise == pytest.approx(RMS, rel=0.05)
    # blanked corner pixel flags NaNs
    *_, has_nans_corner = dcube.get_spec_data(0, 0)
    assert has_nans_corner


def test_cubestack_aggregation(stack):
    assert stack.n_cubes == 2
    assert stack.shape == (379, 20, 20)
    spec_data, any_nans = stack.get_spec_data(10, 10)
    assert len(spec_data) == 2
    assert not any_nans
    _, any_nans_corner = stack.get_spec_data(0, 0)
    assert any_nans_corner


def test_cubestack_snr(stack):
    """The clump center is bright (SNR >> 1); the (1,1) line dominates."""
    snr_center = stack.get_max_snr(10, 10)
    snr_edge = stack.get_max_snr(1, 10)
    assert snr_center > 5.0
    assert snr_center > snr_edge


def test_flat_batch_masks(stack):
    datas, noises, nan_mask, max_snr = stack.get_flat_batch()
    assert datas[0].shape == (400, 379)
    assert nan_mask.sum() > 0            # blanked corners
    assert nan_mask.sum() < 400          # most pixels valid
    center = 10 * 20 + 10
    assert not nan_mask[center]
    assert max_snr[center] > 5.0


@pytest.mark.slow
def test_fixture_fit_recovers_truth(stack):
    """End-to-end: fit bright fixture pixels, compare the recovered
    centroid/width to the committed truth maps (the role of the
    reference's real-data ``test_fit_cube`` smoke test,
    main.py:1354-1361)."""
    import dataclasses

    import jax.numpy as jnp
    from jax import random

    from nestfit_tpu import NSConfig, get_irdc_priors
    from nestfit_tpu.models import ammonia
    from nestfit_tpu.sampling.fit import fit_batch

    truth, _ = read_fits(PATH_TRUTH)           # [5, b, l]
    pix = [(10, 10), (9, 10), (10, 9), (11, 10)]
    utrans = get_irdc_priors(vsys=0.0)

    spectra = []
    for cube in stack.cubes:
        d = np.stack([cube.data[il, ib] for il, ib in pix])
        n = np.array([cube.noise_map.get_noise(il, ib) for il, ib in pix])
        spec = ammonia.make_ammonia_spectrum(
            cube.xarr, d, float(n[0]), trans_id=cube.trans_id
        )
        spec = dataclasses.replace(
            spec, noise=jnp.asarray(n, dtype=spec.data.dtype)
        )
        spectra.append(spec)
    runner = AmmoniaRunner(tuple(spectra), utrans, ncomp=1)
    fit = fit_batch(random.key(3), runner, len(pix),
                    NSConfig(nlive=100, tol=1.0), n_post=128)

    lnz = np.asarray(fit.lnz)
    null = np.asarray(fit.null_lnz)
    assert np.all(lnz - null > 11.0), "bright pixels must prefer 1 comp"
    best = np.asarray(fit.products.bestfit_params)  # [R, 6]
    for k, (il, ib) in enumerate(pix):
        voff_t = truth[0, ib, il]
        sigm_t = truth[4, ib, il]
        assert abs(best[k, 0] - voff_t) < 0.15, (k, best[k, 0], voff_t)
        assert abs(best[k, 4] - sigm_t) < 0.25, (k, best[k, 4], sigm_t)
