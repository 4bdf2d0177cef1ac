"""Cube container, FITS I/O, and store tests.

Mirrors the reference pytest suite's coverage of NoiseMap/DataCube/
CubeStack (reference: nestfit/test/test_main.py:32-71) on synthetic
FITS cubes, plus round-trip tests for our self-contained FITS I/O.
"""

import numpy as np
import pytest

from nestfit_tpu.cube import (
    CubeStack,
    DataCube,
    NoiseMap,
    NoiseMapUniform,
    read_fits,
    write_fits,
)
from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS
from nestfit_tpu.utils import freq_axis_from_velocity


def test_fits_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(5, 7, 11)).astype(np.float32)
    header = {
        "CTYPE3": "FREQ", "CRVAL3": 23.69e9, "CDELT3": 1.25e4,
        "CRPIX3": 1.0, "RESTFRQ": 23.6944955e9, "BUNIT": "K",
        "OBJECT": "synthetic",
    }
    path = tmp_path / "cube.fits"
    write_fits(path, data, header)
    data2, header2 = read_fits(path)
    np.testing.assert_array_equal(data, data2)
    assert header2["CTYPE3"] == "FREQ"
    np.testing.assert_allclose(header2["CRVAL3"], 23.69e9)
    assert header2["OBJECT"] == "synthetic"
    assert header2["NAXIS"] == 3
    assert header2["NAXIS1"] == 11


def make_cube(n_lon=4, n_lat=3, n_chan=64, trans_id=1, noise=0.3, seed=0):
    nu = AMMONIA_TRANSITIONS[trans_id - 1].nu
    vaxis = np.linspace(-10, 10, n_chan)
    xarr = freq_axis_from_velocity(vaxis, nu)
    rng = np.random.default_rng(seed)
    data = rng.normal(scale=noise, size=(n_lon, n_lat, n_chan))
    return DataCube(data, xarr, noise_map=noise, trans_id=trans_id)


def test_noise_maps():
    nm = NoiseMapUniform(0.33)
    assert nm.get_noise(3, 5) == 0.33
    img = np.arange(12.0).reshape(3, 4) + 1.0  # (b, l)
    nmap = NoiseMap.from_pbimg(2.0, img)
    # transposed to (l, b)
    assert nmap.shape == (4, 3)
    assert nmap.get_noise(0, 0) == 2.0 / img[0, 0]
    img2 = img.copy()
    img2[0, 0] = np.nan
    nmap2 = NoiseMap.from_pbimg(2.0, img2)
    assert np.isinf(nmap2.get_noise(0, 0))


def test_datacube_shapes_and_spec_data():
    cube = make_cube()
    assert cube.spatial_shape == (4, 3)
    assert cube.nchan == 64
    assert cube.xarr[1] > cube.xarr[0]
    xarr, arr, noise, tid, has_nans = cube.get_spec_data(1, 2)
    assert arr.shape == (64,)
    assert noise == 0.3 and tid == 1 and not has_nans
    # NaN detection
    cube.data[0, 0, 5] = np.nan
    *_, has_nans = cube.get_spec_data(0, 0)
    assert has_nans


def test_datacube_from_fits(tmp_path):
    nu = AMMONIA_TRANSITIONS[0].nu
    n_chan = 32
    vaxis = np.linspace(-10, 10, n_chan)
    xarr = freq_axis_from_velocity(vaxis, nu)
    data_sbl = np.zeros((n_chan, 3, 4), dtype=np.float32)  # (S, b, l)
    data_sbl[10, 1, 2] = 5.0
    header = {
        "CTYPE3": "FREQ", "CRVAL3": xarr[0],
        "CDELT3": xarr[1] - xarr[0], "CRPIX3": 1.0,
        "RESTFRQ": nu, "BUNIT": "K",
    }
    path = tmp_path / "c.fits"
    write_fits(path, data_sbl, header)
    cube = DataCube.from_fits(path, noise_map=0.2, trans_id=1)
    assert cube.spatial_shape == (4, 3)
    np.testing.assert_allclose(cube.xarr, xarr, rtol=1e-9)
    # transposed pixel lookup
    assert cube.data[2, 1, 10] == 5.0


def test_cubestack_batch_accessors():
    c1 = make_cube(trans_id=1, seed=1)
    c2 = make_cube(trans_id=2, seed=2)
    c1.data[0, 0, :] = np.nan
    c1.data[2, 1, 30] = 10.0  # strong "signal"
    stack = CubeStack([c1, c2])
    assert stack.spatial_shape == (4, 3)
    assert stack.shape == (64, 3, 4)
    datas, noises, nan_mask, max_snr = stack.get_flat_batch()
    assert len(datas) == 2 and datas[0].shape == (12, 64)
    assert nan_mask.sum() == 1 and nan_mask[0]
    flat = 2 * 3 + 1
    assert max_snr[flat] == pytest.approx(10.0 / 0.3, rel=1e-6)
    # per-pixel accessor agrees
    assert stack.get_max_snr(2, 1) == pytest.approx(10.0 / 0.3, rel=1e-6)
    spec_data, any_nans = stack.get_spec_data(0, 0)
    assert any_nans and len(spec_data) == 2
