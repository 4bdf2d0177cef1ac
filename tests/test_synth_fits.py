"""Synthetic FITS cube harness -> full fit_cube recovery.

The FITS-file analogue of the reference's recovery-study path
(synth_spectra.py:195-236 -> main.py:1354-1361): write synthetic
cubes to FITS, read them back through DataCube.from_fits, run the
CubeFitter ladder, and check parameter recovery.
"""

import numpy as np
import pytest

from nestfit_tpu.cube import CubeFitter, CubeStack, DataCube, HdfStore
from nestfit_tpu.models import AmmoniaRunner
from nestfit_tpu.priors import get_irdc_priors
from nestfit_tpu.synth import make_indep_synth_cube


def test_make_indep_synth_cube_roundtrip(tmp_path):
    out = make_indep_synth_cube(
        tmp_path / "synth", im_shape=(2, 3), noise_levels=[0.0, 0.2],
        rng=np.random.default_rng(11),
    )
    assert set(out["cubes"]) == {0.0, 0.2}
    p11, p22 = out["cubes"][0.2]
    c1 = DataCube.from_fits(p11, trans_id=1)
    c2 = DataCube.from_fits(p22, trans_id=2)
    assert c1.shape == (3, 2, 380)
    assert c1.noise_map.rms == pytest.approx(0.2)
    # frequency axes ascend and differ between transitions
    assert c1.xarr[1] > c1.xarr[0]
    assert abs(c1.rest_freq - c2.rest_freq) > 1e7
    # truth cube round-trips
    pdata, _ = __import__(
        "nestfit_tpu.cube.fits_io", fromlist=["read_fits"]
    ).read_fits(out["params"])
    assert pdata.shape == (12, 2, 3)


@pytest.mark.slow
def test_fit_cube_from_fits_recovery(tmp_path):
    """FITS -> DataCube -> fit_cube -> products, with centroid
    recovery against the written truth cube."""
    from nestfit_tpu.cube.fits_io import read_fits

    rng = np.random.default_rng(3)
    out = make_indep_synth_cube(
        tmp_path / "synth", im_shape=(2, 2), noise_levels=[0.1],
        rng=rng,
        # narrow separations: effectively single blended components,
        # so the ncomp=1 rung recovers a centroid inside [v1, v2]
        sampler_kwargs={"vsep": (0.16, 0.3), "sigm": (0.3, 0.6),
                        "ntot": (14.0, 15.0)},
    )
    p11, p22 = out["cubes"][0.1]
    stack = CubeStack([
        DataCube.from_fits(p11, trans_id=1),
        DataCube.from_fits(p22, trans_id=2),
    ])
    truth, _ = read_fits(out["params"])     # [12, lat, lon]
    utrans = get_irdc_priors(vsys=0.0)
    fitter = CubeFitter(
        stack, utrans, AmmoniaRunner, ncomp_max=1,
        ns_kwargs={"nlive": 60, "tol": 1.0},
        batch_size=4, n_post=128, nlive_buckets=1,
    )
    store_name = str(tmp_path / "rec_cube")
    fitter.fit_cube(store_name=store_name, seed=1)
    with HdfStore(store_name) as store:
        hdf = store.hdf
        n_sig = 0
        for group in store.iter_pix_groups():
            i_lon = group.attrs["i_lon"]
            i_lat = group.attrs["i_lat"]
            assert group.attrs["nbest"] >= 1
            best = group["1"]["bestfit_params"][...]
            v_lo = truth[0, i_lat, i_lon] - 1.0
            v_hi = truth[1, i_lat, i_lon] + 1.0
            assert v_lo < best[0] < v_hi, (i_lon, i_lat, best[0])
            n_sig += 1
        assert n_sig == 4
