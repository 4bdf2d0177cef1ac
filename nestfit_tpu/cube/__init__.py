from nestfit_tpu.cube.cube import (
    CubeStack,
    DataCube,
    NoiseMap,
    NoiseMapUniform,
)
from nestfit_tpu.cube.fitter import CubeFitter
from nestfit_tpu.cube.fits_io import read_fits, write_fits
from nestfit_tpu.cube.store import HdfStore
