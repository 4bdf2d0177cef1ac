"""HDF5 result store.

Preserves the reference's store format exactly
(reference: main.py:233-377; layout spec docs/store_spec.rst:56-150):
a ``<name>.store/`` directory of per-writer ``chunk<i>.hdf`` files
externally linked into a master ``table.hdf``, with per-pixel groups
``/pix/<lon>/<lat>/<N>`` carrying the nested-sampling attributes and
datasets, and a ``/products`` group of dense aggregated maps.

The chunk-per-writer design maps one-to-one onto per-host shard files
in a multi-host TPU fit (SURVEY.md section 2.3).
"""

import warnings
from pathlib import Path

import h5py
import numpy as np

from nestfit_tpu.models import MODELS
from nestfit_tpu.sampling.results import MARGINAL_COLS, QUANTILES


def check_ext(store_name, ext="hdf"):
    if store_name.endswith(f".{ext}"):
        return store_name
    return f"{store_name}.{ext}"


class HdfStore:
    """Reference-compatible HDF5 store (main.py:233-377)."""

    linked_table = Path("table.hdf")
    chunk_prefix = "chunk"
    dpath = "/products"

    def __init__(self, store_name, nchunks=1):
        self.store_name = str(store_name)
        self.store_dir = Path(check_ext(self.store_name, ext="store"))
        self.store_dir.mkdir(parents=True, exist_ok=True)
        self.hdf = h5py.File(self.store_dir / self.linked_table, "a")
        try:
            self.nchunks = int(self.hdf.attrs["nchunks"])
        except KeyError:
            self.hdf.attrs["nchunks"] = nchunks
            self.nchunks = nchunks
        try:
            model_name = self.hdf.attrs["model_name"]
            self.model = MODELS[model_name]
        except KeyError:
            self.model = None

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.close()

    @property
    def chunk_paths(self):
        return [
            self.store_dir / Path(f"{self.chunk_prefix}{i}.hdf")
            for i in range(self.nchunks)
        ]

    @property
    def is_open(self):
        try:
            self.hdf.mode
            return True
        except ValueError:
            return False

    def close(self):
        try:
            self.hdf.flush()
            self.hdf.close()
        except ValueError:
            pass

    def iter_pix_groups(self):
        assert self.is_open
        for lon_pix in self.hdf["/pix"]:
            for lat_pix in self.hdf[f"/pix/{lon_pix}"]:
                group = self.hdf[f"/pix/{lon_pix}/{lat_pix}"]
                if isinstance(group, h5py.Group):
                    yield group

    def find_first_valid_group(self):
        assert self.is_open
        for group in self.iter_pix_groups():
            if "1" in group:
                return group["1"]
        raise ValueError("No valid pix groups found.")

    def link_files(self):
        """Externally link every chunk's pixel groups into table.hdf
        (reference: main.py:313-322)."""
        assert self.is_open
        for chunk_path in self.chunk_paths:
            if not chunk_path.exists():
                continue
            with h5py.File(chunk_path, "r") as chunk_hdf:
                if "/pix" not in chunk_hdf:
                    continue
                for lon_pix in chunk_hdf["/pix"]:
                    for lat_pix in chunk_hdf[f"/pix/{lon_pix}"]:
                        group_name = f"/pix/{lon_pix}/{lat_pix}"
                        if group_name in self.hdf:
                            del self.hdf[group_name]
                        self.hdf[group_name] = h5py.ExternalLink(
                            chunk_path.name, group_name
                        )
                self.hdf.flush()

    def reset_pix_links(self):
        assert self.is_open
        if "/pix" in self.hdf:
            del self.hdf["/pix"]

    def insert_header(self, stack):
        if not self.is_open:
            warnings.warn(
                "Could not insert header: the HDF5 file is closed.",
                category=RuntimeWarning,
            )
            return
        sh_g = self.hdf.require_group("simple_header")
        for k, v in stack.simple_header.items():
            sh_g.attrs[k] = v
        fh_g = self.hdf.require_group("full_header")
        for k, v in stack.full_header.items():
            if v is None or (isinstance(v, float) and not np.isfinite(v)):
                continue
            fh_g.attrs[k] = v
        self.hdf.attrs["naxis1"] = stack.shape[2]  # n_lon
        self.hdf.attrs["naxis2"] = stack.shape[1]  # n_lat

    def read_header(self, full=True):
        assert self.is_open
        name = "full_header" if full else "simple_header"
        return dict(self.hdf[name].attrs)

    def create_dataset(self, dset_name, data, group="", clobber=True):
        assert len(dset_name) > 0
        self.hdf.require_group(group)
        path = f'{group.rstrip("/")}/{dset_name}'
        if path in self.hdf and clobber:
            del self.hdf[path]
        return self.hdf[group].create_dataset(dset_name, data=data)

    def insert_fitter_pars(self, fitter):
        assert self.is_open
        self.hdf.attrs["lnZ_threshold"] = fitter.lnZ_thresh
        self.hdf.attrs["n_max_components"] = fitter.ncomp_max
        self.hdf.attrs["multinest_kwargs"] = str(fitter.ns_kwargs)

    def insert_model_metadata(self, model_module):
        assert self.is_open
        self.hdf.attrs["n_params"] = model_module.N
        self.hdf.attrs["model_name"] = model_module.NAME
        self.hdf.attrs["par_names"] = model_module.PAR_NAMES
        self.hdf.attrs["par_names_short"] = model_module.PAR_NAMES_SHORT
        self.hdf.attrs["tex_labels"] = model_module.TEX_LABELS
        self.hdf.attrs["tex_labels_with_units"] = (
            model_module.TEX_LABELS_WITH_UNITS
        )
        self.model = model_module


def write_fit_group(hdf, i_lon, i_lat, ncomp, fit, run_ix):
    """Write one pixel's one-ncomp fit into ``/pix/<lon>/<lat>/<N>``.

    Persists exactly the attribute/dataset set of the reference's
    ``mn_dump`` (core.pyx:645-687) from a batched :class:`FitResult`
    at batch index ``run_ix``.
    """
    group = hdf.require_group(f"/pix/{i_lon}/{i_lat}/{ncomp}")
    ns = fit.ns
    group.attrs["ncomp"] = ncomp
    group.attrs["null_lnZ"] = float(fit.null_lnz[run_ix])
    group.attrs["n_chan_tot"] = fit.n_chan_tot
    group.attrs["n_samples"] = int(ns.n_samples[run_ix])
    group.attrs["n_live"] = ns.nlive
    group.attrs["n_params"] = fit.n_params
    group.attrs["global_lnZ"] = float(ns.lnz[run_ix])
    group.attrs["global_lnZ_err"] = float(ns.lnz_err[run_ix])
    group.attrs["max_loglike"] = float(ns.max_loglike[run_ix])
    group.attrs["marg_cols"] = MARGINAL_COLS
    group.attrs["marg_quantiles"] = QUANTILES
    group.attrs["n_calls"] = int(ns.ncall[run_ix])
    group.attrs["converged"] = bool(ns.converged[run_ix])
    for name in ("BIC", "AIC", "AICc", "null_BIC", "null_AIC", "null_AICc"):
        group.attrs[name] = float(fit.ics[name][run_ix])
    prod = fit.products
    group.create_dataset(
        "posteriors", data=np.asarray(prod.posteriors[run_ix], dtype=np.float32)
    )
    group.create_dataset("marginals", data=np.asarray(prod.marginals[run_ix]))
    group.create_dataset(
        "bestfit_params", data=np.asarray(prod.bestfit_params[run_ix])
    )
    group.create_dataset("map_params", data=np.asarray(prod.map_params[run_ix]))
    return group
