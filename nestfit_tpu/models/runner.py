"""Runner layer: model + spectra + prior transform -> likelihood.

TPU-native equivalent of the reference ``Runner`` hierarchy
(reference: core/core.pyx:553-561, ammonia.pyx:369-447,
gaussian.pyx:57-112, diazenylium.pyx:161-230).  Instead of a virtual
``c_loglikelihood`` called back from Fortran, a Runner is a lightweight
pytree-of-spectra wrapper exposing pure functions that the vectorized
nested sampler vmaps over (pixels x live points).

Broadcasting contract: all methods accept ``theta`` with arbitrary
leading batch dims ``[..., ndim]``; the spectra ``data``/``noise``
arrays must be broadcast-compatible with those leading dims (e.g.
unbatched ``data[S]`` works with any batch, per-pixel ``data[R, S]``
works with ``theta[R, ndim]``).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from nestfit_tpu.models.spectrum import Spectrum


class Runner:
    """Evaluates ln-likelihood for a model over a set of spectra.

    Attributes mirror the reference Runner fields (core/core.pxd:63-72):
    ``n_model`` (params per component), ``ncomp``, ``n_params``,
    ``ndim``, ``n_chan_tot``, ``n_spec``, ``null_lnZ``.
    """

    model = None  # model module; set by subclasses

    def __init__(self, spectra, utrans, ncomp=1, **predict_kwargs):
        if isinstance(spectra, Spectrum):
            spectra = (spectra,)
        assert ncomp > 0
        self.spectra = tuple(spectra)
        self.utrans = utrans
        self.ncomp = int(ncomp)
        self.predict_kwargs = predict_kwargs
        self.n_model = self.model.N
        self.n_params = self.n_model * self.ncomp
        self.ndim = self.n_params  # no nuisance parameters
        self.n_spec = len(self.spectra)
        self.n_chan_tot = sum(s.size for s in self.spectra)
        if utrans is not None:
            assert utrans.n_param == self.n_model, (
                f"prior transformer covers {utrans.n_param} parameters, "
                f"model has {self.n_model}"
            )
        self.run_lnZ = np.nan

    @classmethod
    def from_data(cls, spec_data, utrans, **kwargs):
        """Build from a list of (xarr, data, noise, trans_id) tuples
        (reference: ammonia.pyx:418-421)."""
        spectra = tuple(
            cls.model.make_model_spectrum(xarr, data, noise, trans_id=tid)
            for (xarr, data, noise, tid) in spec_data
        )
        return cls(spectra, utrans, **kwargs)

    @property
    def null_lnZ(self):
        """Ln-likelihood of the all-zero model (core.pyx:518-520)."""
        return sum(s.null_lnZ for s in self.spectra)

    # --- data threading (for compile reuse across pixel batches) ---
    def data_tree(self):
        """The per-pixel arrays as a pytree: ((data, noise), ...)."""
        return tuple((s.data, s.noise) for s in self.spectra)

    def with_data(self, data_tree):
        """New Runner with replaced per-pixel data/noise arrays (the
        static channel-axis terms are shared with this instance)."""
        import dataclasses as _dc

        spectra = tuple(
            _dc.replace(spec, data=d, noise=n)
            for spec, (d, n) in zip(self.spectra, data_tree)
        )
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        new.spectra = spectra
        return new

    def predict(self, theta):
        """Model spectra per transition: tuple of f32[..., S_t]."""
        theta = jnp.asarray(theta)
        return tuple(
            self.model.model_predict(spec, theta, **self.predict_kwargs)
            for spec in self.spectra
        )

    #: use the fused Pallas spectrum+chi2 kernels when the model
    #: provides them and we are on an accelerator backend (the pure
    #: jnp path remains the reference semantics and the CPU path)
    use_fused = None  # None -> auto (fused on TPU)

    def _fused_enabled(self):
        if self.use_fused is not None:
            return bool(self.use_fused)
        if not hasattr(self.model, "fused_chi2"):
            return False
        import jax

        return jax.default_backend() not in ("cpu",)

    def log_likelihood(self, theta):
        """Summed chi-square ln-likelihood over all spectra
        (reference: ammonia.pyx:423-432)."""
        if self._fused_enabled():
            return self._log_likelihood_fused(theta)
        preds = self.predict(theta)
        return sum(
            spec.loglikelihood(pred) for spec, pred in zip(self.spectra, preds)
        )

    def _log_likelihood_fused(self, theta):
        """Fused-kernel path: one Pallas launch per transition.

        ``theta[..., R, ndim]`` with the trailing batch axis aligned to
        the spectra's pixel axis (flat row ``b`` uses data row
        ``b % R``).
        """
        theta = jnp.asarray(theta)
        lead = theta.shape[:-1]
        flat = theta.reshape(-1, theta.shape[-1])
        B = flat.shape[0]
        total = 0.0
        for spec in self.spectra:
            chi2 = self.model.fused_chi2(spec, flat, **self.predict_kwargs)
            noise = jnp.asarray(spec.noise)
            if noise.ndim == 0:
                inv2v = 1.0 / (2.0 * noise * noise)
            else:
                R = noise.shape[0]
                reps = B // R
                inv2v = jnp.tile(1.0 / (2.0 * noise * noise), reps)
            total = total - chi2 * inv2v
        return total.reshape(lead)

    def transform(self, u):
        """Unit-cube -> physical parameters via the prior transformer."""
        return self.utrans.transform(u, self.ncomp)

    def loglike_unit(self, u):
        """Ln-likelihood directly from unit-cube coordinates -- the
        function MultiNest would call (core.pyx:622-624)."""
        return self.log_likelihood(self.transform(u))

    # Convenience host-side entry point matching the reference's
    # `Runner.loglikelihood` (core.pyx:558-561).
    def loglikelihood(self, utheta):
        u = jnp.asarray(utheta)
        lnl = self.loglike_unit(u)
        return np.asarray(lnl)


def _make_runner(model_module, name):
    cls = type(name, (Runner,), {"model": model_module})
    cls.__doc__ = f"Runner for the {model_module.NAME} model."
    return cls


from nestfit_tpu.models import ammonia as _ammonia
from nestfit_tpu.models import gaussian as _gaussian
from nestfit_tpu.models import diazenylium as _diazenylium


class AmmoniaRunner(Runner):
    """Ammonia model runner (reference: ammonia.pyx:369-447).

    ``cold``/``lte`` map to the Swift conversion and Tex=Trot options.
    """

    model = _ammonia

    def __init__(self, spectra, utrans, ncomp=1, cold=False, lte=False):
        super().__init__(spectra, utrans, ncomp=ncomp, cold=cold, lte=lte)


class GaussianRunner(Runner):
    """Gaussian model runner (reference: gaussian.pyx:57-112)."""

    model = _gaussian


class DiazenyliumRunner(Runner):
    """Diazenylium model runner (reference: diazenylium.pyx:161-230)."""

    model = _diazenylium


RUNNERS = {
    "ammonia": AmmoniaRunner,
    "gaussian": GaussianRunner,
    "diazenylium": DiazenyliumRunner,
}

_ammonia.ModelRunner = AmmoniaRunner
_gaussian.ModelRunner = GaussianRunner
_diazenylium.ModelRunner = DiazenyliumRunner
