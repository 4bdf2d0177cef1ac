"""Prior transforms: unit cube -> physical parameters.

TPU-native rebuild of the reference prior hierarchy
(reference: nestfit/core/core.pyx:169-483).  Every prior is a pure
transformation applied to a view of the parameter cube
``u[..., n_params, ncomp]`` (parameter-major layout, core.pyx:192-197);
a :class:`PriorTransformer` applies them in sequence.  All transforms
broadcast over arbitrary leading batch dims (pixels x live points) --
the per-likelihood-call cost that the reference pays scalar-by-scalar
(core.pyx:459-476) becomes a handful of vectorized gathers.

The component count ``ncomp`` is always a static (trace-time) integer,
so the sequential logic in the ordered/spaced/placement priors unrolls
into straight-line XLA code.
"""

import numpy as np

import jax
import jax.numpy as jnp

from nestfit_tpu.constants import FWHM
from nestfit_tpu.priors.distributions import (
    Distribution,
    cdf_interp,
    cdf_over_interval,
    ppf_interp,
    tapered_interval_invert,
)


class Prior:
    """Independent tabulated prior on one parameter
    (reference core.pyx:169-197)."""

    n_param = 1
    #: parameter rows whose unit-cube input this prior ignores (the
    #: likelihood is flat along them; the sampler can skip bounding
    #: those dimensions)
    unused_param_rows = ()

    def __init__(self, dist: Distribution, p_ix: int):
        assert p_ix >= 0
        self.dist = dist
        self.p_ix = int(p_ix)

    def apply(self, theta, ncomp: int):
        """theta: f32[..., n_params, ncomp] with unit-cube values in
        this prior's slots; returns updated array."""
        u = theta[..., self.p_ix, :]
        return theta.at[..., self.p_ix, :].set(ppf_interp(self.dist, u))


class DuplicatePrior(Prior):
    """Draw once, write to two parameter slots
    (reference core.pyx:200-221; e.g. tex = tkin in LTE synth fits)."""

    n_param = 2

    def __init__(self, dist, p_ix, p_ix_dup):
        super().__init__(dist, p_ix)
        assert p_ix_dup >= 0
        self.p_ix_dup = int(p_ix_dup)
        self.unused_param_rows = (self.p_ix_dup,)

    def apply(self, theta, ncomp):
        v = ppf_interp(self.dist, theta[..., self.p_ix, :])
        theta = theta.at[..., self.p_ix, :].set(v)
        return theta.at[..., self.p_ix_dup, :].set(v)


class ConstantPrior(Prior):
    """Fixed value (reference core.pyx:224-238)."""

    n_param = 1

    def __init__(self, value, p_ix):
        self.value = float(value)
        self.p_ix = int(p_ix)
        self.dist = None
        self.unused_param_rows = (self.p_ix,)

    def apply(self, theta, ncomp):
        return theta.at[..., self.p_ix, :].set(self.value)


class OrderedPrior(Prior):
    """Strict left-to-right ordering via nested rescaling of the unit
    interval (reference core.pyx:241-258)."""

    def apply(self, theta, ncomp):
        u = theta[..., self.p_ix, :]
        umin = jnp.zeros_like(u[..., 0])
        vals = []
        for i in range(ncomp):
            ui = umin + (1.0 - umin) * u[..., i]
            umin = ui
            vals.append(ppf_interp(self.dist, ui))
        return theta.at[..., self.p_ix, :].set(jnp.stack(vals, axis=-1))


class SpacedPrior(Prior):
    """First draw from an independent prior, subsequent draws are
    positive offsets from the running value
    (reference core.pyx:261-292)."""

    n_param = 1

    def __init__(self, prior_indep: Prior, prior_depen: Prior):
        self.prior_indep = prior_indep
        self.prior_depen = prior_depen
        self.p_ix = prior_indep.p_ix
        self.dist = prior_indep.dist

    def apply(self, theta, ncomp):
        u = theta[..., self.p_ix, :]
        v = ppf_interp(self.prior_indep.dist, u[..., 0])
        vals = [v]
        for i in range(1, ncomp):
            v = v + ppf_interp(self.prior_depen.dist, u[..., i])
            vals.append(v)
        return theta.at[..., self.p_ix, :].set(jnp.stack(vals, axis=-1))


class CenSepPrior(Prior):
    """Center +- separation/2 parametrization for two components
    (reference core.pyx:295-318)."""

    n_param = 1

    def __init__(self, vcen_prior: Prior, vsep_prior: Prior):
        self.vcen_prior = vcen_prior
        self.vsep_prior = vsep_prior
        self.p_ix = vcen_prior.p_ix
        self.dist = vcen_prior.dist

    def apply(self, theta, ncomp):
        ix = self.p_ix
        u = theta[..., ix, :]
        vcen = ppf_interp(self.vcen_prior.dist, u[..., 0])
        if ncomp == 1:
            return theta.at[..., ix, 0].set(vcen)
        if ncomp == 2:
            vsep = ppf_interp(self.vsep_prior.dist, u[..., 1])
            pair = jnp.stack([vcen - 0.5 * vsep, vcen + 0.5 * vsep], axis=-1)
            return theta.at[..., ix, :].set(pair)
        # Higher orders not parametrized (reference core.pyx:316-318)
        raise NotImplementedError("CenSepPrior supports ncomp <= 2")


class ResolvedCenSepPrior(Prior):
    """Center/separation with the separation floored at a multiple of
    the geometric-mean FWHM so components stay spectrally resolved
    (reference core.pyx:321-366)."""

    n_param = 2

    def __init__(self, vcen_prior, vsep_prior, sigm_prior, scale=1.5):
        self.vcen_prior = vcen_prior
        self.vsep_prior = vsep_prior
        self.sigm_prior = sigm_prior
        self.scale = float(scale)
        self.sep_scale = FWHM * float(scale)
        self.p_ix = vcen_prior.p_ix
        self.dist = vcen_prior.dist

    def apply(self, theta, ncomp):
        theta = self.sigm_prior.apply(theta, ncomp)
        ix_v = self.vcen_prior.p_ix
        ix_s = self.sigm_prior.p_ix
        u = theta[..., ix_v, :]
        vcen = ppf_interp(self.vcen_prior.dist, u[..., 0])
        if ncomp == 1:
            return theta.at[..., ix_v, 0].set(vcen)
        if ncomp == 2:
            vsep = ppf_interp(self.vsep_prior.dist, u[..., 1])
            sig = theta[..., ix_s, :]
            min_sep = self.sep_scale * jnp.sqrt(sig[..., 0] * sig[..., 1])
            vsep = jnp.maximum(vsep, min_sep)
            pair = jnp.stack([vcen - 0.5 * vsep, vcen + 0.5 * vsep], axis=-1)
            return theta.at[..., ix_v, :].set(pair)
        raise NotImplementedError("ResolvedCenSepPrior supports ncomp <= 2")


class ResolvedPlacementPrior(Prior):
    """Sequential N-component placement with minimum resolved
    separations (reference core.pyx:369-434).

    Components are placed left to right; each draw re-normalizes the
    centroid CDF over the remaining interval with a power-law taper
    (``cdf_over_interval``), and adjacent components are kept at least
    ``scale * FWHM * sqrt(sigma_i * sigma_{i-1})`` apart, with the
    separations shrunk to fit if their sum exceeds the full interval.
    """

    n_param = 2

    def __init__(self, vcen_prior, sigm_prior, scale=1.5):
        self.vcen_prior = vcen_prior
        self.sigm_prior = sigm_prior
        self.scale = float(scale)
        self.sep_scale = FWHM * float(scale)
        self.p_ix = vcen_prior.p_ix
        self.dist = vcen_prior.dist

    def apply(self, theta, ncomp):
        dist = self.vcen_prior.dist
        theta = self.sigm_prior.apply(theta, ncomp)
        ix_v = self.vcen_prior.p_ix
        ix_s = self.sigm_prior.p_ix
        u = theta[..., ix_v, :]
        if ncomp == 1:
            return theta.at[..., ix_v, 0].set(ppf_interp(dist, u[..., 0]))
        sig = theta[..., ix_s, :]
        # minimum separations between adjacent components (core.pyx:411-416)
        seps = [jnp.zeros_like(sig[..., 0])]
        for i in range(1, ncomp):
            seps.append(
                self.sep_scale * jnp.sqrt(sig[..., i] * sig[..., i - 1])
            )
        min_seps = jnp.stack(seps, axis=-1)            # [..., ncomp]
        sep_tot = jnp.sum(min_seps, axis=-1)
        v_range = dist.xmax - dist.xmin
        # shrink to fit (core.pyx:417-424)
        factor = jnp.where(sep_tot > v_range, v_range / sep_tot, 1.0)
        min_seps = min_seps * factor[..., None]
        sep_tot = sep_tot * factor
        # sequential draws left to right (core.pyx:425-434)
        v_lo = jnp.full_like(sep_tot, dist.xmin)
        v_hi = dist.xmax - sep_tot
        vals = []
        for i in range(ncomp):
            sep = min_seps[..., i]
            v_lo = v_lo + sep
            v_hi = v_hi + sep
            sfact = ncomp - 1 - i
            if sfact <= 2:
                # O(1)-memory analytic inversion (the hot path; the
                # dense [..., N] formulation dominated the whole
                # likelihood evaluation at production batch sizes)
                v = tapered_interval_invert(
                    dist, u[..., i], v_lo, v_hi, sfact
                )
            else:
                cdf = cdf_over_interval(dist, v_lo, v_hi, float(sfact))
                v = cdf_interp(cdf, u[..., i], xax=dist.xax, dx=dist.dx)
            vals.append(v)
            v_lo = v
        return theta.at[..., ix_v, :].set(jnp.stack(vals, axis=-1))


class PriorTransformer:
    """Applies a sequence of priors to the unit cube
    (reference core.pyx:437-483)."""

    def __init__(self, priors):
        priors = list(priors)
        assert len(priors) >= 1
        self.priors = priors
        self.n_prior = len(priors)
        self.n_param = sum(p.n_param for p in priors)

    def transform(self, utheta, ncomp: int):
        """u[..., n_param*ncomp] -> theta[..., n_param*ncomp].

        Pure-functional equivalent of ``c_transform``
        (core.pyx:459-476); raises on shape mismatch like the Python
        wrapper (core.pyx:478-483).
        """
        utheta = jnp.asarray(utheta)
        ndim = utheta.shape[-1]
        if self.n_param * ncomp != ndim:
            raise ValueError(f"Invalid shape for ncomp={ncomp}: {ndim}")
        theta = utheta.reshape(utheta.shape[:-1] + (self.n_param, ncomp))
        for prior in self.priors:
            theta = prior.apply(theta, ncomp)
        return theta.reshape(utheta.shape[:-1] + (ndim,))

    def flat_dims(self, ncomp: int):
        """Unit-cube indices the transform ignores (likelihood-flat
        dimensions, e.g. a ConstantPrior's row or a DuplicatePrior's
        copy row).  The sampler excludes them from its bounding
        geometry and samples them uniformly."""
        dims = []
        for prior in self.priors:
            for row in getattr(prior, "unused_param_rows", ()):
                dims.extend(row * ncomp + i for i in range(ncomp))
        return tuple(sorted(dims))
