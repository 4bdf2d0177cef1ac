"""Ammonia (NH3) inversion-transition model.

TPU-native rebuild of the reference ammonia model
(reference: nestfit/models/ammonia.pyx).  Six parameters per velocity
component (ammonia.pyx:459)::

    voff : velocity centroid offset          [km/s]
    trot : rotation temperature              [K]
    tex  : excitation temperature            [K]
    ntot : log10 total column density        [log10 cm^-2]
    sigm : velocity dispersion               [km/s]
    orth : ortho fraction of total NH3       [0-1]

Per component the main-line optical depth follows from the partition
function over 51 rotational J levels and the column density
(ammonia.pyx:326-361), then the shared hyperfine radiative-transfer
kernel synthesizes the brightness profile.

All functions are pure, batched over arbitrary leading dims, and
jit/vmap/shard_map friendly.  Parameter layout matches the reference's
parameter-major stride ``params[p * ncomp + i]`` (core.pyx:192-197).
"""

import numpy as np

import jax
import jax.numpy as jnp

from nestfit_tpu.constants import CKMS, CCMS, H, KB
from nestfit_tpu.models import hyperfine
from nestfit_tpu.models.spectrum import Spectrum, make_spectrum
from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS, Transition

# Ammonia rotation constants, Coudert & Roueff (2006) A&A 449 855
# (reference: ammonia.pyx:15-18, __NEW_CONST=True branch)
BROT = 298192.92e6
CROT = 186695.86e6
# Legacy constants, Poynter & Kakar (1975) (ammonia.pyx:19-22)
BROT_OLD = 298117.06e6
CROT_OLD = 186726.36e6

# Partition function summed over J = 0..50 (ammonia.pyx:25-27, 48-51)
NPART = 51
_J_ALL = np.arange(NPART)
JORTH = _J_ALL[_J_ALL % 3 == 0]    # 17 ortho levels
JPARA = _J_ALL[_J_ALL % 3 != 0]    # 34 para levels

N_PARAMS = 6


def _level_energy_k(j, brot=BROT, crot=CROT):
    """Rotational level energy over KB in Kelvin: H*(B*j*(j+1)+(C-B)*j^2)/KB."""
    j = np.asarray(j, dtype=np.float64)
    return H * (brot * j * (j + 1) + (crot - brot) * j * j) / KB


_E_ORTH = _level_energy_k(JORTH)
_E_PARA = _level_energy_k(JPARA)
_G_ORTH = 2.0 * JORTH + 1.0
_G_PARA = 2.0 * JPARA + 1.0


def swift_convert(tkin):
    """Gas kinetic -> rotation temperature, "cold ammonia" approximation
    of Swift et al. (2005) eq. A6 (reference: ammonia.pyx:280-286)."""
    return tkin / (1.0 + (tkin / 41.18) * jnp.log(1.0 + 0.6 * jnp.exp(-15.7 / tkin)))


def partition_level(j, trot):
    """Single-level partition term ``(2j+1) exp(-E_j/(KB trot))``
    (reference: ammonia.pyx:289-301, exact branch)."""
    e_j = _level_energy_k(j)
    return (2.0 * j + 1.0) * jnp.exp(-e_j / trot)


def partition_func(para: bool, trot):
    """Total partition function over para or ortho J levels
    (reference: ammonia.pyx:304-315).  Ortho levels carry the spin
    degeneracy factor 2."""
    trot = jnp.asarray(trot)
    dtype = trot.dtype
    if para:
        e = jnp.asarray(_E_PARA, dtype=dtype)
        g = jnp.asarray(_G_PARA, dtype=dtype)
        return jnp.sum(g * jnp.exp(-e / trot[..., None]), axis=-1)
    e = jnp.asarray(_E_ORTH, dtype=dtype)
    g = jnp.asarray(_G_ORTH, dtype=dtype)
    return 2.0 * jnp.sum(g * jnp.exp(-e / trot[..., None]), axis=-1)


def tau_main(trans: Transition, trot, tex, ntot, sigm, orth):
    """Main-line optical depth of one component
    (reference: ammonia.pyx:349-360).

    Combines the level population from the partition function, the
    stimulated-emission correction, the Einstein A term, and the line
    width normalization.
    """
    zlev = partition_level(trans.n, trot)
    qtot = partition_func(trans.para, trot)
    species_frac = (1.0 - orth) if trans.para else orth
    pop_rotstate = 10.0 ** ntot * species_frac * zlev / qtot
    t0r = H * trans.nu / KB
    eterm = jnp.exp(-t0r / tex)
    expterm = (1.0 - eterm) / (1.0 + eterm)
    fracterm = CCMS**2 * trans.ea / (8.0 * np.pi * trans.nu**2)
    widthterm = CKMS / (sigm * trans.nu * np.sqrt(2.0 * np.pi))
    return pop_rotstate * fracterm * expterm * widthterm


def unpack_params(params, n_params: int):
    """Reshape flat parameter-major params [..., n_params*ncomp] to
    [..., n_params, ncomp] (stride convention of core.pyx:192-197)."""
    ndim = params.shape[-1]
    assert ndim % n_params == 0, (ndim, n_params)
    ncomp = ndim // n_params
    return params.reshape(params.shape[:-1] + (n_params, ncomp))


def amm_predict(spec: Spectrum, params, cold: bool = False, lte: bool = False):
    """Predict the ammonia spectrum for a mixture of components.

    Pure-function equivalent of ``c_amm_predict``
    (reference: ammonia.pyx:326-361).

    Parameters
    ----------
    spec : Spectrum
        Built with ``rest_freq`` equal to the transition frequency and
        the matching ``trans_id`` (1 -> (1,1), ... 9 -> (9,9)).
    params : f32[..., 6*ncomp]
        Parameter-major packed parameters.
    cold : bool
        Interpret ``trot`` as kinetic temperature and apply the Swift
        et al. (2005) conversion (ammonia.pyx:344-345).
    lte : bool
        Force ``tex = trot`` (ammonia.pyx:346-347).

    Returns
    -------
    pred : f32[..., S]
    """
    trans = AMMONIA_TRANSITIONS[spec.trans_id - 1]
    p = unpack_params(jnp.asarray(params, dtype=spec.dnu.dtype), N_PARAMS)
    voff, trot, tex, ntot, sigm, orth = (p[..., i, :] for i in range(N_PARAMS))
    if cold:
        trot = swift_convert(trot)
    if lte:
        tex = trot
    tau0 = tau_main(trans, trot, tex, ntot, sigm, orth)   # [..., ncomp]
    # Components are optically thin slabs w.r.t. each other: sum the
    # per-component brightness contributions (ammonia.pyx:335-361).
    tb = hyperfine.hf_predict(
        trans, spec.dnu, spec.t0, spec.tbg, voff, tex, tau0, sigm
    )                                                      # [..., ncomp, S]
    return jnp.sum(tb, axis=-2)


def fused_chi2(spec: Spectrum, params_flat, cold: bool = False,
               lte: bool = False):
    """Fused Pallas spectrum-synthesis + chi-square for flat-batched
    params [B, 6*ncomp] (see ops/fused.py); B must be a multiple of
    the data batch R with row alignment ``b % R``."""
    from nestfit_tpu.ops import fused

    trans = AMMONIA_TRANSITIONS[spec.trans_id - 1]
    p = unpack_params(jnp.asarray(params_flat, jnp.float32), N_PARAMS)
    voff, trot, tex, ntot, sigm, orth = (p[..., i, :] for i in range(N_PARAMS))
    if cold:
        trot = swift_convert(trot)
    if lte:
        tex = trot
    tau0 = tau_main(trans, trot, tex, ntot, sigm, orth)
    return fused.hf_chi2_fused(
        trans, spec.dnu, spec.t0, spec.tbg, spec.data,
        voff, tex, tau0, sigm,
    )


def make_ammonia_spectrum(xarr, data, noise, trans_id=1, **kw) -> Spectrum:
    """Equivalent of ``AmmoniaSpectrum`` construction
    (reference: ammonia.pyx:244-277): sets the rest frequency from the
    transition table and precomputes the CMB background term."""
    assert 1 <= trans_id <= len(AMMONIA_TRANSITIONS)
    trans = AMMONIA_TRANSITIONS[trans_id - 1]
    return make_spectrum(xarr, data, noise, rest_freq=trans.nu,
                         trans_id=trans_id, **kw)


# Module-level metadata mirroring the reference's model-module protocol
# (reference: ammonia.pyx:450-478) used by the registry and the store.
N = N_PARAMS
IX_VCEN = 0
IX_SIGM = 4
NAME = "ammonia"
model_predict = amm_predict
make_model_spectrum = make_ammonia_spectrum
TRANSITIONS = AMMONIA_TRANSITIONS

PAR_NAMES = ["voff", "trot", "tex", "ntot", "sigm", "orth"]
PAR_NAMES_SHORT = ["v", "Tk", "Tx", "N", "s", "o"]
TEX_LABELS = [
    r"$v_\mathrm{lsr}$",
    r"$T_\mathrm{rot}$",
    r"$T_\mathrm{ex}$",
    r"$\log(N_\mathrm{p})$",
    r"$\sigma_\mathrm{v}$",
    r"$f_\mathrm{o}$",
]
TEX_LABELS_WITH_UNITS = [
    r"$v_\mathrm{lsr} \ [\mathrm{km\, s^{-1}}]$",
    r"$T_\mathrm{rot} \ [\mathrm{K}]$",
    r"$T_\mathrm{ex} \ [\mathrm{K}]$",
    r"$\log(N) \ [\log(\mathrm{cm^{-2}})]$",
    r"$\sigma_\mathrm{v} \ [\mathrm{km\, s^{-1}}]$",
    r"$f_\mathrm{o}$",
]


def get_par_names(ncomp=None):
    if ncomp is not None:
        return [
            f"{label}{n}"
            for label in PAR_NAMES_SHORT
            for n in range(1, ncomp + 1)
        ]
    return PAR_NAMES_SHORT
