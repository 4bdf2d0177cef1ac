"""Model registry.

Maps model names to their modules (reference:
nestfit/models/__init__.py:6-7); used by the store to recover the model
from persisted metadata (reference main.py:256-259).
"""

from nestfit_tpu.models import ammonia, diazenylium, gaussian
from nestfit_tpu.models import runner as _runner  # attaches ModelRunner attrs
from nestfit_tpu.models.runner import (
    AmmoniaRunner,
    DiazenyliumRunner,
    GaussianRunner,
    Runner,
    RUNNERS,
)
from nestfit_tpu.models.spectrum import Spectrum, make_spectrum
from nestfit_tpu.models.tables import (
    AMMONIA_TRANSITIONS,
    DIAZENYLIUM_TRANSITIONS,
    Transition,
)

MODELS = {
    module.NAME: module
    for module in (ammonia, diazenylium, gaussian)
}
