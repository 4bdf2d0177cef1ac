from nestfit_tpu.native.bindings import (
    available,
    ns_gaussian,
    ns_spectral_ammonia,
    amm_predict_native,
    transform_native,
)
