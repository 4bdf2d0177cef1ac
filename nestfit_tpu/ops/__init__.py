from nestfit_tpu.ops import fused
from nestfit_tpu.ops.fused import gauss_chi2_fused, hf_chi2_fused
