from nestfit_tpu.utils.axes import freq_axis_from_velocity, velocity_axis_from_freq
from nestfit_tpu.utils.logging import get_logger
