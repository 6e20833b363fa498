from npswf_tpu.core.config import NPSConfig
from npswf_tpu.core.calibration import CalibrationBundle, load_calibration, synthetic_calibration

__all__ = ["NPSConfig", "CalibrationBundle", "load_calibration", "synthetic_calibration"]
