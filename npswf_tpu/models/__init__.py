from npswf_tpu.models.waveform import (
    SplineRefModel,
    WaveformModel,
    get_model,
    register_model,
)

__all__ = ["WaveformModel", "SplineRefModel", "get_model", "register_model"]
