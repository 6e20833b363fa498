from npswf_tpu.utils.synthetic import SyntheticTruth, make_events
from npswf_tpu.utils.timers import StageTimer

__all__ = ["SyntheticTruth", "make_events", "StageTimer"]
