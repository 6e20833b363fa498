from npswf_tpu.runtime.executor import RunResult, run_segment

__all__ = ["RunResult", "run_segment"]
