from facerec_tpu.utils.profiling import StageTimer, timed_call, trace

__all__ = ["StageTimer", "timed_call", "trace"]
