from maxk_tpu.bench.timing import time_fn, TimingResult

__all__ = ["time_fn", "TimingResult"]
