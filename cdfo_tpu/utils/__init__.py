from .profiling import count_params, estimate_flops, trace_profile, Timer

__all__ = ["count_params", "estimate_flops", "trace_profile", "Timer"]
