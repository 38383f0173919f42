from .cache import apply_platform_env, enable_compilation_cache
from .profiling import count_params, estimate_flops, trace_profile, Timer

__all__ = ["count_params", "estimate_flops", "trace_profile", "Timer",
           "apply_platform_env", "enable_compilation_cache"]
