from .cache import enable_compilation_cache
from .engine import Engine, render_rtvs
from .profiler import RenderProfiler, device_trace, profile_engine
from .render_loop import RenderLoop
