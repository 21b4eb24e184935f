from . import io, native, timers, viz

__all__ = ["io", "native", "timers", "viz"]
