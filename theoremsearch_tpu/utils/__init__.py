from .tracing import Tracer, JsonlTracer, NullTracer, get_tracer
from .progress import progress

__all__ = ["Tracer", "JsonlTracer", "NullTracer", "get_tracer", "progress"]
