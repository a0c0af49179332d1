from .tracing import Tracer, JsonlTracer, NullTracer, get_tracer
from .progress import progress
from .shapes import pow2_bucket

__all__ = [
    "Tracer", "JsonlTracer", "NullTracer", "get_tracer", "progress",
    "pow2_bucket",
]
