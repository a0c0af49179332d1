from .metadata import CorpusMetadata
from .filters import SearchFilters, compile_filter_mask, infer_type, parse_paper_filter
from .engine import SearchEngine
from .delta import DeltaBuffer

__all__ = [
    "CorpusMetadata",
    "SearchFilters",
    "compile_filter_mask",
    "infer_type",
    "parse_paper_filter",
    "SearchEngine",
    "DeltaBuffer",
]
