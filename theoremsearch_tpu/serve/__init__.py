from .latex_display import clean_latex_for_display
from .app import SearchService

__all__ = ["clean_latex_for_display", "SearchService"]
