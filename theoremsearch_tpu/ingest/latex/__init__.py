from .extract import extract_theorems, Theorem

__all__ = ["extract_theorems", "Theorem"]
