"""Reusable expression helpers (SURVEY.md §2.8 scalar families)."""

from .helpers import (  # noqa: F401
    cosine_similarity,
    format_bytes,
    ngram_expr,
    quality_expr,
    salted_join,
)

__all__ = ["cosine_similarity", "format_bytes", "ngram_expr", "quality_expr", "salted_join"]
