"""Reusable expression helpers (SURVEY.md §2.8 scalar families)."""

from .helpers import cosine_similarity, format_bytes, salted_join  # noqa: F401

__all__ = ["cosine_similarity", "format_bytes", "salted_join"]
