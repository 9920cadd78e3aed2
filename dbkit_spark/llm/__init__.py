"""LLM-data-pipeline operators (SURVEY.md §2.11): deduplication family,
embedding similarity search, text analysis, multimodal column plumbing."""

from . import dedup, multimodal, similarity  # noqa: F401
