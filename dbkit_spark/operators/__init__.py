"""Relational operator surface (SURVEY.md §2)."""

from . import aggregate, filter, joins, project, setops, sort, window  # noqa: F401
