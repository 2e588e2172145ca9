"""Relational-spatial + training-data operators (SURVEY.md §2 / §7)."""
