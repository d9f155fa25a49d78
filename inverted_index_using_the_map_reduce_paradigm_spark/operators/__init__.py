"""Operator families — one module per SURVEY.md §2 group."""
