"""Scalar/array function helpers (SURVEY.md §2.8) shared across
operators and oracle SQL generation."""
