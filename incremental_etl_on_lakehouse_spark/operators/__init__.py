"""Reusable DataFrame operators: CDC/merge, dedup families, similarity, text."""
