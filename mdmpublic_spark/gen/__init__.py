"""Deterministic synthetic corpus generation (FIXTURES.md)."""
