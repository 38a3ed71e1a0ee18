"""Relational declared queries (populated below)."""
