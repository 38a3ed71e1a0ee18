"""LLM-pipeline declared queries (populated below)."""
