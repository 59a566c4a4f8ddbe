"""Structured Streaming operators (SURVEY.md §2.B S1/S2)."""
