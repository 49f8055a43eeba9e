"""Structured Streaming operators (extension surface — the reference
has no streaming; SURVEY.md §2.9 note)."""
