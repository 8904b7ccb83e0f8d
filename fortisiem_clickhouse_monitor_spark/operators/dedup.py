"""Placeholder — queries land here (SURVEY.md §2)."""
