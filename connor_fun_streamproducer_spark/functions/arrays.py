"""Placeholder — ops land here per SURVEY.md §7 build order."""
