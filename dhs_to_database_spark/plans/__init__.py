"""Load orchestration & schema evolution (SURVEY.md §2.A A21-A30)."""
