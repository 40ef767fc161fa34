"""End-to-end pipeline compositions (SURVEY.md §3: entry points E1-E3)."""
