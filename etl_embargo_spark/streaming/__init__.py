"""Structured Streaming wrappers (SURVEY.md §2.7): the reference's cron
cadence as availableNow micro-batches, plus event-time windowed aggregation
with watermarks for late data.
"""
