"""Sink layer (SURVEY.md §2.1 K1-K6): routed partitioned writes and
filesystem blob emission.
"""
