"""Operator layer (SURVEY.md §2): embargo classification, set algebra,
aggregations, and the north-star extension operators (dedup, similarity
search, text analysis, multimodal plumbing).
"""
