"""Source layer (SURVEY.md §2.1): the tar-archive exploder (the one custom
datasource), line-text and JSON dim sources.
"""
