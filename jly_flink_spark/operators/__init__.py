"""Large-scale training-data-pipeline operators: deduplication,
similarity search, text analysis, multimodal columns.

These go beyond the reference's surface (SURVEY.md §2.2 'north-star
extensions') and are designed 100-TB-first: every operator is a
declarative DataFrame plan (shuffle-conscious, broadcast-aware),
with Pandas UDFs only where built-ins cannot express the semantics.
"""
