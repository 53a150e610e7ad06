"""Operator modules.

- ``relational``  — Cascading-core parity ops the reference exercises
  (SURVEY.md §2.B) plus the relational surface Spark gives free (§2.C)
- ``dedup``       — exact + near-duplicate detection at corpus scale
- ``similarity``  — vector similarity search over embedding columns
- ``text``        — text analysis (lang-id, quality, tokens, fingerprints)
- ``multimodal``  — binary media columns with typed metadata
- ``asof``        — time-series as-of join
"""
