"""Data sources.

File-based and catalog-based table access live in ``io.py`` and
``catalog.py`` (SURVEY.md A1-A21 parity); this package holds
additional sources:

- ``synthetic`` — distributed deterministic corpus generator for
  scale-testing operators beyond the fixed driver test data.
"""

from cascading_hive_spark.sources.synthetic import (  # noqa: F401
    synthetic_documents,
    synthetic_embeddings,
)
