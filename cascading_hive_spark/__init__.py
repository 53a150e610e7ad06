"""cascading_hive_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of branky/cascading.hive.

The reference (surveyed in SURVEY.md) is a Cascading Tap/Scheme adapter
for Hive file formats (RCFile/ORC) and the HCatalog metastore; the query
semantics its users run come from Cascading core operators. This package
re-expresses that whole surface Spark-first:

- ``session``   — SparkSession builder tuned for columnar scans + AQE
- ``schema``    — Hive DDL schema strings <-> StructType (HiveSchemaUtil.java parity)
- ``io``        — format-dispatching table read/write (RCFile/ORCFile.java parity)
- ``catalog``   — metastore-backed tables, partition filters, publish
  (HCatTap/CascadingHCatUtil.java parity)
- ``operators`` — relational operators (Cascading core parity) plus
  LLM-data-pipeline operators (dedup, similarity, text, multimodal)
- ``streaming`` — Structured Streaming equivalents for event flows

Everything is DataFrame-declarative so Catalyst supplies column pruning,
partition pruning, predicate pushdown, and join selection (SURVEY.md §4:
the reference hand-implements or delegates all of these).
"""

from cascading_hive_spark.io import align_to_schema, read_table, write_table  # noqa: F401
from cascading_hive_spark.schema import parse_ddl, to_ddl  # noqa: F401
from cascading_hive_spark.session import get_session  # noqa: F401
from cascading_hive_spark.tables import TABLES, load_table  # noqa: F401

__version__ = "0.1.0"
