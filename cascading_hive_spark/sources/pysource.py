"""Spark 4 Python DataSource: a custom source registered with
``spark.dataSource.register`` and read via ``spark.read.format(...)``
— the extension point that replaces "write a JVM connector" for
Python-first teams (SPARK-44076). The reference's equivalent surface
is its Tap/Scheme registry (TapFactory.java); here a source plugs into
the planner itself: Spark asks the source for PARTITIONS and schedules
one task per partition, so a custom source scales exactly like a
built-in one.

The concrete source generates the deterministic synthetic-documents
corpus (same content contract as sources/synthetic.py — xxhash64-free,
pure Python arithmetic mirror) so tests can assert the custom-source
rows equal the DataFrame-built ones; a real deployment would swap the
row generator for an API/queue/proprietary-format reader while keeping
the partition-planning shape.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _DocsPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n", 10000)`` —
    options: n (rows), n_partitions, n_vocab, seed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    _VOCAB30 = (
        "the a data table row column key value query scan filter join group "
        "sort merge spark hive line part order customer stream batch window "
        "agg fast slow big small vector"
    ).split()
    _LANGS = ["en", "de", "fr", "es", "pt"]
    _SOURCES = ["web", "books", "code", "wiki"]

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.n_vocab = int(options.get("n_vocab", 30))
        self.seed = int(options.get("seed", 7))

    def partitions(self):
        # contiguous id ranges: Spark schedules ONE TASK PER RANGE —
        # this method is the scale contract of a custom source (a
        # single-partition source serializes the whole read)
        step = max(1, self.n // self.n_partitions)
        return [
            _DocsPartition(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition: _DocsPartition):
        # deterministic content: a multiplicative-hash stream per id —
        # partition-independent, so any partitioning yields identical rows
        mult, mod = 2654435761, 1_000_000_007
        vocab = [
            self._VOCAB30[i % len(self._VOCAB30)] + (str(i // 30) if i >= 30 else "")
            for i in range(self.n_vocab)
        ]
        for doc_id in range(partition.start, partition.end):
            h = ((doc_id + self.seed) * mult) % mod
            n_words = 10 + h % 41
            words = []
            w = h
            for _ in range(n_words):
                w = (w * mult + 12345) % mod
                words.append(vocab[w % self.n_vocab])
            text = " ".join(words)
            yield (
                doc_id,
                text,
                self._LANGS[h % len(self._LANGS)],
                self._SOURCES[(h // 7) % len(self._SOURCES)],
                len(text),
            )


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
