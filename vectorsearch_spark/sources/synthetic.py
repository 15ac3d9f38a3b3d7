"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-corpus generator — documents materialize
inside executor tasks, one ``InputPartition`` per slice, so a
100×-scale probe corpus never exists on disk or the driver.

Usage::

    spark.dataSource.register(SyntheticCorpusDataSource)
    df = (spark.read.format("synthetic_corpus")
          .option("rows", 500_000).option("partitions", 64)
          .option("seed", 42).load())

Schema: (doc_id bigint, text string, lang string). Determinism
contract: row content is a pure function of (seed, doc_id) — re-reads,
retried tasks, and different partition counts all yield the identical
corpus (the property that makes the source usable under oracle
checks; a ``rand()``-based generator would re-deal on every retry).

Scale: partition i generates rows [i·rows/P, (i+1)·rows/P) locally —
no shuffle, no driver materialization, arbitrarily wide parallelism.
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "the of and to in is that it was for on are as with his they at be "
    "this have from or one had by word but not what all were we when "
    "your can said there use an each which she do how their if will up "
    "other about out many then them these so some her would make like "
    "him into time has look two more write go see number no way could "
    "people my than first water been call who oil its now find long "
    "down day did get come made may part"
).split()
_LANGS = ("en", "de", "fr", "es", "und")


def _gen_doc(seed: int, doc_id: int) -> tuple[int, str, str]:
    rng = random.Random((seed << 32) ^ doc_id)
    n = rng.randint(5, 120)
    text = " ".join(rng.choice(_WORDS) for _ in range(n))
    return (doc_id, text, _LANGS[rng.randrange(len(_LANGS))])


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = max(1, -(-self.rows // self.parts))
        return [
            _Slice(lo, min(lo + per, self.rows), self.seed)
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Slice):
        for doc_id in range(partition.start, partition.end):
            yield _gen_doc(partition.seed, doc_id)


class SyntheticCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string"

    def reader(self, schema) -> SyntheticCorpusReader:
        return SyntheticCorpusReader(self.options)
