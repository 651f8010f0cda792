"""Custom connector via Spark 4's Python DataSource API.

The reference reads exactly one CSV (reference spark.py:29,
app.py:32). A complete engine must also be EXTENSIBLE to new sources
without JVM code — Spark 4's ``pyspark.sql.datasource`` API is that
extension point, and this module exercises the whole surface:

- ``SyntheticLoansDataSource``: a deterministic loan-application
  generator (``spark.read.format("synthetic_loans")``) whose rows are
  pure modular arithmetic over (partition, row index) — same data on
  every read, any partitioning, so tests can assert exact content.
- **Partition planning**: ``partitions()`` splits the requested row
  count across N ``InputPartition``s — the source parallelizes like
  any file scan (each partition generates its slice independently on
  its executor; nothing flows through the driver).
- **Filter pushdown** (Spark 4.1 ``pushFilters``): ``EqualTo``/
  ``GreaterThan``/``LessThan`` on the integer ``credit_score`` and
  ``status`` columns are absorbed into the generator loop; remaining
  filters stay with Spark. The reader reports which filters it
  accepted so tests can pin the pushdown actually happened.

Scale posture: a Python DataSource runs Arrow-batched in the Python
workers — fine for generators/API adapters; heavy tabular IO should
stay on native parquet/ORC scans (sources/readers.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    LessThan,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "application_id bigint, credit_score int, loan_amount double, status int"
)


def _row(i: int) -> tuple:
    # Deterministic synthetic loan application #i (pure integer math).
    credit_score = 500 + (i * 7919) % 400  # 500..899
    loan_amount = float(50_000 + (i * 104_729) % 950_000)
    status = 1 if (i * 31 + 7) % 5 == 0 else 0  # ~20% defaults
    return (i, credit_score, loan_amount, status)


@dataclass
class _Slice(InputPartition):
    start: int
    end: int


class _Reader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.accepted: list[Filter] = []

    def pushFilters(self, filters: list[Filter]):  # noqa: N802
        for f in filters:
            if isinstance(f, (EqualTo, GreaterThan, LessThan)) and f.attribute in (
                ("credit_score",),
                ("status",),
            ):
                self.accepted.append(f)
            else:
                yield f  # not pushed — Spark keeps it

    def _keep(self, row: tuple) -> bool:
        by_name = {"application_id": 0, "credit_score": 1, "loan_amount": 2, "status": 3}
        for f in self.accepted:
            v = row[by_name[f.attribute[0]]]
            if isinstance(f, EqualTo) and not v == f.value:
                return False
            if isinstance(f, GreaterThan) and not v > f.value:
                return False
            if isinstance(f, LessThan) and not v < f.value:
                return False
        return True

    def partitions(self):
        per = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, per)) + [self.n_rows]
        return [_Slice(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            row = _row(i)
            if self._keep(row):
                yield row


class SyntheticLoansDataSource(DataSource):
    """``spark.read.format("synthetic_loans").option("rows", n)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_loans"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _Reader(schema, self.options)


def register(spark) -> None:
    """Idempotently register the custom source on a session.

    A reader that implements ``pushFilters`` requires
    ``spark.sql.python.filterPushdown.enabled`` (off by default in
    Spark 4.1, runtime-settable) — set here so a bare session works.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticLoansDataSource)
