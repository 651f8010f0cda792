"""Pin a metadata-scale result as a local relation.

Shared implementation of the ``collect()`` + ``createDataFrame``
pattern that previously appeared three times (streaming runners,
checkpoint-scoped plans, SQL-scripting scope) — VERDICT r7 item 5.
Leaf module (imports only pyspark) so both ``plans._core`` and
``streaming.windows`` can use it without an import cycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Pinning materializes on the driver — a guard this size keeps the
#: pattern usable only for post-aggregate / metadata-scale frames.
MAX_PIN_ROWS = 10_000


def pin_local(
    spark: SparkSession, df: DataFrame, max_rows: int = MAX_PIN_ROWS
) -> DataFrame:
    """Collect a metadata-scale result and rebuild it as a local-
    relation DataFrame, severing any dependency on soon-to-be-dropped
    inputs (memory-sink tables, temp checkpoint/output dirs). Safer
    than ``.cache()``: a cache can be invalidated (clearCache,
    unpersist, session restart) after which any action recomputes from
    the deleted source and fails — ADVICE r5 item 1's failure mode.

    Refuses frames larger than ``max_rows`` so a future call site
    can't silently pin (= drag through the driver) a data-scale frame.
    The collected rows live only as long as the returned DataFrame —
    nothing stays pinned after the caller drops it.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"pin_local: frame exceeds {max_rows} rows — pinning is for "
            "post-aggregate metadata-scale results only; write a "
            "distributed sink instead"
        )
    return spark.createDataFrame(rows, df.schema)
