"""Expansion-join width pin — the AQE input-sizing guard.

An EXPANSION join produces far more rows than it reads (bucketed
near-dup candidate generation, interval fan-out joins, shingle inverted
indexes). AQE sizes — and coalesces — post-shuffle partitions from the
MAP OUTPUT BYTES of the join's input, which is tiny for these joins, so
it happily collapses the probe side to 1-2 partitions that then each
produce millions of rows on one core. Measured regressions before this
discipline existed: l2_containment_pairs 679 s at sf1 (single-task pair
generation); the sf1 j14 interval join ran a 14M-pair join+write 2
tasks wide.

The fix is one rule: before an expansion join, repartition the probe
side on the join keys with an EXPLICIT partition count — a
user-specified count is exempt from AQE coalescing, and the join reuses
the distribution so no extra exchange appears. This module is the one
place that rule lives (round-4 verdict: "add one shared helper so the
next expansion join can't regress"); tests/test_plans.py pins the
post-shuffle width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pin_expansion_width(
    df: DataFrame, keys: list[Column | str], n_parts: int | None = None
) -> DataFrame:
    """Repartition ``df`` on ``keys`` with an explicit width so the
    downstream expansion join keeps ``n_parts`` tasks regardless of how
    small the map output is (AQE cannot coalesce a user-specified
    count). Default width: ``spark.sql.shuffle.partitions``."""
    if n_parts is None:
        n_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.repartition(n_parts, *cols)
