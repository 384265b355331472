"""Join strategy helpers for skewed / co-located workloads.

The engine leans on Catalyst defaults first: dimension tables broadcast
automatically (``spark.sql.autoBroadcastJoinThreshold``), AQE splits skewed
sort-merge partitions at runtime (``spark.sql.adaptive.skewJoin``).  The
helpers here cover the cases those don't reach:

- ``salted_join``: a hot fact-side key whose single hash partition exceeds
  executor memory even after AQE splitting (AQE splits *partitions*, not a
  single key's rows within an aggregation pipeline feeding the join).
- ``write_bucketed`` (sources.io): shuffle-once-at-ingest co-location for
  repeated joins on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with hot-key salting: the skewed side scatters uniformly
    across ``n_salts`` sub-keys; the other side is replicated once per salt,
    so one hot key spreads over ``n_salts`` tasks instead of one straggler.

    Cost model: replicates the small side ``n_salts``× through the shuffle —
    only worth it when the other side is far smaller than the hot key's row
    count (the usual shape: fact × dimension too big to broadcast).

    Right/full outer joins are rejected: the replicated side's unmatched
    keys would surface once PER SALT (n_salts null-extended copies).
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            "the replicated side would emit unmatched rows once per salt"
        )
    on = [on] if isinstance(on, str) else list(on)
    salt = F.floor(F.rand(seed) * n_salts).cast("int")
    left = skewed.withColumn("__salt__", salt)
    right = other.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt__"),
    )
    return left.join(right, on + ["__salt__"], how).drop("__salt__")
