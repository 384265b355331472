"""Physical-plan audit helper — the ".explain and iterate" discipline as a
queryable report.

At 100 TB the difference between a good and a bad plan is a handful of
countable facts: how many exchanges (shuffles) run, whether filters and
column pruning reached the parquet scan, how much of the plan stays inside
whole-stage codegen, and whether any Python boundary sits in the hot path.
``plan_report`` extracts exactly those facts from ``explain`` output so
tests (and humans) can assert plan SHAPE, not just results — e.g. "this
cleaner chain is one scan, zero shuffles" stays true as code evolves.

Parsing ``explain('formatted')`` text is intentional: it is the same
surface a human audits, it needs no private APIs, and a Spark upgrade that
changes the wording fails loudly in the plan-shape tests rather than
silently skewing a metric.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanReport:
    n_exchanges: int          # shuffle boundaries (Exchange nodes)
    n_broadcasts: int         # BroadcastExchange nodes (small-side joins)
    n_scans: int              # file source scans
    n_python_stages: int      # Arrow/pandas UDF evaluation nodes
    n_sorts: int
    n_aggregates: int
    wholestage_ids: int       # distinct WholeStageCodegen spans
    pushed_filters: list[str]  # per-scan PushedFilters payloads
    read_schemas: list[str]    # per-scan ReadSchema payloads (column pruning)
    partition_filters: list[str]  # per-scan PartitionFilters (listing pruning)
    text: str                  # the full formatted plan (join-type asserts)

    @property
    def scans_are_pruned(self) -> bool:
        """True when every scan reads an explicit (non-empty) projected
        schema — the 'don't read all columns for a 2-column query' check."""
        return all(s and s != "struct<>" for s in self.read_schemas)


def _tree_depth(line: str) -> int:
    """Indentation depth of a Spark plan-tree line (chars before the node
    name: spaces and the ':  +- |' connector glyphs)."""
    return len(re.match(r"^[\s:+\-|]*", line).group(0))


def _subtree(lines: list[str], i: int) -> str:
    """The child subtree text of the node at ``lines[i]``."""
    d = _tree_depth(lines[i])
    sub = []
    for j in range(i + 1, len(lines)):
        if _tree_depth(lines[j]) <= d:
            break
        sub.append(lines[j])
    return "\n".join(sub)


def forced_broadcast_subtrees(df: DataFrame) -> list[str]:
    """The analyzed-plan subtree under each EXPLICIT broadcast hint
    (``F.broadcast``/``/*+ BROADCAST */``) — one string per hint.

    Distinguishes FORCED broadcasts (a hint the planner cannot refuse —
    wrong on any input that grows with data size, since at 100× scale the
    shipped side OOMs where a shuffle join survives) from planner-chosen
    ones (sized from stats/AQE, free to change with scale).  Tests assert
    on the subtree text: a hint is scale-safe only when the subtree reads
    a fixed-cardinality input (a dim like ``nation``, a collected model
    literal), never an sf-proportional table subset."""
    text = df._jdf.queryExecution().analyzed().toString()
    lines = text.splitlines()
    return [
        _subtree(lines, i)
        for i, l in enumerate(lines)
        if "ResolvedHint" in l and "broadcast" in l.lower()
    ]


def node_subtrees(df: DataFrame, node_name: str, plan: str = "optimized") -> list[str]:
    """Child-subtree text of every ``node_name`` node in the logical plan
    (``plan``: 'analyzed' or 'optimized') — for nesting asserts like 'the
    Window's input is an Aggregate output, not corpus rows'."""
    qe = df._jdf.queryExecution()
    text = (qe.analyzed() if plan == "analyzed" else qe.optimizedPlan()).toString()
    lines = text.splitlines()
    return [
        _subtree(lines, i)
        for i, l in enumerate(lines)
        if re.match(rf"^[\s:+\-|]*{node_name}\b", l)
    ]


def plan_report(df: DataFrame) -> PlanReport:
    """Audit the EXECUTED-plan description of ``df`` (final AQE plan when
    the query has run; the initial physical plan otherwise)."""
    text = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # node inventory lines look like "(3) HashAggregate [codegen id : 1]"
    nodes = re.findall(r"^\(\d+\)\s+([A-Za-z0-9_]+)", text, re.M)
    counts = {}
    for n in nodes:
        counts[n] = counts.get(n, 0) + 1
    return PlanReport(
        n_exchanges=counts.get("Exchange", 0),
        n_broadcasts=counts.get("BroadcastExchange", 0),
        n_scans=sum(v for k, v in counts.items() if k.startswith("Scan")),
        n_python_stages=sum(
            v
            for k, v in counts.items()
            if "EvalPython" in k or "MapInPandas" in k or "FlatMapGroupsInPandas" in k
        ),
        n_sorts=counts.get("Sort", 0),
        n_aggregates=counts.get("HashAggregate", 0)
        + counts.get("SortAggregate", 0)
        + counts.get("ObjectHashAggregate", 0),
        wholestage_ids=len(set(re.findall(r"codegen id : (\d+)", text))),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: (\S+)", text),
        partition_filters=re.findall(r"PartitionFilters: \[([^\]]*)\]", text),
        text=text,
    )
