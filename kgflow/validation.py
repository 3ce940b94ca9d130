"""Data-quality validation: the reference's validation stage
(databricks/notebooks/data-validation.py) as reusable DataFrame checks.

Checks (all single-job, distributed — no per-column job loops):
  * required-column null counts         (data-validation.py:70-95)
  * key uniqueness                      (data-validation.py:97-118)
  * referential integrity via left_anti (data-validation.py:120-161)
and the severity-weighted quality score of data-validation.py:299-303:
    score = 100 - 10*critical - 5*high, pass >= 90.

The report is a DataFrame (writable like the reference's Delta report
sink, data-validation.py:342-346) built via createDataFrame from the
collected check rows — the checks themselves run on executors; only the
tiny summary lands on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PASS_THRESHOLD = 90


@dataclass
class Issue:
    check: str
    column: str
    severity: str  # critical | high
    count: int


def check_required(df: DataFrame, required: list[str]) -> list[Issue]:
    present = [c for c in required if c in df.columns]
    missing = [c for c in required if c not in df.columns]
    issues = [Issue("missing_column", c, "critical", 1) for c in missing]
    if present:
        row = df.agg(
            *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in present]
        ).collect()[0]
        issues += [
            Issue("required_null", c, "critical", int(row[c]))
            for c in present
            if row[c]
        ]
    return issues


def check_unique(df: DataFrame, keys: list[str]) -> list[Issue]:
    issues = []
    for key in keys:
        dupes = (
            df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)
        )
        n = dupes.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0]
        if n:
            issues.append(Issue("duplicate_key", key, "critical", int(n)))
    return issues


def check_foreign_key(
    child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> list[Issue]:
    dangling = (
        child.where(F.col(fk).isNotNull())
        .select(F.col(fk).alias("k"))
        .join(parent.select(F.col(pk).alias("k")), "k", "left_anti")
        .count()
    )
    return [Issue("dangling_fk", fk, "high", int(dangling))] if dangling else []


def quality_score(issues: list[Issue]) -> int:
    critical = sum(1 for i in issues if i.severity == "critical")
    high = sum(1 for i in issues if i.severity == "high")
    return max(0, 100 - 10 * critical - 5 * high)


def report(spark: SparkSession, source: str, issues: list[Issue]) -> DataFrame:
    """Issues -> report DataFrame (the S6/S9 sink shape)."""
    score = quality_score(issues)
    rows = [
        (source, i.check, i.column, i.severity, i.count, score, score >= PASS_THRESHOLD)
        for i in issues
    ] or [(source, "ok", None, None, 0, score, True)]
    return spark.createDataFrame(
        rows,
        "source string, check string, column string, severity string, "
        "violations long, quality_score int, passed boolean",
    )
