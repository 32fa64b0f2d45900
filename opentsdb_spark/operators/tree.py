"""/api/tree — hierarchical organization of series via ordered rules.

Reference: src/tree/Tree.java, src/tree/TreeRule.java, src/tree/
TreeBuilder.java, served by src/tsd/TreeRpc.java. A tree is an ordered list
of rules; each rule extracts one (or, with a separator, several) path
level(s) from a series' metric or a tag value; running all series through
the rules yields branches (inner nodes) and leaves (series ids).

Spark shape: rules compile to array-of-string path expressions over the
distinct-series frame; branches = explode of path prefixes, aggregated
once. The series scan is the only big input; everything else is
propotional to the number of distinct series.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentsdb_spark.sources.points import series_id_col


@dataclass(frozen=True)
class TreeRule:
    """One rule (reference src/tree/TreeRule.java types METRIC / TAGK;
    'separator' splits the extracted value into multiple path levels —
    e.g. metric 'sys.cpu.user' with separator '.' -> 3 levels)."""

    type: str  # 'METRIC' | 'TAGK'
    field: str = ""  # tag key for TAGK
    separator: str | None = None


def _rule_levels(rule: TreeRule):
    if rule.type == "METRIC":
        src = F.col("metric")
    elif rule.type == "TAGK":
        src = F.col("tags").getItem(rule.field)
    else:
        raise ValueError(f"unknown tree rule type {rule.type!r}")
    if rule.separator:
        import re

        return F.split(src, re.escape(rule.separator), -1)  # split() takes a regex
    return F.array(src)


def build_tree(points: DataFrame, rules: tuple[TreeRule, ...]) -> DataFrame:
    """Run every distinct series through the rules.

    Returns leaves: (series_id, path array<string>, depth). Series for which
    a rule extracts nothing (missing tag) drop that level (reference
    TreeBuilder skips no-match rules)."""
    series = (
        points.withColumn("series_id", series_id_col())
        .groupBy("series_id")
        .agg(F.first("metric").alias("metric"), F.first("tags").alias("tags"))
    )
    path = None
    for rule in rules:
        lv = F.filter(_rule_levels(rule), lambda x: x.isNotNull() & (x != ""))
        path = lv if path is None else F.concat(path, lv)
    if path is None:
        raise ValueError("tree needs at least one rule")
    return series.select(
        "series_id", path.alias("path"), F.size(path).alias("depth")
    )


def tree_branches(leaves: DataFrame) -> DataFrame:
    """All inner branches: every proper prefix of every leaf path, with leaf
    counts (the reference's branch listing, TreeRpc 'branch' endpoint)."""
    prefixes = leaves.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("depth")),
                lambda n: F.slice("path", 1, n),
            )
        ).alias("branch")
    )
    return (
        prefixes.groupBy("branch")
        .agg(F.count("*").alias("leaf_count"))
        .select(
            F.array_join("branch", "/").alias("branch_path"),
            F.size("branch").alias("depth"),
            "leaf_count",
        )
    )
