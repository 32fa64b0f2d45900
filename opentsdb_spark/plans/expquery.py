"""exp (v2) query compiler — /api/query/exp.

Reference lifecycle (SURVEY.md §3.3): pojo.Query -> one TSQuery for the
metric variables -> DAG of ExpressionIterators evaluating JEXL arithmetic
over series joined per the Join spec (src/tsd/QueryExecutor.java:85-160,
src/query/expression/ExpressionIterator.java:67-290). Here each variable
compiles to a grouped DataFrame, each expression to a series_join +
F.expr — the reference's explicit jgrapht DAG ordering falls out of
DataFrame dependency structure.

Expressions may reference earlier expression ids as variables (the
reference allows nested expressions in the DAG); outputs select which
expressions are returned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from opentsdb_spark.model import ExpQuery, SubQuery
from opentsdb_spark.operators.join import evaluate_expression, series_join
from opentsdb_spark.plans.planner import compile_subquery
from opentsdb_spark.timeparse import parse_datetime_ms


def compile_exp_query(
    points: DataFrame, eq: ExpQuery, now_ms: int | None = None
) -> dict[str, DataFrame]:
    """Compile all expressions; returns {expression_id: DataFrame} with
    columns [*join_tagks, ts, value]."""
    start_ms = parse_datetime_ms(eq.start, now_ms=now_ms)
    end_ms = parse_datetime_ms(eq.end, now_ms=now_ms)
    # same inverted-range guard as compile_query (TSQuery.java:179-186) —
    # without it a fill-policy downsample reaches F.sequence with
    # last < first and dies with Spark's sequence-boundaries error
    if end_ms < start_ms:
        raise ValueError(
            f"End time [{end_ms}] must be greater than or equal to the start time [{start_ms}]"
        )

    variables: dict[str, DataFrame] = {}
    var_tagks: dict[str, tuple[str, ...]] = {}
    for m in eq.metrics:
        sub = SubQuery(
            metric=m.metric,
            aggregator=m.aggregator,
            downsample=m.downsample,
            rate=m.rate,
            filters=m.filters,
        )
        res = compile_subquery(points, sub, start_ms, end_ms)
        variables[m.id] = res.df
        var_tagks[m.id] = res.group_tagks

    results: dict[str, DataFrame] = {}
    for e in eq.expressions:
        import re

        referenced = tuple(
            v for v in set(re.findall(r"\b[A-Za-z_][A-Za-z0-9_]*\b", e.expr))
            if v in variables or v in results
        )
        if not referenced:
            raise ValueError(f"expression {e.id!r} references no known variables")
        # join keys: the common group tag keys of the referenced variables
        tagk_sets = [set(var_tagks.get(v, ())) for v in referenced]
        join_tagks = tuple(sorted(set.intersection(*tagk_sets))) if tagk_sets else ()
        frames = {v: (variables[v] if v in variables else results[v]) for v in referenced}
        fills = {vid: pol for vid, pol in e.fill_policies.items() if vid in frames}
        # metric variables carry their own default fill policy
        for m in eq.metrics:
            if m.id in frames and m.id not in fills:
                fills[m.id] = m.fill_policy
        joined = series_join(frames, join_tagks, e.join.operator, fills)
        out = evaluate_expression(joined, e.expr, referenced)
        results[e.id] = out.select(*join_tagks, "ts", "value")
        var_tagks[e.id] = join_tagks

    if eq.outputs:
        return {k: v for k, v in results.items() if k in eq.outputs}
    return results
