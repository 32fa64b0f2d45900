"""Series-set joins + expression evaluation (exp/v2 layer, and the engine
under the binary gexp functions).

Reference semantics:
  * INTERSECTION join — series (flattened tag sets) present in ALL variable
    result sets are kept (src/query/expression/IntersectionIterator.java:57-310,
    src/query/pojo/Join.java:28-79).
  * UNION join — every tag set is kept; a variable missing that series (or a
    value at a timestamp) is filled per its NumericFillPolicy
    (src/query/expression/UnionIterator.java:40-260,
    NumericFillPolicy.java).
  * Arithmetic over the joined variables is a JEXL script in the reference
    (src/query/pojo/Expression.java:43-55,
    ExpressionIterator.java:67-165); here it is ``F.expr`` over the
    per-variable value columns — full + - * / % comparisons and ternaries.
  * The gexp sumSeries/diffSeries/multiplySeries/divideSeries functions are
    this same machinery with a UNION join and 'a + b [+ ...]' style scripts
    (src/query/expression/DiffSeries.java:60-75).

Spark shape: variables arrive as grouped frames (tag key cols + ts + value);
the join spine is distinct (tags, ts) of kept series — shuffles hash on the
same key throughout, and AQE picks broadcast sides automatically when one
variable is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentsdb_spark.model import FillPolicy


def _fill_col(p: FillPolicy):
    if p.policy == "zero":
        return F.lit(0.0)
    if p.policy == "nan":
        return F.lit(float("nan"))
    if p.policy == "null":
        return F.lit(None).cast("double")
    if p.policy == "scalar":
        return F.lit(float(p.value))
    raise ValueError(f"unknown fill policy: {p.policy!r}")


def series_join(
    variables: dict[str, DataFrame],
    join_tagks: tuple[str, ...],
    operator: str = "intersection",
    fill_policies: dict[str, FillPolicy] | None = None,
) -> DataFrame:
    """Join variable frames on (tag keys, ts).

    Each frame must have columns [*join_tagks, 'ts', 'value']. Returns a
    frame with [*join_tagks, 'ts', v_<id>...] — one value column per
    variable, filled per that variable's policy where absent.
    """
    if operator not in ("intersection", "union"):
        raise ValueError(f"join operator must be intersection|union, got {operator!r}")
    fills = fill_policies or {}
    keys = list(join_tagks)

    # Single chained FULL OUTER join on (tags, ts): the join result IS the
    # timestamp spine (every (series, ts) where any variable has a value).
    # Building explicit tag-set/spine frames instead would re-execute each
    # variable's sub-plan 3x (Spark does not share common subplans): measured
    # 21-25 shuffles vs ~6 for this shape on a two-variable expression.
    out = None
    vids = list(variables)
    for vid in vids:
        part = variables[vid].select(*keys, "ts", F.col("value").alias(f"v_{vid}"))
        out = part if out is None else out.join(part, on=[*keys, "ts"], how="full")

    if operator == "intersection" and keys:
        # keep series (tag sets) present in ALL variable result sets
        # (IntersectionIterator semantics) — presence flags via one window
        # over the already-partitioned join output
        from pyspark.sql import Window

        w = Window.partitionBy(*keys)
        flag = None
        for vid in vids:
            present = F.max(F.col(f"v_{vid}").isNotNull().cast("int")).over(w) == 1
            flag = present if flag is None else (flag & present)
        out = out.withColumn("__kept", flag).where(F.col("__kept")).drop("__kept")

    for vid in vids:
        pol = fills.get(vid)
        if pol is not None:
            out = out.withColumn(f"v_{vid}", F.coalesce(F.col(f"v_{vid}"), _fill_col(pol)))
    return out


def _ternary_to_if(s: str) -> str:
    """JEXL ``cond ? a : b`` -> Spark SQL ``IF(cond, a, b)`` (right-assoc,
    paren-aware — the reference evaluates JEXL scripts which allow ternaries,
    src/query/pojo/Expression.java:43-55)."""
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "?" and depth == 0:
            q, j, d2 = 1, i + 1, 0
            while j < len(s):
                c = s[j]
                if c == "(":
                    d2 += 1
                elif c == ")":
                    d2 -= 1
                elif c == "?" and d2 == 0:
                    q += 1
                elif c == ":" and d2 == 0:
                    q -= 1
                    if q == 0:
                        break
                j += 1
            cond, a, b = s[:i], s[i + 1:j], s[j + 1:]
            return f"IF({_ternary_to_if(cond)}, {_ternary_to_if(a)}, {_ternary_to_if(b)})"
    return s


def evaluate_expression(joined: DataFrame, expr: str, variables: tuple[str, ...]) -> DataFrame:
    """Evaluate an arithmetic expression string over the joined frame.

    ``expr`` references variables by id (e.g. ``"a + b / 1024"``); ids are
    rewritten to the ``v_<id>`` columns and handed to Catalyst via F.expr.
    """
    import re

    expr = _ternary_to_if(expr)
    rewritten = re.sub(
        r"\b([A-Za-z_][A-Za-z0-9_]*)\b",
        lambda m: f"v_{m.group(1)}" if m.group(1) in variables else m.group(1),
        expr,
    )
    # the reference evaluates JEXL (non-ANSI: x/0 -> Inf/NaN, not an error);
    # classic Spark SQL semantics are the closest match (x/0 -> NULL). The
    # conf is owned by session.py / sources.load_table — no mutation here.
    return joined.withColumn("value", F.expr(rewritten).cast("double"))
