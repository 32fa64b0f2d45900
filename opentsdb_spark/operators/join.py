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

    # Union + conditional-aggregation pivot on (tags, ts): one shuffle total,
    # independent of variable count. A chained FULL OUTER join (the previous
    # shape) re-shuffles per variable pair — the join output's key columns
    # are coalesce(a.k, b.k), which discards the child partitioning, so N
    # variables cost N-1 exchanges (measured 13 on a two-variable arithmetic
    # query end-to-end). Variable frames are grouped aggregates, so (tags,
    # ts) is unique per variable and max(when) is exactly "the value if
    # present". Grouping also aligns null tag values across variables, which
    # matches the reference's flattened-tag-string matching (two series both
    # missing a tag compare equal, IntersectionIterator.java:57-310) — SQL
    # join keys would treat them as distinct.
    vids = list(variables)
    if len(vids) == 1:
        out = variables[vids[0]].select(*keys, "ts", F.col("value").alias(f"v_{vids[0]}"))
    else:
        u = None
        for vid in vids:
            part = variables[vid].select(
                *keys, "ts", F.lit(vid).alias("__var"), "value"
            )
            u = part if u is None else u.unionByName(part)
        out = u.groupBy(*keys, "ts").agg(
            *[
                F.max(F.when(F.col("__var") == vid, F.col("value"))).alias(f"v_{vid}")
                for vid in vids
            ]
        )

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


# --- IEEE-754 division rewrite ----------------------------------------------
# The reference evaluates expressions with JEXL 2.1.1, whose floating-point
# path is plain Java double arithmetic (JexlArithmetic.divide/mod): x/0 yields
# +-Infinity, 0/0 and x%0 yield NaN. Spark SQL (ANSI off) and DuckDB both
# return NULL instead, so every binary `/` and `%` is rewritten into an
# explicit CASE that reproduces the Java semantics. The CASE text is plain
# ANSI SQL on purpose — catalog oracles embed the identical shape so both
# engines compute the same non-finite values. (Known edge: a -0.0 denominator
# produces +Inf here, -Inf in Java — Spark compares -0.0 = 0.0 as true and
# offers no sign-of-zero test; fill policies only ever produce +0.0.)

_TOKEN_RE = __import__("re").compile(
    r"\s*(\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?"
    r"|[A-Za-z_][A-Za-z0-9_]*"
    r"|\|\||&&|==|!=|>=|<=|[-+*/%(),<>!?:])"
)


def ieee_div_sql(x: str, y: str) -> str:
    """The shared Spark/DuckDB CASE for JEXL-style x / y (NULLs propagate)."""
    return (
        f"(CASE WHEN ({y}) = 0.0 AND (isnan({x}) OR ({x}) = 0.0) THEN CAST('NaN' AS DOUBLE)"
        f" WHEN ({y}) = 0.0 AND ({x}) > 0.0 THEN CAST('Infinity' AS DOUBLE)"
        f" WHEN ({y}) = 0.0 AND ({x}) < 0.0 THEN CAST('-Infinity' AS DOUBLE)"
        f" ELSE ({x}) / ({y}) END)"
    )


def ieee_mod_sql(x: str, y: str) -> str:
    """JEXL-style x % y: any x (finite or NaN) mod 0 is NaN, NULLs propagate."""
    return (
        f"(CASE WHEN ({y}) = 0.0 AND ({x}) IS NOT NULL THEN CAST('NaN' AS DOUBLE)"
        f" ELSE ({x}) % ({y}) END)"
    )


class _ExprParser:
    """Recursive-descent re-emitter for the JEXL expression grammar:
    ?: (right-assoc, lowest) || && == != < <= > >= + - * / % unary-!/-
    parens and ident(...) calls. Everything is emitted verbatim except
    binary / and % (IEEE CASE forms) and ?: (-> IF), so nested parenthesized
    ternaries work anywhere an operand can."""

    def __init__(self, s: str):
        self.toks = []
        pos = 0
        while pos < len(s):
            m = _TOKEN_RE.match(s, pos)
            if not m:
                if s[pos:].strip():
                    raise ValueError(f"untokenizable expression at {s[pos:]!r}")
                break
            self.toks.append(m.group(1))
            pos = m.end()
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def eat(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> str:
        out = self.ternary()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return out

    def ternary(self) -> str:
        cond = self.or_()
        if self.peek() != "?":
            return cond
        self.eat()
        t = self.ternary()
        if self.eat() != ":":
            raise ValueError("expected : in ternary")
        f = self.ternary()
        return f"IF({cond}, {t}, {f})"

    def or_(self) -> str:
        left = self.and_()
        while self.peek() == "||":
            self.eat()
            left = f"({left} OR {self.and_()})"
        return left

    def and_(self) -> str:
        left = self.eq()
        while self.peek() == "&&":
            self.eat()
            left = f"({left} AND {self.eq()})"
        return left

    def eq(self) -> str:
        left = self.cmp()
        while self.peek() in ("==", "!="):
            op = "=" if self.eat() == "==" else "!="
            left = f"({left} {op} {self.cmp()})"
        return left

    def cmp(self) -> str:
        left = self.add()
        while self.peek() in ("<", "<=", ">", ">="):
            op = self.eat()
            left = f"({left} {op} {self.add()})"
        return left

    def add(self) -> str:
        left = self.mul()
        while self.peek() in ("+", "-"):
            op = self.eat()
            left = f"({left} {op} {self.mul()})"
        return left

    def mul(self) -> str:
        left = self.unary()
        while self.peek() in ("*", "/", "%"):
            op = self.eat()
            right = self.unary()
            if op == "/":
                left = ieee_div_sql(left, right)
            elif op == "%":
                left = ieee_mod_sql(left, right)
            else:
                left = f"({left} * {right})"
        return left

    def unary(self) -> str:
        if self.peek() == "-":
            self.eat()
            return f"(- {self.unary()})"
        if self.peek() == "!":
            self.eat()
            return f"(NOT {self.unary()})"
        return self.primary()

    def primary(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of expression")
        if t == "(":
            self.eat()
            inner = self.ternary()
            if self.eat() != ")":
                raise ValueError("expected )")
            return f"({inner})"
        self.eat()
        if t[0].isalpha() or t[0] == "_":
            if self.peek() == "(":  # function call, e.g. IF(c, a, b)
                self.eat()
                args = []
                if self.peek() != ")":
                    args.append(self.ternary())
                    while self.peek() == ",":
                        self.eat()
                        args.append(self.ternary())
                if self.eat() != ")":
                    raise ValueError("expected ) after args")
                return f"{t}({', '.join(args)})"
            return t
        if "." in t or "e" in t or "E" in t:
            # float-looking literal: JEXL arithmetic is double arithmetic,
            # but Spark SQL parses `1.0` as DECIMAL(2,1) and decimal/decimal
            # division truncates to the result scale (1.0 / -3.5 ->
            # -0.285714). CAST keeps the whole expression in doubles; bare
            # int literals stay as-is (int `/` already yields double).
            return f"CAST({t} AS DOUBLE)"
        return t  # integer literal


def rewrite_ieee_arithmetic(expr: str) -> str:
    """Rewrite / and % to the JEXL double semantics; on any parse surprise
    fall back to the untouched expression (NULL-on-zero Spark semantics)."""
    try:
        return _ExprParser(expr).parse()
    except ValueError:
        return expr


def evaluate_expression(joined: DataFrame, expr: str, variables: tuple[str, ...]) -> DataFrame:
    """Evaluate an arithmetic expression string over the joined frame.

    ``expr`` references variables by id (e.g. ``"a + b / 1024"``); ids are
    rewritten to the ``v_<id>`` columns, division/modulo take JEXL's IEEE
    double semantics (see rewrite_ieee_arithmetic), and the result is handed
    to Catalyst via F.expr — whole-stage codegen, no Python in the loop.
    """
    import re

    expr = _ternary_to_if(expr)
    rewritten = re.sub(
        r"\b([A-Za-z_][A-Za-z0-9_]*)\b",
        lambda m: f"v_{m.group(1)}" if m.group(1) in variables else m.group(1),
        expr,
    )
    rewritten = rewrite_ieee_arithmetic(rewritten)
    return joined.withColumn("value", F.expr(rewritten).cast("double"))
