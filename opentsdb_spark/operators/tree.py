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
    """One rule (reference src/tree/TreeRule.java). Types mirror the
    reference's enum (TreeRule.java:45-55): METRIC, TAGK, and the _CUSTOM
    variants reading a custom-map value; ``regex`` extracts group
    ``regex_group_idx`` from the source value (TreeRule.java:60-75 +
    TreeBuilder.parseRegexRule), ``separator`` splits into multiple path
    levels, ``display_format`` rewrites the level text with {value}
    substitution (TreeRule.java display_format handling)."""

    type: str  # 'METRIC' | 'TAGK' | 'METRIC_CUSTOM' | 'TAGK_CUSTOM' | 'TAGV_CUSTOM'
    field: str = ""  # tag key for TAGK*, custom-map key for *_CUSTOM
    separator: str | None = None
    regex: str | None = None
    regex_group_idx: int = 1
    display_format: str | None = None


def _rule_source(rule: TreeRule):
    if rule.type == "METRIC":
        return F.col("metric")
    if rule.type == "TAGK":
        return F.col("tags").getItem(rule.field)
    if rule.type in ("METRIC_CUSTOM", "TAGK_CUSTOM", "TAGV_CUSTOM"):
        # custom maps live on UIDMeta in the reference; here the optional
        # ``custom`` map column carries them (null when absent)
        return F.col("custom").getItem(rule.field)
    raise ValueError(f"unknown tree rule type {rule.type!r}")


def _rule_levels(rule: TreeRule):
    src = _rule_source(rule)
    if rule.regex:
        # empty extraction = no match = rule skipped (TreeBuilder.java
        # processRegexRule: null/absent group -> not matched)
        src = F.nullif(F.regexp_extract(src, rule.regex, rule.regex_group_idx), F.lit(""))
    if rule.display_format:
        # '{value}' substitution; null (no-match) sources stay null
        src = F.when(
            src.isNotNull(),
            F.replace(F.lit(rule.display_format), F.lit("{value}"), src),
        )
    if rule.separator:
        import re

        return F.split(src, re.escape(rule.separator), -1)  # split() takes a regex
    return F.array(src)


def _distinct_series(points: DataFrame) -> DataFrame:
    """Collapse the point frame to one row per distinct series —
    (series_id, metric, tags[, custom]) — without building the series_id
    STRING per point. Round-13 autopsy pinned the per-point string build
    (map_entries -> per-entry concat -> string array_sort -> array_join ->
    concat) as tree_collisions' dominant cost, linear in the scan; the
    collapse now groups by the EXACT metric column plus a 256-bit salted
    xxhash64 fingerprint of the sorted tag-entry array (four independent
    64-bit hashes — all codegen, no string allocation), and the readable
    series_id string is built on the collapsed ~#series rows only.
    Identity standard: a silent series merge needs two distinct tag maps
    (same metric) to collide on all four salted hashes at once — the same
    256-bit negligible-collision bar exact_dedup's sha2(content) grouping
    already sets for document identity. (Round-13 had rejected grouping on
    ONE 64-bit hash as trading exactness, and on the raw sorted-entries
    array as 1.6x slower — the interpreted complex-type grouping path;
    four longs keep the aggregate in codegen. Round-14 A/B at 30x:
    4.3-4.8 s -> 2.3-2.6 s on tree_collisions, outputs checksum-equal.)"""
    cols = points.columns
    extra = ["custom"] if "custom" in cols else []
    ent = F.array_sort(F.map_entries(F.col("tags")))
    pts = points.select("metric", "tags", *extra, ent.alias("__e"))
    series = (
        pts.groupBy(
            "metric",
            *[F.xxhash64(F.lit(i), "__e").alias(f"__k{i}") for i in range(4)],
        )
        .agg(F.first("tags").alias("tags"),
             *([F.first("custom").alias("custom")] if extra else []))
        .withColumn("series_id", series_id_col())
        .select("series_id", "metric", "tags", *extra)
    )
    if not extra:
        series = series.withColumn(
            "custom", F.lit(None).cast("map<string,string>")
        )
    return series


def build_tree(
    points: DataFrame, rules: tuple[TreeRule, ...], strict_match: bool = False
) -> DataFrame:
    """Run every distinct series through the ORDERED rule list.

    Returns leaves: (series_id, path array<string>, depth). Series for which
    a rule extracts nothing (missing tag / regex miss) drop that level
    (reference TreeBuilder skips no-match rules); with ``strict_match`` the
    whole series is excluded instead (Tree.java strict_match flag)."""
    series = _distinct_series(points)
    path = None
    matched_all = F.lit(True)
    for rule in rules:
        raw = _rule_levels(rule)
        lv = F.filter(raw, lambda x: x.isNotNull() & (x != ""))
        lv = F.coalesce(lv, F.array())  # null source -> no levels
        matched_all = matched_all & (F.size(lv) > 0)
        path = lv if path is None else F.concat(path, lv)
    if path is None:
        raise ValueError("tree needs at least one rule")
    out = series.select(
        "series_id", path.alias("path"), F.size(path).alias("depth"),
        matched_all.alias("__all"),
    )
    if strict_match:
        out = out.where(F.col("__all"))
    return out.drop("__all")


def build_tree_state(
    points: DataFrame,
    rules: tuple[TreeRule, ...],
    strict_match: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full tree build with failure bookkeeping: returns
    (leaves, collisions, not_matched) — the three row families the
    reference persists per tree (src/tree/Tree.java:60-68: branch rows +
    a collisions row + a not-matched row; TreeBuilder.java:200-230 records
    them while processing each TSMeta).

      collisions   two series mapping to the SAME full path keep only one
                   leaf (reference: first writer wins, Tree.java:274-281;
                   here the tie-break is deterministic — smallest series_id)
                   -> (series_id, existing_series_id, branch_path)
      not_matched  series a rule extracted nothing from, with the rule list
                   that missed (TreeBuilder.java:645-650 accumulates the
                   failed rules into the reason string)
                   -> (series_id, reason)
    """
    series = _distinct_series(points)
    path = None
    miss_reasons = []
    for i, rule in enumerate(rules):
        raw = _rule_levels(rule)
        lv = F.coalesce(F.filter(raw, lambda x: x.isNotNull() & (x != "")), F.array())
        tag = f"{rule.type}:{rule.field}" if rule.field else rule.type
        miss_reasons.append(F.when(F.size(lv) == 0, F.lit(f"{i}:{tag}")))
        path = lv if path is None else F.concat(path, lv)
    if path is None:
        raise ValueError("tree needs at least one rule")
    st = series.select(
        "series_id", path.alias("path"), F.size(path).alias("depth"),
        F.filter(F.array(*miss_reasons), lambda x: x.isNotNull()).alias("__missed"),
    )
    not_matched = st.where(F.size("__missed") > 0).select(
        "series_id", F.array_join("__missed", " ").alias("reason")
    )
    leaves = st.where(F.col("depth") > 0)
    if strict_match:
        leaves = leaves.where(F.size("__missed") == 0)
    leaves = leaves.drop("__missed")
    keep = leaves.groupBy("path").agg(F.min("series_id").alias("__keep"))
    with_keep = leaves.join(keep, on="path")
    collisions = (
        with_keep.where(F.col("series_id") != F.col("__keep"))
        .select(
            "series_id", F.col("__keep").alias("existing_series_id"),
            F.array_join("path", "/").alias("branch_path"),
        )
    )
    kept_leaves = with_keep.where(F.col("series_id") == F.col("__keep")).drop("__keep")
    return kept_leaves, collisions, not_matched


@dataclass
class TreeDef:
    """A stored tree (reference src/tree/Tree.java:73-130: treeId, name,
    description, notes, strictMatch, enabled, storeFailures + the ordered
    rule set from src/tree/TreeRule.java)."""

    tree_id: int
    name: str = ""
    description: str = ""
    notes: str = ""
    strict_match: bool = False
    enabled: bool = True
    store_failures: bool = False
    rules: tuple[TreeRule, ...] = ()
    created: int = 0


class TreeStore:
    """Persistent tree state: definitions + the three built row families
    per tree, the engine-side analog of the reference's tree storage
    (Tree.java TREE_FAMILY branch rows, collision row, not-matched row;
    maintained by src/tree/TreeBuilder.java). Built frames stay lazy — a
    production deployment checkpoints them to tables exactly like the
    search-plugin index frames."""

    def __init__(self) -> None:
        self.trees: dict[int, TreeDef] = {}
        self._built: dict[int, dict[str, DataFrame]] = {}
        self._next_id = 1

    def create(self, tree: TreeDef) -> TreeDef:
        if tree.tree_id == 0:
            tree = TreeDef(**{**tree.__dict__, "tree_id": self._next_id})
        if tree.tree_id in self.trees:
            raise ValueError(f"tree {tree.tree_id} already exists")
        self._next_id = max(self._next_id, tree.tree_id) + 1
        self.trees[tree.tree_id] = tree
        return tree

    def edit(self, tree_id: int, **updates) -> TreeDef:
        cur = self.trees[tree_id]
        self.trees[tree_id] = TreeDef(**{**cur.__dict__, **updates})
        return self.trees[tree_id]

    def delete(self, tree_id: int) -> None:
        # reference: deleting a tree wipes branches/collisions/not-matched
        # (Tree.java deleteTree definition flag)
        self.trees.pop(tree_id)
        self._built.pop(tree_id, None)

    def rebuild(self, tree_id: int, points: DataFrame) -> dict[str, DataFrame]:
        """Run every series through the tree's rules and persist the result
        frames (the reference's TreeSync/TreeBuilder full-sweep)."""
        t = self.trees[tree_id]
        leaves, collisions, not_matched = build_tree_state(
            points, t.rules, strict_match=t.strict_match
        )
        state = {"leaves": leaves}
        if t.store_failures:
            state["collisions"] = collisions
            state["not_matched"] = not_matched
        self._built[tree_id] = state
        return state

    def built(self, tree_id: int, family: str) -> DataFrame:
        if tree_id not in self.trees:
            raise KeyError(f"no such tree {tree_id}")
        state = self._built.get(tree_id)
        if state is None:
            raise ValueError(f"tree {tree_id} has not been built")
        if family not in state:
            raise ValueError(
                f"tree {tree_id} does not store {family} "
                "(storeFailures disabled)" if family != "leaves" else family
            )
        return state[family]


def tree_branches(leaves: DataFrame) -> DataFrame:
    """All branches: every prefix of every leaf path INCLUDING the full
    rule-derived path, with leaf counts. The full path is deliberately a
    branch row — in the reference a leaf hangs OFF the branch named by all
    rule segments (the leaf itself adds only its display name /tsuid,
    src/tree/Branch.java), so 'event_type/user' is the terminal branch
    holding the leaves, not the leaf (the tree_branches oracle pins both
    depth levels)."""
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


def tree_branch(leaves: DataFrame, path: tuple[str, ...]) -> dict:
    """Navigate to ONE branch (reference TreeRpc 'branch' endpoint /
    src/tree/Branch.java): returns its direct child branches and the leaves
    sitting exactly at this depth+1.

    Driver-side result is bounded by the branch's fan-out, not the corpus."""
    d = len(path)
    at = leaves
    for i, seg in enumerate(path):
        at = at.where(F.element_at("path", i + 1) == seg)
    children = (
        at.where(F.col("depth") > d + 1)
        .select(F.element_at("path", d + 1).alias("branch"))
        .groupBy("branch").agg(F.count("*").alias("leaf_count"))
        .orderBy("branch")
    )
    leaf_rows = (
        at.where(F.col("depth") == d + 1)
        .select("series_id", F.element_at("path", d + 1).alias("leaf"))
        .orderBy("leaf", "series_id")
    )
    return {
        "path": list(path),
        "branches": [r.asDict() for r in children.collect()],
        "leaves": [r.asDict() for r in leaf_rows.collect()],
    }


# --------------------------------------------------------------- tree sync
# Disk-backed tree storage driven by the `uid treesync` / `uid treepurge`
# CLI (reference src/tools/UidManager.java:220-245 dispatching to
# src/tools/TreeSync.java). Layout under one directory:
#   <dir>/trees.json            tree definitions incl. rules
#   <dir>/tree_<id>/<family>/   parquet per built row family
# The reference stores both in the UID table; a directory of parquet
# tables is the columnar analog.

TREE_FAMILIES = ("leaves", "collisions", "not_matched")


def save_tree_defs(store: TreeStore, dir_path: str) -> None:
    import json
    import os

    import threading

    os.makedirs(dir_path, exist_ok=True)
    defs = [
        {**{k: v for k, v in t.__dict__.items() if k != "rules"},
         "rules": [r.__dict__ for r in t.rules]}
        for t in store.trees.values()
    ]
    # pid+thread-unique tmp: concurrent writers on a shared tmp name
    # interleave and the atomic replace publishes corrupt JSON
    tmp = os.path.join(
        dir_path, f".trees.json.tmp{os.getpid()}.{threading.get_ident()}")
    with open(tmp, "w") as fh:
        json.dump(defs, fh, indent=1)
    os.replace(tmp, os.path.join(dir_path, "trees.json"))


def load_tree_defs(dir_path: str) -> TreeStore:
    import json
    import os

    store = TreeStore()
    p = os.path.join(dir_path, "trees.json")
    if os.path.exists(p):
        with open(p) as fh:
            for d in json.load(fh):
                rules = tuple(TreeRule(**r) for r in d.pop("rules", ()))
                store.create(TreeDef(rules=rules, **d))
    return store


def treesync(store: TreeStore, points: DataFrame, dir_path: str) -> dict:
    """Run every series through every ENABLED tree's rules and write the
    built row families to disk (TreeSync.java's full sweep; disabled trees
    are skipped exactly like TreeBuilder refuses them). Returns per-tree
    family row counts. Each tree's sweep is one distinct-series scan —
    at scale the series frame, not the point data, bounds the work."""
    import os
    import shutil

    report: dict[int, dict[str, int]] = {}
    for tid, t in sorted(store.trees.items()):
        built_dir = os.path.join(dir_path, f"tree_{tid}")
        if not t.enabled:
            # stale state never survives a sweep: a tree toggled to disabled
            # (or one whose store_failures was switched off) must not keep
            # serving last sync's families next to fresh leaves
            if os.path.isdir(built_dir):
                shutil.rmtree(built_dir)
            continue
        # build into a temp sibling and swap in only after EVERY family
        # wrote successfully — destroying the previous build first left a
        # no-families window (and nothing at all on a failed rebuild) for
        # any concurrently-serving TSD sharing --trees-dir; same
        # tmp+replace discipline as save_tree_defs' trees.json
        tmp_dir = os.path.join(dir_path, f".tree_{tid}.building")
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        state = store.rebuild(tid, points)
        counts = {}
        for family, df in state.items():
            out = os.path.join(tmp_dir, family)
            df.write.mode("overwrite").parquet(out)
            counts[family] = df.sparkSession.read.parquet(out).count()
        old_dir = os.path.join(dir_path, f".tree_{tid}.old")
        if os.path.isdir(old_dir):
            shutil.rmtree(old_dir)
        if os.path.isdir(built_dir):
            os.rename(built_dir, old_dir)
        os.rename(tmp_dir, built_dir)
        if os.path.isdir(old_dir):
            shutil.rmtree(old_dir)
        report[tid] = counts
    return report


def treepurge(dir_path: str, tree_id: int, delete_definition: bool = False,
              store: TreeStore | None = None) -> TreeStore:
    """Remove a tree's built families from disk, optionally the definition
    too (UidManager treepurge <id> [true] -> TreeSync.purgeTree)."""
    import os
    import shutil

    built = os.path.join(dir_path, f"tree_{tree_id}")
    if os.path.isdir(built):
        shutil.rmtree(built)
    store = store if store is not None else load_tree_defs(dir_path)
    if delete_definition and tree_id in store.trees:
        store.delete(tree_id)
        save_tree_defs(store, dir_path)
    return store
