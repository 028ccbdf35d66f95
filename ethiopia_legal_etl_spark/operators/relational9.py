"""Wave 9: cogrouped-map as-of join (the last un-exercised pandas API
flavor), df.stat crosstab, null-safe equality join, and schema-evolution
union-by-name.

Reference parity: none of these exist in the reference (SURVEY.md §2.A
"explicitly absent") — they are Layer-B engine surface:
- `asof_merge_cogrouped` re-expresses relational.asof_error_prev_purchase
  through ``df.groupby().cogroup().applyInPandas`` + ``pd.merge_asof``,
  the canonical cogrouped-map use case. The JVM window variant stays the
  recommended path (no Python boundary); this one proves the cogroup
  plumbing against the SAME DuckDB ASOF oracle family and extends it to
  LEFT semantics (errors with no prior purchase survive with a null).
- `crosstab_returnflag_linestatus` covers the ``df.stat`` contingency-
  table surface (crosstab pivots col2's values into columns).
- `join_nullsafe_eq` covers ``eqNullSafe`` (<=>): NULL keys match NULL
  keys, the IS NOT DISTINCT FROM join DuckDB spells natively. Plain
  equi-joins silently drop NULL-keyed rows — entity-resolution flows
  that bucket on a derived nullable key need this operator.
- `union_by_name_evolution` covers ``unionByName(allowMissingColumns)``:
  v1 files lack a column that v2 files added; the union fills NULL, the
  lakehouse schema-evolution read path (DuckDB: UNION ALL BY NAME).

NOTE: no ``from __future__ import annotations`` here — cogrouped
applyInPandas callables are cloudpickled and string type hints break
resolution (same rule as the pandas_udf modules).
"""

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.functions.measures import (
    EVENTS_FINITE_SQL,
    clean_measures,
)
from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.sources.tables import load_table

_ASOF_SCHEMA = "event_id long, user_id long, prev_purchase_id long"


def _merge_asof_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Per-user merge_asof: for each error, the latest purchase at or
    before it (backward direction, exact matches allowed = ts >= p_ts).
    Keys only on the right (purchases, no errors) emit nothing."""
    if left.empty:
        return pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "prev_purchase_id": pd.Series(dtype="Int64"),
            }
        )
    left = left.sort_values("ts", kind="mergesort")
    if right.empty:
        out = left[["event_id", "user_id"]].copy()
        out["prev_purchase_id"] = pd.array([None] * len(out), dtype="Int64")
        return out
    right = right[["p_ts", "p_event_id"]].sort_values("p_ts", kind="mergesort")
    merged = pd.merge_asof(
        left, right, left_on="ts", right_on="p_ts", direction="backward"
    )
    return pd.DataFrame(
        {
            "event_id": merged["event_id"],
            "user_id": merged["user_id"],
            "prev_purchase_id": merged["p_event_id"].astype("Int64"),
        }
    )


@register(
    "asof_merge_cogrouped",
    oracle="""
    WITH err AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'error'),
         pur AS (
           SELECT user_id, ts, MAX(event_id) AS p_event_id
           FROM events WHERE event_type = 'purchase'
           GROUP BY user_id, ts
         )
    SELECT e.event_id, e.user_id, p.p_event_id AS prev_purchase_id
    FROM err e ASOF LEFT JOIN pur p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    doc="LEFT as-of join via cogrouped applyInPandas + pd.merge_asof: "
    "both sides shuffle ONCE on the user_id cogroup key, then each "
    "user's (errors, purchases) frame pair merges in a single Arrow "
    "batch — the pandas-native spelling of the as-of. The JVM "
    "range-join+window variant (asof_error_prev_purchase) is the fast "
    "path; this entry proves the cogroup plumbing and the LEFT "
    "semantics (no prior purchase -> null). Scale: per-group work is "
    "O(|err|+|pur|) after an in-memory sort; skewed users bound the "
    "batch — for a pathological single-user dataset prefer the window "
    "variant, which AQE skew-splits.",
)
def asof_merge_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    err = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .select("event_id", "ts", "user_id")
    )
    # Separate scan + p_-prefixed names for the purchase side: a
    # self-cogroup whose two sides share leaf attributes (same exprIds
    # for ts/user_id) can lose the shared columns from the right Arrow
    # batch after analyzer dedup — independent lineage and disjoint
    # names make the cogroup schema unambiguous in every session.
    # dedup purchases on (user, ts) so the as-of pick is deterministic
    pur = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_event_id"))
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
            "p_event_id",
        )
    )
    return (
        err.groupby("user_id")
        .cogroup(pur.groupby("p_user_id"))
        .applyInPandas(_merge_asof_group, schema=_ASOF_SCHEMA)
    )


@register(
    "crosstab_returnflag_linestatus",
    oracle="""
    SELECT l_returnflag AS flag,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS cnt_F,
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS cnt_O
    FROM lineitem
    WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
    GROUP BY 1
    """,
    doc="df.stat.crosstab contingency table: returnflag x linestatus "
    "counts, linestatus values pivoted into columns. NULLs excluded on "
    "both sides up front — crosstab would stringify them into a "
    "literal 'null' bucket, which is a display artifact, not a key. "
    "Scale: one partial-aggregated shuffle on the pair (same plan "
    "family as pivot_status_by_priority); the column set is the col2 "
    "domain, so crosstab is only for low-cardinality pairs — "
    "high-cardinality contingency stays in groupBy form.",
)
def crosstab_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isNotNull() & F.col("l_linestatus").isNotNull()
    )
    ct = li.stat.crosstab("l_returnflag", "l_linestatus")
    cols = set(ct.columns)
    out = ct.select(
        F.col("l_returnflag_l_linestatus").alias("flag"),
        *[
            (F.col(status) if status in cols else F.lit(0).cast("long")).alias(
                f"cnt_{status}"
            )
            for status in ("F", "O")
        ],
    )
    return out


@register(
    "join_nullsafe_eq",
    oracle=f"""
    WITH graded AS (
      SELECT event_type,
             CASE WHEN value >= 100 THEN 'high'
                  WHEN value >= 50 THEN 'mid' END AS grade
      FROM {EVENTS_FINITE_SQL}
    ),
    a AS (SELECT grade, COUNT(*) AS purchase_cnt FROM graded
          WHERE event_type = 'purchase' GROUP BY grade),
    b AS (SELECT grade, COUNT(*) AS click_cnt FROM graded
          WHERE event_type = 'click' GROUP BY grade)
    SELECT a.grade, a.purchase_cnt, b.click_cnt
    FROM a JOIN b ON a.grade IS NOT DISTINCT FROM b.grade
    """,
    doc="null-safe equality join (eqNullSafe / <=>): purchase vs click "
    "counts per derived value grade (sub-50 values grade to NULL = "
    "unknown), where the NULL grade is a first-class key that matches "
    "itself — a plain equi-join would silently drop it. DuckDB spells "
    "it IS NOT DISTINCT FROM. Scale: "
    "both sides are post-aggregate (|grades| rows), so the join is a "
    "broadcast; on large sides <=> hashes NULL like any value, no "
    "skew surprise beyond an actual NULL hot key (salt if so). "
    "Measure hygiene (r11, the proportion_wilson_ci class): a NaN/Inf "
    "reading passes `value >= 100` on BOTH engines (non-finite sorts "
    "greatest) and would silently grade 'high' — clean_measures maps "
    "it to NULL, i.e. the 'unknown' grade, which is exactly what a "
    "failed reading is (and the NULL-grade key is this entry's whole "
    "point).",
)
def join_nullsafe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = clean_measures(load_table(spark, sf_dir, "events"), "value")
    grade = (
        F.when(F.col("value") >= 100, "high")
        .when(F.col("value") >= 50, "mid")
        .otherwise(F.lit(None).cast("string"))
    )
    a = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(grade.alias("grade"))
        .agg(F.count(F.lit(1)).alias("purchase_cnt"))
    )
    b = (
        ev.where(F.col("event_type") == "click")
        .groupBy(grade.alias("b_grade"))
        .agg(F.count(F.lit(1)).alias("click_cnt"))
    )
    return (
        a.join(b, a.grade.eqNullSafe(b.b_grade), "inner")
        .select("grade", "purchase_cnt", "click_cnt")
    )


@register(
    "union_by_name_evolution",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders WHERE o_custkey < 100
    UNION ALL BY NAME
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price,
           o_orderpriority AS priority
    FROM orders WHERE o_custkey >= 100 AND o_custkey < 200
    """,
    doc="schema-evolution union: v1 rows lack the priority column v2 "
    "added; unionByName(allowMissingColumns=True) aligns by NAME and "
    "fills the missing column with NULL (DuckDB: UNION ALL BY NAME). "
    "Positional union would silently misalign. This is the read path "
    "for a dataset whose later files gained columns — the batch twin "
    "of the parquet mergeSchema test in test_sources.py. Scale: pure "
    "narrow concat, zero shuffle.",
)
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.where(F.col("o_custkey") < 100).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("total_price")
    )
    v2 = orders.where(
        (F.col("o_custkey") >= 100) & (F.col("o_custkey") < 200)
    ).select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total_price"),
        F.col("o_orderpriority").alias("priority"),
    )
    return v1.unionByName(v2, allowMissingColumns=True)
