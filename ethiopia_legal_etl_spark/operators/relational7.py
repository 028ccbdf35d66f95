"""Wave 7: time-series gap-fill (LOCF), linear-regression aggregates,
fuzzy string matching, median/boolean aggregates, stratified sampling,
and count-min-sketch heavy hitters.

Reference parity: the reference computes none of these (SURVEY.md §2.A
"explicitly absent" list) — they are Layer-B engine surface, the
operations a training-data / observability pipeline needs at scale:
gap-fill is the hypertable-interpolation twin of `hypertable_rollup`;
the CMS heavy-hitter path is the frequency analog of the mergeable-HLL
pattern in relational6.sketch_hll_daily_users.

Float policy per registry docstring: exact decimal sums cast to double;
regression outputs rounded (slope/intercept 4dp — magnitudes ~1e2-1e4
with cross-engine accumulation-order error ~1e-9 — r² 6dp, bounded
[0,1]) with `+ 0` canonicalizing IEEE -0.0.
"""

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethiopia_legal_etl_spark.operators.registry import register
from ethiopia_legal_etl_spark.functions.measures import EVENTS_FINITE_SQL, clean_measures
from ethiopia_legal_etl_spark.sources.tables import load_table


@register(
    "timeseries_gapfill_locf",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(14,2))) AS day_value
      FROM {EVENTS_FINITE_SQL} WHERE user_id < 20 AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    spine AS (
      SELECT u.user_id,
             CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT DISTINCT user_id FROM daily) u CROSS JOIN bounds b
    )
    SELECT s.user_id, s.day,
           CAST(last_value(d.day_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS locf_value
    FROM spine s
    LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
    doc="time-series gap-fill: missing days filled by last observation "
    "carried forward, the TimescaleDB locf()/time_bucket_gapfill shape "
    "(oracle spells it the textbook way: dense spine LEFT JOIN + "
    "last_value IGNORE NULLS). The Spark plan is join-free segment "
    "explosion instead: lead(day) finds each observation's successor "
    "and ONE explode expands, per observation, the (day,value) struct "
    "run [day, next-1] — the LOCF fill IS the segment — prefixed for "
    "each user's first row (rn=1) by a null-valued head run from the "
    "global lo bound, so no spine join and no second pass. ONE "
    "exchange on the event data: repartition(user_id) feeds both the "
    "(user_id, day) aggregate (hash(user_id) clusters every (user_id, "
    "day) group) and the lead/row_number window; bounds are a 1-row "
    "broadcast agg straight off the scan. The naive spine-join plan "
    "costs 5 exchanges including a |users×days| join — measured, then "
    "replaced (same oracle hash).",
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # null-valued events are NOT observations: the oracle's IGNORE
    # NULLS skips them, so a day whose values are all null must be a
    # GAP (filled from the previous day), not an observed null
    ev = clean_measures(
        # raw-column null prefilter keeps IsNotNull(value) PUSHED to
        # the scan (the entry drops null measures anyway); the
        # cleaned non-finites become NULL and fall to the same filter
        load_table(spark, sf_dir, "events").where(
            F.col("value").isNotNull()
        ),
        "value",
    ).where(
        (F.col("user_id") < 20) & F.col("value").isNotNull()
    )
    day_expr = F.to_date(F.date_trunc("day", "ts"))
    bounds = ev.agg(
        F.min(day_expr).alias("lo"), F.max(day_expr).alias("hi")
    )
    daily = (
        ev.repartition("user_id")
        .groupBy("user_id", day_expr.alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(14,2)")).alias("day_value"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    segs = daily.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "day",
        "day_value",
        "lo",
        "hi",
        F.lead("day").over(w).alias("day_next"),
        F.row_number().over(w).alias("rn"),
    )
    run = F.expr(
        """
        concat(
          CASE WHEN rn = 1 AND day > lo
               THEN transform(sequence(lo, date_sub(day, 1), interval 1 day),
                              d -> struct(d AS day,
                                          CAST(NULL AS DECIMAL(24,2)) AS v))
               ELSE array() END,
          transform(sequence(day, coalesce(date_sub(day_next, 1), hi),
                             interval 1 day),
                    d -> struct(d AS day, day_value AS v)))
        """
    )
    return segs.select("user_id", F.explode(run).alias("s")).select(
        "user_id",
        F.col("s.day").alias("day"),
        F.col("s.v").cast("double").alias("locf_value"),
    )


@register(
    "regr_quantity_price",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) + 0 AS price_qty_slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) + 0
             AS price_qty_intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) + 0 AS price_qty_r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="linear-regression aggregates (OLS slope/intercept/R² of "
    "extendedprice on quantity per return flag) — single-pass "
    "distributed moments, no ML library. Map-side partial aggregation "
    "applies as with any declarative agg; one shuffle on the group key.",
)
def regr_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        (F.round(F.regr_slope(y, x), 4) + F.lit(0.0)).alias("price_qty_slope"),
        (F.round(F.regr_intercept(y, x), 4) + F.lit(0.0)).alias(
            "price_qty_intercept"
        ),
        (F.round(F.regr_r2(y, x), 6) + F.lit(0.0)).alias("price_qty_r2"),
        F.regr_count(y, x).alias("n_pairs"),
    )


@register(
    "median_bool_flags",
    oracle="""
    SELECT l_linestatus,
           median(l_quantity) AS median_qty,
           bool_and(l_discount <= 0.1) AS all_low_discount,
           bool_or(l_tax > 0.07) AS any_high_tax,
           CAST(count_if(l_returnflag = 'R') AS BIGINT) AS n_returned
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="exact median + boolean/conditional aggregates. median on a "
    "DOUBLE column interpolates the middle pair in BOTH engines (DuckDB "
    "median = quantile_cont(0.5) on floats; discrete on DECIMAL — the "
    "column being double is load-bearing for parity).",
)
def median_bool_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.median("l_quantity").alias("median_qty"),
        F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_discount"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
    )


@register(
    "fuzzy_pairs_levenshtein",
    oracle="""
    SELECT s1.s_suppkey AS k1, s2.s_suppkey AS k2,
           levenshtein(s1.s_name, s2.s_name) AS edit_dist
    FROM supplier s1 JOIN supplier s2
      ON s1.s_suppkey < s2.s_suppkey
     AND abs(length(s1.s_name) - length(s2.s_name)) <= 1
     AND levenshtein(s1.s_name, s2.s_name) <= 1
    """,
    doc="fuzzy self-match: supplier-name pairs within edit distance 1 "
    "(entity-resolution blocking shape). Non-equi predicate -> "
    "broadcast-nested-loop join; the cheap length-difference guard "
    "short-circuits before the O(nm) Levenshtein DP on each pair. At "
    "scale you'd block first (length bucket / first-k-chars / MinHash "
    "as in dedup.py) so the BNLJ only sees candidate pairs; this query "
    "documents the verify step of that pipeline.",
)
def fuzzy_pairs_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    s1 = sup.select(F.col("s_suppkey").alias("k1"), F.col("s_name").alias("n1"))
    s2 = sup.select(F.col("s_suppkey").alias("k2"), F.col("s_name").alias("n2"))
    return (
        s1.join(
            F.broadcast(s2),
            (F.col("k1") < F.col("k2"))
            & (F.abs(F.length("n1") - F.length("n2")) <= 1)
            & (F.levenshtein("n1", "n2") <= 1),
        )
        .select("k1", "k2", F.levenshtein("n1", "n2").alias("edit_dist"))
    )


@register(
    "stratified_sample_orders",
    oracle=None,  # seeded Bernoulli draws are engine-specific -> rows-only
    doc="stratified sampling: df.sampleBy draws a different Bernoulli "
    "fraction per o_orderstatus stratum (seeded, deterministic for a "
    "fixed input layout), then counts per stratum. The train/eval-split "
    "and class-rebalancing primitive; property test bounds each "
    "stratum's count by binomial tails (tests/test_relational7.py)."
    " Rows-only verdict (r12): NOT convertible — sampleBy membership "
    "rides the same engine RNG stream as sample_lineitem_fraction. "
    "Ground truth: per-stratum binomial-tail bounds "
    "(tests/test_relational7.py).",
)
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    sampled = orders.sampleBy(
        "o_orderstatus", fractions={"O": 0.1, "F": 0.2, "P": 0.5}, seed=7
    )
    return sampled.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_sampled"))


@register(
    "heavy_hitters_cms",
    oracle=None,  # sketch estimates are engine-specific -> rows-only
    doc="count-min-sketch heavy hitters: a single distributed "
    "count_min_sketch aggregate (eps=1e-3, conf=0.99 -> w=2719, d=5, "
    "~53 KB regardless of input size) builds a mergeable frequency "
    "sketch of event_type; the driver deserializes the sketch "
    "(org.apache.spark.util.sketch.CountMinSketch) and reports the "
    "estimate for each distinct type. Same incremental-analytics story "
    "as sketch_hll_daily_users: per-partition sketches merge "
    "associatively, so 100 TB of events reduces to kilobytes before "
    "any frequency question is asked. CMS guarantees est >= true and "
    "est <= true + eps*N w.p. conf (property-tested)."
    " Rows-only verdict (r12): NOT convertible — "
    "org.apache.spark.util.sketch.CountMinSketch's hash family is "
    "JVM-internal, so collision noise is engine-specific; the Misra- "
    "Gries twin heavy_hitters_mg IS oracle-checked. Ground truth: CMS "
    "overestimate-only + eps*N error envelope properties.",
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _heavy_hitters_cms(spark, ev, "event_type")


def _heavy_hitters_cms(
    spark: SparkSession, ev: DataFrame, key: str, max_ndv: int = 10_000
) -> DataFrame:
    # CMS probing is inherently driver-side (the sketch answers point
    # queries); bound the distinct-key collect so a high-NDV column
    # fails fast instead of OOMing the driver. approx_count_distinct
    # is one pass, no shuffle of raw keys.
    ndv = ev.agg(F.approx_count_distinct(key).alias("ndv")).head()["ndv"]
    if ndv > max_ndv:
        raise ValueError(
            f"heavy_hitters_cms: ~{ndv} distinct values of {key!r} exceeds "
            f"the driver-probe bound ({max_ndv}); probe an explicit "
            "candidate list (e.g. a frequent-items pre-pass) instead of "
            "collecting all distinct keys"
        )
    raw = bytes(
        ev.agg(
            F.count_min_sketch(
                key, F.lit(0.001), F.lit(0.99), F.lit(42)
            ).alias("sk")
        ).head()["sk"]
    )
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(raw)
    )
    # the aggregate hashes the UTF8String payload, i.e. the raw UTF-8
    # bytes -> query with byte[] (estimateCount(String) hashes the same
    # bytes; both spellings verified equal in tests)
    # the aggregate skips nulls; a null key cannot be queried either
    collected = (
        ev.select(key)
        .where(F.col(key).isNotNull())
        .distinct()
        .limit(max_ndv + 1)
        .collect()
    )
    if len(collected) > max_ndv:
        # the approx guard (default ~5% rsd) underestimated; never
        # probe a silently truncated, nondeterministic key subset
        raise ValueError(
            f"heavy_hitters_cms: >{max_ndv} distinct values of {key!r} "
            "(approx guard underestimated); probe an explicit candidate "
            "list instead"
        )
    types = sorted(r[0] for r in collected)
    rows = [(t, int(cms.estimateCount(bytearray(t.encode())))) for t in types]
    return spark.createDataFrame(rows, "event_type string, est_count long")


@register(
    "zorder_pruning_stats",
    oracle=None,  # writes scratch files, reads parquet footers -> rows-only
    doc="z-order clustered write evidence (sources/zorder.py): lineitem "
    "rewritten as 16 files under three layouts (hash, single-column "
    "range, Morton z-order on partkey+suppkey); for each layout and "
    "each key column, counts how many files a quarter-range predicate "
    "must read according to the parquet footer min/max — the exact "
    "stats a scan's file pruning consults. Expected shape: hash prunes "
    "nothing, single-column range prunes only its sort column, z-order "
    "prunes BOTH (~6-8/16). At 100 TB this is the difference between "
    "a two-dimension filter reading ~6% of files and reading all of "
    "them when the predicate misses the sort column."
    " Rows-only verdict (r12): NOT convertible — the entry reads "
    "parquet footer min/max of files written to a scratch dir; oracle "
    "views are the pre-registered testdata tables only and DuckDB "
    "never sees the scratch layouts. Ground truth: layout-ordering "
    "assertions (z-order prunes both keys) in tests.",
)
def zorder_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    import pyarrow.parquet as pq

    from ethiopia_legal_etl_spark.sources.zorder import write_zorder_clustered

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    maxes = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()
    if maxes[0] is None:  # empty input: nothing to lay out or compare
        return spark.createDataFrame(
            [], "layout string, col string, files_total long, files_hit long"
        )

    base = tempfile.mkdtemp(prefix="elel_spark_z_")
    li.repartition(16).write.mode("overwrite").parquet(f"{base}/hash")
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(f"{base}/single")
    )
    write_zorder_clustered(li, f"{base}/zorder", ["l_partkey", "l_suppkey"], 16)

    def file_ranges(path: str, column: str):
        out = []
        for f in sorted(Path(path).glob("*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            idx = md.schema.names.index(column)
            lo = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            out.append((lo, hi))
        return out

    rows = []
    for layout in ("hash", "single", "zorder"):
        for col, qhi in (("l_partkey", maxes[0] // 4), ("l_suppkey", maxes[1] // 4)):
            rs = file_ranges(f"{base}/{layout}", col)
            hit = sum(1 for lo, hi in rs if lo <= qhi and 0 <= hi)
            rows.append((layout, col, len(rs), hit))
    return spark.createDataFrame(
        rows, "layout string, col string, files_total long, files_hit long"
    )


def mg_summary_stream(values, k: int) -> dict:
    """Misra-Gries k-1-counter summary of one value stream (Misra &
    Gries 1982): increment a tracked item, open a counter if fewer
    than k-1 are live, else decrement ALL live counters (dropping
    zeros). Invariant: any item with true frequency > n/k is ALWAYS
    live at the end — deterministic, no hash, no probability."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k - 1:
            counters[v] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def mg_merge(partials: list[dict], k: int) -> dict:
    """Associative merge (Agarwal et al., PODS 2012): sum counters,
    then subtract the k-th largest count so at most k-1 survive —
    preserves the superset guarantee across partitions."""
    merged: dict = {}
    for p in partials:
        for item, c in p.items():
            merged[item] = merged.get(item, 0) + int(c)
    if len(merged) >= k:
        kth = sorted(merged.values(), reverse=True)[k - 1]
        merged = {i: c - kth for i, c in merged.items() if c - kth > 0}
    return merged


@register(
    "heavy_hitters_mg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    HAVING COUNT(*) * 8 > (SELECT COUNT(*) FROM events)
    """,
    doc="Misra-Gries heavy hitters with an exact verification pass — "
    "the DETERMINISTIC counterpart of heavy_hitters_cms (CMS bounds "
    "hold with probability; the MG summary provably contains EVERY "
    "item with frequency > n/k, no coin flips). Distributed shape: "
    "one mapInPandas pass builds a <= k-1-counter summary per "
    "partition (bounded rows, never data), the driver merges "
    "associatively (sum, then subtract the k-th largest — the "
    "mergeable-summaries construction), and a second pass counts the "
    "<= k-1 candidates EXACTLY with a pushed isin filter. Because "
    "candidates form a guaranteed superset of the true heavy "
    "hitters, filtering the exact counts by count*k > n yields "
    "precisely the true heavy-hitter set — which is why this sketch "
    "entry is DuckDB-oracle-checkable while CMS is rows-only. At "
    "100 TB the full groupBy this replaces would shuffle every "
    "distinct key; this shuffles only the candidate-filtered rows.",
)
def heavy_hitters_mg(
    spark: SparkSession, sf_dir: str, k: int = 8
) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("event_type")

    def part(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf["event_type"]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k - 1:
                    counters[v] = 1
                else:
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "cnt": list(counters.values())}
            )

    partials = ev.mapInPandas(part, "item string, cnt long").collect()
    by_part: dict = {}
    for r in partials:
        by_part[r["item"]] = by_part.get(r["item"], 0) + int(r["cnt"])
    merged = mg_merge([by_part], k)
    candidates = sorted(merged)  # <= k-1 items, deterministic order
    n_total = ev.count()
    return (
        ev.where(F.col("event_type").isin(candidates))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_events") * k > F.lit(n_total))
    )


@register(
    "fuzzy_vocab_damerau",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT unnest(list_filter(string_split(text, ' '),
                                         x -> x != '')) AS tok
      FROM documents
    )
    SELECT v1.tok AS t1, v2.tok AS t2,
           levenshtein(v1.tok, v2.tok) AS lev_dist,
           damerau_levenshtein(v1.tok, v2.tok) AS dl_dist
    FROM vocab v1 JOIN vocab v2
      ON v1.tok < v2.tok
     AND damerau_levenshtein(v1.tok, v2.tok) <= 2
    """,
    doc="TRANSPOSITION-AWARE FUZZY VOCABULARY MATCH: all corpus-token "
    "pairs within TRUE Damerau-Levenshtein distance 2, with the plain "
    "Levenshtein distance alongside so the transposition wins are "
    "visible (dl < lev exactly where adjacent swaps are involved — "
    "the typo class plain edit distance double-counts). The distance "
    "itself is from scratch: Spark has no damerau_levenshtein "
    "builtin, so functions/strdist.py folds the full Lowrance-Wagner "
    "matrix up with nested `aggregate` HOFs — a pure JVM-side SQL "
    "expression, no UDF, verified against DuckDB's builtin on 400 "
    "random cases + pinned discriminators (CA/ABC=2 proves it's the "
    "unrestricted variant, not optimal-string-alignment). Spark side "
    "prunes with |len diff| <= 2 AND levenshtein <= 4 before the "
    "expensive DP — sound because dl <= 2 implies both (each edit "
    "changes length by <= 1, and lev <= 2*dl) — so the builtin cheap "
    "distance gates the HOF one; the oracle needs no such guard and "
    "the result sets are identical. Sibling: "
    "fuzzy_pairs_levenshtein (builtin distance, supplier names). "
    "Scale: the vocabulary is Heaps-bounded, the all-pairs BNLJ is "
    "vocab x vocab (never docs x docs); at 100 TB you block the "
    "vocab by (length, first char) into an equi-join first — the "
    "guard predicates here are exactly those blocking keys.",
)
def fuzzy_vocab_damerau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethiopia_legal_etl_spark.functions.strdist import (
        damerau_levenshtein,
    )

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda w: w != "")
            ).alias("tok")
        )
        .distinct()
    )
    v1 = vocab.select(F.col("tok").alias("t1"))
    v2 = vocab.select(F.col("tok").alias("t2"))
    dl = damerau_levenshtein("t1", "t2")
    return (
        v1.join(
            F.broadcast(v2),
            (F.col("t1") < F.col("t2"))
            # cheap guards (supersets of dl <= 2): prune before the DP
            & (F.abs(F.length("t1") - F.length("t2")) <= 2)
            & (F.levenshtein("t1", "t2") <= 4)
            & (dl <= 2),
        )
        .select(
            "t1",
            "t2",
            F.levenshtein("t1", "t2").alias("lev_dist"),
            dl.alias("dl_dist"),
        )
    )


@register(
    "fuzzy_vocab_jaro_winkler",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT unnest(list_filter(string_split(text, ' '),
                                         x -> x != '')) AS tok
      FROM documents
    )
    SELECT v1.tok AS t1, v2.tok AS t2,
           ROUND(jaro_winkler_similarity(v1.tok, v2.tok), 6) + 0 AS jw
    FROM vocab v1 JOIN vocab v2 ON v1.tok < v2.tok
    WHERE jaro_winkler_similarity(v1.tok, v2.tok) >= 0.7
    """,
    doc="JARO-WINKLER FUZZY MATCH over the corpus token vocabulary — "
    "the third record-linkage distance next to fuzzy_pairs_levenshtein "
    "(builtin) and fuzzy_vocab_damerau (from-scratch DL; same vocab "
    "scaffolding, deliberately: each scalar-distance FUNCTION gets "
    "one oracle-checked carrier): JW is the census-linkage standard "
    "(Winkler 1990) that rewards shared prefixes, which edit "
    "distances ignore. The function is from scratch "
    "(functions/strdist.py): the greedy windowed match folds over "
    "positions with (used-flags, matched-chars) as HOF state, "
    "transpositions compare the two matched sequences, prefix boost "
    "l<=4 / p=0.1 applies only above jaro 0.7 — probed bit-identical "
    "to DuckDB's builtin on 600+ random cases plus the standard "
    "discriminators (including the ''/'' = 0.0 and window-0 "
    "'ab'/'ba' = 0.0 quirks). ROUND(6) on both sides anyway: the "
    "builtin's internal float op order is an implementation detail. "
    "Scale: vocab x vocab is Heaps-bounded; on a real corpus the "
    "same expression runs on blocked candidate pairs exactly like "
    "the damerau entry.",
)
def fuzzy_vocab_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethiopia_legal_etl_spark.functions.strdist import (
        jaro_winkler_similarity,
    )

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda w: w != "")
            ).alias("tok")
        )
        .distinct()
    )
    v1 = vocab.select(F.col("tok").alias("t1"))
    v2 = vocab.select(F.col("tok").alias("t2"))
    jw = jaro_winkler_similarity("t1", "t2")
    return (
        v1.join(F.broadcast(v2), (F.col("t1") < F.col("t2")) & (jw >= 0.7))
        .select("t1", "t2", (F.round(jw, 6) + 0).alias("jw"))
    )
