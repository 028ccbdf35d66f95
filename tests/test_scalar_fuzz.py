"""Cross-engine scalar fuzz: a seeded adversarial corpus (empty
strings, unicode, negatives, zeros, NULLs) pushed through paired
Spark / DuckDB expressions and compared exactly by row id.

This is the random-data complement to the oracle queries (which run
on fixed table data): the corpus is built to hit the edges the
tables never contain — '' vs NULL, negative modulo, zero-length
pads, out-of-range split indices.

Dialect notes (why some pairs differ in spelling):
- xor: Spark `a ^ b` is bitwise-xor; DuckDB `^` is power → xor(a,b).
- sha-2: Spark sha2(s, 256) == DuckDB sha256(s).
- Unicode: casing/reverse are engine-specific above ASCII (Java
  casing vs DuckDB grapheme-aware reverse), so the unicode column u
  only goes through length/concat/md5 — the portable subset.
"""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest


def _corpus(n: int = 400) -> pd.DataFrame:
    rng = random.Random(42)
    ascii_pool = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " .,;:-_/%#@!?'\"()"
    )
    uni_pool = "አማርኛሕግفقهδίκη法律ПравоΩß€✓"

    def rand_s():
        r = rng.random()
        if r < 0.06:
            return None
        if r < 0.12:
            return ""
        if r < 0.18:
            return "   "
        return "".join(rng.choice(ascii_pool) for _ in range(rng.randrange(0, 24)))

    def rand_u():
        if rng.random() < 0.08:
            return None
        return "".join(rng.choice(uni_pool) for _ in range(rng.randrange(0, 10)))

    def rand_i():
        r = rng.random()
        if r < 0.06:
            return None
        if r < 0.15:
            return rng.choice([0, -1, 1, 7, -7, 255, -255])
        return rng.randrange(-10**9, 10**9)

    def rand_d():
        if rng.random() < 0.06:
            return None
        # exact quarters: representable in binary, tie-free policy notes
        return rng.randrange(-4000, 4000) / 4.0

    rows = {
        "id": list(range(n)),
        "s": [rand_s() for _ in range(n)],
        "u": [rand_u() for _ in range(n)],
        "i": [rand_i() for _ in range(n)],
        "j": [rand_i() for _ in range(n)],
        "d": [rand_d() for _ in range(n)],
    }
    df = pd.DataFrame(rows)
    df["i"] = df["i"].astype("Int64")
    df["j"] = df["j"].astype("Int64")
    return df


# (name, spark_expr, duck_expr) — identical spelling unless dialects
# force a split (see module docstring).
PAIRS = [
    ("upper_s", "upper(s)", "upper(s)"),
    ("lower_s", "lower(s)", "lower(s)"),
    ("trim_s", "trim(s)", "trim(s)"),
    ("ltrim_s", "ltrim(s)", "ltrim(s)"),
    ("rtrim_s", "rtrim(s)", "rtrim(s)"),
    ("substr_s", "substr(s, 2, 3)", "substr(s, 2, 3)"),
    ("left_s", "left(s, 3)", "left(s, 3)"),
    ("right_s", "right(s, 3)", "right(s, 3)"),
    ("lpad_s", "lpad(s, 8, 'x')", "lpad(s, 8, 'x')"),
    ("rpad_s", "rpad(s, 8, 'x')", "rpad(s, 8, 'x')"),
    ("lpad0_s", "lpad(s, 0, 'x')", "lpad(s, 0, 'x')"),
    ("replace_s", "replace(s, 'a', 'ZZ')", "replace(s, 'a', 'ZZ')"),
    ("repeat_s", "repeat(s, 2)", "repeat(s, 2)"),
    ("len_s", "length(s)", "length(s)"),
    ("len_u", "length(u)", "length(u)"),
    ("concat_ws_su", "concat_ws('-', s, u)", "concat_ws('-', s, u)"),
    # DuckDB split_part(NULL, d, n) returns '' (not NULL!) — a fuzz
    # find; oracles using split_part over nullable columns must
    # coalesce. Compare on the non-null domain.
    ("split_part_s", "split_part(coalesce(s, ''), ' ', 1)",
     "split_part(coalesce(s, ''), ' ', 1)"),
    ("split_part_oob", "split_part(coalesce(s, ''), ' ', 9)",
     "split_part(coalesce(s, ''), ' ', 9)"),
    ("translate_s", "translate(s, 'abc', 'xyz')", "translate(s, 'abc', 'xyz')"),
    ("strpos_s", "instr(s, 'a')", "instr(s, 'a')"),
    ("md5_u", "md5(coalesce(u, ''))", "md5(coalesce(u, ''))"),
    ("sha256_s", "sha2(coalesce(s, ''), 256)", "sha256(coalesce(s, ''))"),
    ("coalesce_s", "coalesce(s, '<null>')", "coalesce(s, '<null>')"),
    ("nullif_empty", "nullif(s, '')", "nullif(s, '')"),
    ("abs_i", "abs(i)", "abs(i)"),
    ("mod_i", "i % 7", "i % 7"),          # dividend-sign in both
    ("mod_neg", "i % -7", "i % -7"),
    ("band_ij", "i & j", "i & j"),
    ("bor_ij", "i | j", "i | j"),
    ("bxor_ij", "i ^ j", "xor(i, j)"),
    # DuckDB << rejects negative inputs; Spark shiftleft wraps Java
    # semantics — compare on the shared (non-negative) domain
    ("shiftl", "shiftleft(abs(i), 3)", "abs(i) << 3"),
    ("greatest_ij", "greatest(i, j)", "greatest(i, j)"),
    ("least_ij", "least(i, j)", "least(i, j)"),
    ("sign_i", "sign(i)", "sign(i)"),
    ("floor_d", "floor(d)", "floor(d)"),
    ("ceil_d", "ceil(d)", "ceil(d)"),
    # DuckDB CAST(double AS BIGINT) ROUNDS half-away; Spark TRUNCATES
    # toward zero (fuzz find: -9.5 → -10 vs -9). trunc() restores
    # parity; integer `div` / `//` truncate identically in both.
    ("trunc_div", "cast(i / 8 as bigint)", "trunc(i / 8)::bigint"),
    ("int_div", "i div 8", "i // 8"),
    ("regexp_digits", "regexp_extract(s, '[0-9]+', 0)", "regexp_extract(s, '[0-9]+', 0)"),
    ("if_pos", "if(i > 0, 'pos', 'nonpos')", "if(i > 0, 'pos', 'nonpos')"),
    # r4 second wave: string predicates, codes, distance, bit/basing
    ("reverse_ascii", "reverse(s)", "reverse(s)"),  # s is ASCII-only
    ("startswith_s", "startswith(s, 'a')", "starts_with(s, 'a')"),
    ("endswith_s", "endswith(s, 'a')", "ends_with(s, 'a')"),
    ("contains_s", "contains(s, 'a')", "contains(s, 'a')"),
    ("ascii_s", "ascii(s)", "ascii(s)"),
    ("chr_i", "char(abs(i) % 26 + 65)",
     "chr(CAST(abs(i) % 26 + 65 AS INTEGER))"),
    ("levenshtein_s", "levenshtein(s, 'abc')", "levenshtein(s, 'abc')"),
    ("bitcount_i", "bit_count(i)", "bit_count(i)"),
    ("hex_i", "hex(abs(i))", "upper(to_hex(abs(i)))"),
    # pmod: Spark has it natively; DuckDB spelled out
    ("pmod_i", "pmod(i, 7)", "((i % 7) + 7) % 7"),
    # try_divide: NULL-on-zero semantics vs the explicit CASE
    ("try_div_ij", "cast(try_divide(i, j) as double)",
     "CASE WHEN j = 0 THEN NULL ELSE i / CAST(j AS DOUBLE) END"),
    ("octet_u", "octet_length(u)", "octet_length(encode(u))"),
]


@pytest.fixture(scope="module")
def fuzz_results(spark):
    pdf = _corpus()
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("fuzz_corpus")
    spark_sel = ", ".join(f"{se} AS {n}" for n, se, _ in PAIRS)
    got_s = (
        spark.sql(f"SELECT id, {spark_sel} FROM fuzz_corpus")
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    con = duckdb.connect()
    con.register("fuzz_corpus", pdf)
    duck_sel = ", ".join(f"{de} AS {n}" for n, _, de in PAIRS)
    got_d = (
        con.execute(f"SELECT id, {duck_sel} FROM fuzz_corpus")
        .df()
        .set_index("id")
        .sort_index()
    )
    return got_s, got_d


@pytest.mark.parametrize("name", [p[0] for p in PAIRS])
def test_scalar_pair_matches_duckdb(fuzz_results, name):
    got_s, got_d = fuzz_results
    s_col, d_col = got_s[name], got_d[name]
    bad = []
    for rid in got_s.index:
        a, b = s_col.loc[rid], d_col.loc[rid]
        a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NA
        b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NA
        if a_null and b_null:
            continue
        if a_null != b_null or repr(a) != repr(b):
            bad.append((rid, a, b))
        if len(bad) >= 5:
            break
    assert not bad, f"{name}: spark vs duckdb diverge: {bad}"


# ---------------------------------------------------------------------
# Temporal battery: same methodology over a seeded timestamp corpus
# (leap days, month ends, epoch boundary, far past/future).
# Dialect finds encoded below:
# - extract(dow): Spark numbers Sunday=1..7, DuckDB Sunday=0..6
# - weekday (Spark, Monday=0) == isodow - 1 (DuckDB, Monday=1)
# ---------------------------------------------------------------------

def _ts_corpus(n: int = 300) -> pd.DataFrame:
    import datetime as dt

    rng = random.Random(7)
    fixed = [
        dt.datetime(2000, 2, 29, 0, 0, 0),    # leap day
        dt.datetime(1999, 12, 31, 23, 59, 59),
        dt.datetime(1970, 1, 1, 0, 0, 0),     # epoch
        dt.datetime(2038, 1, 19, 3, 14, 7),   # 32-bit rollover
        dt.datetime(1905, 6, 30, 12, 0, 0),   # far past
        dt.datetime(2262, 1, 1, 1, 2, 3),     # near pandas ns ceiling
        None,
    ]
    rand = [
        dt.datetime(
            rng.randrange(1950, 2100),
            rng.randrange(1, 13),
            rng.randrange(1, 29),
            rng.randrange(0, 24),
            rng.randrange(0, 60),
            rng.randrange(0, 60),
        )
        for _ in range(n - len(fixed))
    ]
    return pd.DataFrame({"id": list(range(n)), "ts": fixed + rand})


TS_PAIRS = [
    # cast to STRING not DATE: equal values, but pandas renders Spark
    # DATE as datetime.date and DuckDB DATE as Timestamp → repr-diff
    ("trunc_month", "cast(cast(date_trunc('month', ts) as date) as string)",
     "cast(cast(date_trunc('month', ts) as date) as string)"),
    ("trunc_week", "cast(cast(date_trunc('week', ts) as date) as string)",
     "cast(cast(date_trunc('week', ts) as date) as string)"),
    ("trunc_hour", "cast(date_trunc('hour', ts) as string)",
     "cast(date_trunc('hour', ts) as string)"),
    ("ex_year", "extract(year from ts)", "extract(year from ts)"),
    ("ex_quarter", "extract(quarter from ts)", "extract(quarter from ts)"),
    ("ex_doy", "extract(doy from ts)", "extract(doy from ts)"),
    ("ex_week", "extract(week from ts)", "extract(week from ts)"),
    ("ex_dow_norm", "extract(dow from ts) - 1", "extract(dow from ts)"),
    ("weekday_iso", "weekday(ts) + 1", "isodow(ts)"),
    ("add_days", "cast(ts + interval 40 day as string)",
     "cast(ts + interval 40 day as string)"),
    ("add_months_eom", "cast(ts + interval 1 month as string)",
     "cast(ts + interval 1 month as string)"),
    ("sub_hours", "cast(ts - interval 25 hour as string)",
     "cast(ts - interval 25 hour as string)"),
    ("last_day", "cast(last_day(ts) as string)", "cast(last_day(ts) as string)"),
    ("fmt_minute", "date_format(ts, 'yyyy-MM-dd HH:mm')",
     "strftime(ts, '%Y-%m-%d %H:%M')"),
    ("epoch_s", "unix_timestamp(ts)", "cast(epoch(ts) as bigint)"),
    ("days_since", "datediff(cast(ts as date), DATE '2000-01-01')",
     "datediff('day', DATE '2000-01-01', cast(ts as date))"),
    ("mk_date", "cast(make_date(extract(year from ts), 1, 31) as string)",
     "cast(make_date(extract(year from ts), 1, 31) as string)"),
]


@pytest.fixture(scope="module")
def ts_fuzz_results(spark):
    pdf = _ts_corpus()
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("ts_fuzz_corpus")
    spark_sel = ", ".join(f"{se} AS {n}" for n, se, _ in TS_PAIRS)
    got_s = (
        spark.sql(f"SELECT id, {spark_sel} FROM ts_fuzz_corpus")
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    con = duckdb.connect()
    con.register("ts_fuzz_corpus", pdf)
    duck_sel = ", ".join(f"{de} AS {n}" for n, _, de in TS_PAIRS)
    got_d = (
        con.execute(f"SELECT id, {duck_sel} FROM ts_fuzz_corpus")
        .df()
        .set_index("id")
        .sort_index()
    )
    return got_s, got_d


@pytest.mark.parametrize("name", [p[0] for p in TS_PAIRS])
def test_temporal_pair_matches_duckdb(ts_fuzz_results, name):
    got_s, got_d = ts_fuzz_results
    s_col, d_col = got_s[name], got_d[name]
    bad = []
    for rid in got_s.index:
        a, b = s_col.loc[rid], d_col.loc[rid]
        a_null = a is None or a is pd.NaT or (isinstance(a, float) and math.isnan(a)) or a is pd.NA
        b_null = b is None or b is pd.NaT or (isinstance(b, float) and math.isnan(b)) or b is pd.NA
        if a_null and b_null:
            continue
        if a_null != b_null or repr(a) != repr(b):
            bad.append((rid, a, b))
        if len(bad) >= 5:
            break
    assert not bad, f"{name}: spark vs duckdb diverge: {bad}"
