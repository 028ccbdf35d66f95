"""String-distance scalar functions built from pure Spark SQL
higher-order functions — no UDF, no Python on the data path.

Spark ships `levenshtein` but not the transposition-aware
Damerau-Levenshtein distance, which is the one record linkage
actually wants (digit swaps and fat-finger transpositions are edit
distance 2 to Levenshtein but 1 to Damerau). This implements the
TRUE (unrestricted) Damerau-Levenshtein — the variant with the
"last occurrence" bookkeeping, where dl('CA','ABC') = 2 — matching
DuckDB's `damerau_levenshtein` (probed: CA/ABC -> 2, ab/ba -> 1,
'a cat'/'an act' -> 2), NOT the weaker optimal-string-alignment
variant (which would give 3 for CA/ABC and forbids edits inside a
transposed pair).

Algorithm (Lowrance & Wagner 1975 / the standard matrix form): the
full (|a|+2) x (|b|+2) DP matrix with a max-distance border row and
column; cell (i, j) takes the min of substitute / insert / delete
and the transposition jump d[k][l] + (i-k-1) + 1 + (j-l-1), where k
is the last row with a[k] = b[j] and l the last column in row i with
b[l] = a[i]. Here the matrix is folded up row-by-row with
`aggregate`: the outer fold's state IS the matrix built so far
(array<array<int>>), the inner fold builds one row, and k / l are
recomputed per cell by a prefix scan instead of carrying mutable
`da[]` / `db` state (pure functions of (i, j, a, b); the extra
O(i + j) scan per cell keeps the whole thing a single deterministic
SQL expression).

Cost is O(|a| * |b| * (|a| + |b|)) per pair with array copies on
top — fine for the short tokens/names record linkage compares
(after blocking), wrong for documents. Evaluation is JVM-side
(whole-stage codegen or Catalyst's interpreted HOF path), never a
Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def damerau_levenshtein(a, b) -> Column:
    """True (unrestricted) Damerau-Levenshtein distance as a Column.

    NULL if either side is NULL (matching DuckDB). Character-based
    (Spark `substr` counts characters, not bytes).
    """
    a, b = _c(a), _c(b)
    la, lb = F.length(a), F.length(b)
    maxd = la + lb
    one = F.lit(1)

    # matrix row mapping: m[x+1] = algorithm row d[x] (d[0] is the
    # border "row -1"); within a row, element y+1 = column d[..][y]
    d0 = F.array_repeat(maxd, lb + F.lit(2))
    d1 = F.concat(F.array(maxd), F.sequence(F.lit(0), lb))

    def cell(m, i, row, j):
        a_i = a.substr(i, one)
        b_j = b.substr(j, one)
        cost = F.when(a_i == b_j, F.lit(0)).otherwise(F.lit(1))
        # k: last row index < i with a[k] = b[j]; 0 = "never" (the
        # border row absorbs it). Prefix scan instead of da[] state.
        k = (
            F.when(
                i > 1,
                F.aggregate(
                    F.sequence(one, i - 1),
                    F.lit(0),
                    lambda acc, x: F.when(
                        a.substr(x, one) == b_j, x
                    ).otherwise(acc),
                ),
            )
            .otherwise(F.lit(0))
        )
        # l: last column index < j with b[l] = a[i]
        el = (
            F.when(
                j > 1,
                F.aggregate(
                    F.sequence(one, j - 1),
                    F.lit(0),
                    lambda acc, x: F.when(
                        b.substr(x, one) == a_i, x
                    ).otherwise(acc),
                ),
            )
            .otherwise(F.lit(0))
        )
        diag = F.element_at(F.element_at(m, i + 1), j + 1)
        up = F.element_at(F.element_at(m, i + 1), j + 2)
        left = F.element_at(row, j + 1)
        trans = (
            F.element_at(F.element_at(m, k + 1), el + 1)
            + (i - k - 1)
            + 1
            + (j - el - 1)
        )
        return F.least(diag + cost, up + 1, left + 1, trans)

    full = F.aggregate(
        F.sequence(one, la),
        F.array(d0, d1),
        lambda m, i: F.concat(
            m,
            F.array(
                F.aggregate(
                    F.sequence(one, lb),
                    F.concat(F.array(maxd), F.array(i)),
                    lambda row, j: F.concat(
                        row, F.array(cell(m, i, row, j))
                    ),
                )
            ),
        ),
        lambda m: F.element_at(F.element_at(m, la + 2), lb + 2),
    )
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("int"))
        .when(la == 0, lb)
        .when(lb == 0, la)
        .otherwise(full)
        .cast("int")
    )


def jaro_winkler_similarity(a, b) -> Column:
    """Jaro-Winkler similarity as a pure HOF Column (textbook Winkler:
    prefix boost l<=4, p=0.1, applied only when jaro > 0.7 — probed
    to match DuckDB's `jaro_winkler_similarity` on the standard
    discriminators: MARTHA/MARHTA=.9611, DIXON/DICKSONX=.8133,
    ab/ba=0 because the window max(2,2)/2-1=0 admits no matches).

    The greedy match step (each t-position used once, s scanned left
    to right, window |i-j| <= max(|s|,|t|)/2 - 1) folds over s's
    positions carrying (t-used flags, matched s-chars) as state; the
    transposition count then compares the matched s-sequence against
    the matched t-sequence in t order. All counts are exact ints; the
    final similarity is a short float formula of them — callers that
    hash cross-engine should ROUND(6) both sides (the formula's op
    order inside another engine's builtin is not observable).
    """
    a, b = _c(a), _c(b)
    ls, lt = F.length(a), F.length(b)
    one = F.lit(1)
    # match window; can be -1 (both len<=1) or 0 (len 2) -> the lo>hi
    # guard below yields "no candidate positions"
    w = F.floor(F.greatest(ls, lt) / 2).cast("int") - 1

    def step(state, i):
        tm = state["tm"]
        sc = state["sc"]
        a_i = a.substr(i, one)
        lo = F.greatest(one, i - w)
        hi = F.least(lt, i + w)
        j = F.when(
            hi >= lo,
            F.array_min(
                F.filter(
                    F.sequence(lo, hi),
                    lambda p: (F.element_at(tm, p) == 0)
                    & (b.substr(p, one) == a_i),
                )
            ),
        )
        return F.when(
            j.isNotNull(),
            F.struct(
                F.transform(
                    tm,
                    lambda v, idx: F.when(idx + 1 == j, F.lit(1)).otherwise(v),
                ).alias("tm"),
                F.concat(sc, F.array(a_i)).alias("sc"),
            ),
        ).otherwise(F.struct(tm.alias("tm"), sc.alias("sc")))

    init = F.struct(
        F.array_repeat(F.lit(0), lt).alias("tm"),
        F.array().cast("array<string>").alias("sc"),
    )
    matched = F.aggregate(F.sequence(one, ls), init, step)
    tm, sc = matched["tm"], matched["sc"]
    m = F.size(sc)
    tc = F.transform(
        F.filter(F.sequence(one, lt), lambda p: F.element_at(tm, p) == 1),
        lambda p: b.substr(p, one),
    )
    ndiff = F.aggregate(
        F.sequence(one, m),
        F.lit(0),
        lambda acc, p: acc
        + F.when(F.element_at(sc, p) == F.element_at(tc, p), 0).otherwise(1),
    )
    tr = (ndiff / 2).cast("int")  # floor: ndiff >= 0
    md = m.cast("double")
    jaro = (
        # empty-side check FIRST: DuckDB returns 0.0 for ''/'', not
        # the textbook 1.0 (probed), and a == b would otherwise win
        F.when((ls == 0) | (lt == 0), F.lit(0.0))
        .when(a == b, F.lit(1.0))
        .when(m == 0, F.lit(0.0))
        .otherwise((md / ls + md / lt + (md - tr) / md) / F.lit(3.0))
    )
    # common prefix length, capped at 4, consecutive from position 1
    el = F.aggregate(
        F.sequence(one, F.least(F.lit(4), ls, lt)),
        F.lit(0),
        lambda acc, p: F.when(
            (acc == p - 1) & (a.substr(p, one) == b.substr(p, one)), p
        ).otherwise(acc),
    )
    boosted = jaro + el * F.lit(0.1) * (F.lit(1.0) - jaro)
    jw = F.when(jaro > 0.7, boosted).otherwise(jaro)
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(
        jw
    )
