"""Static plan gate for the interpreted-HOF quadratic fixed in r13.

Higher-order-function lambdas (transform/filter/aggregate/exists)
evaluate INTERPRETED, so any non-trivial expression referenced inside
the lambda body — not passed as the HOF's array argument — re-evaluates
once per element. With `F.split(text)` inside a per-gram lambda that
made gram generation O(tokens^2) per document: the r13 --substr-volume
probe read ~200 s/run at 40x doc length vs ~14 s for the aliased shape
(SCALING.md §substr-volume).

The fix materializes the token array under a column alias so the
lambda reads an attribute. This gate freezes that shape: in the
OPTIMIZED plan of every operator that windows/chunks a token array,
no `lambdafunction(...)` span may contain a `split(` call — which is
exactly what reappears if someone inlines the split again OR a future
Catalyst version starts collapsing the aliasing projection into the
lambda body.
"""

from __future__ import annotations


def _lambda_spans(plan: str) -> list[str]:
    """Extract every balanced `lambdafunction(...)` span."""
    spans = []
    i = 0
    needle = "lambdafunction("
    while True:
        j = plan.find(needle, i)
        if j < 0:
            break
        depth, k = 0, j + len(needle) - 1
        while k < len(plan):
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        spans.append(plan[j : k + 1])
        i = k + 1
    return spans


def _assert_no_split_in_lambdas(df, name: str) -> None:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    spans = _lambda_spans(plan)
    assert spans, (
        f"{name}: expected lambdafunction nodes in the optimized plan "
        "— operator restructured? update this gate"
    )
    bad = [s[:200] for s in spans if "split(" in s]
    assert not bad, (
        f"{name}: split() inside a HOF lambda body re-evaluates per "
        f"element (O(tokens^2) per doc — see SCALING.md "
        f"§substr-volume). Alias the token array into a column before "
        f"the lambda. Offending spans: {bad}"
    )


def test_no_split_inside_hof_lambdas(spark, sf_dir):
    from ethiopia_legal_etl_spark.operators.corpusops import (
        chunk_overlap_windows,
        dedup_paragraph_exact,
    )
    from ethiopia_legal_etl_spark.operators.dedup import (
        dedup_substring_fraction,
    )
    from ethiopia_legal_etl_spark.operators.textguard import (
        contamination_ngram_overlap,
        dedup_chunk_boilerplate,
    )
    from ethiopia_legal_etl_spark.operators.textstats import (
        winnowing_fingerprints,
    )

    for fn in (
        dedup_substring_fraction,
        winnowing_fingerprints,
        dedup_paragraph_exact,
        chunk_overlap_windows,
        contamination_ngram_overlap,
        dedup_chunk_boilerplate,
    ):
        _assert_no_split_in_lambdas(fn(spark, sf_dir), fn.__name__)


def test_gate_actually_detects_the_inline_shape(spark, sf_dir):
    """Sanity: the unfixed spelling must trip the gate — otherwise the
    gate is vacuous (e.g. Catalyst renamed the lambda node)."""
    import pytest
    from pyspark.sql import functions as F

    from ethiopia_legal_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")  # inline — the quadratic shape
    bad = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 7),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, 8))),
            )
        ).alias("g"),
    )
    with pytest.raises(AssertionError, match="tokens\\^2"):
        _assert_no_split_in_lambdas(bad, "inline_shape")
