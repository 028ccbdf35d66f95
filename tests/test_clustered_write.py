"""Write-path clustering evidence: repartitionByRange + sort gives
files disjoint min/max ranges, so engines (Spark's parquet reader,
and any warehouse reading the table) skip whole files/row-groups for
time-window predicates. The footer statistics are read back with
pyarrow — the same metadata a scan's pruning consults.

At 100 TB this is the difference between a date-window query reading
one day's files and reading the whole table: clustering is decided
at WRITE time, and this test pins the layout contract.
"""

from pathlib import Path

import pyarrow.parquet as pq

from ethiopia_legal_etl_spark.sources.tables import load_table


def _file_ranges(path: str, column: str):
    """(min, max) of `column` per parquet file, from footer stats."""
    ranges = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        idx = md.schema.names.index(column)
        lo = min(
            md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    return ranges


def test_range_clustered_write_has_disjoint_file_stats(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")

    hashed = str(tmp_path / "hashed")
    clustered = str(tmp_path / "clustered")
    li.repartition(8).write.mode("overwrite").parquet(hashed)
    (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(clustered)
    )

    h_ranges = _file_ranges(hashed, "l_shipdate")
    c_ranges = _file_ranges(clustered, "l_shipdate")
    assert len(h_ranges) == 8 and len(c_ranges) == 8

    def overlaps(r):
        n = 0
        for i, (lo1, hi1) in enumerate(r):
            for lo2, hi2 in r[i + 1:]:
                if lo1 <= hi2 and lo2 <= hi1:
                    n += 1
        return n

    # hash layout: every file spans ~the whole domain -> all pairs overlap
    assert overlaps(h_ranges) == 28
    # range-clustered: consecutive files may share a boundary value but
    # the layout is (near-)disjoint
    assert overlaps(c_ranges) <= 7

    # the payoff: a 1-month window intersects every hashed file but at
    # most 2 clustered files
    lo = min(r[0] for r in c_ranges)
    month_hi = lo.replace(month=lo.month + 1)
    hits_hash = sum(1 for a, b in h_ranges if a <= month_hi and lo <= b)
    hits_clus = sum(1 for a, b in c_ranges if a <= month_hi and lo <= b)
    assert hits_hash == 8
    assert hits_clus <= 2
