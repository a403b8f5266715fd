"""Repository compaction: small-file consolidation, metadata
preservation, and range-clustered data skipping."""

from __future__ import annotations

import pyarrow.dataset as ds
import pyarrow.parquet as pq
import pytest

from db2pq_spark.core import Engine
from db2pq_spark.sinks.parquet_sink import get_modified_pq, table_path

COMMENT = "compacted table (Updated 2026-01-15)"


@pytest.fixture()
def fragmented(spark, sf_dir, tmp_path):
    """A repository table splintered into 32 tiny part files."""
    eng = Engine(spark, tmp_path / "repo")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(32)
    eng.df_to_pq(li, "sf", "li_frag", last_modified=COMMENT)
    return eng


class TestCompact:
    def test_reduces_file_count_and_keeps_rows(self, fragmented, spark):
        path = table_path(fragmented.data_dir, "sf", "li_frag")
        rows_before = spark.read.parquet(str(path)).count()
        before, after = fragmented.compact("sf", "li_frag", target_mb=128)
        assert before == 32 and after < before
        assert spark.read.parquet(str(path)).count() == rows_before

    def test_preserves_freshness_metadata(self, fragmented):
        path = table_path(fragmented.data_dir, "sf", "li_frag")
        assert get_modified_pq(path) == COMMENT
        fragmented.compact("sf", "li_frag")
        assert get_modified_pq(path) == COMMENT

    def test_cluster_by_gives_disjoint_ranges(self, fragmented):
        """Range-clustered rewrite → per-file min/max on the cluster
        column barely overlap → predicate scans can skip files."""
        fragmented.compact("sf", "li_frag", target_files=4,
                           cluster_by="l_orderkey")
        path = table_path(fragmented.data_dir, "sf", "li_frag")
        files = list(ds.dataset(str(path), format="parquet").files)
        assert len(files) >= 2
        ranges = []
        for f in files:
            md = pq.read_metadata(f)
            col_idx = md.schema.names.index("l_orderkey")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        ranges.sort()
        overlaps = sum(1 for (a, b) in zip(ranges, ranges[1:])
                       if a[1] > b[0])
        assert overlaps == 0, f"file ranges overlap: {ranges}"


class TestZOrder:
    def test_zorder_prunes_on_both_columns(self, spark, tmp_path):
        """Z-ordered compaction → predicates on EITHER column skip most
        files by footer min/max; single-column clustering only skips on
        the clustered column."""
        import itertools

        eng = Engine(spark, tmp_path / "zrepo")
        grid = spark.createDataFrame(
            [(x, y, x * 1000 + y) for x, y in
             itertools.product(range(64), range(64))],
            ["x", "y", "payload"]).repartition(16)
        eng.df_to_pq(grid, "g", "grid", last_modified=COMMENT)

        def col_stats(md, rg, col):
            group = md.row_group(rg)
            j = next(j for j in range(group.num_columns)
                     if group.column(j).path_in_schema == col)
            return group.column(j).statistics

        def files_matching(table, col, lo, hi):
            path = table_path(eng.data_dir, "g", table)
            hit = 0
            for f in ds.dataset(str(path), format="parquet").files:
                md = pq.ParquetFile(f).metadata
                stats = [col_stats(md, i, col)
                         for i in range(md.num_row_groups)]
                fmin = min(s.min for s in stats)
                fmax = max(s.max for s in stats)
                if fmax >= lo and fmin <= hi:
                    hit += 1
            return hit

        eng.compact("g", "grid", cluster_by=["x", "y"], target_files=16)
        path = table_path(eng.data_dir, "g", "grid")
        n_files = len(ds.dataset(str(path), format="parquet").files)
        assert n_files >= 8  # enough granularity for pruning to mean anything

        # an 1/8-width slab on either axis must prune most files
        hits_x = files_matching("grid", "x", 0, 7)
        hits_y = files_matching("grid", "y", 0, 7)
        assert hits_x <= n_files // 2, (hits_x, n_files)
        assert hits_y <= n_files // 2, (hits_y, n_files)

    def test_zvalue_interleaves_bits(self, spark):
        from db2pq_spark.operators.zorder import zvalue

        df = spark.createDataFrame(
            [(x, y) for x in range(4) for y in range(4)], ["x", "y"])
        out = df.withColumn("z", zvalue(df, ["x", "y"], bits=2)).collect()
        got = {(r["x"], r["y"]): r["z"] for r in out}
        # classic 2-bit Morton curve: z(x,y) with x in bit positions
        # 0,2 and y in 1,3 (column order x,y → x gets even positions)
        assert got[(0, 0)] == 0
        assert got[(3, 3)] == 15
        assert got[(1, 0)] == 1 and got[(0, 1)] == 2
        # locality: nearby cells share high bits
        assert got[(3, 0)] == 5 and got[(0, 3)] == 10

    def test_zorder_handles_timestamp_and_rejects_strings(self, spark, tmp_path):
        import datetime as dt

        from db2pq_spark.operators.zorder import zvalue

        rows = [(i, dt.datetime(2024, 1, 1 + i % 28), float(i), f"s{i}")
                for i in range(50)]
        df = spark.createDataFrame(rows, "id long, ts timestamp, v double, s string")
        # timestamp interleaves via its epoch proxy — must not crash
        out = df.withColumn("z", zvalue(df, ["ts", "v"], bits=4))
        assert out.where("z IS NULL").count() == 0
        with pytest.raises(ValueError, match="only numeric"):
            zvalue(df, ["s", "v"])

    def test_zorder_all_null_column_is_bucket_zero(self, spark):
        from db2pq_spark.operators.zorder import zvalue

        df = spark.createDataFrame(
            [(i, None) for i in range(8)], "a long, b double")
        out = df.withColumn("z", zvalue(df, ["a", "b"], bits=2)).collect()
        assert all(r["z"] is not None for r in out)
