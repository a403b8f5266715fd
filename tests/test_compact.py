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
