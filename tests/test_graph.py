"""Integer-deterministic PageRank (operators/graph.py)."""
from __future__ import annotations

import pytest

from db2pq_spark.operators.graph import pagerank


def _pr(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank_units"]
            for r in pagerank(e, **kw).collect()}


class TestPagerank:
    def test_hub_outranks_spokes(self, spark):
        # 1,2,3 all link to 4; 4 links back to 1
        got = _pr(spark, [(1, 4), (2, 4), (3, 4), (4, 1)])
        assert got[4] == max(got.values())
        assert got[2] == got[3]          # symmetric spokes tie
        assert got[1] > got[2]           # 1 gets 4's back-link

    def test_symmetric_pair_ties(self, spark):
        got = _pr(spark, [(1, 2), (2, 1)])
        assert got[1] == got[2]

    def test_dangling_mass_redistributes(self, spark):
        # 2 is dangling (no out-edges): its mass must flow back into
        # the graph rather than vanish — with damping 17/20 and 2
        # nodes, total mass stays within floor-loss of 2 * unit
        got = _pr(spark, [(1, 2)])
        total = sum(got.values())
        assert 2_000_000 - 50 <= total <= 2_000_000

    def test_isolated_node_via_nodes_param(self, spark):
        e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        nodes = spark.createDataFrame([(1,), (2,), (9,)], "node long")
        got = {r["node"]: r["rank_units"]
               for r in pagerank(e, nodes=nodes).collect()}
        assert set(got) == {1, 2, 9}
        assert got[9] < got[1]           # 9 only ever gets teleport+share

    def test_nodes_missing_endpoint_raises(self, spark):
        # a `nodes` universe that omits an edge endpoint would leak
        # mass silently — must refuse up front
        e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        nodes = spark.createDataFrame([(1,), (2,)], "node long")
        with pytest.raises(ValueError, match="superset"):
            pagerank(e, nodes=nodes)

    def test_zero_iterations_is_uniform(self, spark):
        got = _pr(spark, [(1, 2), (2, 3)], iterations=0)
        assert set(got.values()) == {1_000_000}

    def test_bad_damping_raises(self, spark):
        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError, match="damping"):
            pagerank(e, damping=(21, 20))

    def test_empty_graph_raises(self, spark):
        e = spark.createDataFrame([], "src long, dst long")
        with pytest.raises(ValueError, match="empty graph"):
            pagerank(e)

    def test_parallel_edges_double_contribution(self, spark):
        # duplicate edge 1->2 doubles 2's share of 1's mass relative
        # to 3's single edge
        got = _pr(spark, [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)])
        assert got[2] > got[3]
