"""SCD2 merge semantics on a constructed dimension."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def dim(spark):
    rows = [
        # key, city, valid_from, valid_to
        (1, "london", 100, None),
        (2, "paris", 100, None),
        (3, "rome", 100, 150),      # historical (already closed)
        (3, "milan", 150, None),
    ]
    return spark.createDataFrame(
        rows, "supp_id long, city string, valid_from long, valid_to long")


@pytest.fixture(scope="module")
def updates(spark):
    rows = [
        (1, "berlin", 200),   # changed → close london, open berlin
        (2, "paris", 200),    # unchanged → no-op
        (9, "madrid", 200),   # brand new key
    ]
    return spark.createDataFrame(
        rows, "supp_id long, city string, effective_ts long")


def test_scd2_merge(spark, dim, updates):
    from db2pq_spark.operators.scd import scd2_apply

    out = scd2_apply(dim, updates, key="supp_id", attrs=["city"])
    rows = {(r["supp_id"], r["city"], r["valid_from"], r["valid_to"])
            for r in out.collect()}
    assert rows == {
        (1, "london", 100, 200),   # closed at update time
        (1, "berlin", 200, None),  # new open version
        (2, "paris", 100, None),   # unchanged, untouched
        (3, "rome", 100, 150),     # history preserved
        (3, "milan", 150, None),   # open, no update → untouched
        (9, "madrid", 200, None),  # new key opened
    }
    # idempotence: re-applying the same updates changes nothing
    again = scd2_apply(out, updates, key="supp_id", attrs=["city"])
    assert again.count() == out.count()
