"""PROC CONTENTS parsing (reference D4) and the gated SSH transport."""

from __future__ import annotations

import pytest

from db2pq_spark.sync.sas import get_modified_str, sas_modified_via_ssh
from db2pq_spark.sync.timestamps import last_modified_dttm

SAMPLE = """
                        The CONTENTS Procedure

 Data Set Name        CRSP.DSF              Observations          101231845
 Member Type          DATA                  Variables             20
 Engine               V9                    Indexes               0
 Created              11/25/2025 22:11:04   Observation Length    160
 Last Modified        11/26/2025 01:40:41   Deleted Observations  0
 Protection                                 Compressed            NO
"""


def test_parse_and_feed_sync_kernel():
    comment = get_modified_str(SAMPLE)
    assert comment == "Last modified: 11/26/2025 01:40:41"
    d = last_modified_dttm(comment)
    assert d is not None and (d.year, d.hour) == (2025, 1)


def test_no_match_returns_none():
    assert get_modified_str("no metadata here") is None
    assert get_modified_str("") is None


def test_ssh_transport_gated():
    with pytest.raises(RuntimeError, match="paramiko"):
        sas_modified_via_ssh("host", "user", "crsp", "dsf")
