"""Sync-kernel unit tests: comment parsing (both formats, DST edges),
UTC stamps, archive-stem inverse parse, staleness decisions.

Mirrors the reference's freshness semantics (db2pq/files/timestamps.py,
db2pq/sync/modified.py)."""

from __future__ import annotations

import datetime as dt

from db2pq_spark.sync.modified import modified_info, update_available
from db2pq_spark.sync.timestamps import (
    UNKNOWN_MODIFIED,
    last_modified_dttm,
    parse_utc_stamp,
    restore_table_basename,
    utc_stamp,
)


class TestCommentParsing:
    def test_last_modified_format_is_ny_local(self):
        d = last_modified_dttm("Last modified: 11/26/2025 01:40:41")
        assert d is not None
        # November = EST = UTC-5
        assert d.utcoffset() == dt.timedelta(hours=-5)
        assert (d.year, d.month, d.day, d.hour) == (2025, 11, 26, 1)

    def test_updated_format_assumes_2am_ny(self):
        d = last_modified_dttm("xyz table (Updated 2026-03-28)")
        assert d is not None
        assert (d.hour, d.minute) == (2, 0)
        # late March = EDT = UTC-4
        assert d.utcoffset() == dt.timedelta(hours=-4)

    def test_dst_boundary_july(self):
        d = last_modified_dttm("Last modified: 07/04/2025 12:00:00")
        assert d.utcoffset() == dt.timedelta(hours=-4)  # EDT

    def test_unparseable(self):
        assert last_modified_dttm(None) is None
        assert last_modified_dttm("") is None
        assert last_modified_dttm("no dates here") is None
        assert last_modified_dttm("Last modified: 13/45/2025 99:00:00") is None

    def test_embedded_in_longer_comment(self):
        d = last_modified_dttm("crsp.dsf data (Updated 2026-05-01) nightly")
        assert d.date() == dt.date(2026, 5, 1)


class TestStamps:
    def test_roundtrip(self):
        d = last_modified_dttm("Last modified: 11/26/2025 01:40:41")
        stamp = utc_stamp(d)
        # 01:40 EST == 06:40 UTC
        assert stamp == "20251126T064041Z"
        back = parse_utc_stamp(stamp)
        assert back == d.astimezone(dt.timezone.utc)

    def test_none_is_unknown(self):
        assert utc_stamp(None) == UNKNOWN_MODIFIED
        assert parse_utc_stamp(UNKNOWN_MODIFIED) is None

    def test_restore_basename(self):
        assert restore_table_basename("dsf_20251126T064041Z") == "dsf"
        assert restore_table_basename("dsf_unknown_modified") == "dsf"
        assert restore_table_basename("my_table_20251126T064041Z") == "my_table"
        assert restore_table_basename("plain") == "plain"


class TestUpdateAvailable:
    def src(self, c):
        return modified_info("source", c)

    def dst(self, c):
        return modified_info("dest", c)

    def test_source_unparseable_false(self):
        assert not update_available(self.src(None), self.dst("(Updated 2020-01-01)"))
        assert not update_available(self.src("junk"), self.dst(None))

    def test_dest_missing_true(self):
        assert update_available(self.src("(Updated 2026-01-01)"), self.dst(None))

    def test_date_granularity(self):
        # same date, different times → NOT newer (date granularity)
        s = self.src("Last modified: 03/01/2026 23:00:00")
        d = self.dst("Last modified: 03/01/2026 01:00:00")
        assert not update_available(s, d)
        s2 = self.src("Last modified: 03/02/2026 00:00:01")
        assert update_available(s2, d)
