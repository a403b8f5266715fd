"""Freshness-comment timestamp parsing (host-side, exact reference parity).

The sync kernel's behavior depends on these exact formats
(reference: db2pq/files/timestamps.py:8-42):

- ``"Last modified: MM/DD/YYYY HH:MM:SS"`` — a naive datetime in
  America/New_York (WRDS comment style).
- ``"... (Updated YYYY-MM-DD)"`` — date only; assumed 02:00
  America/New_York (the WRDS nightly refresh hour).
- Archive filename stamps: ``YYYYMMDDTHHMMSSZ`` in UTC, plus the
  ``_unknown_modified`` fallback (db2pq/files/parquet.py:294-369).

DST handling uses zoneinfo's default fold=0 (earliest occurrence for
ambiguous local times), matching the reference's behavior.
"""

from __future__ import annotations

import datetime as dt
import re
from zoneinfo import ZoneInfo

NY = ZoneInfo("America/New_York")
UTC = dt.timezone.utc

_LAST_MODIFIED_RE = re.compile(
    r"Last modified:\s*(\d{2})/(\d{2})/(\d{4})\s+(\d{2}):(\d{2}):(\d{2})"
)
_UPDATED_RE = re.compile(r"\(Updated\s+(\d{4})-(\d{2})-(\d{2})\)")
_STAMP_RE = re.compile(r"^(\d{8})T(\d{6})Z$")

UNKNOWN_MODIFIED = "unknown_modified"


def last_modified_dttm(comment: str | None) -> dt.datetime | None:
    """Parse a table comment into a tz-aware datetime, or None.

    Two formats (reference db2pq/files/timestamps.py:24-38): the
    ``Last modified:`` NY-local datetime and the ``(Updated ...)`` date
    assumed at 02:00 NY.
    """
    if not comment:
        return None
    m = _LAST_MODIFIED_RE.search(comment)
    if m:
        mo, d, y, hh, mm, ss = (int(g) for g in m.groups())
        try:
            return dt.datetime(y, mo, d, hh, mm, ss, tzinfo=NY)
        except ValueError:
            return None
    m = _UPDATED_RE.search(comment)
    if m:
        y, mo, d = (int(g) for g in m.groups())
        try:
            return dt.datetime(y, mo, d, 2, 0, 0, tzinfo=NY)
        except ValueError:
            return None
    return None


def utc_stamp(dttm: dt.datetime | None) -> str:
    """Filename-safe UTC stamp ``YYYYMMDDTHHMMSSZ`` for archive suffixes
    (reference db2pq/files/timestamps.py:11-21); unparseable → the
    ``unknown_modified`` sentinel."""
    if dttm is None:
        return UNKNOWN_MODIFIED
    return dttm.astimezone(UTC).strftime("%Y%m%dT%H%M%SZ")


def parse_utc_stamp(stamp: str) -> dt.datetime | None:
    """Inverse of :func:`utc_stamp` (None for the unknown sentinel)."""
    m = _STAMP_RE.match(stamp)
    if not m:
        return None
    return dt.datetime.strptime(stamp, "%Y%m%dT%H%M%SZ").replace(tzinfo=UTC)


def restore_table_basename(stem: str) -> str:
    """Recover the table name from an archive stem
    ``<table>_<YYYYMMDDTHHMMSSZ>`` / ``<table>_unknown_modified``
    (reference db2pq/files/parquet.py:361-369)."""
    if stem.endswith(f"_{UNKNOWN_MODIFIED}"):
        return stem[: -len(UNKNOWN_MODIFIED) - 1]
    parts = stem.rsplit("_", 1)
    if len(parts) == 2 and _STAMP_RE.match(parts[1]):
        return parts[0]
    return stem
