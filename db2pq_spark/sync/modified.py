"""Freshness comparison kernel (reference: db2pq/sync/modified.py:15-47).

Pure host-side logic: parse a source/destination freshness string into a
comparable record, then decide at **date granularity** whether the
destination is stale.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from db2pq_spark.sync.timestamps import last_modified_dttm


@dataclass(frozen=True)
class ModifiedInfo:
    """A parsed freshness marker.

    ``kind`` labels the side ("source"/"dest"/...); ``raw`` is the
    original string; ``dttm_local`` the parsed tz-aware datetime (None if
    unparseable); ``dt`` its date (None if unparseable). Mirrors the
    reference record (db2pq/sync/modified.py:15-32).
    """

    kind: str
    raw: str | None
    dttm_local: dt.datetime | None
    dt: dt.date | None


def modified_info(kind: str, raw: str | None) -> ModifiedInfo:
    """Parse a freshness comment; unparseable → None fields."""
    dttm = last_modified_dttm(raw)
    return ModifiedInfo(
        kind=kind,
        raw=raw,
        dttm_local=dttm,
        dt=dttm.date() if dttm else None,
    )


def update_available(src: ModifiedInfo, dst: ModifiedInfo) -> bool:
    """Date-granularity staleness decision (db2pq/sync/modified.py:34-47):

    - source unparseable → False (can't assert an update exists)
    - destination unparseable/missing → True (must refresh)
    - else: source date strictly newer than destination date
    """
    if src.dt is None:
        return False
    if dst.dt is None:
        return True
    return src.dt > dst.dt
