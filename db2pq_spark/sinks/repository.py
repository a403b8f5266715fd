"""Parquet repository lifecycle management.

Reference parity for the file-repository operators (SURVEY §2.9):
``pq_list_files`` (db2pq/files/paths.py:27-60), ``pq_archive``
(db2pq/files/parquet.py:294-359), ``pq_restore`` (:371-459),
``pq_remove`` (:461-534), ``pq_last_modified`` (:783-895).

Tables are directories (or single files in compat mode); both are
handled uniformly.
"""

from __future__ import annotations

import os
from pathlib import Path

from db2pq_spark.sinks.parquet_sink import (
    archive_dir,
    archive_existing,
    get_modified_pq,
    table_path,
    _rm,
)
from db2pq_spark.sync.timestamps import restore_table_basename


def pq_list_files(
    data_dir: str | Path, schema: str, archive: bool = False
) -> list[str]:
    """Stems of tables (or archived versions) in a schema dir."""
    base = archive_dir(data_dir, schema) if archive else Path(data_dir) / schema
    if not base.exists():
        return []
    return sorted(
        p.stem
        for p in base.glob("*.parquet")
        if not p.name.startswith(".") and p.name != "archive"
    )


def pq_archive(data_dir: str | Path, schema: str, table: str) -> Path | None:
    """Archive the active table; returns the archive path or None."""
    return archive_existing(data_dir, schema, table)


def pq_restore(
    data_dir: str | Path,
    schema: str,
    archived_stem: str,
    archive_current: bool = True,
) -> Path:
    """Move an archived version back to being the active table.

    With ``archive_current=True`` the currently-active table is archived
    first; on any failure the original state is restored (rollback, as in
    db2pq/files/parquet.py:371-459).
    """
    src = archive_dir(data_dir, schema) / f"{archived_stem}.parquet"
    if not src.exists():
        raise FileNotFoundError(f"no archived file {src}")
    table = restore_table_basename(archived_stem)
    dest = table_path(data_dir, schema, table)

    current_archived: Path | None = None
    if dest.exists():
        if archive_current:
            current_archived = archive_existing(data_dir, schema, table)
        else:
            _rm(dest)
    try:
        os.replace(src, dest)
    except OSError:
        if current_archived is not None:
            os.replace(current_archived, dest)
        raise
    return dest


def pq_remove(
    data_dir: str | Path, schema: str, name: str, archive: bool = False
) -> bool:
    """Delete an active table (name = table) or an archived version
    (name = archived stem). Returns whether anything was removed."""
    if archive:
        target = archive_dir(data_dir, schema) / f"{name}.parquet"
    else:
        target = table_path(data_dir, schema, name)
    if not target.exists():
        return False
    _rm(target)
    return True


def pq_last_modified(
    data_dir: str | Path, schema: str | None = None
) -> list[dict[str, str | None]]:
    """Freshness summary across the repository (reference returns a
    pandas DataFrame, db2pq/files/parquet.py:783-895; we return records —
    trivially convertible and dependency-free)."""
    root = Path(data_dir)
    schemas = [schema] if schema else sorted(
        p.name for p in root.iterdir() if p.is_dir()
    )
    out: list[dict[str, str | None]] = []
    for sch in schemas:
        for stem in pq_list_files(root, sch):
            path = table_path(root, sch, stem)
            out.append(
                {
                    "schema": sch,
                    "table": stem,
                    "file": str(path),
                    "last_modified": get_modified_pq(path),
                }
            )
    return out


def pq_vacuum(
    data_dir: str | Path,
    schema: str,
    keep_last: int | None = None,
    older_than: "dt.datetime | None" = None,
) -> list[str]:
    """Prune archived table versions; returns removed stems.

    Retention by count (``keep_last`` newest versions per table) and/or
    age (``older_than``: drop versions stamped before it). Versions with
    an unparseable stamp (``_unknown_modified``) sort oldest, so they
    are pruned first by ``keep_last`` but are never age-pruned (no
    evidence of age). At least one selector is required — a bare
    vacuum that empties the archive is almost always a mistake.

    [extension] The reference archives but never prunes
    (db2pq/files/parquet.py:294-359 has no deletion path); unbounded
    archives are a real operational cost at repository scale.
    """
    if keep_last is None and older_than is None:
        raise ValueError("pass keep_last and/or older_than")
    import datetime as dt

    if older_than is not None and older_than.tzinfo is None:
        # stamps parse tz-aware (UTC); a naive cutoff (datetime.now())
        # would raise mid-prune — normalize up front, assuming UTC
        older_than = older_than.replace(tzinfo=dt.timezone.utc)
    from db2pq_spark.sync.timestamps import (
        parse_utc_stamp,
        restore_table_basename,
    )

    base = archive_dir(data_dir, schema)
    removed: list[str] = []
    by_table: dict[str, list[tuple]] = {}
    for stem in pq_list_files(data_dir, schema, archive=True):
        table = restore_table_basename(stem)
        stamp = stem[len(table) + 1:] if stem.startswith(f"{table}_") else ""
        by_table.setdefault(table, []).append(
            (parse_utc_stamp(stamp), stem))

    for table, versions in by_table.items():
        # newest first; None stamps (unknown age) last
        versions.sort(key=lambda v: (v[0] is None,
                                     -(v[0].timestamp() if v[0] else 0)))
        for rank, (stamped, stem) in enumerate(versions):
            too_many = keep_last is not None and rank >= keep_last
            too_old = (older_than is not None and stamped is not None
                       and stamped < older_than)
            if too_many or too_old:
                _rm(base / f"{stem}.parquet")
                removed.append(stem)
    return removed
