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
