"""Reference-shaped module-level API (drop-in surface for db2pq users).

The reference exposes its engine as module-level functions
(``db2pq/__init__.py``: db_to_pq, wrds_update_pq, pq_list_files, ...).
This module provides the same names with the same parameter names and
defaults, backed by the Spark :class:`~db2pq_spark.core.Engine` — so a
user of the reference can ``import db2pq_spark as db2pq`` and keep their
scripts.

Deviations (all documented per function):

- ``engine=`` / ``threads=`` / ``batched=`` / ``adbc_*`` knobs are
  accepted and ignored: execution-engine choice collapses to Spark
  (Spark is always batched and partition-parallel; parallelism comes
  from the session, not per-call thread counts).
- ``ibis_to_pq`` accepts a Spark DataFrame as the expression — in this
  engine a DataFrame *is* the deferred expression tree the reference
  uses Ibis for. Genuine Ibis expressions compile to SQL and need a
  live PostgreSQL source.
- Functions touching a live PostgreSQL database (exports, comments,
  DDL) require reachable credentials exactly like the reference; the
  parquet-repository functions are fully local.

Reference: db2pq/__init__.py:7-16 (_PUBLIC_EXPORTS), signatures at
db2pq/core.py:43-, db2pq/postgres/update.py, db2pq/files/.
"""

from __future__ import annotations

import os
from pathlib import Path

from db2pq_spark.core import Engine, UpdateResult
from db2pq_spark.session import get_spark
from db2pq_spark.sinks import repository as _repo
from db2pq_spark.sources.credentials import (
    resolve_pg_connection,
    wrds_connection,
)
from db2pq_spark.sources.jdbc import JdbcSource


def resolve_data_dir(data_dir: str | Path | None = None) -> Path:
    """data_dir > $DATA_DIR > cwd (reference db2pq/files/paths.py:13-16)."""
    return Path(data_dir or os.environ.get("DATA_DIR") or ".")


_ENGINES: dict[Path, Engine] = {}


def _engine(data_dir: str | Path | None = None) -> Engine:
    root = resolve_data_dir(data_dir)
    eng = _ENGINES.get(root)
    if eng is None:
        eng = _ENGINES[root] = Engine(get_spark(), root)
    return eng


def _pg_source(user=None, host=None, database=None, dbname=None,
               port=None) -> JdbcSource:
    from db2pq_spark.sources.credentials import WRDS_HOST

    conn = resolve_pg_connection(host=host, database=database or dbname,
                                 user=user, port=port)
    url = conn.jdbc_url
    if conn.host == WRDS_HOST:
        # WRDS's pgbouncer requires SSL; every path that resolves to the
        # WRDS host must carry it, not just _wrds_source()
        url += "?sslmode=require"
    return JdbcSource(url=url, user=conn.user, password=conn.password)


def _wrds_source(wrds_id=None) -> JdbcSource:
    conn = wrds_connection(user=wrds_id or os.environ.get("WRDS_ID"))
    return JdbcSource(url=conn.jdbc_url + "?sslmode=require",
                      user=conn.user, password=conn.password)


def _get_pg_comment(source: JdbcSource, schema: str, table_name: str):
    """Source table comment via JDBC (reference get_pg_comment,
    db2pq/postgres/comments.py:6-19). Returns None when unreadable."""
    from db2pq_spark.sources.jdbc import jdbc_read_options, read_jdbc

    sql = ("SELECT obj_description(to_regclass("
           f"'\"{schema}\".\"{table_name}\"'), 'pg_class') AS comment")
    try:
        rows = read_jdbc(_engine().spark,
                         jdbc_read_options(source, sql=sql)).collect()
        return rows[0][0] if rows else None
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Forward exports (database → parquet repository)
# ---------------------------------------------------------------------------

def db_to_pq(
    table_name,
    schema,
    *,
    user=None,
    host=None,
    database=None,
    port=None,
    data_dir=None,
    col_types=None,
    row_group_size=1_048_576,
    obs=None,
    modified=None,
    alt_table_name=None,
    keep=None,
    drop=None,
    rename=None,
    where=None,
    batched=True,          # accepted for parity; Spark is always batched
    threads=None,          # parallelism comes from the Spark session
    tz="UTC",
    engine=None,           # engine choice collapses to Spark
    numeric_mode=None,
    adbc_batch_size_hint_bytes=None,
    adbc_use_copy=None,
    archive=False,
    archive_dir=None,
):
    """Export a PostgreSQL table to the parquet repository
    (reference db2pq/core.py:43-265)."""
    _check_archive_dir(archive_dir)
    src = _pg_source(user=user, host=host, database=database, port=port)
    if modified is None:
        modified = _get_pg_comment(src, schema, table_name)
    eng = _engine(data_dir)
    return eng.db_to_pq(
        src, schema, table_name,
        alt_table=alt_table_name,
        keep=keep, drop=drop, rename=rename, col_types=col_types,
        where=where, obs=obs, numeric_mode=numeric_mode, tz=tz,
        last_modified=modified, archive=archive,
        row_group_rows=row_group_size,
    )


def wrds_pg_to_pq(table_name, schema, *, wrds_id=None, **kwargs):
    """WRDS-hosted variant of :func:`db_to_pq`
    (reference db2pq/core.py:382-526; fixed host at :493,504-506)."""
    conn = wrds_connection(user=wrds_id or os.environ.get("WRDS_ID"))
    return db_to_pq(table_name, schema, user=conn.user, host=conn.host,
                    database=conn.database, port=conn.port, **kwargs)


def wrds_sql_to_pq(
    sql,
    table_name,
    schema,
    *,
    wrds_id=None,
    data_dir=None,
    row_group_size=1_048_576,
    modified=None,
    alt_table_name=None,
    threads=None,
    tz="UTC",
    engine=None,
    adbc_batch_size_hint_bytes=None,
    adbc_use_copy=None,
    archive=False,
    archive_dir=None,
):
    """Arbitrary-SQL export: the SQL executes on the source database
    (reference db2pq/core.py:529-661)."""
    _check_archive_dir(archive_dir)
    src = _wrds_source(wrds_id)
    eng = _engine(data_dir)
    return eng.sql_to_pq(sql, schema, alt_table_name or table_name,
                         source=src, tz=tz, last_modified=modified,
                         archive=archive, row_group_rows=row_group_size)


def _ibis_backend_source(expr):
    """Derive a :class:`JdbcSource` from an Ibis expression's bound
    backend (PG connection params), mirroring how the reference pulls
    the connection off the expression (db2pq/ibis.py:17-60). Returns
    None when the backend shape is unrecognized — callers then require
    an explicit ``source=``."""
    from db2pq_spark.sources.jdbc import JdbcSource

    try:
        backend = expr._find_backend()
        con = backend.con          # psycopg / psycopg2 connection
        info = con.info
        url = f"jdbc:postgresql://{info.host}:{info.port}/{info.dbname}"
        return JdbcSource(url, user=info.user,
                          password=info.password or None)
    except Exception:
        return None


def ibis_to_pq(table, out_file, *, engine=None, row_group_size=1_048_576,
               threads=None, tz="UTC", adbc_batch_size_hint_bytes=None,
               adbc_use_copy=None, source=None, **writer_kwargs):
    """Deferred-expression export (reference db2pq/ibis.py:17-146).

    Two expression dialects are accepted:

    - a **Spark DataFrame** — this engine's native deferred expression
      tree; exported through the full plan pipeline.
    - a **genuine Ibis table expression** (when ``ibis`` is installed):
      compiled to SQL with ``ibis.to_sql`` and executed **on the source
      database** via the JDBC query path — exactly the reference's
      compile-and-stream shape. The connection comes from the
      expression's bound backend, or pass ``source=`` (a
      :class:`~db2pq_spark.sources.jdbc.JdbcSource`) explicitly.

    ``out_file`` is the destination parquet path (reference semantics).
    """
    from pyspark.sql import DataFrame

    out = Path(out_file)
    eng = _engine(out.parent.parent if out.parent.name else None)
    if isinstance(table, DataFrame):
        return eng.df_to_pq(table, out.parent.name, out.stem, tz=tz,
                            row_group_rows=row_group_size, **writer_kwargs)
    try:
        import ibis
    except ImportError:
        raise TypeError(
            "ibis_to_pq expects a Spark DataFrame (the engine's deferred "
            "expression) — or a genuine Ibis expression, which requires "
            "the 'ibis-framework' package") from None
    sql = str(ibis.to_sql(table))
    src = source or _ibis_backend_source(table)
    if src is None:
        raise ValueError(
            "could not derive a connection from the Ibis expression's "
            "backend; pass source=JdbcSource(...) explicitly")
    return eng.sql_to_pq(sql, out.parent.name, out.stem, source=src,
                         tz=tz, row_group_rows=row_group_size,
                         **writer_kwargs)


def db_schema_to_pq(schema, *, user=None, host=None, dbname=None,
                    database=None, port=None, data_dir=None,
                    row_group_size=1_048_576, batched=True, threads=None,
                    engine=None, numeric_mode=None, archive=False,
                    archive_dir=None):
    """Export every table of a schema (reference db2pq/core.py:765-892).
    Returns the list of written paths (reference returns file names)."""
    _check_archive_dir(archive_dir)
    src = _pg_source(user=user, host=host, database=database, dbname=dbname,
                     port=port)
    eng = _engine(data_dir)
    results = eng.schema_to_pq(src, schema, numeric_mode=numeric_mode,
                               archive=archive,
                               row_group_rows=row_group_size)
    return [p for p in results.values() if p is not None]


# ---------------------------------------------------------------------------
# Conditional (freshness-gated) exports
# ---------------------------------------------------------------------------

def pg_update_pq(table_name, schema, *, force=False, **kwargs):
    """Freshness-gated :func:`db_to_pq` (reference db2pq/core.py:955-1026):
    export only when the source table comment is newer than the stored
    parquet ``last_modified``; unparseable source comment → refuse."""
    data_dir = kwargs.get("data_dir")
    src = _pg_source(user=kwargs.get("user"), host=kwargs.get("host"),
                     database=kwargs.get("database"),
                     port=kwargs.get("port"))
    comment = kwargs.pop("modified", None) or _get_pg_comment(
        src, schema, table_name)
    eng = _engine(data_dir)
    result = eng.update_pq(
        schema, kwargs.get("alt_table_name") or table_name, comment,
        lambda: db_to_pq(table_name, schema, modified=comment, **kwargs),
        force=force,
    )
    _print_update(result)
    return result.path


def wrds_update_pq(table_name, schema, *, wrds_id=None, force=False,
                   use_sas=False, **kwargs):
    """Freshness-gated WRDS export (reference db2pq/core.py:1028-1212).
    ``use_sas=True`` sources the freshness stamp from SAS PROC CONTENTS
    over SSH instead of the PostgreSQL table comment."""
    conn = wrds_connection(user=wrds_id or os.environ.get("WRDS_ID"))
    comment = kwargs.pop("modified", None)
    if comment is None and use_sas:
        from db2pq_spark.sync.sas import sas_modified_via_ssh

        # reference SSH endpoint (db2pq/sas/stream.py:27); SAS library
        # name == the PostgreSQL schema name on WRDS
        comment = sas_modified_via_ssh(
            "wrds-cloud-sshkey.wharton.upenn.edu", conn.user,
            schema, table_name)
    if comment is None:
        comment = _get_pg_comment(
            _wrds_source(conn.user), schema, table_name)
    eng = _engine(kwargs.get("data_dir"))
    result = eng.update_pq(
        schema, kwargs.get("alt_table_name") or table_name, comment,
        lambda: wrds_pg_to_pq(table_name, schema, wrds_id=conn.user,
                              modified=comment, **kwargs),
        force=force,
    )
    _print_update(result)
    return result.path


def wrds_update_schema(schema, *, wrds_id=None, data_dir=None,
                       threads=None, archive=False):
    """Refresh every repository table of a schema from WRDS
    (reference db2pq/core.py:1217-1254)."""
    root = resolve_data_dir(data_dir)
    return [
        wrds_update_pq(tbl, schema, wrds_id=wrds_id, data_dir=root,
                       archive=archive)
        for tbl in _repo.pq_list_files(root, schema)
    ]


def _print_update(result: UpdateResult) -> None:
    msg = {"updated": "Updated", "skipped": "Skipped (up to date)",
           "refused": "Refused", "empty": "Empty result"}[result.action]
    detail = f": {result.reason}" if result.reason else ""
    print(f"{msg} {result.schema}.{result.table}{detail}")


# ---------------------------------------------------------------------------
# Reverse paths (parquet/database → PostgreSQL)
# ---------------------------------------------------------------------------

def pq_to_pg(table_name, schema, *, data_dir=None, user=None, host=None,
             dbname=None, database=None, port=None, dst_schema=None,
             alt_table_name=None, engine=None, create_roles=True,
             source_comment=None):
    """Load a repository table into PostgreSQL
    (reference db2pq/postgres/update.py:480-568)."""
    src = _pg_source(user=user, host=host, database=database, dbname=dbname,
                     port=port)
    eng = _engine(data_dir)
    if create_roles:
        _ensure_schema_and_roles(src, dst_schema or schema)
    eng.pq_to_db(schema, table_name, src, dest_schema=dst_schema,
                 dest_table=alt_table_name or table_name)
    if source_comment is None:
        source_comment = _repo.get_modified_pq(
            _repo.table_path(eng.data_dir, schema, table_name))
    if source_comment:
        set_table_comment(schema=dst_schema or schema,
                          table_name=alt_table_name or table_name,
                          comment=source_comment, user=user, host=host,
                          dbname=database or dbname, port=port)


def pq_update_pg(table_name, schema, *, data_dir=None, force=False,
                 **kwargs):
    """Freshness-gated :func:`pq_to_pg`
    (reference db2pq/postgres/update.py:570-691): load only when the
    parquet ``last_modified`` is newer than the destination table
    comment."""
    from db2pq_spark.sync.modified import modified_info, update_available

    eng = _engine(data_dir)
    pq_comment = _repo.get_modified_pq(
        _repo.table_path(eng.data_dir, schema, table_name))
    dst = _pg_source(user=kwargs.get("user"), host=kwargs.get("host"),
                     database=kwargs.get("database"),
                     dbname=kwargs.get("dbname"), port=kwargs.get("port"))
    dst_comment = _get_pg_comment(
        dst, kwargs.get("dst_schema") or schema,
        kwargs.get("alt_table_name") or table_name)
    src_info = modified_info("source", pq_comment)
    dst_info = modified_info("dest", dst_comment)
    if not force:
        if src_info.dt is None:
            print(f"Refused {schema}.{table_name}: parquet has no "
                  "parseable last_modified")
            return None
        if not update_available(src_info, dst_info):
            print(f"Skipped (up to date) {schema}.{table_name}")
            return None
    pq_to_pg(table_name, schema, data_dir=data_dir,
             source_comment=pq_comment, **kwargs)
    print(f"Updated {schema}.{table_name}")
    return table_name


def db_to_pg(table_name, schema, *, user=None, host=None, database=None,
             port=None, dst_user=None, dst_host=None, dst_database=None,
             dst_port=None, dst_schema=None, col_types=None, obs=None,
             alt_table_name=None, keep=None, drop=None, rename=None,
             tz="UTC", create_roles=True):
    """PG→PG copy through Spark (reference db2pq/core.py:269-379):
    planned read from the source, partition-parallel JDBC write to the
    destination."""
    from db2pq_spark.plans.plan import build_plan
    from db2pq_spark.sources.jdbc import (
        jdbc_read_options,
        read_jdbc,
        write_jdbc,
    )

    src = _pg_source(user=user, host=host, database=database, port=port)
    dst = _pg_source(user=dst_user or user, host=dst_host or host,
                     database=dst_database or database,
                     port=dst_port or port)
    eng = _engine()
    probe = read_jdbc(eng.spark, jdbc_read_options(
        src, sql=f'SELECT * FROM "{schema}"."{table_name}" LIMIT 0'))
    plan = build_plan(probe.columns, keep=keep, drop=drop, rename=rename,
                      col_types=col_types, where=None, obs=obs)
    df = read_jdbc(eng.spark, jdbc_read_options(
        src, plan=plan, schema=schema, table=table_name))
    from db2pq_spark.functions.timestamps import normalize_timestamps

    df = normalize_timestamps(df, tz)
    if create_roles:
        _ensure_schema_and_roles(dst, dst_schema or schema)
    write_jdbc(df, dst, dst_schema or schema,
               alt_table_name or table_name)


def wrds_update_pg(table_name, schema, *, wrds_id=None, force=False,
                   dst_user=None, dst_host=None, dst_database=None,
                   dst_port=None, dst_schema=None, create_roles=True,
                   **kwargs):
    """WRDS → local PostgreSQL, freshness-gated
    (reference db2pq/postgres/update.py:369-477)."""
    conn = wrds_connection(user=wrds_id or os.environ.get("WRDS_ID"))
    dest_table = kwargs.get("alt_table_name") or table_name
    src_comment = _get_pg_comment(_wrds_source(conn.user), schema,
                                  table_name)
    dst = _pg_source(user=dst_user, host=dst_host, database=dst_database,
                     port=dst_port)
    dst_comment = _get_pg_comment(dst, dst_schema or schema, dest_table)
    from db2pq_spark.sync.modified import modified_info, update_available

    if not force:
        src_info = modified_info("source", src_comment)
        if src_info.dt is None:
            print(f"Refused {schema}.{table_name}: no parseable WRDS "
                  "comment")
            return None
        if not update_available(src_info,
                                modified_info("dest", dst_comment)):
            print(f"Skipped (up to date) {schema}.{table_name}")
            return None
    db_to_pg(table_name, schema, user=conn.user, host=conn.host,
             database=conn.database, port=conn.port, dst_user=dst_user,
             dst_host=dst_host, dst_database=dst_database,
             dst_port=dst_port, dst_schema=dst_schema,
             create_roles=create_roles, **kwargs)
    if src_comment:
        set_table_comment(schema=dst_schema or schema,
                          table_name=dest_table, comment=src_comment,
                          user=dst_user, host=dst_host,
                          dbname=dst_database, port=dst_port)
    return table_name


def wrds_pg_to_pg(table_name, schema, *, wrds_id=None, **kwargs):
    """Unconditional WRDS → local PostgreSQL copy
    (reference db2pq/core.py:663-763)."""
    conn = wrds_connection(user=wrds_id or os.environ.get("WRDS_ID"))
    return db_to_pg(table_name, schema, user=conn.user, host=conn.host,
                    database=conn.database, port=conn.port, **kwargs)


# ---------------------------------------------------------------------------
# Parquet repository management (fully local)
# ---------------------------------------------------------------------------

def pq_list_files(schema, *, data_dir=None, archive=False,
                  archive_dir=None):
    """List table stems in a schema (reference db2pq/files/paths.py:27-60)."""
    _check_archive_dir(archive_dir)
    return _repo.pq_list_files(resolve_data_dir(data_dir), schema,
                               archive=archive)


def pq_archive(table_name=None, schema=None, data_dir=None, file_name=None,
               archive_dir=None):
    """Archive the active parquet file of a table
    (reference db2pq/files/parquet.py:294-359)."""
    _check_archive_dir(archive_dir)
    if file_name is not None and table_name is None:
        table_name = Path(file_name).stem
    return _repo.pq_archive(resolve_data_dir(data_dir), schema, table_name)


def pq_restore(file_basename, schema, data_dir=None, archive=True,
               archive_dir=None):
    """Restore an archived file to active
    (reference db2pq/files/parquet.py:371-459)."""
    _check_archive_dir(archive_dir)
    return _repo.pq_restore(resolve_data_dir(data_dir), schema,
                            file_basename, archive_current=archive)


def pq_remove(table_name=None, schema=None, data_dir=None, archive=False,
              file_name=None, archive_dir=None):
    """Remove an active or archived parquet file
    (reference db2pq/files/parquet.py:461-534)."""
    _check_archive_dir(archive_dir)
    if file_name is not None and table_name is None:
        table_name = Path(file_name).stem
    return _repo.pq_remove(resolve_data_dir(data_dir), schema, table_name,
                           archive=archive)


def pq_last_modified(schema=None, *, data_dir=None):
    """Freshness summary of the repository
    (reference db2pq/files/parquet.py:783-895)."""
    return _repo.pq_last_modified(resolve_data_dir(data_dir), schema)


def _check_archive_dir(archive_dir) -> None:
    if archive_dir not in (None, "archive"):
        raise NotImplementedError(
            "custom archive_dir is not supported; the repository uses "
            "<data_dir>/<schema>/archive (reference default)")


# ---------------------------------------------------------------------------
# DDL / administration (JDBC statement passthrough)
# ---------------------------------------------------------------------------

def process_sql(sql, *, user=None, host=None, dbname=None, port=None,
                params=None):
    """Execute arbitrary SQL on the destination database
    (reference db2pq/postgres/update.py:27-68)."""
    if params:
        raise NotImplementedError(
            "parameterized statements are not supported on the JDBC "
            "passthrough; inline literals or use Engine.sql_to_pq")
    from db2pq_spark.sources.jdbc import execute_sql

    src = _pg_source(user=user, dbname=dbname, port=port, host=host)
    return execute_sql(_engine().spark, src, sql)


def set_table_comment(conn=None, *, schema, table_name, comment, user=None,
                      host=None, dbname=None, port=None):
    """COMMENT ON TABLE passthrough
    (reference db2pq/postgres/comments.py:35-93)."""
    if conn is not None:
        raise NotImplementedError(
            "pass connection parameters instead of an open psycopg "
            "connection (this engine drives JDBC)")
    lit = "NULL" if comment is None else "'" + comment.replace("'", "''") + "'"
    process_sql(
        f'COMMENT ON TABLE "{schema}"."{table_name}" IS {lit}',
        user=user, host=host, dbname=dbname, port=port,
    )


def _ensure_schema_and_roles(source: JdbcSource, schema: str) -> None:
    """CREATE SCHEMA IF NOT EXISTS on the destination (reference
    _ensure_schema_and_roles, db2pq/postgres/update.py:92-122; the
    role/grant bootstrap is deployment policy — apply via process_sql)."""
    from db2pq_spark.sources.jdbc import execute_sql

    execute_sql(_engine().spark, source,
                f'CREATE SCHEMA IF NOT EXISTS "{schema}"')


def db_schema_tables(schema, *, views=False, user=None, host=None,
                     database=None, dbname=None, port=None):
    """List relations in a PostgreSQL schema
    (reference db2pq/postgres/schema.py:35-86)."""
    from db2pq_spark.sources.jdbc import jdbc_read_options, read_jdbc

    src = _pg_source(user=user, host=host, database=database, dbname=dbname,
                     port=port)
    kinds = "('BASE TABLE', 'VIEW')" if views else "('BASE TABLE')"
    sql = ("SELECT table_name FROM information_schema.tables "
           f"WHERE table_schema = '{schema}' AND table_type IN {kinds} "
           "ORDER BY table_name")
    rows = read_jdbc(_engine().spark,
                     jdbc_read_options(src, sql=sql)).collect()
    return [r[0] for r in rows]


def wrds_get_tables(schema, *, wrds_id=None, views=False):
    """List relations in a WRDS schema
    (reference db2pq/postgres/schema.py:89-120)."""
    conn = wrds_connection(user=wrds_id or os.environ.get("WRDS_ID"))
    return db_schema_tables(schema, views=views, user=conn.user,
                            host=conn.host, database=conn.database,
                            port=conn.port)


# ---------------------------------------------------------------------------
# Engine-config shims (the engine is always Spark)
# ---------------------------------------------------------------------------

_DEFAULT_ENGINE = "spark"


def set_default_engine(engine: str) -> None:
    """Reference config shim (db2pq/config.py:17-40). Any value is
    accepted for script compatibility; execution is always Spark."""
    global _DEFAULT_ENGINE
    if not isinstance(engine, str) or not engine:
        raise ValueError(f"invalid engine: {engine!r}")
    _DEFAULT_ENGINE = engine


def get_default_engine() -> str:
    """Always effectively Spark (reference db2pq/config.py:42-82)."""
    return _DEFAULT_ENGINE


def close_adbc_cached() -> None:
    """No-op: connection pooling is executor-managed in Spark
    (reference db2pq/postgres/adbc.py:16-52)."""


PUBLIC_EXPORTS = [
    "db_to_pq", "pg_update_pq", "db_to_pg", "ibis_to_pq", "wrds_pg_to_pq",
    "wrds_sql_to_pq", "wrds_pg_to_pg", "db_schema_to_pq", "wrds_update_pq",
    "pq_list_files", "wrds_update_schema", "pq_last_modified", "pq_archive",
    "pq_restore", "pq_remove", "db_schema_tables", "wrds_get_tables",
    "wrds_update_pg", "pq_to_pg", "pq_update_pg", "process_sql",
    "set_table_comment", "close_adbc_cached", "set_default_engine",
    "get_default_engine",
]
