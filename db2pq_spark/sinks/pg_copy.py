"""PostgreSQL binary-COPY writer — the bulk-load fast path.

Reference behavior being re-expressed: the reference streams
``COPY ... (FORMAT BINARY)`` between databases
(db2pq/postgres/copy.py:3-27) and loads parquet into PG the same way;
plain JDBC batch INSERT (our S10/S11 default, sources/jdbc.py:154) is
typically 5-10× slower on real PG loads because every row round-trips
the SQL layer.

Spark-first adaptation: **each executor partition opens its own libpq
connection** and streams its rows through one ``COPY ... FROM STDIN
(FORMAT BINARY)`` — N partitions load in parallel (the reference is a
single stream). The driver never materializes data; the per-partition
closure receives rows lazily from the shuffle/scan.

``psycopg`` (v3) does the binary wire encoding; it is not installed in
this container, so the executor body import-gates it and the unit tests
drive the framing logic (COPY SQL, type registration, row streaming)
through a fake copy object. Integration tests are skip-gated on a live
PG exactly like the reference's ``local_pg`` marker.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

from pyspark.sql import DataFrame

#: Spark simpleString → PG type name for psycopg's binary dumpers
#: (``Copy.set_types``). Anything unlisted maps to ``None``; if ANY
#: column is unmapped, type registration is skipped wholesale and
#: psycopg infers every dumper from the Python values (see
#: :func:`stream_rows` — ``set_types`` rejects None entries).
_SPARK_TO_PG: dict[str, str] = {
    "boolean": "bool",
    "tinyint": "int2",
    "smallint": "int2",
    "int": "int4",
    "bigint": "int8",
    "float": "float4",
    "double": "float8",
    "string": "text",
    "binary": "bytea",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
}


def pg_type_for(spark_type: str) -> str | None:
    """PG wire type for a Spark ``simpleString`` type (None → let
    psycopg infer; e.g. decimals map to ``numeric``)."""
    s = spark_type.lower()
    if s.startswith("decimal"):
        return "numeric"
    return _SPARK_TO_PG.get(s)


def quote_ident(name: str) -> str:
    """Quote a PG identifier (server-side quoting parity with the
    reference's qident, db2pq/postgres/select_sql.py)."""
    return '"' + name.replace('"', '""') + '"'


def copy_sql(schema: str, table: str, cols: list[str]) -> str:
    """The exact COPY framing the reference uses
    (db2pq/postgres/copy.py:20-23): explicit quoted column list,
    binary format."""
    cols_csv = ", ".join(quote_ident(c) for c in cols)
    return (f"COPY {quote_ident(schema)}.{quote_ident(table)} "
            f"({cols_csv}) FROM STDIN (FORMAT BINARY)")


def stream_rows(copy: Any, rows: Iterable[tuple], types: list[str | None],
                set_types: bool = True) -> int:
    """Feed rows into an open psycopg ``Copy`` object; returns count.
    Split out from the connection handling so unit tests can drive it
    with a fake.

    ``Copy.set_types`` accepts only type names/OIDs — a None entry (an
    unmapped Spark type) would crash it, so types are registered only
    when EVERY column mapped; otherwise psycopg infers all dumpers from
    the Python values."""
    if set_types and all(t is not None for t in types) and types:
        copy.set_types(types)
    n = 0
    for row in rows:
        copy.write_row(tuple(row))
        n += 1
    return n


#: keywords libpq itself accepts (PostgreSQL docs §32.1.2) — anything
#: else in a JDBC url's query string is a JDBC-driver knob that libpq
#: would reject at connect time, so it is translated or dropped.
_LIBPQ_KEYS = frozenset({
    "host", "hostaddr", "port", "dbname", "user", "password", "passfile",
    "channel_binding", "connect_timeout", "client_encoding", "options",
    "application_name", "fallback_application_name", "keepalives",
    "keepalives_idle", "keepalives_interval", "keepalives_count",
    "tcp_user_timeout", "replication", "gssencmode", "sslmode",
    "requiressl", "sslcompression", "sslcert", "sslkey", "sslpassword",
    "sslrootcert", "sslcrl", "sslcrldir", "sslsni", "requirepeer",
    "ssl_min_protocol_version", "ssl_max_protocol_version", "krbsrvname",
    "gsslib", "service", "target_session_attrs", "load_balance_hosts",
})

#: JDBC-only query keys with a libpq equivalent (keys lowercased)
_JDBC_KEY_ALIASES = {
    "logintimeout": "connect_timeout",
    "connecttimeout": "connect_timeout",
    "applicationname": "application_name",
}


def _quote_conninfo_value(v: str) -> str:
    """Quote a conninfo value per libpq rules: empty values and values
    containing whitespace, quotes, or backslashes are wrapped in single
    quotes with ``\\`` and ``'`` backslash-escaped — otherwise a
    password like ``x host=evil`` would inject conninfo parameters."""
    if v == "" or any(c in v for c in " \t\n'\\"):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return v


def jdbc_url_to_dsn(url: str, user: str | None = None,
                    password: str | None = None) -> str:
    """``jdbc:postgresql://host:port/db?k=v`` → libpq connection string.

    Values are quoted per libpq conninfo rules; query keys are filtered
    to what libpq accepts (``ssl=true`` → ``sslmode=require``,
    ``loginTimeout`` → ``connect_timeout``; unknown JDBC-driver knobs
    are dropped rather than handed to libpq, which rejects unknown
    keywords at connect time)."""
    if not url.startswith("jdbc:postgresql://"):
        raise ValueError(f"not a PostgreSQL JDBC url: {url}")
    rest = url[len("jdbc:postgresql://"):]
    query = ""
    if "?" in rest:
        rest, query = rest.split("?", 1)
    hostport, _, db = rest.partition("/")
    host, _, port = hostport.partition(":")
    pairs: list[tuple[str, str]] = [("host", host)]
    if port:
        pairs.append(("port", port))
    if db:
        pairs.append(("dbname", db))
    if user is not None:
        pairs.append(("user", user))
    if password is not None:
        pairs.append(("password", password))
    for kv in query.split("&"):
        if not kv or "=" not in kv:
            continue
        k, v = kv.split("=", 1)
        lk = k.lower()
        if lk == "ssl":
            if v.lower() in ("true", "1", "on", ""):
                pairs.append(("sslmode", "require"))
        elif lk in _JDBC_KEY_ALIASES:
            pairs.append((_JDBC_KEY_ALIASES[lk], v))
        elif lk in _LIBPQ_KEYS:
            pairs.append((lk, v))
        # else: JDBC-driver-only knob — no libpq meaning, dropped
    return " ".join(f"{k}={_quote_conninfo_value(v)}" for k, v in pairs)


def utcize_row(row: tuple, ts_idx: list[int]) -> tuple:
    """Attach UTC instants to the tz-naive datetimes PySpark hands the
    Python worker for TimestampType columns.

    ``TimestampType.fromInternal`` produces naive datetimes in the
    worker's OS-local wall time; feeding those to a ``timestamptz``
    binary dumper would either fail or shift the instant by the local
    UTC offset. ``astimezone(utc)`` on a naive value interprets it as
    local time — recovering the exact instant Spark stored — and yields
    an aware datetime psycopg encodes correctly."""
    import datetime as dt

    if not ts_idx:
        return tuple(row)
    out = list(row)
    for i in ts_idx:
        v = out[i]
        if isinstance(v, dt.datetime) and v.tzinfo is None:
            out[i] = v.astimezone(dt.timezone.utc)
    return tuple(out)


def _copy_partition(rows: Iterator, dsn: str, sql: str,
                    types: list[str | None],
                    ts_idx: list[int] | None = None) -> None:
    """Executor-side body: one connection + one COPY per partition.
    Commit per partition — Spark task retries re-run the whole
    partition, so pair this with an idempotent target (truncate/staging
    table) for exactly-once loads."""
    try:
        import psycopg
    except ImportError as exc:  # pragma: no cover - env without psycopg
        raise ImportError(
            "binary COPY requires psycopg (v3); install it on executors "
            "or use write_jdbc (batch INSERT) instead") from exc

    first = next(rows, None)
    if first is None:
        return
    import itertools

    fixed = (utcize_row(r, ts_idx or []) for r in
             itertools.chain([first], rows))
    with psycopg.connect(dsn) as conn:
        with conn.cursor() as cur:
            with cur.copy(sql) as copy:
                stream_rows(copy, fixed, types)
        conn.commit()


def write_pg_copy(
    df: DataFrame,
    source,
    schema: str,
    table: str,
) -> None:
    """Bulk-load a DataFrame into an EXISTING PG table via parallel
    binary COPY (one stream per partition).

    Table creation/replacement stays on the JDBC path
    (:func:`db2pq_spark.sources.jdbc.write_jdbc` or DDL via
    ``execute_sql``) — COPY is append-only by design, matching the
    reference's copy step which also targets a pre-created table.
    """
    cols = df.columns
    types = [pg_type_for(t) for _, t in df.dtypes]
    ts_idx = [i for i, (_, t) in enumerate(df.dtypes) if t == "timestamp"]
    sql = copy_sql(schema, table, cols)
    dsn = jdbc_url_to_dsn(source.url, source.user, source.password)
    df.foreachPartition(
        lambda rows: _copy_partition(iter(rows), dsn, sql, types, ts_idx))
