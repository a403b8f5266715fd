"""Connection resolution & credentials (reference X5, SURVEY §2.10).

Host-side, engine-independent logic re-expressed from the reference's
behavior (db2pq/postgres/_defaults.py:8-35, db2pq/credentials.py:127-381):

- connection parameters resolve from explicit args > ``PG*`` env vars
  > ``.env`` file > defaults
- passwords come from ``~/.pgpass`` (libpq format ``host:port:db:user:
  password`` with ``*`` wildcards and ``\\:``/``\\\\`` escapes), honored
  only when the file has owner-only permissions — libpq semantics
- ``save_password`` appends a pgpass entry, creating the file 0600
- NO interactive prompting (the reference prompts via getpass;
  this engine targets non-interactive cluster jobs, so missing
  credentials raise instead — ``interactive`` hooks can be layered on
  by callers)

Everything here is pure Python and unit-tested; the JDBC layer consumes
the resolved ``PgConnection``.
"""

from __future__ import annotations

import os
import stat
from dataclasses import dataclass, replace
from pathlib import Path


@dataclass(frozen=True)
class PgConnection:
    host: str
    database: str
    user: str
    port: int = 5432
    password: str | None = None

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"

    @property
    def uri(self) -> str:
        auth = self.user
        return f"postgresql://{auth}@{self.host}:{self.port}/{self.database}"


def _load_dotenv(path: Path) -> dict[str, str]:
    """Minimal .env parser (KEY=VALUE lines, # comments, optional
    quotes) — mirrors the reference's dotenv autoload without the
    dependency."""
    out: dict[str, str] = {}
    if not path.exists():
        return out
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        v = v.strip().strip("'\"")
        out[k.strip()] = v
    return out


def resolve_pg_connection(
    host: str | None = None,
    database: str | None = None,
    user: str | None = None,
    port: int | None = None,
    password: str | None = None,
    env_file: str | Path = ".env",
    pgpass: str | Path | None = None,
) -> PgConnection:
    """Fill connection parameters: explicit > PG* env > .env > defaults.

    Password additionally falls back to a ``~/.pgpass`` lookup. Missing
    host/database/user raise ``ValueError`` (the reference would prompt;
    cluster jobs must fail fast instead)."""
    dotenv = _load_dotenv(Path(env_file))

    def pick(explicit, env_key, default=None):
        if explicit is not None:
            return explicit
        if os.environ.get(env_key):
            return os.environ[env_key]
        if dotenv.get(env_key):
            return dotenv[env_key]
        return default

    host = pick(host, "PGHOST")
    database = pick(database, "PGDATABASE")
    user = pick(user, "PGUSER", os.environ.get("USER"))
    port = int(pick(port, "PGPORT", 5432))
    password = pick(password, "PGPASSWORD")

    missing = [k for k, v in
               (("host", host), ("database", database), ("user", user))
               if not v]
    if missing:
        raise ValueError(f"cannot resolve connection: missing {missing} "
                         "(set PGHOST/PGDATABASE/PGUSER or pass explicitly)")

    conn = PgConnection(host=host, database=database, user=user,
                        port=port, password=password)
    if conn.password is None:
        pw = lookup_pgpass(conn, pgpass)
        if pw is not None:
            conn = replace(conn, password=pw)
    return conn


def _pgpass_path(override: str | Path | None = None) -> Path:
    if override is not None:
        return Path(override)
    if os.environ.get("PGPASSFILE"):
        return Path(os.environ["PGPASSFILE"])
    return Path.home() / ".pgpass"


def _secure_enough(path: Path) -> bool:
    """libpq ignores a pgpass readable by group/other."""
    mode = path.stat().st_mode
    return not (mode & (stat.S_IRWXG | stat.S_IRWXO))


def _split_pgpass_line(line: str) -> list[str]:
    """Split on unescaped ':' honoring ``\\:`` and ``\\\\`` escapes."""
    fields, cur, i = [], [], 0
    while i < len(line):
        ch = line[i]
        if ch == "\\" and i + 1 < len(line):
            cur.append(line[i + 1])
            i += 2
            continue
        if ch == ":":
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    fields.append("".join(cur))
    return fields


def lookup_pgpass(
    conn: PgConnection, pgpass: str | Path | None = None
) -> str | None:
    """First matching password from the pgpass file, libpq semantics:
    field order host:port:db:user:password, ``*`` matches anything,
    insecure file permissions → ignored entirely."""
    path = _pgpass_path(pgpass)
    if not path.exists() or not _secure_enough(path):
        return None
    want = [conn.host, str(conn.port), conn.database, conn.user]
    for line in path.read_text().splitlines():
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        fields = _split_pgpass_line(line.strip())
        if len(fields) != 5:
            continue
        if all(f == "*" or f == w for f, w in zip(fields, want)):
            return fields[4]
    return None


def save_password(
    conn: PgConnection, password: str, pgpass: str | Path | None = None
) -> Path:
    """Append a pgpass entry (idempotent; creates the file 0600 —
    reference save_password, db2pq/credentials.py:306-353)."""
    path = _pgpass_path(pgpass)
    esc = lambda s: s.replace("\\", "\\\\").replace(":", "\\:")
    entry = ":".join([esc(conn.host), str(conn.port), esc(conn.database),
                      esc(conn.user), esc(password)])
    existing = path.read_text().splitlines() if path.exists() else []
    if entry not in existing:
        with open(path, "a") as fh:
            fh.write(entry + "\n")
    os.chmod(path, 0o600)
    return path


#: WRDS fixed endpoint (reference db2pq/core.py:493,504-506)
WRDS_HOST = "wrds-pgdata.wharton.upenn.edu"
WRDS_PORT = 9737
WRDS_DB = "wrds"


def wrds_connection(user: str | None = None,
                    pgpass: str | Path | None = None) -> PgConnection:
    """Resolve a WRDS connection (user from WRDS_USER/PGUSER env)."""
    user = user or os.environ.get("WRDS_USER") or os.environ.get("PGUSER")
    if not user:
        raise ValueError("cannot resolve WRDS user: set WRDS_USER")
    return resolve_pg_connection(
        host=WRDS_HOST, database=WRDS_DB, user=user, port=WRDS_PORT,
        pgpass=pgpass,
    )
