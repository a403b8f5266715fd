"""SAS-metadata freshness source (reference D4/Y7, SURVEY §2.7/2.8).

The reference scrapes ``Last Modified`` from ``PROC CONTENTS`` output
run over SSH on the WRDS cloud (db2pq/sas/stream.py:6-62). The parser
(D4) is pure text processing and fully implemented here; the SSH
transport (Y7) needs paramiko, which this environment does not ship —
it is gated behind an import and raises a clear error when absent.
"""

from __future__ import annotations

import re

_LAST_MODIFIED_LINE = re.compile(
    r"Last Modified\s+(\d{2}/\d{2}/\d{4}\s+\d{2}:\d{2}:\d{2})"
)


def get_modified_str(contents_output: str) -> str | None:
    """Extract the ``Last Modified`` stamp from PROC CONTENTS output and
    normalize it to the engine's comment format
    (``Last modified: MM/DD/YYYY HH:MM:SS`` — feedable straight into
    :func:`db2pq_spark.sync.timestamps.last_modified_dttm`)."""
    for line in contents_output.splitlines():
        m = _LAST_MODIFIED_LINE.search(line)
        if m:
            return f"Last modified: {m.group(1)}"
    return None


def sas_modified_via_ssh(
    host: str, user: str, library: str, table: str
) -> str | None:
    """Run PROC CONTENTS remotely and parse its Last Modified (Y7).

    Requires paramiko (not in this container); the command construction
    and parsing mirror the reference flow."""
    try:
        import paramiko  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "sas_modified_via_ssh requires paramiko (SSH transport); "
            "install it or supply freshness comments from the database "
            "side instead"
        ) from exc
    client = paramiko.SSHClient()
    client.set_missing_host_key_policy(paramiko.AutoAddPolicy())
    client.connect(host, username=user)
    try:
        cmd = (f"qsas -stdio <<'EOF'\nproc contents data={library}.{table};"
               "run;\nEOF")
        _, stdout, _ = client.exec_command(cmd)
        return get_modified_str(stdout.read().decode(errors="replace"))
    finally:
        client.close()
