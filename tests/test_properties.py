"""Property-based tests (hypothesis) for the pure planning/sync logic —
a layer the reference's suite lacks entirely (SURVEY §5: 'no
property-based tests')."""

from __future__ import annotations

import datetime as dt
import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from db2pq_spark.errors import EmptySelectionError
from db2pq_spark.plans.plan import filter_columns, resolve_output_columns
from db2pq_spark.sources.credentials import _split_pgpass_line
from db2pq_spark.sync.modified import modified_info, update_available
from db2pq_spark.sync.timestamps import (
    last_modified_dttm,
    parse_utc_stamp,
    utc_stamp,
)

names = st.lists(
    st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=8),
    min_size=1, max_size=10, unique=True,
)


def _parse_conninfo(dsn: str) -> dict[str, str]:
    """Minimal libpq conninfo parser (keyword=value, values optionally
    single-quoted with backslash escapes) — the inverse the quoting in
    sinks/pg_copy.py must satisfy."""
    out: dict[str, str] = {}
    i, n = 0, len(dsn)
    while i < n:
        while i < n and dsn[i] == " ":
            i += 1
        if i >= n:
            break
        eq = dsn.index("=", i)
        key = dsn[i:eq]
        i = eq + 1
        if i < n and dsn[i] == "'":
            i += 1
            val = []
            while dsn[i] != "'":
                if dsn[i] == "\\":
                    i += 1
                val.append(dsn[i])
                i += 1
            i += 1
        else:
            j = i
            while j < n and dsn[j] != " ":
                j += 1
            val = [dsn[i:j]]
            i = j
        out[key] = "".join(val)
    return out


class TestFilterColumnsProperties:
    @given(cols=names)
    @settings(max_examples=50)
    def test_identity_without_patterns(self, cols):
        assert filter_columns(cols) == list(cols)

    @given(cols=names, data=st.data())
    @settings(max_examples=50)
    def test_result_is_ordered_subset(self, cols, data):
        keep = data.draw(st.sampled_from(cols))
        try:
            out = filter_columns(cols, keep=re.escape(keep))
        except EmptySelectionError:
            return
        assert set(out) <= set(cols)
        # original relative order is preserved
        assert out == [c for c in cols if c in set(out)]

    @given(cols=names, data=st.data())
    @settings(max_examples=50)
    def test_drop_wins_over_keep(self, cols, data):
        target = data.draw(st.sampled_from(cols))
        pat = "^" + re.escape(target) + "$"
        try:
            out = filter_columns(cols, keep=pat, drop=pat)
        except EmptySelectionError:
            return  # dropping the only keep-match empties the selection
        assert target not in out


class TestRenameProperties:
    @given(cols=names)
    @settings(max_examples=50)
    def test_identity_rename(self, cols):
        pairs = resolve_output_columns(cols, {})
        assert [s for s, _ in pairs] == list(cols)
        assert all(s == o for s, o in pairs)

    @given(cols=names, suffix=st.text(alphabet=string.ascii_lowercase,
                                      min_size=1, max_size=3))
    @settings(max_examples=50)
    def test_injective_rename_roundtrip(self, cols, suffix):
        rename = {c: c + "_" + suffix for c in cols}
        pairs = resolve_output_columns(cols, rename)
        assert [o for _, o in pairs] == [c + "_" + suffix for c in cols]


class TestTimestampProperties:
    aware_dts = st.datetimes(
        min_value=dt.datetime(1990, 1, 1),
        max_value=dt.datetime(2099, 12, 28),
        timezones=st.just(dt.timezone.utc),
    )

    @given(d=aware_dts)
    @settings(max_examples=100)
    def test_stamp_roundtrip_to_second(self, d):
        stamp = utc_stamp(d)
        back = parse_utc_stamp(stamp)
        assert back == d.replace(microsecond=0)

    @given(mo=st.integers(1, 12), day=st.integers(1, 28),
           y=st.integers(1990, 2099), hh=st.integers(0, 23),
           mm=st.integers(0, 59), ss=st.integers(0, 59))
    @settings(max_examples=100)
    def test_comment_parse_total_on_valid_dates(self, mo, day, y, hh, mm, ss):
        c = f"Last modified: {mo:02d}/{day:02d}/{y:04d} {hh:02d}:{mm:02d}:{ss:02d}"
        d = last_modified_dttm(c)
        assert d is not None
        assert (d.month, d.day, d.year) == (mo, day, y)

    @given(junk=st.text(max_size=40))
    @settings(max_examples=100)
    def test_never_raises_on_junk(self, junk):
        last_modified_dttm(junk)  # must not throw, whatever comes in


class TestUpdateAvailableProperties:
    comments = st.one_of(
        st.none(),
        st.text(max_size=20),
        st.dates(min_value=dt.date(2000, 1, 1), max_value=dt.date(2099, 1, 1))
          .map(lambda d: f"(Updated {d.isoformat()})"),
    )

    @given(src=comments, dst=comments)
    @settings(max_examples=200)
    def test_decision_matrix(self, src, dst):
        s, d = modified_info("s", src), modified_info("d", dst)
        out = update_available(s, d)
        if s.dt is None:
            assert out is False        # can't assert an update exists
        elif d.dt is None:
            assert out is True         # must refresh unknown dest
        else:
            assert out == (s.dt > d.dt)


class TestPgpassProperties:
    @given(fields=st.lists(
        st.text(alphabet=string.printable.replace("\n", "").replace("\r", ""),
                max_size=10),
        min_size=5, max_size=5))
    @settings(max_examples=100)
    def test_escape_split_roundtrip(self, fields):
        esc = lambda s: s.replace("\\", "\\\\").replace(":", "\\:")
        line = ":".join(esc(f) for f in fields)
        assert _split_pgpass_line(line) == fields


class TestPgCopyProperties:
    @given(name=st.text(min_size=1, max_size=30))
    @settings(max_examples=100)
    def test_quote_ident_always_wrapped_and_escaped(self, name):
        from db2pq_spark.sinks.pg_copy import quote_ident

        q = quote_ident(name)
        assert q[0] == '"' and q[-1] == '"'
        # interior double-quotes are all doubled: stripping the doubling
        # recovers the original name
        assert q[1:-1].replace('""', '"') == name

    @given(password=st.text(min_size=0, max_size=30))
    @settings(max_examples=200)
    def test_dsn_password_quoting_round_trips(self, password):
        """Any password — spaces, quotes, backslashes, conninfo-syntax
        injections — must parse back to itself under libpq's conninfo
        grammar (values single-quoted with \\ and ' backslash-escaped)."""
        from db2pq_spark.sinks.pg_copy import jdbc_url_to_dsn

        dsn = jdbc_url_to_dsn("jdbc:postgresql://h/db", user="u",
                              password=password)
        parsed = _parse_conninfo(dsn)
        assert parsed["password"] == password
        assert parsed["host"] == "h" and parsed["dbname"] == "db"

    @given(host=st.text(alphabet=string.ascii_lowercase + ".-",
                        min_size=1, max_size=20),
           port=st.integers(min_value=1, max_value=65535),
           db=st.text(alphabet=string.ascii_lowercase, min_size=1,
                      max_size=12))
    @settings(max_examples=50)
    def test_dsn_round_trips_url_components(self, host, port, db):
        from db2pq_spark.sinks.pg_copy import jdbc_url_to_dsn

        dsn = jdbc_url_to_dsn(f"jdbc:postgresql://{host}:{port}/{db}")
        parts = dict(kv.split("=", 1) for kv in dsn.split(" "))
        assert parts == {"host": host, "port": str(port), "dbname": db}

    @given(ts=st.datetimes(min_value=dt.datetime(1971, 1, 1),
                           max_value=dt.datetime(2100, 1, 1)))
    @settings(max_examples=100)
    def test_utcize_preserves_the_instant(self, ts):
        from db2pq_spark.sinks.pg_copy import utcize_row

        (out,) = utcize_row((ts,), [0])
        assert out.tzinfo is not None
        # same wall-clock instant expressed in UTC: converting back to
        # the local zone recovers the naive value
        assert out.astimezone().replace(tzinfo=None) == ts


class TestMixingArithmeticProperties:
    """The corpus-mixing rate arithmetic (operators/mixing.py) claims
    bit-for-bit engine portability: the integer bucket-unit rate must
    match what DuckDB computes from the same literal SQL."""

    @given(
        w=st.floats(min_value=0.01, max_value=100.0,
                    allow_nan=False, allow_infinity=False),
        w2=st.floats(min_value=0.01, max_value=1000.0,
                     allow_nan=False, allow_infinity=False),
        budget=st.integers(1, 10**12),
        avail=st.integers(1, 10**12),
    )
    @settings(max_examples=200, deadline=None)
    def test_units_match_duckdb(self, w, w2, budget, avail):
        import duckdb

        from db2pq_spark.operators.mixing import mix_units_sql

        weights = {"s": w, "t": w2}
        n_buckets, max_epochs = 1_000_000, 4
        total_w = float(sum(weights.values()))
        target = int(float(budget) * w / total_w)
        units_py = min(target * n_buckets // avail,
                       max_epochs * n_buckets)
        sql = mix_units_sql("'s'", str(avail), weights, budget,
                            max_epochs=max_epochs)
        (units_sql,) = duckdb.sql(f"SELECT {sql}").fetchone()
        assert units_py == units_sql

    def test_quoted_source_name_is_escaped(self):
        # a source named with an embedded quote must not break (or
        # alter) the generated SQL
        import duckdb

        from db2pq_spark.operators.mixing import mix_units_sql

        weights = {"o'reilly": 1.0, "plain": 1.0}
        sql = mix_units_sql("'o''reilly'", "100", weights, 100)
        (units,) = duckdb.sql(f"SELECT {sql}").fetchone()
        assert units == 500_000  # target 50 * 1e6 buckets // 100

    def test_compound_size_expr_precedence(self):
        # size_sum_expr may be compound (e.g. "a + b"); the //
        # denominator must parenthesize it
        import duckdb

        from db2pq_spark.operators.mixing import mix_units_sql

        sql = mix_units_sql("'s'", "60 + 40", {"s": 1.0}, 100)
        (units,) = duckdb.sql(f"SELECT {sql}").fetchone()
        assert units == 1_000_000  # 100*1e6 // 100, NOT 60 + 40*...

    @given(
        budget=st.integers(1, 10**9),
        avails=st.lists(st.integers(1, 10**9), min_size=1, max_size=5),
        ws=st.lists(st.floats(min_value=0.01, max_value=10.0,
                              allow_nan=False), min_size=1, max_size=5),
    )
    @settings(max_examples=100, deadline=None)
    def test_units_invariants(self, budget, avails, ws):
        n = min(len(avails), len(ws))
        n_buckets, max_epochs = 1_000_000, 4
        total_w = sum(ws[:n])
        for w, avail in zip(ws[:n], avails[:n]):
            target = int(float(budget) * w / total_w)
            units = min(target * n_buckets // avail,
                        max_epochs * n_buckets)
            assert 0 <= units <= max_epochs * n_buckets
            full, frac = units // n_buckets, units % n_buckets
            assert 0 <= full <= max_epochs
            assert 0 <= frac < n_buckets
            # a source with avail >= budget can never be upsampled
            if avail >= budget:
                assert full <= 1
