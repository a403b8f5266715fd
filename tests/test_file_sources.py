"""File-format ingestion (csv/json → repository) through the full
plan → normalize → sink pipeline."""

from __future__ import annotations

import json

import pytest

from db2pq_spark.core import Engine


@pytest.fixture()
def repo(tmp_path):
    return tmp_path / "repo"


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "people.csv"
    p.write_text(
        "id,name,score,joined\n"
        "1,ada,91.5,2024-01-02\n"
        "2,grace,88.0,2024-03-04\n"
        "3,edsger,75.25,2024-05-06\n"
    )
    return p


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "events.jsonl"
    rows = [
        {"id": 1, "kind": "click", "n": 3},
        {"id": 2, "kind": "view", "n": 7},
        {"id": 3, "kind": "click", "n": 1},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return p


class TestCsv:
    def test_explicit_schema_roundtrip(self, spark, repo, csv_file):
        eng = Engine(spark, repo)
        path = eng.csv_to_pq(
            csv_file, "files", "people",
            file_schema="id INT, name STRING, score DOUBLE, joined DATE",
        )
        back = spark.read.parquet(str(path))
        assert dict(back.dtypes) == {
            "id": "int", "name": "string", "score": "double",
            "joined": "date"}
        assert back.count() == 3

    def test_inferred_schema_and_plan(self, spark, repo, csv_file):
        eng = Engine(spark, repo)
        path = eng.csv_to_pq(
            csv_file, "files", "scores",
            keep=["^id$", "^score$"],
            rename={"score": "pts"},
            where="id > 1",
        )
        back = spark.read.parquet(str(path))
        assert back.columns == ["id", "pts"]
        assert back.count() == 2

    def test_failfast_on_malformed(self, spark, repo, tmp_path):
        bad = tmp_path / "bad.csv"
        bad.write_text("id,n\n1,2\nthree,not_an_int\n")
        eng = Engine(spark, repo)
        with pytest.raises(Exception):
            eng.csv_to_pq(bad, "files", "bad",
                          file_schema="id INT, n INT",
                          options={"mode": "FAILFAST"})


class TestJson:
    def test_jsonl_roundtrip(self, spark, repo, jsonl_file):
        eng = Engine(spark, repo)
        path = eng.json_to_pq(
            jsonl_file, "files", "events",
            file_schema="id BIGINT, kind STRING, n BIGINT",
        )
        back = spark.read.parquet(str(path))
        assert back.count() == 3
        assert {r.kind for r in back.collect()} == {"click", "view"}

    def test_unsupported_format_rejected(self, spark, repo, jsonl_file):
        eng = Engine(spark, repo)
        with pytest.raises(ValueError, match="unsupported format"):
            eng.file_to_pq(jsonl_file, "avro", "files", "x")


class TestBinaryFiles:
    def test_raw_files_land_as_binary_rows(self, spark, repo, tmp_path):
        src = tmp_path / "imgs"
        src.mkdir()
        (src / "a.jpg").write_bytes(b"\xff\xd8JPEGDATA")
        (src / "b.jpg").write_bytes(b"\xff\xd8MORE")
        (src / "notes.txt").write_text("skip me")

        eng = Engine(spark, repo)
        path = eng.binary_to_pq(src, "files", "imgs", glob="*.jpg")
        back = spark.read.parquet(str(path))
        rows = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"])
                for r in back.collect()}
        assert rows == {"a.jpg": b"\xff\xd8JPEGDATA",
                        "b.jpg": b"\xff\xd8MORE"}
        assert dict(back.dtypes)["content"] == "binary"
        assert dict(back.dtypes)["length"] == "bigint"

    def test_binary_rejects_user_schema(self, spark, repo, tmp_path):
        eng = Engine(spark, repo)
        with pytest.raises(ValueError, match="fixed schema"):
            eng.file_to_pq(tmp_path, "binaryfile", "files", "x",
                           file_schema="a INT")

    def test_feature_extraction_composes(self, spark, repo, tmp_path):
        """Stored binary rows feed the multimodal feature extractor
        unchanged — the ingest-to-features path is one pipeline."""
        from db2pq_spark.operators.multimodal import extract_features

        src = tmp_path / "blobs"
        src.mkdir()
        (src / "x.bin").write_bytes(b"hello world payload")
        eng = Engine(spark, repo)
        path = eng.binary_to_pq(src, "files", "blobs")
        back = spark.read.parquet(str(path)).selectExpr(
            "xxhash64(path) AS doc_id", "content")
        feats = extract_features(back).first()
        assert feats["n_bytes"] == len(b"hello world payload")
