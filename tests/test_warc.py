"""WARC source: dependency-free record framing over binaryFile reads,
including the per-record-gzip-member .warc.gz layout."""

import gzip

import pytest
from pyspark.sql import functions as F

from earthmover_spark.sources.warc import (
    iter_warc_records,
    read_warc,
)
from earthmover_spark.util import EarthmoverSparkError


def _record(rtype, uri, body: bytes, extra=""):
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rtype}-{uri or 'none'}>\r\n"
        "WARC-Date: 2024-01-02T03:04:05Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + extra
        + f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def _http(body: bytes, status=200, ctype="text/html"):
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n\r\n".encode()
        + body
    )


@pytest.fixture(scope="module")
def warc_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    records = [
        _record("warcinfo", None, b"software: test\r\n"),
        _record("request", "http://a.example/x", b"GET /x HTTP/1.1\r\n"),
        _record(
            "response", "http://a.example/x",
            _http("<html>page one é</html>".encode()),
            extra="Content-Type: application/http; msgtype=response\r\n",
        ),
        _record(
            "response", "http://b.example/y",
            _http(b"plain body two", status=404, ctype="text/plain"),
        ),
    ]
    raw = b"".join(records)
    (d / "a.warc").write_bytes(raw)
    # .warc.gz: one gzip member PER RECORD (the Common Crawl layout)
    gz = b"".join(gzip.compress(r) for r in records)
    (d / "b.warc.gz").write_bytes(gz)
    return str(d)


def test_read_warc_responses(spark, warc_files):
    df = read_warc(spark, warc_files + "/a.warc")
    rows = {r.target_uri: r for r in df.collect()}
    assert set(rows) == {"http://a.example/x", "http://b.example/y"}
    a = rows["http://a.example/x"]
    assert a.warc_type == "response" and a.http_status == 200
    assert bytes(a.payload).decode() == "<html>page one é</html>"
    assert rows["http://b.example/y"].http_status == 404
    assert bytes(rows["http://b.example/y"].payload) == b"plain body two"


def test_read_warc_gz_members_match_plain(spark, warc_files):
    plain = sorted(
        map(tuple, read_warc(spark, warc_files + "/a.warc")
            .drop("file").collect())
    )
    gz = sorted(
        map(tuple, read_warc(spark, warc_files + "/b.warc.gz")
            .drop("file").collect())
    )
    assert plain == gz and len(plain) == 2


def test_read_warc_all_types_and_no_strip(spark, warc_files):
    df = read_warc(
        spark, warc_files + "/a.warc", record_types=None, strip_http=False
    )
    got = {r.warc_type for r in df.collect()}
    assert got == {"warcinfo", "request", "response"}
    resp = [r for r in df.collect() if r.http_status is not None]
    assert resp == []  # strip_http=False: status never parsed
    raw = [
        r for r in df.collect()
        if r.warc_type == "response" and bytes(r.payload).startswith(b"HTTP/")
    ]
    assert len(raw) == 2  # HTTP headers retained in payload


def test_iter_warc_records_errors():
    with pytest.raises(EarthmoverSparkError, match="expected WARC/"):
        list(iter_warc_records(b"NOT A WARC"))
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
    with pytest.raises(EarthmoverSparkError, match="Content-Length"):
        list(iter_warc_records(bad))


def test_empty_warc_gz_is_valid_not_corrupt(spark, tmp_path):
    """r9 ADVICE regression: a structurally valid gzip whose members
    decode to zero bytes (an empty .warc.gz shard) must read as zero
    records — 'no member decoded' means mislabeled, not empty."""
    from earthmover_spark.sources.warc import _gunzip_members

    assert _gunzip_members(gzip.compress(b"")) == b""
    d = tmp_path / "empty_shard"
    d.mkdir()
    (d / "empty.warc.gz").write_bytes(gzip.compress(b""))
    assert read_warc(spark, str(d)).count() == 0
    # a genuinely mislabeled archive still raises
    with pytest.raises(EarthmoverSparkError, match="mislabeled"):
        _gunzip_members(b"this is not gzip at all")


def test_folded_warc_headers_unfold():
    """r9 ADVICE regression: RFC 822-style folded header lines (SP/HT
    continuation) are part of the WARC header grammar — a folded
    WARC-Target-URI must parse whole, not truncate at the fold."""
    body = b"folded body"
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Record-ID: <urn:uuid:folded-1>\r\n"
        "WARC-Target-URI: http://example.com/very/long\r\n"
        "\t/continued/path?q=1\r\n"
        "WARC-Date: 2024-01-02T03:04:05Z\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    recs = list(iter_warc_records(head + body + b"\r\n\r\n"))
    assert len(recs) == 1
    assert recs[0]["target_uri"] == (
        "http://example.com/very/long /continued/path?q=1"
    )
    assert recs[0]["payload"] == body


def test_read_warc_text_pipeline_composes(spark, warc_files):
    """The advertised pattern: payload binary -> decode -> the normal
    text curation ops."""
    from earthmover_spark.llm.textstats import quality_score

    df = read_warc(spark, warc_files + "/b.warc.gz").select(
        F.col("target_uri").alias("doc_id"),
        F.decode("payload", "utf-8").alias("text"),
    )
    out = quality_score(df)
    assert out.count() == 2 and "quality" in out.columns


def test_warc_via_source_dispatch(spark, warc_files):
    from earthmover_spark.sources.readers import read_source

    df = read_source(spark, warc_files + "/b.warc.gz")
    assert df.count() == 2  # responses only by default
    df_all = read_source(
        spark, warc_files + "/a.warc", record_types=None
    )
    assert df_all.count() == 4


def test_warc_ingest_example(spark, tmp_path, warc_files):
    """examples/15_warc_ingest end-to-end from YAML: warc.gz -> HTTP
    200 filter -> decode -> strip markup -> quality -> jsonl."""
    import json
    import os

    from earthmover_spark.plans.executor import run_project

    cfg = os.path.join(
        os.path.dirname(__file__), "..", "examples", "15_warc_ingest",
        "earthmover.yaml",
    )
    results = run_project(
        spark, cfg,
        params={"WARC_GLOB": warc_files + "/b.warc.gz"},
        output_dir=str(tmp_path),
    )
    rows = [
        json.loads(ln)
        for ln in open(results["$destinations.corpus"]).read().splitlines()
    ]
    # only the 200 response survives the status filter; markup gone
    assert len(rows) == 1
    assert rows[0]["url"] == "http://a.example/x"
    assert "<html>" not in rows[0]["text"] and "page one" in rows[0]["text"]
    assert float(rows[0]["quality"]) >= 0
