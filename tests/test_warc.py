"""WARC reader (operators/warc.py): build/parse round-trip, per-record
fault containment with resync, HTTP payload splitting, and the Spark
explode shape (one mapInPandas hop, zero shuffle).
"""

from dxnn_ocr_cpp_spark.operators.warc import (build_http_payload,
                                               build_record, parse_warc,
                                               warc_records)


def rec(uri, body, **kw):
    return build_record(uri, build_http_payload(body, **kw))


class TestParse:
    def test_multi_record_roundtrip(self):
        blob = (rec("https://a/1", b"hello") +
                rec("https://a/2", b"", status=404) +
                build_record("https://a/3", b"raw bytes no http",
                             record_type="metadata"))
        rows = parse_warc(blob)
        assert [r[6] for r in rows] == ["ok", "ok", "ok"]
        assert rows[0][2] == "https://a/1" and rows[0][5] == b"hello"
        assert rows[0][3] == 200 and rows[0][4] == "text/html"
        assert rows[1][3] == 404 and rows[1][5] == b""
        # non-HTTP payload: returned whole, no status/type
        assert rows[2][1] == "metadata" and rows[2][3] is None
        assert rows[2][5] == b"raw bytes no http"

    def test_binary_body_with_embedded_magic(self):
        # Content-Length-directed reads must not resync inside a valid
        # body even if it contains the WARC magic bytes
        evil = b"xx" + b"WARC/1.0\r\n" + b"yy"
        blob = (build_record("https://a/e", evil) +
                rec("https://a/f", b"after"))
        rows = parse_warc(blob)
        assert [(r[2], r[6]) for r in rows] == [
            ("https://a/e", "ok"), ("https://a/f", "ok")]
        assert rows[0][5] == evil

    def test_truncated_record_contained_and_resyncs(self):
        bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://bad/x\r\n"
               b"Content-Length: 999999\r\n\r\nshort")
        blob = rec("https://a/1", b"one") + bad + rec("https://a/2", b"two")
        rows = parse_warc(blob)
        assert [(r[2], r[6]) for r in rows] == [
            ("https://a/1", "ok"), ("https://bad/x", "truncated"),
            ("https://a/2", "ok")]

    def test_missing_content_length_is_bad_header(self):
        bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://bad/h\r\n\r\n")
        blob = bad + rec("https://a/1", b"one")
        rows = parse_warc(blob)
        assert rows[0][6] == "bad-header"
        assert rows[1][2] == "https://a/1" and rows[1][6] == "ok"

    def test_degenerate_inputs(self):
        assert parse_warc(None) == []
        assert parse_warc(b"") == []
        assert parse_warc(b"not a warc at all") == []
        # magic with unterminated header block
        rows = parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n")
        assert [r[6] for r in rows] == ["bad-header"]


class TestSparkShape:
    def test_explode_and_plan(self, spark):
        blobs = spark.createDataFrame(
            [(0, rec("https://a/1", b"x") + rec("https://a/2", b"yy")),
             (1, rec("https://b/1", b"z")),
             (2, None)],
            "blob_id long, blob binary")
        out = warc_records(blobs)
        rows = sorted((r["blob_id"], r["target_uri"], bytes(r["body"]))
                      for r in out.collect())
        assert rows == [(0, "https://a/1", b"x"), (0, "https://a/2", b"yy"),
                        (1, "https://b/1", b"z")]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 1
        assert "Exchange" not in plan
