"""Log-line extractor conformance tests.

Fixture shapes mirror the reference's extractor test corpus (FIXTURES.md §5;
`extractor_test.go:13-1158` semantics): structured HTTP access log with
contextMap, application log with instant/thrown, container log, proxy access
log, and every skip-sentinel path."""

import json

import pyarrow as pa

from commerce_logs_pipeline_ray.stages.loglines import (
    extract_batch,
    extract_level,
    extract_log_line,
    service_from_pod,
)

STRUCTURED_HTTP = json.dumps(
    {
        "Logs": {
            "contextMap": {
                "requestLine": "GET /medias/product.jpg HTTP/1.1",
                "statusCode": 200.0,            # float64 coercion path
                "bytesSent": "51234",           # string coercion path
                "processMillis": 42,
                "remoteHost": "10.0.0.7",
            },
            "timeMillis": 1718000000123,
            "level": "INFO",
        }
    }
)

APPLICATION_LOG = json.dumps(
    {
        "logs": {
            "instant": {"epochSecond": 1718000001, "nanoOfSecond": 123456789},
            "level": "warn",
            "loggerName": "de.company.OrderService",
            "thread": "hybrisHTTP23",
            "message": "order submitted",
            "thrown": {"class": "java.lang.RuntimeException", "message": "boom"},
        }
    }
)

CONTAINER_LOG = json.dumps(
    {
        "@timestamp": "2025-06-15T10:30:00.123456789Z",
        "time": "2025-06-15T09:00:00Z",
        "log": "2025-06-15 10:30:00 ERROR something failed\n",
        "kubernetes": {"pod_name": "api-6f9d8c7b5-x2x9p"},
    }
)

PROXY_LOG = json.dumps(
    {
        "Logs": {
            "requestFirstLine": "POST /checkout HTTP/1.1",
            "status": "502",
            "localServerName": "shop.example.com",
            "userAgent": "Mozilla/5.0",
            "cacheStatus": "MISS",
            "remoteHost": "203.0.113.9",
            "timeMillis": 1718000002000,
        }
    }
)


def test_structured_http_with_coercions():
    r = extract_log_line(STRUCTURED_HTTP)
    assert r["record_type"] == "http"
    assert r["method"] == "GET"
    assert r["path"] == "/medias/product.jpg"
    assert r["protocol"] == "HTTP"
    assert r["status_code"] == 200        # float64 → int
    assert r["bytes_sent"] == 51234       # "51234" → int
    assert r["process_millis"] == 42
    assert r["ts_ns"] == 1718000000123 * 1_000_000


def test_application_log_instant_and_thrown():
    r = extract_log_line(APPLICATION_LOG)
    assert r["record_type"] == "application"
    assert r["ts_ns"] == 1718000001 * 1_000_000_000 + 123456789
    assert r["level"] == "WARN"
    assert r["logger"] == "de.company.OrderService"
    assert r["thread"] == "hybrisHTTP23"
    assert json.loads(r["thrown"])["class"] == "java.lang.RuntimeException"


def test_container_log_ts_preference_and_service():
    r = extract_log_line(CONTAINER_LOG)
    assert r["record_type"] == "container"
    # @timestamp preferred over time; RFC3339Nano precision kept
    assert r["ts_ns"] == 1749983400 * 1_000_000_000 + 123456789
    assert r["level"] == "ERROR"
    assert r["pod"] == "api-6f9d8c7b5-x2x9p"
    assert r["service"] == "api"


def test_proxy_log_classification():
    r = extract_log_line(PROXY_LOG)
    assert r["record_type"] == "proxy"
    assert r["status_code"] == 502        # string → int
    assert r["local_server_name"] == "shop.example.com"
    assert r["cache_status"] == "MISS"
    assert r["method"] == "POST"


def test_skip_sentinels():
    # empty message
    assert extract_log_line("")["record_type"] == "skip"
    # blank container log
    blank = json.dumps({"log": "   ", "@timestamp": "2025-06-15T10:00:00Z"})
    assert extract_log_line(blank)["record_type"] == "skip"
    # requestLine "-" (timeMillis present — extractor.go:110-113 gates the
    # contextMap classification path on it)
    dash = json.dumps({"Logs": {"timeMillis": 1718000000000,
                                "contextMap": {"requestLine": "-", "statusCode": 400,
                                               "remoteHost": "x"}}})
    assert extract_log_line(dash)["record_type"] == "skip"
    # same contextMap WITHOUT timeMillis → not HTTP → application
    # (extractor.go classifier parity)
    no_tm = json.dumps({"Logs": {"contextMap": {"requestLine": "-", "statusCode": 400,
                                                "remoteHost": "x"}}})
    assert extract_log_line(no_tm)["record_type"] == "application"
    # bytesSent alone (with timeMillis) is HTTP evidence — extractor.go:121-127
    bs_only = json.dumps({"Logs": {"timeMillis": 1718000000000,
                                   "contextMap": {"requestLine": "GET / HTTP/1.1",
                                                  "bytesSent": 10}}})
    assert extract_log_line(bs_only)["record_type"] == "http"
    # non-HTTP protocol
    rtsp = json.dumps({"Logs": {"requestFirstLine": "DESCRIBE /stream RTSP/1.0",
                                "status": 200}})
    assert extract_log_line(rtsp)["record_type"] == "skip"
    # non-standard method
    sstp = json.dumps({"Logs": {"requestFirstLine": "SSTP_DUPLEX_POST /sra HTTP/1.1",
                                "status": 200}})
    assert extract_log_line(sstp)["record_type"] == "skip"


def test_error_channel():
    assert extract_log_line("{not json")["record_type"] == "error"
    assert extract_log_line('"just a string"')["record_type"] == "error"
    unknown = json.dumps({"neither": "format"})
    r = extract_log_line(unknown)
    assert r["record_type"] == "error"
    assert r["error_type"] == "unknown_format"


def test_app_log_not_classified_as_http_due_to_source_fields():
    # sourceClassName only vetoes the NO-requestLine evidence branch
    # (extractor.go:121-141); an explicit requestLine wins unconditionally
    # (extractor.go:112-118)
    with_rl = json.dumps(
        {
            "Logs": {
                "contextMap": {"requestLine": "GET / HTTP/1.1", "sourceClassName": "X"},
                "message": "m",
                "timeMillis": 1,
            }
        }
    )
    assert extract_log_line(with_rl)["record_type"] == "http"
    # statusCode evidence alone + sourceClassName → application
    no_rl = json.dumps(
        {
            "Logs": {
                "contextMap": {"statusCode": 200, "sourceClassName": "X"},
                "message": "m",
                "timeMillis": 1,
            }
        }
    )
    assert extract_log_line(no_rl)["record_type"] == "application"


def test_level_extraction_defaults():
    assert extract_level("all fine here") == "INFO"
    assert extract_level("warning: watch out") == "WARNING"
    assert extract_level("[debug] noisy") == "DEBUG"


def test_service_from_pod_fallback():
    # digit-bearing service names fail the [a-z-]+? grammar in the REFERENCE
    # too (extractor.go:24) and fall back to the first dash segment — we
    # reproduce that faithfully rather than "fixing" it
    assert service_from_pod("apache2-igc-9db94ff4f-xzl59") == "apache2"
    assert service_from_pod("background-processing-abc123-x1y2z") == "background-processing"
    assert service_from_pod("checkout-service-7f9a2b-p0q1r") == "checkout-service"
    assert service_from_pod("singleword") == "singleword"


def test_extract_batch_typed_columns():
    lines = [STRUCTURED_HTTP, APPLICATION_LOG, CONTAINER_LOG, PROXY_LOG, "", "{bad"]
    t = pa.table({"line": lines, "origin": [f"f{i}" for i in range(len(lines))]})
    out = extract_batch(t)
    assert out.column("record_type").to_pylist() == [
        "http", "application", "container", "proxy", "skip", "error",
    ]
    assert out.schema.field("ts_ns").type == pa.int64()
    assert out.schema.field("status_code").type == pa.int32()
    assert out.column("origin").to_pylist() == [f"f{i}" for i in range(len(lines))]


def test_batch_in_ray_pipeline(ray_session):
    import ray.data as rd

    lines = [STRUCTURED_HTTP, APPLICATION_LOG, CONTAINER_LOG, PROXY_LOG] * 50 + ["", "{bad"]
    ds = rd.from_items([{"line": s} for s in lines])
    out = ds.map_batches(extract_batch, batch_format="pyarrow").to_pandas()
    assert len(out) == len(lines)
    counts = out["record_type"].value_counts().to_dict()
    assert counts["http"] == 50 and counts["proxy"] == 50
    assert counts["skip"] == 1 and counts["error"] == 1


def test_non_string_field_types_become_errors_not_crashes():
    # confirmed crash cases from review: every one must yield a record, not raise
    cases = [
        json.dumps({"log": 5}),
        json.dumps({"log": "x", "@timestamp": 123}),
        json.dumps({"logs": {"message": 42, "timeMillis": 1}}),
        json.dumps({"logs": {"loggerName": {"a": 1}, "instant": {"epochSecond": 1}}}),
        json.dumps({"log": "err text", "kubernetes": {"pod_name": 7}}),
        json.dumps({"Logs": {"requestFirstLine": {"x": 1}, "status": 200}}),
    ]
    for line in cases:
        r = extract_log_line(line)
        assert r["record_type"] in {"http", "application", "proxy", "container", "skip", "error"}, line
    # and the whole batch survives
    t = pa.table({"line": cases})
    out = extract_batch(t)
    assert out.num_rows == len(cases)


def test_zero_status_and_bytes_are_kept():
    line = json.dumps(
        {"Logs": {"requestFirstLine": "GET / HTTP/1.1", "status": 0, "bytesSent": 0,
                  "contextMap": {"statusCode": 500, "bytesSent": 999, "remoteHost": "h"},
                  "timeMillis": 1}}
    )
    r = extract_log_line(line)
    # explicit 0 at higher precedence wins over contextMap values
    assert r["status_code"] == 0
    assert r["bytes_sent"] == 0


def test_gz_line_file_source_roundtrip(ray_session, tmp_path):
    """The gz shards and the parquet mirror carry identical lines, and the
    extraction aggregate over the file source matches the in-memory path."""
    import pyarrow.parquet as pq

    from commerce_logs_pipeline_ray.sources.loglines_file import (
        read_logline_corpus,
        write_logline_corpus,
    )

    d = str(tmp_path / "corpus")
    gz_paths, pq_path = write_logline_corpus(d, 500, seed=7, num_shards=3)
    assert len(gz_paths) == 3
    ds = read_logline_corpus(d)
    got = sorted(r["line"] for r in ds.take_all())
    want = sorted(pq.read_table(pq_path)["line"].to_pylist())
    assert got == want
    # idempotent rewrite: same bytes
    import hashlib

    h = hashlib.md5(open(gz_paths[0], "rb").read()).hexdigest()
    write_logline_corpus(d, 500, seed=7, num_shards=3)
    assert hashlib.md5(open(gz_paths[0], "rb").read()).hexdigest() == h


def test_edge_shapes_match_sql_oracle_rules():
    """Falsy/null field shapes where Python and the SQL oracle must agree
    (review findings): empty Logs object, JSON-null requestLine, status 0."""
    # {"Logs": {}} is a PRESENT structured record (Go non-nil pointer) →
    # application, not error
    assert extract_log_line(json.dumps({"Logs": {}}))["record_type"] == "application"
    # JSON-null requestLine counts as present (key-in semantics) → HTTP
    # classification → then no parseable request line → skip
    null_rl = json.dumps({"Logs": {"timeMillis": 1, "contextMap": {"requestLine": None}}})
    assert extract_log_line(null_rl)["record_type"] == "skip"
    # status 0: non-empty string form '0' = Apache evidence → http path →
    # no request line → skip (NOT application)
    assert extract_log_line(json.dumps({"Logs": {"status": 0}}))["record_type"] == "skip"
    # log: null → blank container → skip (not error)
    assert extract_log_line(json.dumps({"log": None}))["record_type"] == "skip"


def test_proxy_full_projection():
    line = json.dumps({
        "Logs": {"requestFirstLine": "GET /a HTTP/1.1", "status": 200,
                 "localServerName": "s", "remoteUser": "u1",
                 "referer": "https://x/y", "cacheStatus": "HIT"},
        "kubernetes": {"pod_ip": "10.1.2.3"},
    })
    r = extract_log_line(line)
    assert r["record_type"] == "proxy"
    assert r["remote_user"] == "u1"
    assert r["referer"] == "https://x/y"
    assert r["pod_ip"] == "10.1.2.3"
