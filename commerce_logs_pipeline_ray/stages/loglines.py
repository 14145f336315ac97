"""JSON log-line extractor — full semantic rebuild of the reference's
extraction service over raw log lines.

The reference's heart is a three-way classify-then-parse over JSON log lines
(``pipeline/extraction/internal/extractor/extractor.go``):

* **Format 1 "structured"** — nested ``Logs``/``logs`` object
  (``extractor.go:42-66`` dispatcher);
* **Format 2 "container"** — flat ``log`` string + ``@timestamp``/``time``
  + ``kubernetes.pod_name`` (``extractor.go:149-197``);
* classifiers: ``isHTTPRequestLog`` (``:103-146``), ``isProxyLog``
  (``:820-832``);
* extractors: HTTP request (``:246-433``), application (``:436-500``),
  proxy (``:564-755``), with the messy float64/int/string coercions of
  ``contextMap`` values (``:313-357``) and the request-line regex compiled
  once (``:29``);
* skip sentinels (``(nil, nil)`` returns): empty message, ``requestLine ==
  "-"``, non-HTTP protocol (e.g. RTSP), non-standard method (e.g.
  SSTP_DUPLEX_POST) — ``:151-154, 287-311, 371-396, 682-707``;
* log-level regex with INFO default (``:221-227``), service-from-pod
  normalizer (``:24, 176-184``), RFC3339Nano timestamps (``:200-218``).

Like the reference, parsing is per-record (JSON is irreducibly row-wise);
it runs inside ``map_batches`` so batches stream and the per-record loop
never touches the driver.  Everything downstream (routing, aggregation)
stays vectorized.  Timestamps are Unix **nanoseconds** (``ts_ns`` int64),
matching the reference's wire format.
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone

import pyarrow as pa

# request line grammar — extractor.go:29
REQUEST_LINE_RE = re.compile(r"^([A-Z_]+)\s+([^\s]+)\s+([A-Z]+)/[\d.]+$")
# log level — extractor.go:32
LEVEL_RE = re.compile(r"\b(TRACE|DEBUG|INFO|WARN|WARNING|ERROR|FATAL)\b", re.IGNORECASE)
# service from pod name — extractor.go:24
SERVICE_RE = re.compile(r"^([a-z-]+?)(?:-[a-f0-9]+)?-[a-z0-9]+$")

# standard HTTP methods — non-standard (SSTP_DUPLEX_POST, …) are skipped,
# extractor_test.go:1033-1131 semantics
STANDARD_METHODS = {
    "GET", "POST", "PUT", "DELETE", "PATCH", "HEAD", "OPTIONS", "TRACE", "CONNECT",
}

RECORD_COLUMNS: list[tuple[str, pa.DataType]] = [
    ("record_type", pa.string()),   # http | application | proxy | container | skip | error
    ("ts_ns", pa.int64()),
    ("level", pa.string()),
    ("logger", pa.string()),
    ("thread", pa.string()),
    ("message", pa.string()),
    ("method", pa.string()),
    ("path", pa.string()),
    ("protocol", pa.string()),
    ("status_code", pa.int32()),
    ("bytes_sent", pa.int64()),
    ("process_millis", pa.int64()),
    ("local_server_name", pa.string()),
    ("remote_host", pa.string()),
    ("remote_user", pa.string()),
    ("referer", pa.string()),
    ("user_agent", pa.string()),
    ("cache_status", pa.string()),
    ("pod_ip", pa.string()),
    ("pod", pa.string()),
    ("service", pa.string()),
    ("thrown", pa.string()),
    ("error_type", pa.string()),
]


def _coerce_int(v, default=None):
    """contextMap values arrive as float64/int/str — extractor.go:313-357."""
    if v is None:
        return default
    if isinstance(v, bool):
        return default
    if isinstance(v, (int, float)):
        return int(v)
    if isinstance(v, str):
        if v in ("", "-"):
            return default
        try:
            return int(float(v))
        except ValueError:
            return default
    return default


def _coerce_str(v) -> str | None:
    """Field values may arrive as any JSON type; string fields are coerced
    (numbers → str) rather than crashing the batch."""
    if v is None:
        return None
    return v if isinstance(v, str) else json.dumps(v, sort_keys=True)


def _first_present(*vals):
    """First value that is not None — unlike ``or``, a legitimate 0 / ""
    at higher precedence is kept (204-response bytesSent=0 etc.)."""
    for v in vals:
        if v is not None:
            return v
    return None


def _parse_rfc3339_ns(s) -> int | None:
    """RFC3339Nano → Unix ns (extractor.go:200-218)."""
    if not s or not isinstance(s, str):
        return None
    try:
        frac_ns = 0
        base = s
        m = re.match(r"^(.*?)(?:\.(\d+))?(Z|[+-]\d{2}:?\d{2})$", s)
        if m:
            base = m.group(1) + (m.group(3) or "")
            if m.group(2):
                frac = m.group(2)[:9].ljust(9, "0")
                frac_ns = int(frac)
        dt = datetime.fromisoformat(base.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000 + frac_ns
    except (ValueError, AttributeError):
        return None


def extract_level(text: str) -> str:
    """Case-insensitive level regex, INFO default, uppercased; WARNING→WARN
    is NOT collapsed (mirrors extractor.go:221-227)."""
    m = LEVEL_RE.search(text or "")
    return m.group(1).upper() if m else "INFO"


def service_from_pod(pod: str) -> str:
    """extractor.go:176-184: regex else first dash-segment fallback."""
    if not pod:
        return ""
    m = SERVICE_RE.match(pod)
    if m:
        return m.group(1)
    return pod.split("-")[0]


def _timestamp_ns(logs: dict, root: dict) -> int | None:
    """timeMillis*1e6, else instant.epochSecond*1e9+nano, else root
    @timestamp RFC3339 (extractor.go:246-283, 436-470)."""
    tm = _coerce_int(logs.get("timeMillis"))
    if tm is not None:
        return tm * 1_000_000
    instant = logs.get("instant")
    if isinstance(instant, dict):
        sec = _coerce_int(instant.get("epochSecond"))
        if sec is not None:
            return sec * 1_000_000_000 + (_coerce_int(instant.get("nanoOfSecond"), 0) or 0)
    return _parse_rfc3339_ns(root.get("@timestamp") or "")


def _field_evidence(v) -> bool:
    """Apache-field evidence rule shared with the SQL oracle: the field is
    present AND its string form is non-empty (JSON null → absent; 0/false →
    '0'/'false' → evidence, matching ``json_extract_string`` semantics)."""
    return v is not None and str(v) != ""


def _is_http_request_log(logs: dict) -> bool:
    """extractor.go:103-146 exactly: Apache fields (non-empty
    requestFirstLine/status) → HTTP; else the contextMap path is gated on
    BOTH timeMillis and contextMap being present, then requestLine → HTTP,
    then ANY of statusCode/bytesSent/processMillis/remoteHost counts as HTTP
    evidence unless source{Class,Method}Name marks it an application log."""
    if _field_evidence(logs.get("requestFirstLine")) or _field_evidence(logs.get("status")):
        return True
    if logs.get("timeMillis") is None:
        return False
    ctx = logs.get("contextMap")
    if not isinstance(ctx, dict):
        return False
    if "requestLine" in ctx:
        return True
    has_http = any(f in ctx for f in ("statusCode", "bytesSent", "processMillis", "remoteHost"))
    no_src = "sourceClassName" not in ctx and "sourceMethodName" not in ctx
    return has_http and no_src


def _is_proxy_log(logs: dict) -> bool:
    """extractor.go:820-832."""
    if "requestFirstLine" in logs and "localServerName" in logs:
        return True
    return "localServerName" in logs or "cacheStatus" in logs


def extract_log_line(line: str) -> dict:
    """One record in, one typed record (or skip/error sentinel) out —
    the per-message semantics of ``ExtractLog`` (extractor.go:42-66).

    NEVER raises: any unexpected shape becomes an ``error`` record, so one
    malformed line cannot kill a whole batch/task (the error-channel
    contract, R2)."""
    rec: dict = {name: None for name, _ in RECORD_COLUMNS}

    if not line or not line.strip():
        rec["record_type"] = "skip"
        return rec
    try:
        obj = json.loads(line)
        if not isinstance(obj, dict):
            raise ValueError("not an object")
    except (json.JSONDecodeError, ValueError) as e:
        rec["record_type"] = "error"
        rec["error_type"] = f"json_parse: {type(e).__name__}"
        return rec

    try:
        # dispatch on OBJECT-ness, not truthiness: {"Logs": {}} is a present
        # (empty) structured record — Go's non-nil pointer semantics and the
        # SQL oracle's json_type(...)='OBJECT' both agree
        logs = obj.get("Logs")
        if not isinstance(logs, dict):
            logs = obj.get("logs")
        if isinstance(logs, dict):
            return _extract_structured(logs, obj, rec)
        if "log" in obj:
            return _extract_container(obj, rec)
        rec["record_type"] = "error"
        rec["error_type"] = "unknown_format"
        return rec
    except Exception as e:  # noqa: BLE001 — error channel, not a crash
        bad: dict = {name: None for name, _ in RECORD_COLUMNS}
        bad["record_type"] = "error"
        bad["error_type"] = f"extract: {type(e).__name__}"
        return bad


def _extract_request_line(raw, rec) -> bool:
    """Shared request-line parse + skip sentinels.  True = keep."""
    if raw in (None, "", "-"):  # '-' request → skip (extractor.go:287-311)
        rec["record_type"] = "skip"
        return False
    m = REQUEST_LINE_RE.match(str(raw))
    if not m:
        rec["record_type"] = "skip"
        return False
    method, path, protocol = m.group(1), m.group(2), m.group(3)
    if protocol != "HTTP":  # RTSP etc → skip (extractor_test.go:1033-1063)
        rec["record_type"] = "skip"
        return False
    if method not in STANDARD_METHODS:  # SSTP_DUPLEX_POST → skip (:1065-1131)
        rec["record_type"] = "skip"
        return False
    rec["method"], rec["path"], rec["protocol"] = method, path, protocol
    return True


def _extract_structured(logs: dict, root: dict, rec: dict) -> dict:
    ctx = logs.get("contextMap") if isinstance(logs.get("contextMap"), dict) else {}
    if _is_http_request_log(logs):
        rfl = logs.get("requestFirstLine")
        # string-form precedence (matches the oracle's NULLIF(string, ''))
        request_line = str(rfl) if _field_evidence(rfl) else ctx.get("requestLine")
        if not _extract_request_line(request_line, rec):
            return rec
        rec["record_type"] = "proxy" if _is_proxy_log(logs) else "http"
        rec["ts_ns"] = _timestamp_ns(logs, root)
        # _first_present, not `or`: status/bytesSent of 0 are real values
        rec["status_code"] = _coerce_int(_first_present(logs.get("status"), ctx.get("statusCode")))
        rec["bytes_sent"] = _coerce_int(_first_present(logs.get("bytesSent"), ctx.get("bytesSent")), 0)
        rec["process_millis"] = _coerce_int(ctx.get("processMillis"))
        rec["remote_host"] = _coerce_str(_first_present(logs.get("remoteHost"), ctx.get("remoteHost")))
        if rec["record_type"] == "proxy":
            rec["local_server_name"] = _coerce_str(logs.get("localServerName"))
            rec["user_agent"] = _coerce_str(logs.get("userAgent"))
            rec["cache_status"] = _coerce_str(logs.get("cacheStatus"))
            # full proxy projection — extractor.go:733-755: remoteUser/referer
            # from the Apache-format Logs object, pod_ip from root kubernetes
            rec["remote_user"] = _coerce_str(logs.get("remoteUser"))
            rec["referer"] = _coerce_str(logs.get("referer"))
            kube = root.get("kubernetes")
            rec["pod_ip"] = _coerce_str(kube.get("pod_ip")) if isinstance(kube, dict) else None
        rec["level"] = extract_level(str(logs.get("level") or ""))
        return rec

    # application log (extractor.go:436-500)
    rec["record_type"] = "application"
    rec["ts_ns"] = _timestamp_ns(logs, root)
    rec["level"] = extract_level(str(logs.get("level") or ""))
    rec["logger"] = _coerce_str(logs.get("loggerName"))
    rec["thread"] = _coerce_str(logs.get("thread"))
    rec["message"] = _coerce_str(logs.get("message"))
    thrown = logs.get("thrown")
    if thrown is not None:
        # string passthrough or object → JSON re-serialization (:463-477)
        rec["thrown"] = thrown if isinstance(thrown, str) else json.dumps(thrown, sort_keys=True)
    return rec


def _extract_container(obj: dict, rec: dict) -> dict:
    text = obj.get("log")
    text = text if isinstance(text, str) else (_coerce_str(text) or "")
    if not text.strip():  # blank container log → skip (extractor.go:151-154)
        rec["record_type"] = "skip"
        return rec
    rec["record_type"] = "container"
    # @timestamp preferred over time (extractor.go:200-218)
    rec["ts_ns"] = _parse_rfc3339_ns(obj.get("@timestamp")) or _parse_rfc3339_ns(obj.get("time"))
    rec["message"] = text.rstrip("\n")
    rec["level"] = extract_level(text)
    kube = obj.get("kubernetes")
    pod = _coerce_str(kube.get("pod_name")) if isinstance(kube, dict) else None
    rec["pod"] = pod
    rec["service"] = service_from_pod(pod or "")
    return rec


def synth_log_lines(n: int, seed: int = 42) -> list[str]:
    """Deterministic synthetic log-line corpus covering every wire format
    and sentinel path (for tests/benchmarks; no external data)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    pods = ["api-6f9d8c7b5-x2x9p", "backoffice-ab12cd34-p9q8r", "jsapps-77ee66dd-a1b2c"]
    paths = ["/", "/checkout", "/medias/p.jpg", "/api/v2/orders", "/search?q=x"]
    lines: list[str] = []
    for i in range(n):
        kind = rng.random()
        ts_ms = 1718000000000 + int(rng.integers(0, 86_400_000))
        if kind < 0.40:  # structured http
            lines.append(json.dumps({"Logs": {"contextMap": {
                "requestLine": f"GET {paths[i % len(paths)]} HTTP/1.1",
                "statusCode": float(rng.choice([200, 200, 404, 500])),
                "bytesSent": str(int(rng.integers(100, 100000))),
                "processMillis": int(rng.integers(1, 500)),
                "remoteHost": f"10.0.0.{i % 255}"},
                "timeMillis": ts_ms, "level": "INFO"}}))
        elif kind < 0.55:  # proxy
            lines.append(json.dumps({"Logs": {
                "requestFirstLine": f"POST {paths[i % len(paths)]} HTTP/1.1",
                "status": int(rng.choice([200, 502])),
                "localServerName": "shop.example.com",
                "userAgent": "UA", "cacheStatus": str(rng.choice(["HIT", "MISS"])),
                "remoteUser": "-" if i % 3 else "user1",
                "referer": f"https://shop.example.com{paths[(i + 1) % len(paths)]}",
                "timeMillis": ts_ms},
                "kubernetes": {"pod_ip": f"10.1.0.{i % 255}"}}))
        elif kind < 0.80:  # application
            lines.append(json.dumps({"logs": {
                "instant": {"epochSecond": ts_ms // 1000, "nanoOfSecond": int(rng.integers(0, 1_000_000_000))},
                "level": str(rng.choice(["INFO", "WARN", "ERROR"])),
                "loggerName": "com.shop.Service", "thread": f"http-{i % 16}",
                "message": f"handled request {i}"}}))
        elif kind < 0.92:  # container
            lines.append(json.dumps({
                "@timestamp": "2025-06-15T10:30:00.5Z",
                "log": f"{'ERROR' if i % 7 == 0 else 'info'} container event {i}\n",
                "kubernetes": {"pod_name": pods[i % len(pods)]}}))
        elif kind < 0.96:  # skip sentinels
            lines.append(rng.choice([
                "", json.dumps({"log": "  "}),
                json.dumps({"Logs": {"timeMillis": 1718000000000, "contextMap": {"requestLine": "-", "statusCode": 1, "remoteHost": "h"}}}),
                json.dumps({"Logs": {"requestFirstLine": "DESCRIBE /s RTSP/1.0", "status": 200}}),
            ]))
        else:  # errors
            lines.append(rng.choice(["{truncated", json.dumps({"weird": True})]))
    return lines


def extract_batch(t: pa.Table, *, line_col: str = "line") -> pa.Table:
    """map_batches stage: raw line column → typed record columns.

    Per-record JSON parse inside the batch (row-wise like the reference's
    Go extractor); columns out are typed Arrow arrays.
    """
    lines = t[line_col].to_pylist()
    records = [extract_log_line(s) for s in lines]
    cols = {}
    for name, typ in RECORD_COLUMNS:
        cols[name] = pa.array([r[name] for r in records], type=typ)
    out = pa.table(cols)
    for c in t.column_names:
        if c != line_col:
            out = out.append_column(c, t[c])
    return out
