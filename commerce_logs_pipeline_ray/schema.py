"""Canonical Arrow schemas and registry constants.

The reference declares its fixed output schemas once as Avro records
(``pipeline/events/avro_schemas.go:5-35``); this module is the rebuild's
single-source-of-truth equivalent (SURVEY.md §1.4).

Input payload (BASELINE.json ``input_hint``): one Parquet table
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``.
``doc_id`` carries a structured, blob-name-shaped identifier
(``docs/blob-structure.md:4-33`` in the reference; parser at
``pipeline/blob-monitor/internal/selectors/selectors.go:20-71``) and is the
grok/regex parse target.  ``tokens`` must round-trip bit-exactly through
every stage.
"""

from __future__ import annotations

import pyarrow as pa

# --------------------------------------------------------------------------
# Input table
# --------------------------------------------------------------------------

SEQUENCES_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

VOCAB_SIZE = 50257
MAX_TOKENS = 2048

# --------------------------------------------------------------------------
# Source universe (reference selector registry, selectors.go:84-186)
# --------------------------------------------------------------------------

# The 7 registered selector names in the reference; `apache-proxy` is the hot
# key (Zipf-skewed in the generator) to exercise skew-aware salting.
SOURCES: list[str] = [
    "apache-proxy",
    "api",
    "backoffice",
    "background-processing",
    "jsapps",
    "imageprocessing",
    "zookeeper",
]

# service name embedded in the pod segment of doc_id (the blob-name grammar's
# pod is `{service}-{replicaset-hash}-{suffix}`, selectors.go:20-71).
SERVICE_BY_SOURCE: dict[str, str] = {
    "apache-proxy": "apache2-igc",
    "api": "api",
    "backoffice": "backoffice",
    "background-processing": "background-processing",
    "jsapps": "jsapps",
    "imageprocessing": "imageprocessing",
    "zookeeper": "zookeeper",
}

CONTAINER_BY_SOURCE: dict[str, str] = {
    "apache-proxy": "proxy",
    "zookeeper": "zookeeper",
}
DEFAULT_CONTAINER = "app"

# --------------------------------------------------------------------------
# Doc-id grammar (parse stage)
# --------------------------------------------------------------------------

# `{date}.{pod}_{namespace}_{container}-{blobhash}` — mirrors the reference's
# kubernetes blob-name grammar `{date}.{pod}_{ns}_{container}-{id}.gz`
# (selectors.go:20-71: last-dash / underscore splitting).  RE2-compatible so
# pyarrow.compute.extract_regex and DuckDB regexp_extract agree bit-for-bit.
DOC_ID_PATTERN = (
    r"^(?P<date>\d{8})\."
    r"(?P<pod>[a-z0-9-]+)_"
    r"(?P<namespace>[a-z0-9]+)_"
    r"(?P<container>[a-z0-9-]+)-"
    r"(?P<blob>[a-f0-9]{8})$"
)

# pod = `{service}-{replicaset 8hex}-{suffix 5alnum}`; non-greedy service so
# dashes inside service names survive (reference service-name normalizer,
# extractor.go:24,176-184).
POD_PATTERN = r"^(?P<service>[a-z][a-z0-9-]*?)-(?P<rs>[a-f0-9]{8})-(?P<suffix>[a-z0-9]{5})$"

# --------------------------------------------------------------------------
# Sinks (route registry — reference selector predicates selectors.go:84-186,
# raw routing processor.go:36-41, error path events/extraction.go:136-151)
# --------------------------------------------------------------------------

# First-match-wins precedence order.
SINKS: list[str] = ["errors", "proxy", "infra", "background", "frontend", "application"]

ERROR_TYPE_EMPTY = "empty_doc_id"
ERROR_TYPE_MALFORMED = "malformed_doc_id"

# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------

N_TOK_BUCKET_WIDTH = 128  # n_tok_bucket = n_tok // 128 (FIXTURES.md §3b)
AGG_KEYS: list[str] = ["sink", "source", "tenant", "n_tok_bucket"]

# Number of logical hash partitions recorded in the `partition_id` lineage
# column — the analogue of the reference's FNV32a(blob) % 12 Kafka
# partitioning (processor.go:29-33; configs/kafka_topics.yaml:1-24).
NUM_LOGICAL_PARTITIONS = 12

# --------------------------------------------------------------------------
# Routed output schema (FIXTURES.md §3a)
# --------------------------------------------------------------------------

ROUTED_COLUMNS: list[str] = [
    "doc_id",
    "tokens",
    "n_tok",
    "source",
    "date",
    "service",
    "pod",
    "namespace",
    "container",
    "tenant",
    "environment",
    "service_display",
    "sink",
    "partition_id",
    "lineage_id",
    "error_type",
    "raw",
]

AGG_SCHEMA = pa.schema(
    [
        pa.field("sink", pa.string()),
        pa.field("source", pa.string()),
        pa.field("tenant", pa.string()),
        pa.field("n_tok_bucket", pa.int32()),
        pa.field("row_count", pa.int64()),
        pa.field("token_count", pa.int64()),
    ]
)
