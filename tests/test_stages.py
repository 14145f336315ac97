"""Unit tests for parse / enrich / route / aggregate stage functions
(run directly on pa.Tables — no Ray needed — mirroring the reference's
table-driven extractor tests, extractor_test.go:13-1158)."""

import pyarrow as pa
import pyarrow.compute as pc

from commerce_logs_pipeline_ray.oracle import run_oracle
from commerce_logs_pipeline_ray.schema import SEQUENCES_SCHEMA
from commerce_logs_pipeline_ray.stages.aggregate import final_agg, partial_agg
from commerce_logs_pipeline_ray.stages.enrich import Enricher, build_source_dict
from commerce_logs_pipeline_ray.stages.parse import parse_batch
from commerce_logs_pipeline_ray.stages.route import route_batch


def _seq_table(rows):
    return pa.Table.from_pylist(rows, schema=SEQUENCES_SCHEMA)


EDGE_ROWS = [
    # well-formed proxy
    {"doc_id": "20250615.apache2-igc-9db94ff4f0-xzl59_default_proxy-a8c06151",
     "tokens": [1, 2, 3], "n_tok": 3, "source": "apache-proxy"},
    # well-formed app with dashed service name
    {"doc_id": "20250601.background-processing-abcdef01-ab12c_apps_app-00ff00ff",
     "tokens": [7], "n_tok": 1, "source": "background-processing"},
    # empty doc_id (reference empty-message skip, extractor.go:151-154)
    {"doc_id": "", "tokens": [5, 5], "n_tok": 2, "source": "api"},
    # malformed: underscores stripped
    {"doc_id": "20250615.apione2bdefaultapp-deadbeef", "tokens": [9], "n_tok": 1, "source": "api"},
    # malformed: truncated date
    {"doc_id": "2025.api-12345678-ab9cd_default_app-deadbeef", "tokens": [4, 4, 4],
     "n_tok": 3, "source": "api"},
    # zookeeper → system namespace → infra
    {"doc_id": "20250615.zookeeper-0a1b2c3d-zk001_system_zookeeper-11112222",
     "tokens": [2], "n_tok": 1, "source": "zookeeper"},
    # jsapps → frontend
    {"doc_id": "20250620.jsapps-44556677-fe001_default_app-33334444",
     "tokens": [8, 8], "n_tok": 2, "source": "jsapps"},
]


def test_parse_edge_cases():
    # rs_hash must be exactly 8 hex — adjust row 0 to valid grammar
    t = _seq_table(EDGE_ROWS)
    p = parse_batch(t)
    ok = p.column("parse_ok").to_pylist()
    assert ok == [False, True, False, False, False, True, True]
    # row 0: rs hash '9db94ff4f0' is 10 chars → pod grammar rejects (strict)
    et = p.column("error_type").to_pylist()
    assert et[2] == "empty_doc_id"
    assert et[3] == "malformed_doc_id"
    assert p.column("service").to_pylist()[1] == "background-processing"
    assert p.column("namespace").to_pylist()[5] == "system"
    assert p.column("date").to_pylist()[6] == "20250620"


def test_parse_matches_oracle_on_generated(small_sequences):
    _, table = small_sequences
    p = parse_batch(table)
    orc = run_oracle(table.to_pylist())
    got_ok = p.column("parse_ok").to_pylist()
    want = {}
    for sink, rows in orc.rows_by_sink.items():
        for r in rows:
            want[r["doc_id"]] = r
    doc_ids = table.column("doc_id").to_pylist()
    for i, d in enumerate(doc_ids):
        assert got_ok[i] == want[d]["parse_ok"], d
    # partition_id lineage matches scalar FNV oracle
    pid = p.column("partition_id").to_pylist()
    for i, d in enumerate(doc_ids):
        assert pid[i] == want[d]["partition_id"]


def test_enrich_lookup_and_unknown_source():
    t = _seq_table(EDGE_ROWS[:2])
    t = t.set_column(3, "source", pa.array(["apache-proxy", "no-such-source"]))
    e = Enricher()(t)
    assert e.column("raw_topic").to_pylist() == ["Raw.ProxyLogs", None]
    assert e.column("tenant").to_pylist()[1] is None
    dim = build_source_dict()
    assert dim["raw_topic"][dim["source"].index("apache-proxy")] == "Raw.ProxyLogs"
    assert dim["raw_topic"][dim["source"].index("api")] == "Raw.ApplicationLogs"


def test_route_first_match_precedence():
    t = route_batch(Enricher()(parse_batch(_seq_table(EDGE_ROWS))))
    sinks = t.column("sink").to_pylist()
    assert sinks == ["errors", "background", "errors", "errors", "errors", "infra", "frontend"]


def test_partial_plus_final_agg_equals_oracle(small_sequences, ray_session):
    import ray.data as rd

    _, table = small_sequences
    routed = route_batch(Enricher()(parse_batch(table)))
    orc = run_oracle(table.to_pylist())

    for salt in (0, 8):
        partial = partial_agg(routed, salt_mod=salt)
        ds = rd.from_arrow(partial)
        got = {}
        for r in final_agg(ds, salted=salt > 1).to_dict("records"):
            got[(r["sink"], r["source"], r["tenant"], r["n_tok_bucket"])] = (
                int(r["row_count"]),
                int(r["token_count"]),
            )
        want = {k: tuple(v) for k, v in orc.agg.items()}
        assert got == want, f"salt={salt}"


def test_tokens_untouched_by_stages(small_sequences):
    _, table = small_sequences
    out = route_batch(Enricher()(parse_batch(table)))
    assert out.schema.field("tokens").type == pa.list_(pa.int32())
    assert out.column("tokens").equals(table.column("tokens"))


def test_sliced_batch_write_raw_integrity(tmp_path):
    """Regression: pyarrow if_else(cond, sliced-string, null-scalar) corrupts
    output (zero-filled / wrong-chunk values).  Ray slices blocks into
    batches, so every stage must tolerate non-zero array offsets."""
    import glob

    import pyarrow.parquet as pq

    from commerce_logs_pipeline_ray.datagen import generate_file
    from commerce_logs_pipeline_ray.pipelines.flagship import write_routed_batch

    t1 = generate_file(0, 3000, seed=42)
    t2 = generate_file(1, 3000, seed=42)
    t = pa.concat_tables([t1, t2]).slice(500, 4000)  # sliced, multi-chunk
    routed = route_batch(Enricher()(parse_batch(t)))
    out = str(tmp_path)
    write_routed_batch(
        routed, out_dir=out, shard_id=0, lineage="x", bucket_width=128,
        salt_mod=8, write_routed=True,
    )
    for f in glob.glob(f"{out}/routed/**/*.parquet", recursive=True):
        tt = pq.read_table(f, columns=["doc_id", "raw", "sink"])
        for d, raw, sink in zip(
            tt["doc_id"].to_pylist(), tt["raw"].to_pylist(), tt["sink"].to_pylist()
        ):
            if sink == "errors":
                assert raw == d
            else:
                assert raw is None


def test_validation_stage(small_sequences, ray_session, tmp_path):
    """Semantic validation: bad month/day or token-count mismatch → errors
    sink with error_type=validation_error (extractor.go:503-561 parity)."""
    import os

    import pyarrow.parquet as pq

    from commerce_logs_pipeline_ray.oracle import run_oracle
    from commerce_logs_pipeline_ray.pipelines.flagship import PipelineConfig, run_flagship
    from commerce_logs_pipeline_ray.stages.validate import validate_batch

    bad_rows = [
        # month 13 — passes the \d{8} regex, fails validation
        {"doc_id": "20251315.api-12345678-ab9cd_default_app-deadbeef",
         "tokens": [1, 2], "n_tok": 2, "source": "api"},
        # n_tok disagrees with the physical list length
        {"doc_id": "20250615.api-12345678-ab9cd_default_app-deadbeef",
         "tokens": [1, 2, 3], "n_tok": 2, "source": "api"},
        # valid control row
        {"doc_id": "20250615.jsapps-44556677-fe001_default_app-33334444",
         "tokens": [8], "n_tok": 1, "source": "jsapps"},
    ]
    t = _seq_table(bad_rows)
    v = validate_batch(parse_batch(t))
    assert v.column("parse_ok").to_pylist() == [False, False, True]
    assert v.column("error_type").to_pylist()[:2] == ["validation_error", "validation_error"]

    # end-to-end on generated corpus + injected bad rows, vs oracle
    paths, table = small_sequences
    import pyarrow as pa_

    mixed = pa_.concat_tables([table, t])
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    pq.write_table(mixed, os.path.join(in_dir, "part-00000.parquet"))
    cfg = PipelineConfig(input_dir=in_dir, output_dir=str(tmp_path / "out"),
                         validate=True, batch_size=1024)
    res = run_flagship(cfg)
    orc = run_oracle(mixed.to_pylist(), validate=True)
    got = {
        (r["sink"], r["source"], r["tenant"], r["n_tok_bucket"]): (r["row_count"], r["token_count"])
        for r in res.aggregates.to_pylist()
    }
    assert got == {k: tuple(v) for k, v in orc.agg.items()}
