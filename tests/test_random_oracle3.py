"""Randomized oracle tests, part 3: the round-4 session-3 operator families
(web-cleaning, DSIR, layout, attribution, audits, joins, SSSP, ALS, PQ) on
random inputs with planted edge cases.  Artifact-backed oracles are
retargeted to the random corpus dir exactly as tools/check_queries does."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare

WORDS = ["the", "a", "of", "and", "to", "spark", "query", "vector", "hash",
         "join", "slow", "table", "scan", "merge", "lorem", "ipsum"]

DOC_QUERIES = [
    "gopher_repetition",
    "gopher_quality_rules",
    "c4_line_filter",
    "line_dedup_rewrite",
    "webclean_pipeline",
    "dsir_importance",
    "ngram_diversity",
    "bm25_two_pass",
    "blocklist_scan",
    "budget_apportionment",
    "mmr_rerank",
]

EVENT_QUERIES = [
    "linear_attribution",
    "cusum_changepoint",
    "twap_user_value",
    "zonemap_pruned_scan",
    "isotonic_purchase_rate",
    "histogram_split_finder",
    "partition_skew_audit",
    "incremental_agg",
]

EMB_QUERIES = ["knn_label_consistency", "contrastive_pairs", "pq_ann_topk"]

REL_QUERIES = ["sort_merge_revenue", "woe_binning", "sssp_copurchase", "als_user_step"]


def _run(name: str, d: str, con) -> None:
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
    want = con.execute(sql).df()
    problems = compare(name, got, want)
    assert not problems, problems


def random_documents(seed: int, n: int = 140) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        k = int(rng.integers(4, 40))
        t = " ".join(rng.choice(WORDS, size=k))
        if i % 11 == 0 and i > 0:
            t = texts[i - 1]  # exact duplicate
        texts.append(t)
    langs = rng.choice(["en", "de", "fr"], size=n, p=[0.5, 0.3, 0.2])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 4, size=n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def random_events(seed: int, n: int = 2000) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01").value // 1000  # µs
    ts_us = base + rng.integers(0, 40 * 24 * 3600, size=n).astype(np.int64) * 1_000_000
    ts_us[:5] = ts_us[5]  # planted equal timestamps (tie-break paths)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(1, 80, size=n).astype(np.int64)),
            "event_type": pa.array(
                rng.choice(["view", "purchase", "click", "error", "signup"], size=n)
            ),
            "value": pa.array(np.round(rng.uniform(0, 200, size=n), 2)),
            "props": pa.array(["" for _ in range(n)]),
        }
    )


def random_embeddings(seed: int, n: int = 160, dim: int = 64) -> pa.Table:
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 5, size=n).astype(np.int32)
    centers = rng.normal(size=(5, dim)) * 4
    M = centers[labels] + rng.normal(size=(n, dim))
    M[50] = M[20]  # exact duplicate vector (tie-break path)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row for row in M.astype(np.float32)], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels),
        }
    )


def random_relational(seed: int, n_orders: int = 300, n_cust: int = 50):
    rng = np.random.default_rng(seed)
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    orders = pa.table(
        {
            "o_orderkey": pa.array(okeys),
            "o_custkey": pa.array(
                rng.integers(1, n_cust + 1, size=n_orders).astype(np.int64)
            ),
            "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], size=n_orders)),
            "o_totalprice": pa.array(np.round(rng.uniform(900, 5000, size=n_orders), 2)),
        }
    )
    n_li = n_orders * 3
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(rng.choice(okeys, size=n_li).astype(np.int64)),
            "l_partkey": pa.array(rng.integers(1, 60, size=n_li).astype(np.int64)),
        }
    )
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
            "c_mktsegment": pa.array(
                rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY"], size=n_cust)
            ),
        }
    )
    return orders, lineitem, customer


@pytest.mark.parametrize("seed", [3, 27])
@pytest.mark.parametrize("name", DOC_QUERIES)
def test_random_docs3(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"r3doc{seed}")
    pq.write_table(random_documents(seed), str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    _run(name, str(d), con)


@pytest.mark.parametrize("seed", [9, 31])
@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_random_events3(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"r3ev{seed}")
    pq.write_table(random_events(seed), str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    _run(name, str(d), con)


@pytest.mark.parametrize("seed", [4, 18])
@pytest.mark.parametrize("name", EMB_QUERIES)
def test_random_embeddings3(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"r3em{seed}")
    pq.write_table(random_embeddings(seed), str(d / "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')"
    )
    _run(name, str(d), con)


@pytest.mark.parametrize("seed", [6, 22])
@pytest.mark.parametrize("name", REL_QUERIES)
def test_random_relational3(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"r3rel{seed}")
    orders, lineitem, customer = random_relational(seed)
    pq.write_table(orders, str(d / "orders.parquet"))
    pq.write_table(lineitem, str(d / "lineitem.parquet"))
    pq.write_table(customer, str(d / "customer.parquet"))
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    _run(name, str(d), con)
