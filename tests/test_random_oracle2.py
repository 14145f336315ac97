"""Randomized oracle tests, part 2: text-corpus and relational queries on
random inputs — punctuation-only docs, empty strings, exact duplicate
texts, single-line orders, boundary discounts."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tools.check_queries import compare

DOC_QUERIES = [
    "ttr_per_source",
    "zipf_slope",
    "source_vocab_jaccard",
    "boilerplate_sentences",
    "hapax_docs_per_source",
    "heaps_law_fit",
    "bigram_lm_nll",
    "temperature_resample",
    "corpus_diff",
]

# gram-family queries need every doc >= k (=5) words (documented gram
# contract, functions/grams.py) — they get their own >=5-word corpus
GRAM_QUERIES = [
    "cross_doc_dup_windows",
    "substring_dedup_stats",
    "substring_dedup_rewrite",
]


def random_gram_documents(seed: int, n: int = 120) -> pa.Table:
    """Docs of 8-28 words over a 12-word vocab: natural cross-doc 5-gram
    collisions are common, plus planted exact copies and shared mid-doc
    spans — and every doc satisfies the >= k-words gram contract."""
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        k = int(rng.integers(8, 29))
        t = " ".join(rng.choice(WORDS, size=k))
        if i % 9 == 0 and i > 0:
            t = texts[i - 1]  # exact copy
        if i % 13 == 0 and i > 1:
            # splice a 7-word span from an earlier doc into the middle
            donor = texts[i - 2].split(" ")
            if len(donor) >= 7:
                w = t.split(" ")
                t = " ".join(w[:4] + donor[:7] + w[4:])
        texts.append(t)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 4, size=n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })

REL_QUERIES = [
    "order_priority_check",
    "small_quantity_revenue",
    "custdist",
    "orders_vs_ships_daily",
    "fulfillment_latency_hist",
    "copurchase_degree_hist",
    "weighted_median_price",
    "skyline_orders",
    "orders_growth_wow",
    "revenue_pareto",
    "new_vs_returning_revenue",
    "forecast_revenue_change",
]

WORDS = ["the", "a", "of", "spark", "query", "vector", "hash", "join",
         "batch", "zebra", "quill", "oxide"]


def random_documents(seed: int, n: int = 150) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 25))
        words = list(rng.choice(WORDS, size=k))
        t = " ".join(words)
        if i % 17 == 0:
            t = "...!?"  # punctuation-only
        if i % 23 == 0:
            t = ""  # empty
        if i % 11 == 0 and i > 0:
            t = texts[i - 1]  # exact duplicate of the previous doc
        texts.append(t)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 4, size=n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def random_relational(seed: int, n_orders: int = 300, n_cust: int = 60):
    rng = np.random.default_rng(seed)
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    odate = pd.Timestamp("1996-01-01") + pd.to_timedelta(
        rng.integers(0, 900, size=n_orders), unit="D")
    orders = pa.table({
        "o_orderkey": pa.array(okeys),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, size=n_orders).astype(np.int64)),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], size=n_orders)),
        "o_totalprice": pa.array(np.round(rng.uniform(900, 5000, size=n_orders), 2)),
        "o_orderdate": pa.array(odate, type=pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], size=n_orders)),
    })
    n_li = n_orders * 3
    lkeys = rng.choice(okeys, size=n_li)
    ship = pd.Timestamp("1996-01-01") + pd.to_timedelta(
        rng.integers(0, 1000, size=n_li), unit="D")
    lineitem = pa.table({
        "l_orderkey": pa.array(lkeys.astype(np.int64)),
        "l_partkey": pa.array(rng.integers(1, 80, size=n_li).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(1, 10, size=n_li).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 7, size=n_li).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 50, size=n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(100, 90000, size=n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, size=n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, size=n_li) / 100.0, 2)),
        "l_returnflag": pa.array(rng.choice(["R", "A", "N"], size=n_li)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], size=n_li)),
        "l_shipdate": pa.array(ship, type=pa.timestamp("us")),
    })
    customer = pa.table({
        "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(1, n_cust + 1)]),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, size=n_cust), 2)),
        "c_mktsegment": pa.array(rng.choice(
            ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"], size=n_cust)),
    })
    return orders, lineitem, customer


def _run(name: str, d: str, con) -> None:
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    problems = compare(name, got, want)
    assert not problems, problems


@pytest.mark.parametrize("seed", [5, 13])
@pytest.mark.parametrize("name", DOC_QUERIES)
def test_random_documents_matches_oracle(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"rdoc{seed}")
    pq.write_table(random_documents(seed), str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    _run(name, str(d), con)


@pytest.mark.parametrize("seed", [2, 19])
@pytest.mark.parametrize("name", GRAM_QUERIES)
def test_random_gram_corpus_matches_oracle(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"rgram{seed}")
    pq.write_table(random_gram_documents(seed), str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    _run(name, str(d), con)


@pytest.mark.parametrize("seed", [7, 11])
@pytest.mark.parametrize("name", REL_QUERIES)
def test_random_relational_matches_oracle(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"rrel{seed}")
    orders, lineitem, customer = random_relational(seed)
    pq.write_table(orders, str(d / "orders.parquet"))
    pq.write_table(lineitem, str(d / "lineitem.parquet"))
    pq.write_table(customer, str(d / "customer.parquet"))
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    _run(name, str(d), con)


@pytest.mark.parametrize("seed", [7, 21])
def test_semantic_dedup_random_embeddings(seed, ray_session, tmp_path_factory):
    """semantic_dedup vs its unrolled-Lloyd + EXISTS oracle on RANDOM
    embeddings with planted duplicate pairs — exercises kmeans tie-breaks
    and cosine comparisons on data the fixed corpus never shows."""
    rng = np.random.default_rng(seed)
    n, dim = 160, 64
    M = rng.normal(size=(n, dim))
    # plant exact duplicates (cos = 1.0, assignment-invariant)
    for a, b in ((3, 77), (10, 41), (100, 150)):
        M[b] = M[a]
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in M],
                              type=pa.list_(pa.float32())),
    })
    d = tmp_path_factory.mktemp(f"sd{seed}")
    pq.write_table(t, str(d / "embeddings.parquet"))

    from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
    from tools.check_queries import compare

    spec = REGISTRY["semantic_dedup"]
    got = spec.fn(str(d))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')")
    want = con.execute(spec.sql).df()
    problems = compare("semantic_dedup", got, want, exact=True)
    assert not problems, problems
    assert int(got["n_dropped"].sum()) >= 3  # the planted duplicates dropped
