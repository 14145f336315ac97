"""Randomized oracle tests, part 5: the session-4 wave-6 operator family
(embedding drift audit, bounded transitive closure, unigram-LM EM step,
UCB1 offline replay, BM25 nDCG eval) on random inputs with planted edge
cases, Ray vs DuckDB/scalar-artifact on the same corpus."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare

WORDS = ["spark", "query", "vector", "hash", "join", "table", "scan", "merge",
         "lorem", "ipsum", "delta", "gamma", "batch", "index"]


def _run(name: str, d: str, con) -> None:
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
    want = con.execute(sql).df()
    problems = compare(name, got, want)
    assert not problems, problems


def _docs_table(seed: int, n: int = 400) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, size=int(rng.integers(6, 40))))
        for _ in range(n)
    ]
    texts[0] = "join hash join hash join"       # planted multi-term hit
    texts[1] = "scan table scan table scan"     # planted rel ties
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 4, size=n)]),
    })


@pytest.mark.parametrize("seed", [3, 17])
@pytest.mark.parametrize("name", ["ndcg_bm25_eval", "unigram_em_step"])
def test_random_docs_wave6(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w6doc{seed}")
    pq.write_table(_docs_table(seed), str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    _run(name, str(d), con)


@pytest.mark.parametrize("seed", [7, 29])
def test_random_embedding_drift(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n, dim = 300, 16
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    lab = rng.integers(0, 5, size=n).astype(np.int32)
    mat[lab == 3] += 0.8  # one shifted label: drift cosine far from ±1
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in mat],
                              pa.list_(pa.float32())),
        "label": pa.array(lab),
    })
    d = tmp_path_factory.mktemp(f"w6emb{seed}")
    pq.write_table(t, str(d / "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')"
    )
    _run("embedding_drift_audit", str(d), con)


@pytest.mark.parametrize("seed", [11, 37])
def test_random_transitive_reach(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n = 1500
    t = pa.table({
        "l_orderkey": pa.array(rng.integers(1, 120, size=n).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(1, 40, size=n).astype(np.int64)),
    })
    d = tmp_path_factory.mktemp(f"w6tr{seed}")
    pq.write_table(t, str(d / "lineitem.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
    )
    _run("transitive_reach3", str(d), con)


@pytest.mark.parametrize("seed", [13, 43])
def test_random_ucb1_replay(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n = 3000
    base = pd.Timestamp("2024-01-01").value // 1000
    ts_us = base + rng.integers(0, 10 * 24 * 3600, size=n).astype(np.int64) * 1_000_000
    ts_us[:5] = ts_us[5]  # planted equal timestamps → event_id tiebreak matters
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 50, size=n).astype(np.int64)),
        "event_type": pa.array(
            rng.choice(["view", "purchase", "click", "error", "signup"], size=n)),
        "value": pa.array(np.round(rng.uniform(0, 12, size=n), 2)),
        "props": pa.array(["" for _ in range(n)]),
    })
    d = tmp_path_factory.mktemp(f"w6ucb{seed}")
    pq.write_table(t, str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    _run("ucb1_replay", str(d), con)


def test_ucb1_episode_hand_checked():
    """Hand-walked UCB1 replay: arms explored in name order, logged rounds
    count only on match, UCB ties break to the lower arm index."""
    from commerce_logs_pipeline_ray.pipelines.queries import _UCB_ARMS, _ucb1_episode

    # arm order: click, error, purchase, signup, view
    types = ["click", "view", "error", "purchase", "signup", "view", "click"]
    rewards = [1, 0, 0, 1, 0, 1, 0]
    out = _ucb1_episode(types, rewards)
    # round 1: unexplored → click chosen, matches → n=1 s=1
    # round 2: unexplored → error chosen, logged view → no match
    # round 3: error chosen, matches → n=1 s=0; then purchase, signup match
    # round 6: view unexplored → chosen, matches (r=1)
    assert out["click"][0] >= 1 and out["click"][1] >= 1
    assert out["error"] == [1, 0]
    assert out["purchase"] == [1, 1]
    assert out["signup"] == [1, 0]
    assert out["view"] == [1, 1]
    # all five explored after round 6; round 7: UCB over t=5 rounds
    n = {"click": 1, "error": 1, "purchase": 1, "signup": 1, "view": 1}
    s = {"click": 1, "error": 0, "purchase": 1, "signup": 0, "view": 1}
    best = max(_UCB_ARMS, key=lambda a: (s[a] / n[a] + math.sqrt(2 * math.log(5)), ))
    # ties on the UCB value break to the FIRST arm in _UCB_ARMS order
    expected_choice = next(
        a for a in _UCB_ARMS
        if s[a] / n[a] == max(s[x] / n[x] for x in _UCB_ARMS))
    assert expected_choice == "click"
    assert out["click"] == [2, 1] if expected_choice == "click" else True


def test_ndcg_weights_exact_integers():
    """The positional µ-weights are exact ints and strictly decreasing."""
    w = [int(round(1e6 / math.log2(i + 1.0))) for i in range(1, 11)]
    assert w[0] == 1_000_000
    assert all(a > b for a, b in zip(w, w[1:]))


def _docs_table7(seed: int, n: int = 350) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, size=int(rng.integers(5, 30))))
        for _ in range(n)
    ]
    texts[0] = "alpha beta gamma delta epsilon zeta"
    texts[1] = "alpha beta gamma delta epsilon zeta eta theta iota"  # 0 ⊂ 1
    texts[2] = texts[1]                                              # exact dup
    texts[3] = "num 42 and 7 mixed 99"                               # digits
    langs = rng.choice(["en", "de", "fr", "zh"], size=n)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 4, size=n)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], np.int64)),
    })


@pytest.mark.parametrize("seed", [2, 19])
@pytest.mark.parametrize(
    "name", ["feature_hash_collisions", "logreg_quality_step", "containment_pairs"])
def test_random_docs_wave7(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w7doc{seed}")
    pq.write_table(_docs_table7(seed), str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    _run(name, str(d), con)


@pytest.mark.parametrize("seed", [23, 31])
def test_random_clustering_coefficient(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n = 1200
    t = pa.table({
        "l_orderkey": pa.array(rng.integers(1, 150, size=n).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(1, 50, size=n).astype(np.int64)),
    })
    d = tmp_path_factory.mktemp(f"w7cc{seed}")
    pq.write_table(t, str(d / "lineitem.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
    )
    _run("clustering_coefficient", str(d), con)


@pytest.mark.parametrize("seed", [3, 47])
def test_random_t_closeness(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n_cust, n_ord = 120, 2000
    cust = pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 7, size=n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(0, 100, n_cust), 2)),
        "c_mktsegment": pa.array(["SEG"] * n_cust),
    })
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pick = rng.integers(0, 5, size=n_ord)
    pick[rng.integers(0, n_ord, size=300)] = 0  # planted skewed group mass
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n_ord).astype(np.int64)),
        "o_orderstatus": pa.array(["O"] * n_ord),
        "o_totalprice": pa.array(np.round(rng.uniform(10, 500, n_ord), 2)),
        "o_orderdate": pa.array(
            np.full(n_ord, pd.Timestamp("2024-03-01").value // 1000, np.int64),
            pa.timestamp("us")),
        "o_orderpriority": pa.array([prios[i] for i in pick]),
    })
    nation = pa.table({
        "n_nationkey": pa.array(np.arange(7, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{chr(65 + i)}" for i in range(7)]),
        "n_regionkey": pa.array(np.zeros(7, np.int32)),
    })
    d = tmp_path_factory.mktemp(f"w7tc{seed}")
    pq.write_table(cust, str(d / "customer.parquet"))
    pq.write_table(orders, str(d / "orders.parquet"))
    pq.write_table(nation, str(d / "nation.parquet"))
    con = duckdb.connect()
    for tname in ("customer", "orders", "nation"):
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{d}/{tname}.parquet')"
        )
    _run("t_closeness_audit", str(d), con)


# --- wave 8 ---------------------------------------------------------------


@pytest.mark.parametrize("seed", [5, 13])
@pytest.mark.parametrize(
    "name", ["psi_drift", "ece_calibration", "cuped_adjustment"])
def test_random_events_wave8(name, seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n = 4000
    base = pd.Timestamp("2024-01-01").value // 1000
    ts_us = base + rng.integers(0, 20 * 24 * 3600, size=n).astype(np.int64) * 1_000_000
    vals = np.round(rng.uniform(0, 60, size=n), 2)
    vals[ts_us > np.median(ts_us)] *= 1.5  # planted drift into the 2nd half
    vals = np.round(vals, 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 80, size=n).astype(np.int64)),
        "event_type": pa.array(
            rng.choice(["view", "purchase", "click", "error", "signup"], size=n)),
        "value": pa.array(vals),
        "props": pa.array(["" for _ in range(n)]),
    })
    d = tmp_path_factory.mktemp(f"w8ev{seed}")
    pq.write_table(t, str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    _run(name, str(d), con)


@pytest.mark.parametrize("seed", [7, 21])
@pytest.mark.parametrize("name", ["cdc_chunk_dedup", "mixture_ess_audit"])
def test_random_docs_wave8(name, seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n = 300
    texts = [
        " ".join(rng.choice(WORDS, size=int(rng.integers(10, 120))))
        for _ in range(n)
    ]
    texts[1] = texts[0]                        # exact dup → shared chunks
    texts[2] = "zz " + texts[0]                # prefix insertion: CDC re-syncs
    texts[3] = ""                              # empty doc: zero chunks
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 3, size=n)]),
        "n_chars": pa.array(np.array([max(len(x), 1) for x in texts], np.int64)),
    })
    d = tmp_path_factory.mktemp(f"w8doc{seed}")
    pq.write_table(t, str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    _run(name, str(d), con)


def test_cdc_vectorized_equals_scalar_and_resyncs():
    """The vectorized Arrow-buffer chunker must equal the scalar reference
    byte-for-byte, and a prefix insertion must leave the tail chunks
    identical (the defining CDC property)."""
    from commerce_logs_pipeline_ray.functions.cdc import chunk_column, chunk_text_scalar

    rng = np.random.default_rng(11)
    texts = ["".join(chr(97 + int(c)) for c in rng.integers(0, 26, size=ln))
             for ln in (0, 3, 5, 6, 7, 200, 1500, 4000)]
    arr = pa.array(texts)
    doc_idx, h, ln = chunk_column(arr)
    got = {}
    for d in range(len(texts)):
        m = doc_idx == d
        got[d] = list(zip(h[m].tolist(), ln[m].tolist()))
    for d, s in enumerate(texts):
        want = [(hh % (1 << 64), l) for hh, l in chunk_text_scalar(s)]
        assert [(x % (1 << 64), l) for x, l in got[d]] == want, f"doc {d}"
    # re-sync: shifted copy shares its tail chunks
    base = texts[-1]
    shifted = "q" + base
    _, h2, ln2 = chunk_column(pa.array([shifted]))
    tail_base = set(zip(h[doc_idx == len(texts) - 1].tolist()[2:],
                        ln[doc_idx == len(texts) - 1].tolist()[2:]))
    tail_shift = set(zip(h2.tolist(), ln2.tolist()))
    assert len(tail_base & tail_shift) >= len(tail_base) - 2
