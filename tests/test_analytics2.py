"""Round-2 analytics batch: BM25, MAD outliers, CUBE, set-op membership,
time-decayed EWMA — kernel-level invariants beyond the sf0.001 oracle runs
in test_queries.py."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from commerce_logs_pipeline_ray.functions.search import bm25_postings, bm25_search
from commerce_logs_pipeline_ray.functions.sketch import quantile_from_counts


def test_quantile_from_counts_matches_numpy():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 500, size=101)
    bins, counts = np.unique(vals, return_counts=True)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        got = quantile_from_counts(bins, counts, q)
        assert got == pytest.approx(np.quantile(vals, q), abs=1e-9)


def test_quantile_from_counts_even_count_mid_pair():
    # two values → median is the mid-pair average (SQL median semantics)
    assert quantile_from_counts(np.array([10, 20]), np.array([1, 1]), 0.5) == 15.0
    assert quantile_from_counts(np.array([5]), np.array([4]), 0.5) == 5.0


def test_quantile_from_counts_null_mass():
    assert quantile_from_counts(np.array([np.nan]), np.array([3]), 0.5) is None


def test_bm25_postings_sentinel_carries_corpus_stats(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": ["alpha beta beta", "beta gamma", "..."],
        }
    )
    ds = rd.from_arrow(docs)
    out = bm25_postings(ds, ["beta"]).to_pandas()
    sent = out[out["doc_id"] == -1]
    # doc 2 tokenizes to nothing → 2 docs with tokens, 5 tokens total
    assert int(sent["tf"].sum()) == 2
    assert int(sent["doclen"].sum()) == 5
    cand = out[out["doc_id"] >= 0].sort_values("doc_id")
    assert cand["doc_id"].tolist() == [0, 1]
    assert cand["tf"].tolist() == [2, 1]
    assert cand["doclen"].tolist() == [3, 2]


def test_bm25_score_formula(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": ["x x y", "y z"],
        }
    )
    got = bm25_search(rd.from_arrow(docs), ["x"], k=5)
    n, df, tf, dl, avgdl = 2, 1, 2, 3, 2.5
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    expect = idf * (tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))))
    assert got["doc_id"].tolist() == [0]
    assert got["score"].iloc[0] == pytest.approx(expect, abs=1e-6)


def _ewma_reference(ts_us: np.ndarray, vals: np.ndarray, tau_us: float) -> float:
    anchor = ts_us.max()
    return float((vals * np.exp((ts_us - anchor) / tau_us)).sum())


def test_ewma_partials_reanchor_associatively():
    # fold two partials (anchor, s) exactly like the query's merge stage and
    # compare against the single-pass reference, under every 2-way split
    tau = 86_400_000_000.0
    rng = np.random.default_rng(3)
    ts = np.sort(rng.integers(0, 10 * tau, size=9).astype(np.int64))
    v = rng.uniform(1, 100, size=9)
    want = _ewma_reference(ts, v, tau)
    for cut in range(1, 9):
        a1, s1 = ts[:cut].max(), _ewma_reference(ts[:cut], v[:cut], tau)
        a2, s2 = ts[cut:].max(), _ewma_reference(ts[cut:], v[cut:], tau)
        a = max(a1, a2)
        merged = s1 * math.exp((a1 - a) / tau) + s2 * math.exp((a2 - a) / tau)
        assert merged == pytest.approx(want, rel=1e-12)


def test_mad_outliers_planted(ray_session, tmp_path, monkeypatch):
    # 99 values at 10.00 and one wild 500.00 → median 10, MAD 0, the single
    # extreme point is the only |dev| > 3*MAD outlier... MAD 0 makes every
    # nonzero deviation an outlier; plant a spread so MAD > 0.
    vals = np.concatenate([np.full(60, 10.00), np.full(40, 12.00), [500.00]])
    df = pd.DataFrame(
        {
            "event_type": ["t"] * len(vals),
            "value": vals,
            "event_id": np.arange(len(vals)),
            "user_id": np.zeros(len(vals), dtype=np.int64),
            "ts": pd.to_datetime(np.arange(len(vals)), unit="s"),
            "props": ["{}"] * len(vals),
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    from commerce_logs_pipeline_ray.pipelines.queries import q_mad_outliers

    out = q_mad_outliers(str(tmp_path))
    assert out["median_value"].iloc[0] == 10.0
    # devs: 60×0, 40×2, 1×490 → MAD = median = 0 (61 of 101 ≤ 0)... 0
    assert out["mad"].iloc[0] == 0.0
    assert out["n_outliers"].iloc[0] == 41  # every dev > 0


def test_naive_bayes_confusion_diagonal_dominant(ray_session):
    from commerce_logs_pipeline_ray.pipelines.queries import q_naive_bayes_langid

    out = q_naive_bayes_langid("/root/testdata/sf0.001")
    total = out["n"].sum()
    diag = out[out["lang"] == out["predicted"]]["n"].sum()
    # the synthetic langs share most vocabulary and the sf0.001 train fold is
    # tiny, so demand only better-than-chance (5 langs → 0.2); exact-output
    # correctness is the DuckDB-oracle check in test_queries/check_queries
    assert total > 0 and diag / total > 0.2


def test_quantile_disc_from_counts_matches_duckdb():
    """quantile_disc ≡ Postgres percentile_disc: first value whose
    cumulative fraction ≥ q — verified against DuckDB itself."""
    import duckdb

    from commerce_logs_pipeline_ray.functions.sketch import quantile_disc_from_counts

    rng = np.random.default_rng(7)
    for n in (1, 2, 5, 17, 100):
        vals = rng.integers(-50, 50, size=n)
        bins, counts = np.unique(vals, return_counts=True)
        con = duckdb.connect()
        con.execute("CREATE TABLE t(v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?)", [(int(v),) for v in vals])
        for q in (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0):
            want = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            assert quantile_disc_from_counts(bins, counts, q) == want, (n, q)


def test_word_bigrams_kernel():
    """Punctuation does not break adjacency (empties dropped BEFORE
    pairing); bigrams never cross row boundaries; empty/one-word rows emit
    nothing."""
    import pyarrow as pa

    from commerce_logs_pipeline_ray.functions.search import word_bigrams

    t = pa.table({
        "text": ["a, b...c", "", "word", "X  y!z", None],
        "src": ["s1", "s2", "s3", "s4", "s5"],
    })
    out = word_bigrams(t, "text", "src").to_pandas()
    got = list(zip(out["src"], out["w1"], out["w2"]))
    assert got == [("s1", "a", "b"), ("s1", "b", "c"), ("s4", "x", "y"), ("s4", "y", "z")]


def test_skyline_tie_semantics(ray_session, tmp_path):
    """Crafted ties: exact-duplicate rows BOTH survive (neither strictly
    dominates), same-price/different-date keeps the earlier date only,
    same-date/different-price keeps the higher price only — verified
    against the NOT EXISTS dominance oracle on the same parquet."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY, SQL_SKYLINE_ORDERS
    from tools.check_queries import compare

    rows = [
        # duplicates on both dims → both in skyline
        (1, 500.00, "2000-01-05"),
        (2, 500.00, "2000-01-05"),
        # same price, later date → dominated by 1/2
        (3, 500.00, "2000-02-01"),
        # same date as 1/2, lower price → dominated
        (4, 400.00, "2000-01-05"),
        # strictly better date, lower price → in skyline
        (5, 300.00, "2000-01-01"),
        # dominated by 5 (same date, lower price)
        (6, 200.00, "2000-01-01"),
        # the global max price, latest date → in skyline
        (7, 900.00, "2000-03-01"),
    ]
    t = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([1] * len(rows), pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows)),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
        "o_orderdate": pa.array([pd.Timestamp(r[2]) for r in rows], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))

    got = REGISTRY["skyline_orders"].fn(str(tmp_path))
    assert sorted(got["o_orderkey"]) == [1, 2, 5, 7]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/orders.parquet')")
    assert not compare("skyline", got, con.execute(SQL_SKYLINE_ORDERS).df())
