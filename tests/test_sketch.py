import numpy as np
import pandas as pd
import pytest

from commerce_logs_pipeline_ray.functions.hashing import fnv1a64
from commerce_logs_pipeline_ray.functions.sketch import HyperLogLog, approx_distinct


def test_hll_accuracy_across_scales():
    for n in (100, 5_000, 200_000):
        h = HyperLogLog(p=12)
        vals = [f"key-{i}" for i in range(n)]
        h.add_hashes(fnv1a64(vals))
        est = h.estimate()
        # raw HLL has a known ~3-4% low bias in the 2.5m-5m transition
        # zone (no HLL++ bias table) — 8%% bound covers it plus variance
        assert abs(est - n) / n < 0.08, (n, est)


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_hashes(fnv1a64([f"a{i}" for i in range(10_000)]))
    b.add_hashes(fnv1a64([f"a{i}" for i in range(5_000, 15_000)]))  # overlap 5k
    merged = a.merge(b)
    est = merged.estimate()
    assert abs(est - 15_000) / 15_000 < 0.08
    # serialization round-trip preserves registers
    rt = HyperLogLog.deserialize(merged.serialize(), 12)
    assert rt.estimate() == merged.estimate()


def test_approx_distinct_dataset(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 30_000, size=120_000)
    ds = rd.from_pandas(pd.DataFrame({"user": [f"u{v}" for v in vals]})).repartition(16)
    est = approx_distinct(ds, "user", p=12)
    true = len(set(vals))
    assert abs(est - true) / true < 0.08


def test_query_estimate_close_to_exact(ray_session):
    import duckdb

    from commerce_logs_pipeline_ray.pipelines.queries import q_approx_distinct_users

    est = int(q_approx_distinct_users("/root/testdata/sf0.01")["n_users_approx"].iloc[0])
    true = duckdb.sql(
        "SELECT COUNT(DISTINCT user_id) FROM read_parquet('/root/testdata/sf0.01/events.parquet')"
    ).fetchone()[0]
    assert abs(est - true) / true < 0.08


def test_null_values_not_distinct(ray_session):
    import ray.data as rd

    # NULL must not count as a distinct value, nor collide with ''
    ds = rd.from_pandas(pd.DataFrame({"k": ["a", "b", None, "", None] * 200}))
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - 3) < 0.5


def test_grouped_quantile_fixedpoint_exact(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sketch import grouped_quantile_fixedpoint

    rng = np.random.default_rng(4)
    # 2-decimal fixed-point values, one odd-count and one even-count group,
    # plus NULL values that SQL aggregates ignore
    a = np.round(rng.uniform(0, 50, size=1001), 2)
    b = np.round(rng.uniform(10, 99, size=800), 2)
    df = pd.DataFrame(
        {
            "g": ["a"] * len(a) + ["b"] * len(b) + ["a"] * 5,
            "v": np.concatenate([a, b, [np.nan] * 5]),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    out = grouped_quantile_fixedpoint(ds, "g", "v", q=0.5, out_name="med").set_index("g")["med"]
    assert out["a"] == np.median(a)
    assert out["b"] == np.median(b)  # even count → mid-pair average
    q9 = grouped_quantile_fixedpoint(ds, "g", "v", q=0.9, out_name="q")
    exp_a = np.quantile(a, 0.9, method="linear")
    got_a = float(q9.set_index("g")["q"]["a"])
    assert abs(got_a - exp_a) < 1e-9


def test_quantile_all_null_group_emitted(ray_session):
    """A group whose values are all NULL appears with a NULL median (SQL
    GROUP BY semantics), instead of being dropped."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sketch import grouped_quantile_fixedpoint

    df = pd.DataFrame({"g": ["a"] * 10 + ["b"] * 10,
                       "v": [1.25] * 10 + [np.nan] * 10})
    out = grouped_quantile_fixedpoint(rd.from_pandas(df).repartition(4), "g", "v",
                                      out_name="med").set_index("g")["med"]
    assert out["a"] == 1.25
    assert "b" in out.index and np.isnan(out["b"])


def test_bloom_no_false_negatives_and_fp_rate():
    from commerce_logs_pipeline_ray.functions.sketch import BloomFilter

    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1 << 62, size=20000).astype(np.uint64)
    b = BloomFilter.for_capacity(20000, bits_per_key=10)
    b.add_hashes(keys)
    assert b.contains_hashes(keys).all()  # NEVER a false negative
    probe = rng.integers(0, 1 << 62, size=100000).astype(np.uint64)
    fresh = probe[~np.isin(probe, keys)]
    assert b.contains_hashes(fresh).mean() < 0.03  # ~1% nominal at 10 b/key
    # OR-merge == single-pass build, and serialization round-trips
    x, y = BloomFilter(b.n_bits, b.k), BloomFilter(b.n_bits, b.k)
    x.add_hashes(keys[:10000])
    y.add_hashes(keys[10000:])
    assert (x.merge(y).words == b.words).all()
    r = BloomFilter.deserialize(b.serialize(), b.n_bits, b.k)
    assert (r.words == b.words).all()


def test_bloom_semi_join_exact_vs_pandas(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import bloom_semi_join

    rng = np.random.default_rng(7)
    big = pd.DataFrame(
        {"k": rng.integers(0, 5000, size=20000), "v": rng.random(20000)}
    )
    small = pd.DataFrame({"k2": rng.choice(5000, size=700, replace=False)})
    got = (
        bloom_semi_join(
            rd.from_pandas(big).repartition(6),
            rd.from_pandas(small).repartition(3),
            on="k",
            right_on="k2",
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = (
        big[big["k"].isin(small["k2"])].sort_values(["k", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "v"]], want)


def test_bloom_semi_join_string_keys(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import bloom_semi_join

    rng = np.random.default_rng(3)
    ids = [f"doc-{i:05d}" for i in range(3000)]
    big = pd.DataFrame({"doc_id": rng.choice(ids, size=9000), "n": np.arange(9000)})
    keep = pd.DataFrame({"doc_id": rng.choice(ids, size=200, replace=False)})
    got = (
        bloom_semi_join(
            rd.from_pandas(big).repartition(5),
            rd.from_pandas(keep).repartition(2),
            on="doc_id",
        )
        .to_pandas()
        .sort_values("n")
        .reset_index(drop=True)
    )
    want = big[big["doc_id"].isin(keep["doc_id"])].sort_values("n").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "n"]], want[["doc_id", "n"]])


# ------------------------------------------------------- grouped HLL

def test_grouped_approx_distinct_accuracy(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sketch import grouped_approx_distinct

    rng = np.random.default_rng(21)
    n = 60_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1]),
            "v": rng.integers(0, 5000, n).astype(str),
        }
    )
    got = grouped_approx_distinct(rd.from_pandas(df), ["g"], "v", p=12)
    exact = df.groupby("g")["v"].nunique()
    for _, r in got.iterrows():
        rel = abs(r["approx_distinct"] - exact[r["g"]]) / exact[r["g"]]
        assert rel < 0.05, (r["g"], r["approx_distinct"], exact[r["g"]])


def test_grouped_approx_distinct_matches_global_for_single_group(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sketch import (
        approx_distinct,
        grouped_approx_distinct,
    )

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"g": "only", "v": rng.integers(0, 3000, 20_000).astype(str)})
    ds = rd.from_pandas(df)
    grouped = grouped_approx_distinct(ds, ["g"], "v", p=12)
    glob = approx_distinct(ds, "v", p=12)
    # identical hash stream + identical register fold ⇒ identical estimate
    assert abs(grouped["approx_distinct"].iloc[0] - glob) < 1e-9


def test_grouped_approx_distinct_ignores_nulls(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sketch import grouped_approx_distinct

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 2, "v": ["x", None, "y", None, None, None]})
    got = grouped_approx_distinct(rd.from_pandas(df), ["g"], "v", p=12)
    est = dict(zip(got["g"], got["approx_distinct"]))
    assert round(est["a"]) == 2
    # group b has ONLY nulls → no sketch rows at all → absent (SQL would
    # emit 0; documented rows-only divergence)
    assert "b" not in est


def test_kll_small_input_exact():
    """Below the capacity budget no compaction happens — quantiles exact."""
    import numpy as np

    from commerce_logs_pipeline_ray.functions.sketch import KLLSketch

    s = KLLSketch(200)
    vals = np.arange(1, 101, dtype=np.float64)
    s.update_many(vals)
    assert s.n == 100
    assert s.quantile(0.5) == 50.0
    assert s.quantile(0.01) == 1.0
    assert s.quantile(1.0) == 100.0


def test_kll_rank_accuracy_streaming():
    import numpy as np

    from commerce_logs_pipeline_ray.functions.sketch import KLLSketch

    rng = np.random.default_rng(11)
    data = rng.lognormal(3, 1, 200_000)
    s = KLLSketch(200)
    for chunk in np.array_split(data, 64):
        s.update_many(chunk)
    sd = np.sort(data)
    for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
        est = s.quantile(q)
        true_rank = np.searchsorted(sd, est, side="right") / len(sd)
        assert abs(true_rank - q) < 0.02, (q, true_rank)


def test_kll_merge_matches_single_sketch_bound():
    """32 per-chunk sketches merged in tree order keep the rank bound —
    the property the distributed per-batch combiner relies on."""
    import numpy as np

    from commerce_logs_pipeline_ray.functions.sketch import KLLSketch

    rng = np.random.default_rng(5)
    data = rng.normal(0, 1, 160_000)
    parts = []
    for chunk in np.array_split(data, 32):
        s = KLLSketch(200)
        s.update_many(chunk)
        parts.append(KLLSketch.deserialize(s.serialize()))  # wire roundtrip
    while len(parts) > 1:  # tree merge (arbitrary order is the contract)
        parts = [
            parts[i].merge(parts[i + 1]) if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    merged = parts[0]
    assert merged.n == len(data)
    sd = np.sort(data)
    for q in [0.1, 0.5, 0.9]:
        true_rank = np.searchsorted(sd, merged.quantile(q), side="right") / len(sd)
        assert abs(true_rank - q) < 0.025, (q, true_rank)


def test_kll_nan_and_weight_conservation():
    import numpy as np

    from commerce_logs_pipeline_ray.functions.sketch import KLLSketch

    s = KLLSketch(50)
    s.update_many(np.array([1.0, np.nan, 2.0, np.nan]))
    assert s.n == 2
    big = np.arange(10_000, dtype=np.float64)
    s2 = KLLSketch(50)
    s2.update_many(big)
    # total represented weight is conserved through compactions
    total_w = sum(len(b) * (1 << h) for h, b in enumerate(s2.levels))
    assert total_w == 10_000


def test_approx_quantiles_dataset_vs_exact(ray_session):
    """Distributed per-batch KLL over the real table vs exact ranks."""
    import numpy as np
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sketch import approx_quantiles

    ds = rd.read_parquet("/root/testdata/sf0.01/lineitem.parquet",
                         columns=["l_extendedprice"])
    qs = [0.1, 0.5, 0.9, 0.99]
    est = approx_quantiles(ds, "l_extendedprice", qs, k=200)
    exact = np.sort(ds.to_pandas()["l_extendedprice"].to_numpy())
    for q in qs:
        rank = np.searchsorted(exact, est[q], side="right") / len(exact)
        assert abs(rank - q) < 0.01, (q, rank)


def test_grouped_approx_quantiles_rank_bound(ray_session):
    import numpy as np
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sketch import grouped_approx_quantiles

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"g": rng.choice(["a", "b", "c"], 90_000), "v": rng.lognormal(2, 1, 90_000)}
    )
    got = grouped_approx_quantiles(rd.from_pandas(df).repartition(16), ["g"], "v", [0.5, 0.9])
    assert sorted(got["g"]) == ["a", "b", "c"]
    for _, r in got.iterrows():
        sub = np.sort(df[df["g"] == r["g"]]["v"].to_numpy())
        for q, col in [(0.5, "q5"), (0.9, "q9")]:
            rank = np.searchsorted(sub, r[col], side="right") / len(sub)
            assert abs(rank - q) < 0.02, (r["g"], q, rank)


def test_grouped_approx_quantiles_nulls_and_small_groups(ray_session):
    """Null values ignored; a group smaller than k is EXACT."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sketch import grouped_approx_quantiles

    df = pd.DataFrame(
        {"g": ["a"] * 5 + ["b"] * 3, "v": [1.0, 2.0, 3.0, 4.0, None, 10.0, 20.0, 30.0]}
    )
    got = grouped_approx_quantiles(rd.from_pandas(df), ["g"], "v", [0.5], k=160)
    est = dict(zip(got["g"], got["q5"]))
    assert est["a"] == 2.0  # rank ceil(0.5*4)=2nd of [1,2,3,4]
    assert est["b"] == 20.0  # median of [10,20,30]


def test_misra_gries_deterministic_bounds():
    """Every item with frequency > n/(k+1) present; kept counts are lower
    bounds within n/(k+1) — across a 40-way chunked merge (the distributed
    shape)."""
    import numpy as np

    from commerce_logs_pipeline_ray.functions.sketch import MisraGries

    rng = np.random.default_rng(2)
    data = rng.zipf(1.3, 300_000) % 50_000
    parts = []
    for chunk in np.array_split(data, 40):
        mg = MisraGries(128)
        v, c = np.unique(chunk, return_counts=True)
        mg.update_counts(v.tolist(), c.tolist())
        parts.append(mg)
    m = parts[0]
    for p in parts[1:]:
        m = m.merge(p)
    v, c = np.unique(data, return_counts=True)
    true = dict(zip(v.tolist(), c.tolist()))
    bound = m.error_bound()
    thresh = len(data) / 129
    assert m.n == len(data)
    assert not [x for x, f in true.items() if f > thresh and x not in m.counts]
    errs = [true[x] - cnt for x, cnt in m.counts.items()]
    assert 0 <= min(errs) and max(errs) <= bound


def test_mg_heavy_hitters_dataset_recovers_planted(ray_session):
    import numpy as np
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sketch import mg_heavy_hitters

    rng = np.random.default_rng(9)
    tail = rng.integers(1000, 50_000, 80_000)
    planted = np.repeat([7, 13, 42], [9000, 6000, 4000])
    vals = np.concatenate([tail, planted])
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})
    out = mg_heavy_hitters(rd.from_pandas(df).repartition(16), "v", k=64)
    got = dict(zip(out["v"].astype(int), out["count_lb"].astype(int)))
    bound = out["err_ub"].iloc[0]
    for item, freq in [(7, 9000), (13, 6000), (42, 4000)]:
        assert item in got
        assert freq - bound <= got[item] <= freq
    # top-1 by lower bound is the heaviest planted item
    assert int(out.iloc[0]["v"]) == 7


def test_kmv_exact_below_capacity_and_merge():
    import numpy as np

    from commerce_logs_pipeline_ray.functions.hashing import fnv1a64
    from commerce_logs_pipeline_ray.functions.sketch import KMVSketch

    s = KMVSketch(1024)
    s.add_hashes(fnv1a64([f"x{i}" for i in range(500)]))
    assert s.estimate() == 500.0  # below k → exact
    a, b = KMVSketch(1024), KMVSketch(1024)
    a.add_hashes(fnv1a64([f"x{i}" for i in range(300)]))
    b.add_hashes(fnv1a64([f"x{i}" for i in range(200, 500)]))
    m = a.merge(b)
    assert m.estimate() == 500.0
    rt = KMVSketch.deserialize(m.serialize(), 1024)
    assert (rt.values == m.values).all()


def test_kmv_set_algebra_accuracy():
    """Union / intersection estimates within ~4/sqrt(k) of truth."""
    import numpy as np

    from commerce_logs_pipeline_ray.functions.hashing import fnv1a64
    from commerce_logs_pipeline_ray.functions.sketch import KMVSketch

    k = 4096
    A = [f"u{i}" for i in range(40_000)]
    B = [f"u{i}" for i in range(30_000, 80_000)]  # |A∩B|=10k, |A∪B|=80k
    sa, sb = KMVSketch(k), KMVSketch(k)
    for chunk in np.array_split(np.array(A), 13):
        sa.add_hashes(fnv1a64(list(chunk)))
    for chunk in np.array_split(np.array(B), 7):
        sb.add_hashes(fnv1a64(list(chunk)))
    tol = 4 / np.sqrt(k)
    assert abs(sa.estimate() - 40_000) / 40_000 < tol
    assert abs(sa.merge(sb).estimate() - 80_000) / 80_000 < tol
    # intersection compounds Jaccard + union noise — double tolerance
    assert abs(sa.intersection_estimate(sb) - 10_000) / 10_000 < 2 * tol


def test_kmv_dataset_sketch_matches_local(ray_session):
    """Distributed per-batch KMV == one local sketch of the same values
    (bottom-k union is order-independent — bit-equal, not just close)."""
    import numpy as np
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.hashing import fnv1a64
    from commerce_logs_pipeline_ray.functions.sketch import KMVSketch, kmv_column_sketch

    rng = np.random.default_rng(6)
    vals = [f"v{x}" for x in rng.integers(0, 20_000, 60_000)]
    ds = rd.from_pandas(pd.DataFrame({"c": vals})).repartition(16)
    got = kmv_column_sketch(ds, "c", k=512)
    want = KMVSketch(512)
    want.add_hashes(fnv1a64(vals))
    assert (got.values == want.values).all()


def test_sketch_edge_cases():
    """Empty/single/all-equal/adversarially-ordered inputs across the three
    new sketches — the degenerate shapes a 100-TB stream will contain."""
    import numpy as np

    from commerce_logs_pipeline_ray.functions.hashing import fnv1a64
    from commerce_logs_pipeline_ray.functions.sketch import (
        KLLSketch, KMVSketch, MisraGries)

    s = KLLSketch(8)
    assert np.isnan(s.quantile(0.5))  # empty
    s.update_many(np.array([7.0]))
    assert s.quantile(0.0) == 7.0 and s.quantile(1.0) == 7.0
    eq = KLLSketch(8)
    eq.update_many(np.full(100_000, 3.14))
    assert eq.quantile(0.25) == 3.14 and eq.quantile(0.99) == 3.14
    for order in (1, -1):  # sorted / reverse-sorted adversarial streams
        a = KLLSketch(100)
        a.update_many(np.arange(100_000, dtype=float)[::order])
        for q in (0.1, 0.5, 0.9):
            assert abs(a.quantile(q) / 100_000 - q) < 0.05

    mg = MisraGries(4)
    mg.update_counts([1, 2, 3, 4], [5, 5, 5, 5])
    assert mg.counts == {1: 5, 2: 5, 3: 5, 4: 5}  # at k: no shrink
    mg.update_counts([5], [1])  # (k+1)-th distinct → subtract 1, drop 5
    assert mg.counts == {1: 4, 2: 4, 3: 4, 4: 4} and mg.n == 21

    kv = KMVSketch(16)
    kv.add_hashes(fnv1a64(["a", "b", "a", "b"]))
    assert kv.estimate() == 2.0  # duplicate adds idempotent
    kv2 = KMVSketch(16)
    kv2.add_hashes(fnv1a64(["a", "b"]))
    assert kv.jaccard(kv2) == 1.0
