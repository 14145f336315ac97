"""Token-payload operators vs pure-Python oracles (bit-exactness focus)."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from commerce_logs_pipeline_ray.functions.tokens import (
    bigram_topk,
    length_histogram,
    pack_batch,
    pack_sequences,
    token_frequency,
)


@pytest.fixture(scope="module")
def seq_ds(small_sequences, ray_session):
    import ray.data as rd

    paths, table = small_sequences
    return rd.read_parquet(paths), table


def test_token_frequency_matches_counter(seq_ds):
    ds, table = seq_ds
    got = token_frequency(ds)
    want = Counter()
    for toks in table.column("tokens").to_pylist():
        want.update(toks)
    got_map = dict(zip(got["token"], got["count"]))
    assert got_map == dict(want)


def test_bigram_topk_matches_counter(seq_ds):
    ds, table = seq_ds
    got = bigram_topk(ds, k=15)
    want = Counter()
    for toks in table.column("tokens").to_pylist():
        for a, b in zip(toks, toks[1:]):
            want[(a, b)] += 1
    # compare the top-15 with deterministic tie order (count desc, key asc)
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], (kv[0][0] << 32) | kv[0][1]))[:15]
    got_pairs = list(zip(got["token_a"], got["token_b"], got["count"]))
    assert got_pairs == [(a, b, c) for (a, b), c in ranked]


def test_length_histogram_sums(seq_ds):
    ds, table = seq_ds
    h = length_histogram(ds, bucket_width=128)
    assert h["n_sequences"].sum() == table.num_rows
    assert h["n_tokens"].sum() == sum(table.column("n_tok").to_pylist())


def test_pack_batch_invariants(seq_ds):
    _, table = seq_ds
    packed = pack_batch(table, max_len=2048)
    n_tok = packed["n_tok"].to_pylist()
    toks = packed["tokens"].to_pylist()
    lens_in = table.column("n_tok").to_pylist()
    # token conservation, bit-exact
    assert sum(n_tok) == sum(lens_in)
    assert all(len(t) == n for t, n in zip(toks, n_tok))
    # every bin within max_len unless a single oversized doc
    docs = packed["doc_ids"].to_pylist()
    for n, d in zip(n_tok, docs):
        assert n <= 2048 or len(d) == 1
    # concatenation preserves exact token values per doc (empty doc_id is
    # shared by malformed rows → not unique; skip those in the value check)
    all_ids = table.column("doc_id").to_pylist()
    dup_free = {d for d, c in __import__("collections").Counter(all_ids).items() if c == 1}
    want = {
        d: t
        for d, t in zip(all_ids, table.column("tokens").to_pylist())
        if d in dup_free
    }
    for d_list, t_all in zip(docs, toks):
        pos = 0
        for d in d_list:
            n_d = len(want[d]) if d in want else None
            if n_d is None:
                break  # duplicate id — positions beyond it unverifiable
            assert t_all[pos : pos + n_d] == want[d]
            pos += n_d
    # packing efficiency: average fill of multi-doc bins is decent
    fills = [n / 2048 for n, d in zip(n_tok, docs) if len(d) > 1]
    if fills:
        assert np.mean(fills) > 0.5


def test_pack_sequences_distributed(seq_ds):
    ds, table = seq_ds
    packed = pack_sequences(ds, max_len=2048).to_pandas()
    assert packed["n_tok"].sum() == sum(table.column("n_tok").to_pylist())
    assert packed["n_docs"].sum() == table.num_rows


def test_pack_padding():
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "tokens": pa.array([[1, 2, 3], [4, 5]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([3, 2], type=pa.int32()),
            "source": pa.array(["s", "s"]),
        }
    )
    packed = pack_batch(t, max_len=8, pad=True, pad_id=0)
    assert all(len(x) == 8 for x in packed["tokens"].to_pylist())


def test_packing_stats_partition_independent(ray_session):
    """Per-source FFD packing yields identical stats at different block
    layouts (the determinism contract the packing oracle relies on)."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.pipelines.queries import (
        _pack_source_stats,
        ensure_derived_parquet,
    )
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    path = ensure_derived_parquet("/root/testdata/sf0.001")
    seq = pq.read_table(path)
    srcs = sorted(pc.unique(seq["source"].combine_chunks()).to_pylist())
    ref = {s: _pack_source_stats(seq.filter(pc.equal(seq["source"], s))) for s in srcs}

    def pack_group(t: pa.Table) -> pa.Table:
        rows = []
        for s in pc.unique(t["source"].combine_chunks() if isinstance(t["source"], pa.ChunkedArray) else t["source"]).to_pylist():
            n_packs, tt, td = _pack_source_stats(t.filter(pc.equal(t["source"], s)))
            rows.append({"source": s, "n_packs": n_packs, "total_tokens": tt, "total_docs": td})
        return pa.Table.from_pylist(rows)

    for blocks in (2, 7):
        ds = rd.read_parquet(path, override_num_blocks=blocks)
        got = (
            ds.groupby("source").map_groups(pack_group, batch_format="pyarrow").to_pandas()
            .set_index("source").sort_index()
        )
        for s in srcs:
            assert tuple(got.loc[s]) == ref[s], (blocks, s)


def test_sequence_fingerprints_properties():
    """Equal token arrays → equal fps; order/length/value changes → different
    fps; block-layout invariant (chunked vs contiguous)."""
    from commerce_logs_pipeline_ray.functions.tokens import sequence_fingerprints

    rows = [[1, 2, 3], [1, 2, 3], [3, 2, 1], [1, 2], [], [1, 2, 3, 0], [0, 1, 2, 3]]
    t = pa.table({"tokens": pa.array(rows, type=pa.list_(pa.int32()))})
    f1, f2 = sequence_fingerprints(t)
    fp = list(zip(f1.tolist(), f2.tolist()))
    assert fp[0] == fp[1]
    distinct = {fp[0], fp[2], fp[3], fp[4], fp[5], fp[6]}
    assert len(distinct) == 6  # all structurally different arrays differ
    chunked = pa.concat_tables([t.slice(0, 3), t.slice(3)])
    g1, g2 = sequence_fingerprints(chunked)
    assert (g1 == f1).all() and (g2 == f2).all()


def test_sequence_dedup_stats_counts_planted_duplicates(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    rows = []
    for i in range(60):
        rows.append({"source": f"s{i % 3}", "tokens": rng.integers(0, 50, size=10).tolist()})
    # plant exact dupes: 5 copies of row 0's tokens in s0, 2 in s1
    for _ in range(5):
        rows.append({"source": "s0", "tokens": rows[0]["tokens"]})
    for _ in range(2):
        rows.append({"source": "s1", "tokens": rows[0]["tokens"]})
    df = pd.DataFrame(rows)
    from commerce_logs_pipeline_ray.functions.tokens import sequence_dedup_stats

    ds = rd.from_arrow(pa.table({
        "source": pa.array(df["source"]),
        "tokens": pa.array(df["tokens"].tolist(), type=pa.list_(pa.int32())),
    })).repartition(5)
    out = sequence_dedup_stats(ds)
    got = out.set_index("source")
    # exact ground truth via python sets
    ref = df.groupby("source")["tokens"].agg(
        n_seqs="count", n_unique=lambda s: len({tuple(x) for x in s})
    )
    for s in ref.index:
        assert got.loc[s, "n_seqs"] == ref.loc[s, "n_seqs"]
        assert got.loc[s, "n_unique"] == ref.loc[s, "n_unique"]


def test_chunk_sequences_bit_exact_conservation(ray_session):
    """Concatenating each doc's chunks in chunk_id order reproduces the
    original token array bit-exactly, at any partitioning."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.tokens import chunk_sequences

    rng = np.random.default_rng(11)
    rows = [rng.integers(0, 1000, size=int(n)).tolist() for n in rng.integers(1, 300, size=80)]
    rows.append([])  # empty sequence → one empty chunk
    ids = [f"d{i}" for i in range(len(rows))]
    t = pa.table({
        "doc_id": pa.array(ids),
        "tokens": pa.array(rows, type=pa.list_(pa.int32())),
        "source": pa.array(["s"] * len(rows)),
    })
    ds = rd.from_arrow(t).repartition(7)
    out = chunk_sequences(ds, max_len=64).to_pandas()
    assert (out["n_tok"] <= 64).all()
    out = out.sort_values(["doc_id", "chunk_id"])
    rebuilt = out.groupby("doc_id")["tokens"].agg(lambda s: [x for c in s for x in c])
    for i, d in enumerate(ids):
        assert list(rebuilt[d]) == rows[i], d
    # chunk counts: ceil(n/64), min 1
    n_chunks = out.groupby("doc_id").size()
    for i, d in enumerate(ids):
        assert n_chunks[d] == max((len(rows[i]) + 63) // 64, 1), d


def test_surprisal_stats_vs_python_oracle(ray_session):
    import math

    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.tokens import surprisal_stats

    rng = np.random.default_rng(5)
    V = 50
    rows = [rng.integers(0, V, size=int(n)).tolist() for n in rng.integers(3, 40, size=60)]
    src = [f"s{i % 4}" for i in range(len(rows))]
    t = pa.table({
        "tokens": pa.array(rows, type=pa.list_(pa.int32())),
        "source": pa.array(src),
    })
    out = surprisal_stats(rd.from_arrow(t).repartition(5), V).set_index("source")

    cnt = Counter(x for r in rows for x in r)
    total = sum(cnt.values())
    per_seq = [sum(-math.log(cnt[x] / total) for x in r) / len(r) for r in rows]
    ref = pd.DataFrame({"source": src, "surp": per_seq}).groupby("source")["surp"].agg(
        ["count", "mean"]
    )
    for s in ref.index:
        assert out.loc[s, "n_seqs"] == ref.loc[s, "count"]
        assert abs(out.loc[s, "avg_surprisal"] - round(ref.loc[s, "mean"], 6)) <= 1e-6


def test_heavy_hitters_matches_exact_topk(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.tokens import heavy_hitters_topk

    rng = np.random.default_rng(9)
    # Zipf-ish: heavy head + uniform tail over a large domain
    head = rng.integers(0, 30, size=8000)
    tail = rng.integers(30, 100000, size=4000)
    toks = np.concatenate([head, tail])
    rng.shuffle(toks)
    rows = np.array_split(toks, 300)
    t = pa.table({"tokens": pa.array([r.tolist() for r in rows], type=pa.list_(pa.int32()))})
    want = Counter(int(x) for x in toks)
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    for blocks in (3, 11):
        got = heavy_hitters_topk(rd.from_arrow(t).repartition(blocks), k=15, capacity=256)
        assert list(zip(got["token"], got["count"])) == ranked, blocks


def test_heavy_hitters_capacity_guard(ray_session):
    """A flat distribution whose k-th count can't clear n/capacity must fail
    loudly, not return an unsound top-k."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.tokens import heavy_hitters_topk

    rng = np.random.default_rng(2)
    toks = rng.permutation(np.repeat(np.arange(5000, dtype=np.int32), 2))
    rows = np.array_split(toks, 50)
    t = pa.table({"tokens": pa.array([r.tolist() for r in rows], type=pa.list_(pa.int32()))})
    with pytest.raises(AssertionError, match="raise capacity"):
        heavy_hitters_topk(rd.from_arrow(t).repartition(4), k=10, capacity=8)


def test_cms_never_underestimates_and_merges():
    from commerce_logs_pipeline_ray.functions.sketch import CountMinSketch

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1 << 40, size=3000).astype(np.uint64)
    counts = rng.integers(1, 50, size=3000).astype(np.int64)
    s = CountMinSketch(width=2048, depth=4)
    s.add_hashes(keys, counts)
    # exact truth per distinct key
    import pandas as pd

    truth = pd.DataFrame({"k": keys, "n": counts}).groupby("k")["n"].sum()
    uk = truth.index.to_numpy(dtype=np.uint64)
    est = s.estimate_hashes(uk)
    assert (est >= truth.to_numpy()).all()  # CMS NEVER underestimates
    # average overestimate stays within the εn bound
    eps_n = np.e / 2048 * counts.sum()
    assert (est - truth.to_numpy()).mean() <= eps_n
    # merge == single-pass build, any split
    a, b = CountMinSketch(2048, 4), CountMinSketch(2048, 4)
    a.add_hashes(keys[:1000], counts[:1000])
    b.add_hashes(keys[1000:], counts[1000:])
    assert (a.merge(b).counts == s.counts).all()
    # serialization round-trip
    r = CountMinSketch.deserialize(s.serialize(), 2048, 4)
    assert (r.counts == s.counts).all()


def test_cms_heavy_hitters_matches_exact(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.tokens import (
        cms_heavy_hitters,
        heavy_hitters_topk,
    )

    rng = np.random.default_rng(9)
    head = rng.integers(0, 30, size=8000)
    tail = rng.integers(30, 100000, size=4000)
    toks = np.concatenate([head, tail])
    rng.shuffle(toks)
    rows = np.array_split(toks, 300)
    t = pa.table({"tokens": pa.array([r.tolist() for r in rows], type=pa.list_(pa.int32()))})
    want = Counter(int(x) for x in toks)
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    for blocks in (3, 11):
        got = cms_heavy_hitters(rd.from_arrow(t).repartition(blocks), k=15, capacity=256)
        assert list(zip(got["token"], got["count"])) == ranked, blocks
        exact = heavy_hitters_topk(rd.from_arrow(t).repartition(blocks), k=15, capacity=256)
        assert got.equals(exact)


def test_cms_heavy_hitters_capacity_guard(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.tokens import cms_heavy_hitters

    rng = np.random.default_rng(2)
    toks = rng.permutation(np.repeat(np.arange(5000, dtype=np.int32), 2))
    rows = np.array_split(toks, 50)
    t = pa.table({"tokens": pa.array([r.tolist() for r in rows], type=pa.list_(pa.int32()))})
    with pytest.raises(AssertionError, match="raise capacity"):
        cms_heavy_hitters(rd.from_arrow(t).repartition(4), k=10, capacity=8)
