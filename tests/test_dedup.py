"""Dedup operators: planted near-duplicates must be found; unrelated docs
must not pair up.  (MinHash/SimHash are not SQL-expressible → validated
against planted ground truth + exact-Jaccard verification here.)"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from commerce_logs_pipeline_ray.functions.dedup import (
    MinHasher,
    SimHasher,
    embedding_neardup_pairs,
    jaccard,
    minhash_lsh_pairs,
    simhash_neardup_pairs,
    word_shingles,
)


@pytest.fixture(scope="module")
def planted_docs(ray_session):
    """120 base docs + near-dup copies of the first 10 (one word changed)
    + exact dup of doc 0."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    base = [" ".join(rng.choice(vocab, size=40)) for _ in range(120)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    for j in range(10):
        words = base[j].split(" ")
        words[5] = "CHANGED"
        rows.append({"doc_id": 1000 + j, "text": " ".join(words)})
    rows.append({"doc_id": 2000, "text": base[0]})  # exact dup
    return rd.from_pandas(pd.DataFrame(rows)), rows


def test_minhash_lsh_finds_planted_pairs(planted_docs):
    ds, rows = planted_docs
    pairs = minhash_lsh_pairs(ds, threshold=0.5)
    got = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    for j in range(10):
        assert (j, 1000 + j) in got, f"planted near-dup {j} not found"
    assert (0, 2000) in got
    # exact dup has jaccard 1.0
    row = pairs[(pairs["doc_a"] == 0) & (pairs["doc_b"] == 2000)].iloc[0]
    assert row["jaccard"] == 1.0
    # verified jaccard of all reported pairs is genuinely high
    assert (pairs["jaccard"] >= 0.4).all()


def test_minhash_estimate_tracks_true_jaccard(planted_docs):
    _, rows = planted_docs
    h = MinHasher(num_hashes=128, bands=32)
    a, b = rows[0]["text"], rows[-2]["text"]  # doc 0 vs its near-dup... rows[-2] is 1009
    s0 = h.signature(rows[0]["text"])
    s1 = h.signature(rows[120]["text"])  # near-dup of doc 0
    est = float((s0 == s1).mean())
    true = jaccard(word_shingles(rows[0]["text"]), word_shingles(rows[120]["text"]))
    assert abs(est - true) < 0.25


def test_simhash_neardup(planted_docs):
    ds, rows = planted_docs
    # recall guarantee needs bands > max_hamming; 16 bands of 4 bits
    pairs = simhash_neardup_pairs(ds, max_hamming=8, bands=16)
    got = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 2000) in got  # exact dup → hamming 0
    row = pairs[(pairs["doc_a"] == 0) & (pairs["doc_b"] == 2000)].iloc[0]
    assert row["hamming"] == 0
    # most planted single-word-change near-dups survive at hamming<=8
    found = sum((j, 1000 + j) in got for j in range(10))
    assert found >= 7


def test_simhash_deterministic():
    s = SimHasher()
    assert s.simhash("the quick brown fox") == s.simhash("the quick brown fox")
    assert s.simhash("abc") != s.simhash("xyz")


def test_embedding_neardup(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    base = rng.normal(size=(50, 16))
    rows = [{"vec_id": i, "embedding": base[i].astype(np.float32).tolist()} for i in range(50)]
    # plant near-dups: 100+i = tiny perturbation of i for i<5
    for i in range(5):
        v = base[i] + rng.normal(scale=0.01, size=16)
        rows.append({"vec_id": 100 + i, "embedding": v.astype(np.float32).tolist()})
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = embedding_neardup_pairs(ds, threshold=0.98)
    got = {(a, b) for a, b in zip(pairs["vec_a"], pairs["vec_b"])}
    for i in range(5):
        assert (i, 100 + i) in got
    # random 16-dim gaussians essentially never hit cos>=0.98
    assert len(got) <= 10


def test_embedding_lsh_recall_vs_exact(ray_session):
    """Measured recall of the LSH-bucketed path against the exact tiling on
    the sf0.1 corpus (920 true pairs at cos>=0.4, all near the threshold —
    the hardest regime for hyperplane banding)."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.dedup import embedding_neardup_lsh

    ds = rd.read_parquet(
        "/root/testdata/sf0.1/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    exact = embedding_neardup_pairs(ds, threshold=0.4)
    approx = embedding_neardup_lsh(ds, threshold=0.4, bits_per_band=4, n_bands=16, dim=64)
    e = set(zip(exact["vec_a"], exact["vec_b"]))
    a = set(zip(approx["vec_a"], approx["vec_b"]))
    assert len(e) > 500
    assert a <= e            # precision 1.0: every candidate exact-verified
    recall = len(a & e) / len(e)
    assert recall >= 0.85, f"LSH recall {recall:.3f} below floor"


def _brute_jaccard_pairs(rows, threshold, k=3):
    """O(N²) scalar reference: exact word-k-gram Jaccard over gram STRINGS."""
    def grams(t):
        w = t.split(" ")
        if len(w) < k:
            return {" ".join(w)}
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    sets = {r["doc_id"]: grams(r["text"]) for r in rows}
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            j = inter / union if union else 1.0
            if j >= threshold:
                out[(a, b)] = j
    return out


def test_ngram_jaccard_exact_matches_bruteforce(planted_docs):
    """The distributed inverted-index join must equal the O(N²) scalar
    reference bit-for-bit — pair set AND jaccard values."""
    from commerce_logs_pipeline_ray.functions.dedup import ngram_jaccard_pairs

    ds, rows = planted_docs
    got = ngram_jaccard_pairs(ds, threshold=0.5)
    want = _brute_jaccard_pairs(rows, threshold=0.5)
    got_pairs = {(a, b): j for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"])}
    assert set(got_pairs) == set(want)
    for p, j in want.items():
        assert got_pairs[p] == j, f"jaccard mismatch for {p}"
    assert (0, 2000) in got_pairs and got_pairs[(0, 2000)] == 1.0


def test_ngram_jaccard_df_cutoff_drops_hot_shingles(ray_session):
    """df_cutoff=1 leaves no shingle shared by >1 doc → no pairs at all;
    result keeps the output schema."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.dedup import ngram_jaccard_pairs

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b c d e f", "a b c d e g"]}
    )
    full = ngram_jaccard_pairs(rd.from_pandas(df), threshold=0.1)
    assert len(full) == 1
    cut = ngram_jaccard_pairs(rd.from_pandas(df), threshold=0.1, df_cutoff=1)
    assert len(cut) == 0
    assert list(cut.columns) == ["doc_a", "doc_b", "jaccard"]


def test_short_doc_grams_never_collide_with_clamped_long_grams():
    """A doc with fewer than k words emits ONE pad-sentinel gram — it must
    NOT equal the gram a longer doc produces for the clamp-repeated word
    sequence (e.g. "a b" vs the genuine 3-gram "a b b"), and two identical
    short docs must still share their gram."""
    from commerce_logs_pipeline_ray.functions.dedup import gram_hash_stream

    h = MinHasher(num_hashes=16, bands=4, shingle_k=3, seed=7)
    grams, starts = gram_hash_stream(
        ["a b", "x a b b y", "a b"], 3, h.gram_mix
    )
    short = set(grams[starts[0]:starts[1]].tolist())
    long_ = set(grams[starts[1]:starts[2]].tolist())
    short2 = set(grams[starts[2]:starts[3]].tolist())
    assert len(short) == 1 and short == short2
    assert not (short & long_), "pad-sentinel gram collided with a real 3-gram"


def test_minhash_incremental_against_state(ray_session):
    """New batch matched against persisted band state: planted copies of
    prior docs are caught (with the right prior id), fresh docs are not,
    and re-ingesting the state's own docs under new ids matches too."""
    import numpy as np
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.dedup import minhash_dedup_against_state

    rng = np.random.default_rng(13)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu"]

    def mktext(n):
        return " ".join(rng.choice(vocab, size=n))

    prior_docs = pd.DataFrame(
        {"doc_id": [f"p{i}" for i in range(20)],
         "text": [mktext(40) for _ in range(20)]}
    )
    # run 1: build state (no prior)
    m0, state = minhash_dedup_against_state(rd.from_pandas(prior_docs), None)
    assert len(m0) == 0

    new_docs = pd.DataFrame(
        {"doc_id": ["n0", "n1", "n2", "n3"],
         "text": [prior_docs["text"][3],            # exact copy of p3
                  prior_docs["text"][7] + " extra",  # near copy of p7
                  mktext(40),                        # fresh
                  mktext(40)]}                       # fresh
    )
    matches, new_state = minhash_dedup_against_state(
        rd.from_pandas(new_docs), state, threshold=0.6)
    got = dict(zip(matches["doc_id"], matches["matched_prior"]))
    assert got.get("n0") == "p3"
    assert got.get("n1") == "p7"
    assert "n2" not in got and "n3" not in got
    # exact copy estimates 1.0
    assert float(matches.set_index("doc_id").loc["n0", "est_jaccard"]) == 1.0
    # the returned band rows are appendable state (same schema as prior)
    assert set(new_state.schema().names) == set(state.schema().names)


def test_minhash_incremental_hot_bucket_tiled(ray_session, monkeypatch):
    """Degenerate all-identical corpus: every band bucket is hot on BOTH
    sides.  With the tile edge forced tiny the agreement matrix is computed
    in many blocks — results must equal the single-tile path: every new doc
    matches the smallest prior id at est 1.0, with bounded per-tile memory."""
    import ray.data as rd

    import commerce_logs_pipeline_ray.functions.dedup as dd

    text = "the same exact document body repeated everywhere in the corpus"
    prior = pd.DataFrame({"doc_id": [f"p{i:02d}" for i in range(12)],
                          "text": [text] * 12})
    new = pd.DataFrame({"doc_id": [f"n{i:02d}" for i in range(9)],
                        "text": [text] * 9})
    _, state = dd.minhash_dedup_against_state(rd.from_pandas(prior), None)

    monkeypatch.setattr(dd, "_CROSS_TILE", 4)  # 12×9 bucket → 3×3 tile grid
    tiled, _ = dd.minhash_dedup_against_state(rd.from_pandas(new), state, threshold=0.6)
    monkeypatch.setattr(dd, "_CROSS_TILE", 1024)
    whole, _ = dd.minhash_dedup_against_state(rd.from_pandas(new), state, threshold=0.6)

    assert len(tiled) == 9
    assert (tiled["matched_prior"] == "p00").all()  # smallest prior id wins ties
    assert (tiled["est_jaccard"] == 1.0).all()
    pd.testing.assert_frame_equal(
        tiled.sort_values("doc_id", ignore_index=True),
        whole.sort_values("doc_id", ignore_index=True))


def test_neardup_cluster_dedup_transitive_chain(ray_session):
    """A~B and B~C (A and C differ in two words) must land in ONE cluster
    via connected components even if the A-C pair itself never surfaces;
    canonical keep is the min doc_id.  Singletons stay out of the frame."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.graph import connected_components

    rng = np.random.default_rng(23)
    vocab = [f"t{i}" for i in range(300)]
    base = [" ".join(rng.choice(vocab, size=50)) for _ in range(30)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    wa = base[3].split(" ")
    wb = list(wa); wb[7] = "XX"
    wc = list(wb); wc[31] = "YY"
    rows.append({"doc_id": 500, "text": " ".join(wb)})
    rows.append({"doc_id": 501, "text": " ".join(wc)})
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = minhash_lsh_pairs(ds, threshold=0.5, verify=False)
    edges = rd.from_pandas(
        pd.DataFrame({"u": pairs["doc_a"].astype("int64"),
                      "v": pairs["doc_b"].astype("int64")}))
    cc = connected_components(edges)
    comp = dict(zip(cc["node"], cc["component"]))
    assert comp[3] == comp[500] == comp[501] == 3
    kept = {n for n, c in comp.items() if n == c}
    assert 3 in kept and 500 not in kept and 501 not in kept
    # no unrelated doc joined the cluster
    assert sum(1 for c in comp.values() if c == 3) == 3
