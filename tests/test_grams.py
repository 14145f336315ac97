"""Gram-based curation operators vs pure-Python oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa

from commerce_logs_pipeline_ray.functions.grams import (
    benchmark_gram_set,
    contamination_counts,
    repetition_stats,
)


def _grams(text: str, k: int = 3) -> list[str]:
    w = text.split(" ")
    return [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]


def _corpus() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    rows = []
    vocab = [f"w{i}" for i in range(40)]
    for i in range(120):
        words = list(rng.choice(vocab, size=12))
        rows.append({"doc_id": i, "source": f"s{i % 3}", "text": " ".join(words)})
    # doc 29 and 58 are "benchmark" (29 % 29 == 0 is False for 29... use 0, 29k)
    # benchmark membership is doc_id % 29 == 0: docs 0, 29, 58, 87, 116
    # plant contamination: doc 5 copies a 3-gram from benchmark doc 0
    bench_gram = " ".join(rows[0]["text"].split(" ")[:3])
    rows[5]["text"] = bench_gram + " " + rows[5]["text"]
    # plant repetition: doc 7 repeats one gram twice
    rows[7]["text"] = "a b c a b c x"
    return pd.DataFrame(rows)


def _ds(df, blocks=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


def test_benchmark_gram_set_matches_python(ray_session):
    df = _corpus()
    got = benchmark_gram_set(_ds(df), bench_mod=29, k=3)
    bench_docs = df[df["doc_id"] % 29 == 0]
    n_expected = len({g for t in bench_docs["text"] for g in _grams(t)})
    assert len(got) == n_expected  # distinct hash count == distinct gram count


def test_contamination_counts_vs_python_oracle(ray_session):
    df = _corpus()
    out = contamination_counts(_ds(df), bench_mod=29, k=3).set_index("source")

    bench = {g for t in df[df["doc_id"] % 29 == 0]["text"] for g in _grams(t)}
    rest = df[df["doc_id"] % 29 != 0]
    ref = {}
    for _, r in rest.iterrows():
        hits = sum(g in bench for g in _grams(r["text"]))
        a = ref.setdefault(r["source"], [0, 0, 0])
        a[0] += 1
        a[1] += int(hits > 0)
        a[2] += hits
    for s, (nd, nc, th) in ref.items():
        assert out.loc[s, "n_docs"] == nd
        assert out.loc[s, "n_contaminated"] == nc
        assert out.loc[s, "total_hits"] == th
    # the planted copy must register
    assert out["n_contaminated"].sum() >= 1


def test_contamination_partition_invariant(ray_session):
    df = _corpus()
    a = contamination_counts(_ds(df, 2), bench_mod=29)
    b = contamination_counts(_ds(df, 9), bench_mod=29)
    pd.testing.assert_frame_equal(a, b)


def test_repetition_stats_vs_python_oracle(ray_session):
    df = _corpus()
    out = repetition_stats(_ds(df), k=3).set_index("source")
    ref = {}
    for _, r in df.iterrows():
        gs = _grams(r["text"])
        a = ref.setdefault(r["source"], [0, 0, 0, 0])
        a[0] += 1
        a[1] += int(len(gs) > len(set(gs)))
        a[2] += len(gs)
        a[3] += len(set(gs))
    for s, (nd, nr, tot, dst) in ref.items():
        assert tuple(out.loc[s, ["n_docs", "n_repetitive", "total_grams", "distinct_grams"]]) == (
            nd, nr, tot, dst
        ), s
    # the planted "a b c a b c x" doc repeats gram "a b c"
    assert out.loc["s1", "n_repetitive"] >= 1


def test_cross_doc_dup_windows_planted(ray_session):
    """Planted shared spans: doc pairs sharing an exact 6-word sentence must
    report exactly the k-gram windows inside it; unique docs absent."""
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.grams import cross_doc_dup_windows

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words → 2 5-gram windows
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"one two three four five six seven {shared} tail1 tail2",
                f"{shared} other words here entirely different ending now",
                "completely unique text with no overlap at all whatsoever friend",
                "another unique document body nothing shared with any other doc",
            ],
        }
    )
    out = cross_doc_dup_windows(rd.from_pandas(docs).repartition(3), k=5)
    got = dict(zip(out["doc_id"], out["n_dup_windows"]))
    # the shared 6-word run yields exactly 2 duplicated 5-gram windows each
    assert got == {1: 2, 2: 2}


def test_cross_doc_dup_windows_within_doc_repeat_not_counted(ray_session):
    """A gram repeated only WITHIN one doc is not cross-doc duplication."""
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.grams import cross_doc_dup_windows

    rep = "red blue green yellow pink"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [f"{rep} junk filler words {rep} closing words here",
                     "nothing in common with the first document at all"],
        }
    )
    out = cross_doc_dup_windows(rd.from_pandas(docs), k=5)
    assert len(out) == 0


def test_substring_dedup_cuts_semantics(ray_session):
    """Owner (global first occurrence by (doc,pos)) keeps its span; later
    occurrences cut, INCLUDING within-doc repeats; overlap counted once."""
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.grams import substring_dedup_cuts

    shared = "alpha beta gamma delta epsilon"  # exactly one 5-gram window
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"{shared} unique tail words going here now",  # owner (doc 1, pos 1)
                f"lead-in words {shared} and {shared} again",  # two cut copies
                "nothing shared here with anyone else at all",
            ],
        }
    )
    out = substring_dedup_cuts(rd.from_pandas(docs).repartition(2), k=5)
    got = dict(zip(out["doc_id"], out["n_removed_words"]))
    # doc2: both its copies cut; they don't overlap → 10 words removed
    assert got == {2: 10}


def test_substring_dedup_cuts_overlap_union(ray_session):
    """Overlapping cut windows count covered words once (interval union)."""
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.grams import substring_dedup_cuts

    run = "one two three four five six"  # 6 words → windows at pos 1 and 2
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [f"{run} owner tail words here padding out",
                     f"prefix words {run} suffix words to pad"],
        }
    )
    out = substring_dedup_cuts(rd.from_pandas(docs), k=5)
    got = dict(zip(out["doc_id"], out["n_removed_words"]))
    # doc2's two overlapping 5-windows cover the 6-word run → 6, not 10
    assert got == {2: 6}


def test_substring_dedup_rewrite_text(ray_session):
    """Owner text unchanged; later copies lose exactly the covered words;
    docs without cuts pass through byte-identical."""
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.grams import substring_dedup_rewrite

    shared = "alpha beta gamma delta epsilon"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"{shared} unique tail words going here now",
                f"lead-in words {shared} trailing suffix words here",
                "nothing shared here with anyone else at all",
            ],
        }
    )
    out = (
        substring_dedup_rewrite(rd.from_pandas(docs).repartition(2), k=5)
        .to_pandas().set_index("doc_id")["text_dedup"]
    )
    assert out[1] == docs["text"][0]          # owner untouched
    assert out[2] == "lead-in words trailing suffix words here"
    assert out[3] == docs["text"][2]          # unaffected doc byte-identical


def test_substring_dedup_rewrite_fully_cut_doc(ray_session):
    """A doc that is one big later-occurrence window becomes ''."""
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.grams import substring_dedup_rewrite

    run = "one two three four five"
    docs = pd.DataFrame(
        {"doc_id": [1, 2],
         "text": [f"{run} plus several other owner words here", run]}
    )
    out = (
        substring_dedup_rewrite(rd.from_pandas(docs), k=5)
        .to_pandas().set_index("doc_id")["text_dedup"]
    )
    assert out[1] == docs["text"][0]
    assert out[2] == ""


def test_rewrite_removed_counts_match_stats(ray_session):
    """The rewrite's n_removed_words column equals substring_dedup_cuts'
    interval-union coverage, doc for doc (two independent computations of
    the same cut decision)."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.grams import (
        substring_dedup_cuts, substring_dedup_rewrite)

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    stats = substring_dedup_cuts(ds, k=5).set_index("doc_id")["n_removed_words"]
    got = substring_dedup_rewrite(ds, k=5).to_pandas()
    nz = got[got["n_removed_words"] > 0].set_index("doc_id")["n_removed_words"]
    assert stats.sort_index().equals(nz.sort_index().astype("int64"))
    assert int(got["n_removed_words"].sum()) == int(stats.sum())


def test_substring_dedup_incremental_prior_grams(ray_session):
    """Cross-run state: spans present in prior gram state lose EVERY in-run
    occurrence (their survivor was written earlier); new spans keep their
    in-run first occurrence as usual."""
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.grams import (
        gram_counts_ds, substring_dedup_rewrite)

    shared = "alpha beta gamma delta epsilon zeta"
    batch1 = pd.DataFrame({"doc_id": [1], "text": [f"{shared} owner tail words here now"]})
    batch2 = pd.DataFrame(
        {"doc_id": [10, 11, 12],
         "text": [f"new doc containing {shared} embedded inside it",
                  "fresh unrelated words that match nothing prior ever",
                  f"second new doc with {shared} also present here"]}
    )
    prior = (
        gram_counts_ds(rd.from_pandas(batch1), 5, 42).to_pandas()["g"].to_numpy()
    )
    out = (
        substring_dedup_rewrite(rd.from_pandas(batch2), k=5, prior_grams=prior)
        .to_pandas().set_index("doc_id")
    )
    # BOTH in-run occurrences of the prior span are cut — no in-run owner
    assert out.loc[10, "text_dedup"] == "new doc containing embedded inside it"
    assert out.loc[12, "text_dedup"] == "second new doc with also present here"
    assert out.loc[11, "n_removed_words"] == 0
    # without prior state, the first in-run occurrence would survive
    fresh = (
        substring_dedup_rewrite(rd.from_pandas(batch2), k=5)
        .to_pandas().set_index("doc_id")
    )
    assert fresh.loc[10, "n_removed_words"] == 0
    assert fresh.loc[12, "n_removed_words"] == 6


def test_incremental_prior_dataset_path_equals_array_path(ray_session):
    """Large-state path (prior grams as a Dataset riding the exchange)
    produces the exact same rewrite as the broadcast-array path."""
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.grams import (
        gram_counts_ds, substring_dedup_rewrite)

    shared = "alpha beta gamma delta epsilon zeta"
    batch1 = pd.DataFrame(
        {"doc_id": [1, 2],
         "text": [f"{shared} owner tail words here now",
                  "some other earlier document with plain words inside"]}
    )
    batch2 = pd.DataFrame(
        {"doc_id": [10, 11],
         "text": [f"new doc containing {shared} embedded inside it",
                  "fresh unrelated words that match nothing prior ever"]}
    )
    counts = gram_counts_ds(rd.from_pandas(batch1), 5, 42).materialize()
    arr = counts.to_pandas()["g"].to_numpy()
    via_array = (
        substring_dedup_rewrite(rd.from_pandas(batch2), k=5, prior_grams=arr)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    via_ds = (
        substring_dedup_rewrite(
            rd.from_pandas(batch2), k=5, prior_grams=counts.select_columns(["g"]))
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(via_array, via_ds)
    assert via_ds.set_index("doc_id").loc[10, "n_removed_words"] == 6


def test_substring_family_short_docs_emit_zero_grams(ray_session):
    """ADVICE regression: two identical <k-word docs must NOT count as
    duplicated windows on the Ray side — the SQL oracle's
    generate_series(1, len(w)-k+1) emits zero k-grams for them.  The padded
    single-gram convention remains for the MinHash/contamination family."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.dedup import gram_hash_stream
    from commerce_logs_pipeline_ray.functions.grams import (
        _gram_mix, cross_doc_dup_windows, substring_dedup_cuts)

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["tiny dup doc", "tiny dup doc",                  # 3 words each
                 "one two three four five six seven",             # unique long
                 "one two three four five six seven"],            # dup long
    })
    ds = rd.from_pandas(docs)
    win = cross_doc_dup_windows(ds, k=5)
    assert set(win["doc_id"]) == {3, 4}  # short dups invisible at k=5
    cuts = substring_dedup_cuts(ds, k=5)
    assert set(cuts["doc_id"]) == {4}    # only the later long dup is cut

    # kernel level: pad_short=False emits zero grams for the short docs
    mix = _gram_mix(5, 42)
    g, off = gram_hash_stream(list(docs["text"]), 5, mix, pad_short=False)
    assert np.diff(off).tolist() == [0, 0, 3, 3]
    g2, off2 = gram_hash_stream(list(docs["text"]), 5, mix)  # padded default
    assert np.diff(off2).tolist() == [1, 1, 3, 3]
