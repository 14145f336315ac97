"""Blocked record linkage: exact batch-Levenshtein kernel vs scalar DP,
planted-variant recall, and the documented blocking-scope exclusion."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from commerce_logs_pipeline_ray.functions.linkage import levenshtein_batch, link_records


def _lev(a: str, b: str) -> int:
    m = len(a)
    d = list(range(m + 1))
    for j in range(1, len(b) + 1):
        prev, d[0] = d[0], j
        for i in range(1, m + 1):
            cur = min(d[i] + 1, d[i - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, d[i] = d[i], cur
    return d[m]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(max_size=12), st.text(max_size=12)), min_size=1, max_size=20
    )
)
def test_levenshtein_batch_matches_scalar_dp(pairs):
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    want = np.array([_lev(a, b) for a, b in pairs])
    assert (got == want).all()


def test_levenshtein_batch_empty_and_identical():
    assert levenshtein_batch([], []).tolist() == []
    assert levenshtein_batch(["abc", "", "xy"], ["abc", "ab", ""]).tolist() == [0, 2, 2]


def test_link_records_finds_planted_typos(ray_session):
    import ray.data as rd

    recs = pd.DataFrame(
        {
            "rec_id": [1, 2, 3, 4, 5, 6],
            "name": [
                "goldenrod lavender",
                "goldenrXd lavender",   # substitution → dist 1, shares prefix+suffix
                "goldenrod lavendr",    # deletion → dist 1, shares prefix
                "completely different", # unrelated
                "Xoldenrod lavendeX",   # BOTH prefix and suffix changed → out of blocking scope
                "goldenrod lavender",   # exact duplicate of 1 → dist 0
            ],
        }
    )
    out = link_records(rd.from_pandas(recs), max_dist=2).to_pandas()
    pairs = {(r.id_a, r.id_b): r.dist for r in out.itertuples()}
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 1
    assert pairs[(2, 3)] == 2
    assert pairs[(1, 6)] == 0
    # rec 5 is 2 edits from rec 1 but differs in BOTH block keys — the
    # multi-pass blocking scope excludes it by design
    assert (1, 5) not in pairs
    assert not any(4 in p for p in pairs)


def test_link_records_dedups_cross_block_pairs(ray_session):
    import ray.data as rd

    # identical strings match in BOTH the prefix and the suffix block — the
    # pair must still appear exactly once
    recs = pd.DataFrame({"rec_id": [10, 20], "name": ["same name", "same name"]})
    out = link_records(rd.from_pandas(recs)).to_pandas()
    assert len(out) == 1 and out["dist"].iloc[0] == 0


def test_jaro_winkler_batch_bitwise_vs_duckdb():
    """The pair-vectorized JW kernel must agree BITWISE with DuckDB's
    jaro_winkler_similarity — textbook cases (odd transposition counts,
    boost-threshold edge, empty strings) plus 2000 fuzz pairs."""
    import duckdb
    import numpy as np

    from commerce_logs_pipeline_ray.functions.linkage import jaro_winkler_batch

    cases = [("martha", "marhta"), ("dixon", "dicksonx"),
             ("jellyfish", "smellyfish"), ("abc", "abc"), ("abc", "xyz"),
             ("dwayne", "duane"), ("trace", "crate"), ("hello", "hallo"),
             ("abcdxxxxxx", "abcdyyyyyy"), ("abcdef", "bcadef"),
             ("ab", "ba"), ("aabbcc", "ccbbaa"), ("a", ""), ("", "")]
    rng = np.random.default_rng(41)
    alpha = list("abcdef0123")
    for _ in range(2000):
        la, lb = rng.integers(0, 14, 2)
        a = "".join(rng.choice(alpha, la)) if la else ""
        b = "".join(rng.choice(alpha, lb)) if lb else ""
        if rng.random() < 0.5 and la > 2:
            pos = int(rng.integers(0, la))
            b = a[:pos] + str(rng.choice(alpha)) + a[pos + 1:]
        cases.append((a, b))
    con = duckdb.connect()
    got = jaro_winkler_batch([a for a, _ in cases], [b for _, b in cases])
    want = np.array([
        con.execute("SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        for a, b in cases])
    assert (got == want).all()


def test_damerau_levenshtein_batch_bitwise_vs_duckdb():
    """The pair-vectorized TRUE-DL kernel must agree bitwise with DuckDB's
    damerau_levenshtein — textbook cases ('ca'/'abc' = 2 distinguishes true
    DL from OSA's 3) plus 2500 fuzz pairs with planted swaps."""
    import duckdb
    import numpy as np

    from commerce_logs_pipeline_ray.functions.linkage import damerau_levenshtein_batch

    cases = [("ca", "abc"), ("ab", "ba"), ("abcdef", "abdcef"),
             ("spark", "sprak"), ("a", ""), ("", ""), ("abc", "abc"),
             ("aa", "aaa"), ("abcd", "dcba"), ("xaxbx", "bxaxx")]
    rng = np.random.default_rng(43)
    alpha = list("abcd0123")
    for _ in range(2500):
        la, lb = rng.integers(0, 13, 2)
        a = "".join(rng.choice(alpha, la)) if la else ""
        b = "".join(rng.choice(alpha, lb)) if lb else ""
        if rng.random() < 0.5 and la > 2:
            p = int(rng.integers(0, la - 1))
            b = a[:p] + a[p + 1] + a[p] + a[p + 2:]
        cases.append((a, b))
    con = duckdb.connect()
    got = damerau_levenshtein_batch([x for x, _ in cases], [y for _, y in cases])
    want = np.array([
        con.execute("SELECT damerau_levenshtein(?, ?)", [x, y]).fetchone()[0]
        for x, y in cases])
    assert (got == want).all()
