"""BPE merge training: vectorized kernel vs sequential greedy reference,
planted merges, decode roundtrip, and the distributed trainer vs a
pure-Python reference BPE on the real derived corpus."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from commerce_logs_pipeline_ray.functions.bpe import (
    bpe_decode,
    bpe_train,
    merge_pair_np,
    top_pair,
)


def _ref_merge(seq: list[int], a: int, b: int, nid: int) -> list[int]:
    out, j = [], 0
    while j < len(seq):
        if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
            out.append(nid)
            j += 2
        else:
            out.append(seq[j])
            j += 1
    return out


def _ref_bpe(seqs: list[list[int]], k: int, base: int):
    seqs = [list(s) for s in seqs]
    merges = []
    for i in range(k):
        c: Counter = Counter()
        for s in seqs:
            for x, y in zip(s, s[1:]):
                c[(x, y)] += 1
        if not c:
            break
        (a, b), n = min(c.items(), key=lambda kv: (-kv[1], (kv[0][0] << 32) | kv[0][1]))
        nid = base + i
        merges.append((i, a, b, n, nid))
        seqs = [_ref_merge(s, a, b, nid) for s in seqs]
    return merges, seqs


def _flat(seqs):
    values = np.concatenate([np.asarray(s, dtype=np.int32) for s in seqs]) if seqs else np.array([], np.int32)
    offsets = np.cumsum([0] + [len(s) for s in seqs]).astype(np.int64)
    return values, offsets


def _unflat(values, offsets):
    return [values[offsets[i] : offsets[i + 1]].tolist() for i in range(len(offsets) - 1)]


@pytest.mark.parametrize(
    "seqs,a,b",
    [
        ([[1, 2, 1, 2, 3], [1, 2, 1]], 1, 2),
        ([[7, 7, 7, 7], [7, 7, 7]], 7, 7),  # overlapping runs → greedy parity
        ([[1, 2], [2, 1]], 2, 1),  # cross-boundary pair (2@end,1@start) must NOT merge
        ([[5], [], [5, 5]], 5, 5),
        ([[9, 9, 9, 9, 9]], 9, 9),
    ],
)
def test_merge_pair_matches_sequential_greedy(seqs, a, b):
    values, offsets = _flat(seqs)
    got_v, got_o = merge_pair_np(values, offsets, a, b, 999)
    want = [_ref_merge(s, a, b, 999) for s in seqs]
    assert _unflat(got_v, got_o) == want


def test_merge_pair_randomized_vs_reference():
    rng = np.random.default_rng(11)
    for _ in range(25):
        seqs = [rng.integers(0, 4, size=rng.integers(0, 12)).tolist() for _ in range(8)]
        a, b = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        values, offsets = _flat(seqs)
        got_v, got_o = merge_pair_np(values, offsets, a, b, 99)
        assert _unflat(got_v, got_o) == [_ref_merge(s, a, b, 99) for s in seqs]


def test_top_pair_tiebreak_smallest_packed(ray_session):
    # (3,1) and (1,3) both appear twice → tie broken to smaller packed key (1,3)
    ds = rd.from_arrow(
        pa.table({"tokens": pa.array([[3, 1, 3], [1, 3, 1]], type=pa.list_(pa.int32()))})
    )
    a, b, n = top_pair(ds)
    assert (a, b, n) == (1, 3, 2)


def test_bpe_train_planted(ray_session):
    seqs = [[1, 2, 1, 2, 3], [1, 2, 1]]
    ds = rd.from_arrow(pa.table({"tokens": pa.array(seqs, type=pa.list_(pa.int32()))}))
    got = bpe_train(ds, num_merges=2, vocab_base=100)
    want, _ = _ref_bpe(seqs, 2, 100)
    assert [tuple(r) for r in got.to_numpy()] == want
    # merge 1 is (1,2)×3 → id 100; merge 2 is (100,1)×1 (smallest packed among ties)
    assert tuple(got.iloc[0]) == (0, 1, 2, 3, 100)
    assert tuple(got.iloc[1]) == (1, 100, 1, 1, 101)


def test_bpe_train_matches_reference_on_corpus(ray_session):
    from commerce_logs_pipeline_ray.pipelines.queries import ensure_derived_parquet
    from commerce_logs_pipeline_ray.schema import VOCAB_SIZE

    path = ensure_derived_parquet("/root/testdata/sf0.001")
    tbl = pa.parquet.read_table(path, columns=["tokens"])
    seqs = tbl["tokens"].to_pylist()
    want, _ = _ref_bpe(seqs, 4, VOCAB_SIZE)
    ds = rd.read_parquet(path, columns=["tokens"], override_num_blocks=4)
    got = bpe_train(ds, num_merges=4, vocab_base=VOCAB_SIZE)
    assert [tuple(r) for r in got.to_numpy()] == want


def test_bpe_decode_roundtrip():
    seqs = [[1, 2, 1, 2, 3, 1, 2], [2, 1, 2, 2]]
    merges, rewritten = _ref_bpe(seqs, 3, 50)
    mdf = pd.DataFrame(merges, columns=["merge_idx", "left", "right", "count", "new_id"])
    for orig, enc in zip(seqs, rewritten):
        assert bpe_decode(enc, mdf) == orig


def test_bpe_encode_equals_training_rewrite_and_roundtrips(ray_session):
    """encode(original) reproduces the exact corpus state training left
    behind (same kernel, priority order), and decode(encode(x)) == x."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.bpe import (
        _apply_merge_batch, bpe_decode, bpe_encode, bpe_train)

    rng = np.random.default_rng(8)
    seqs = [rng.integers(0, 6, size=rng.integers(4, 30)).astype(np.int32).tolist()
            for _ in range(200)]
    t = pa.table({"sid": pa.array(range(200), pa.int64()),
                  "tokens": pa.array(seqs, pa.list_(pa.int32()))})
    ds = rd.from_arrow(t).repartition(4)
    merges = bpe_train(ds, num_merges=4, vocab_base=100)
    assert len(merges) == 4

    enc = bpe_encode(ds, merges).to_pandas().sort_values("sid")
    # reference: apply merges sequentially to the single-table corpus
    ref = t
    for r in merges.itertuples():
        ref = _apply_merge_batch(ref, int(r.left), int(r.right), int(r.new_id))
    ref = ref.to_pandas().sort_values("sid")
    for a, b in zip(enc["tokens"], ref["tokens"]):
        assert list(a) == list(b)
    # roundtrip: decoding every encoded sequence recovers the original
    orig = {i: s for i, s in enumerate(seqs)}
    for sid, toks in zip(enc["sid"], enc["tokens"]):
        assert bpe_decode(list(toks), merges) == orig[sid]
    # compression actually happened somewhere
    assert sum(len(x) for x in enc["tokens"]) < sum(len(s) for s in seqs)


def test_bpe_train_flat_matches_distributed_reference():
    """The driver-side incremental trainer (lazy heap + linked list) is
    bit-identical to the per-round-recount reference on random corpora —
    counts, tie-breaks and greedy rewrites all agree."""
    from commerce_logs_pipeline_ray.functions.bpe import bpe_train_flat

    rng = np.random.default_rng(21)
    for _ in range(20):
        seqs = [rng.integers(0, 5, size=rng.integers(0, 25)).tolist() for _ in range(12)]
        k = int(rng.integers(1, 12))
        want, _ = _ref_bpe(seqs, k, 500)
        values, offsets = _flat(seqs)
        got = bpe_train_flat(values, offsets, k, 500)
        assert [tuple(r) for r in got.to_numpy()] == want


def test_encode_flat_512_merges_matches_pass_per_rule_kernel():
    """The linked-list priority encoder == the reference pass-per-rule
    kernel at a REALISTIC vocab size (512 merges), bit-exact, and decode
    roundtrips through the deep merge hierarchy."""
    from commerce_logs_pipeline_ray.functions.bpe import (
        _rule_index, bpe_train_flat, encode_flat, merge_pair_np)

    rng = np.random.default_rng(33)
    seqs = [rng.integers(0, 40, size=rng.integers(1, 200)).tolist() for _ in range(400)]
    values, offsets = _flat(seqs)
    merges = bpe_train_flat(values, offsets, 512, 10_000)
    assert len(merges) >= 400  # the vocab really is deep on this corpus

    class _FakeRef:  # _rule_index keys its per-process cache by ObjectRef hex
        def __init__(self, payload):
            self._p = payload
        def hex(self):
            return "test-512"

    import ray as _ray
    payload = (merges["left"].to_numpy(np.int64), merges["right"].to_numpy(np.int64),
               merges["new_id"].to_numpy(np.int64))
    orig_get = _ray.get
    _ray.get = lambda ref, *a, **k: ref._p if isinstance(ref, _FakeRef) else orig_get(ref, *a, **k)
    try:
        idx = _rule_index(_FakeRef(payload))
    finally:
        _ray.get = orig_get
    got_v, got_o = encode_flat(values, offsets, idx)
    ref_v, ref_o = values.copy(), offsets.copy()
    for r in merges.itertuples():
        ref_v, ref_o = merge_pair_np(ref_v, ref_o, int(r.left), int(r.right), int(r.new_id))
    assert np.array_equal(got_v, ref_v) and np.array_equal(got_o, ref_o)
    for i in (0, 57, 399):
        assert bpe_decode(got_v[got_o[i]:got_o[i + 1]].tolist(), merges) == seqs[i]


def test_bpe_encode_distributed_512_merges(ray_session):
    """Distributed fast encode over a 512-merge sampled-train vocab equals
    the reference kernel on the real derived corpus."""
    from commerce_logs_pipeline_ray.functions.bpe import (
        bpe_encode, bpe_train_sampled, merge_pair_np)
    from commerce_logs_pipeline_ray.functions.tokens import _flat_tokens
    from commerce_logs_pipeline_ray.pipelines.queries import ensure_derived_parquet
    from commerce_logs_pipeline_ray.schema import VOCAB_SIZE

    path = ensure_derived_parquet("/root/testdata/sf0.001")
    merges = bpe_train_sampled(path, num_merges=512, vocab_base=VOCAB_SIZE)
    assert len(merges) == 512
    ds = rd.read_parquet(path, columns=["doc_id", "tokens"], override_num_blocks=4)
    enc = bpe_encode(ds, merges).to_pandas().sort_values("doc_id").reset_index(drop=True)

    t = pa.parquet.read_table(path, columns=["doc_id", "tokens"])
    v, o = _flat_tokens(t)
    v, o = v[o[0]:o[-1]].copy(), (o - o[0]).copy()
    for r in merges.itertuples():
        v, o = merge_pair_np(v, o, int(r.left), int(r.right), int(r.new_id))
    ref = pd.DataFrame({"doc_id": t["doc_id"].to_pylist(),
                        "tokens": [v[o[i]:o[i + 1]].tolist() for i in range(len(o) - 1)]})
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert len(enc) == len(ref)
    for a, b in zip(enc["tokens"], ref["tokens"]):
        assert list(a) == list(b)
