"""Tests for blocklist scan, Hamilton apportionment, audio downsample."""

import numpy as np
import pyarrow as pa


def test_audio_downsample_matches_scalar():
    from commerce_logs_pipeline_ray.functions.media_codecs import encode_wav
    from commerce_logs_pipeline_ray.stages.multimodal import AudioDownsample

    rng = np.random.default_rng(11)
    pcm = rng.integers(-30000, 30000, size=1001).astype(np.int16)  # odd length
    t = pa.table({"media_id": pa.array(["a"]), "payload": pa.array([encode_wav(pcm, 16000)])})
    out = AudioDownsample()(t).to_pylist()[0]
    m = len(pcm) // 2
    down = [(int(pcm[2 * i]) + int(pcm[2 * i + 1])) // 2 for i in range(m)]
    assert out["in_samples"] == 1001
    assert out["out_samples"] == 500
    assert out["out_rate"] == 8000
    assert out["checksum"] == sum(down)
    # floor division on negatives (not truncation): -3 // 2 == -2
    t2 = pa.table(
        {"media_id": pa.array(["b"]),
         "payload": pa.array([encode_wav(np.array([-1, -2], dtype=np.int16), 8000)])}
    )
    assert AudioDownsample()(t2).to_pylist()[0]["checksum"] == -2


def test_apportionment_sums_to_budget(ray_session):
    from commerce_logs_pipeline_ray.pipelines.queries import q_budget_apportionment

    out = q_budget_apportionment("/root/testdata/sf0.001")
    assert int(out["alloc"].sum()) == 1000
    assert (out["extra"].isin((0, 1))).all()
    # alloc is within 1 seat of the exact quota for every source
    total = out["chars"].sum()
    quota = 1000 * out["chars"] / total
    assert ((out["alloc"] - quota).abs() <= 1.0).all()


def test_blocklist_scan_counts(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.pipelines.queries import BLOCKLIST_PHRASES

    assert BLOCKLIST_PHRASES[0] == "slow"
    # vectorized count == python count on a constructed batch
    txt = "slow query slow window sort slow"
    import pyarrow.compute as pc

    arr = pa.array([txt])
    assert pc.count_substring(arr, "slow")[0].as_py() == txt.count("slow")
    assert pc.count_substring(arr, "window sort")[0].as_py() == 1


def test_linear_attribution_integer_exact(ray_session):
    """Planted sessions: credits sum exactly to the purchase cents and the
    earliest view takes the remainder."""
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.windows import linear_attribution

    base = pd.Timestamp("2024-01-01 10:00:00")
    rows = []
    # user 1: purchase 10.01 (1001 cents) with 3 prior views at hours 7, 8, 9
    for k, hr in enumerate((7, 8, 9)):
        rows.append({"event_id": k, "ts": base.replace(hour=hr), "user_id": 1,
                     "event_type": "view", "value": 0.0})
    rows.append({"event_id": 10, "ts": base, "user_id": 1,
                 "event_type": "purchase", "value": 10.01})
    # user 2: view AFTER the purchase → no credit
    rows.append({"event_id": 20, "ts": base, "user_id": 2,
                 "event_type": "purchase", "value": 5.0})
    rows.append({"event_id": 21, "ts": base.replace(hour=11), "user_id": 2,
                 "event_type": "view", "value": 0.0})
    # user 3: view 25h before → outside window
    rows.append({"event_id": 30, "ts": base - pd.Timedelta(hours=25), "user_id": 3,
                 "event_type": "view", "value": 0.0})
    rows.append({"event_id": 31, "ts": base, "user_id": 3,
                 "event_type": "purchase", "value": 7.0})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = linear_attribution(ds).set_index("hour")
    assert int(out["attributed_cents"].sum()) == 1001  # only user 1 credits
    # 1001 // 3 = 333 each; earliest view (hour 7) takes +2 remainder
    assert out.loc[7, "attributed_cents"] == 335
    assert out.loc[8, "attributed_cents"] == 333
    assert out.loc[9, "attributed_cents"] == 333


def test_vocab_coverage_monotone(ray_session):
    from commerce_logs_pipeline_ray.pipelines.queries import q_vocab_coverage

    out = q_vocab_coverage("/root/testdata/sf0.001").iloc[0]
    assert out["k50"] <= out["k90"] <= out["k99"] <= out["vocab_size"]
    assert out["k50"] >= 1


def test_partition_skew_matches_scalar_fnv(ray_session):
    from commerce_logs_pipeline_ray.functions.hashing import fnv1a32, fnv1a32_single
    import pyarrow as pa

    ids = [str(u) for u in (0, 1, 42, 999999, 123456789)]
    vec = fnv1a32(pa.array(ids))
    for s, h in zip(ids, vec):
        assert int(h) == fnv1a32_single(s)


def test_spread16_matches_scalar():
    import numpy as np

    from commerce_logs_pipeline_ray.pipelines.queries import _spread16

    def scalar(v):
        out = 0
        for b in range(16):
            out |= ((v >> b) & 1) << (2 * b)
        return out

    xs = np.array([0, 1, 2, 3, 255, 256, 65535, 12345], dtype=np.int64)
    got = _spread16(xs)
    for v, g in zip(xs, got):
        assert int(g) == scalar(int(v))
    # interleave is a bijection on 16+16 bits
    u = np.arange(0, 65536, 257, dtype=np.int64)
    h = np.arange(0, 65536, 263, dtype=np.int64)
    m = min(len(u), len(h))
    u, h = u[:m], h[:m]
    z = _spread16(u) | (_spread16(h) << np.uint64(1))
    assert len(set(z.tolist())) == len(u)


def test_split_finder_finds_planted_boundary(ray_session, tmp_path, monkeypatch):
    """Variance-reduction split scan: build a toy events parquet where value
    jumps at hour bucket 12 — the best hour24 split must be at bucket 11."""
    import pandas as pd
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from commerce_logs_pipeline_ray.pipelines.queries import q_histogram_split_finder

    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(2400):
        hr = i % 24
        rows.append({
            "event_id": i,
            "ts": base + pd.Timedelta(hours=hr) + pd.Timedelta(days=i // 24),
            "user_id": i % 7,
            "event_type": "view",
            "value": 1.0 if hr < 12 else 9.0,
            "props": "",
        })
    d = tmp_path / "sf"
    d.mkdir()
    pq2.write_table(pa2.Table.from_pandas(pd.DataFrame(rows)), d / "events.parquet")
    out = q_histogram_split_finder(str(d)).set_index("feature")
    assert int(out.loc["hour24", "split_bucket"]) == 11
    assert out.loc["hour24", "gain"] > out.loc["user64", "gain"]
    assert int(out.loc["hour24", "n_left"]) == 1200


def test_pav_blocks_known_case():
    import numpy as np

    from commerce_logs_pipeline_ray.pipelines.queries import _pav_blocks

    # rates: .5, .25, .75, .1 → PAV pools (0.5,0.25)->0.375 then stays,
    # (0.75,0.1) pools to 0.425 which still >= 0.375: blocks [0,0,1,1]
    n = np.array([4, 4, 4, 10])
    pos = np.array([2, 1, 3, 1])
    blk = _pav_blocks(n, pos)
    # verify monotone non-decreasing fitted rates and pooling correctness
    bn = np.bincount(blk, weights=n)
    bp = np.bincount(blk, weights=pos)
    rates = bp / bn
    assert (np.diff(rates[blk]) >= -1e-12).all()
    # total mass preserved
    assert bn.sum() == n.sum() and bp.sum() == pos.sum()
    # already-isotone input is untouched
    blk2 = _pav_blocks(np.array([2, 2, 2]), np.array([0, 1, 2]))
    assert (blk2 == np.array([0, 1, 2])).all()
