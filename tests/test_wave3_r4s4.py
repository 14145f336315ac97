"""Round-4 session-4 wave-3 operators: k-core, FFD compaction, margin-kNN
pair mining, unigram-LM segmentation, scene-cut detection — planted truth."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from commerce_logs_pipeline_ray.functions.graph import kcore_hindex
from commerce_logs_pipeline_ray.functions.sim import margin_knn_pairs
from commerce_logs_pipeline_ray.functions.unigram import (
    select_vocab,
    viterbi_segment,
)
from commerce_logs_pipeline_ray.pipelines.queries import ffd_pack
from commerce_logs_pipeline_ray.sources.media import SCENE_DIFF_THRESHOLD
from commerce_logs_pipeline_ray.stages.multimodal import SceneCutDetector


def _sym_edges(pairs):
    a = np.array([p[0] for p in pairs] + [p[1] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs] + [p[0] for p in pairs], dtype=np.int64)
    return rd.from_pandas(pd.DataFrame({"src": a, "dst": b, "w": 1})).repartition(3)


class TestKCore:
    def test_clique_plus_tail(self, ray_session):
        # 4-clique {1,2,3,4} (core 3), path 4-5-6 (core 1)
        pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
        got = kcore_hindex(_sym_edges(pairs)).set_index("node")["core"].to_dict()
        assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 1, 6: 1}

    def test_two_triangles_bridge(self, ray_session):
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
        got = kcore_hindex(_sym_edges(pairs)).set_index("node")["core"].to_dict()
        assert got == {1: 2, 2: 2, 3: 2, 4: 2, 5: 2, 6: 2}


class TestFFD:
    def test_hand_case(self):
        sizes = np.array([7, 5, 4, 3, 1], dtype=np.int64)
        keys = [("a",), ("b",), ("c",), ("d",), ("e",)]
        # capacity 8: FFD order 7,5,4,3,1 → bins [7+1], [5+3], [4]
        got = ffd_pack(sizes, keys, capacity=8)
        assert got == {("a",): 0, ("b",): 1, ("c",): 2, ("d",): 1, ("e",): 0}

    def test_deterministic_tie_order(self):
        sizes = np.array([4, 4, 4], dtype=np.int64)
        keys = [("z",), ("a",), ("m",)]
        got = ffd_pack(sizes, keys, capacity=8)
        # equal sizes sort by key asc: a,m,z → bins 0,0,1
        assert got == {("a",): 0, ("m",): 0, ("z",): 1}


class TestMarginKNN:
    def test_mutual_pairs_planted(self, ray_session):
        rng = np.random.default_rng(5)
        dim = 16
        # two clean translation pairs + background noise
        base = rng.normal(size=(2, dim)) * 3
        a_vecs = np.vstack([base + rng.normal(size=(2, dim)) * 0.01,
                            rng.normal(size=(6, dim))])
        b_vecs = np.vstack([base + rng.normal(size=(2, dim)) * 0.01,
                            rng.normal(size=(6, dim))])
        ids = np.arange(16, dtype=np.int64)
        emb = pa.table(
            {"vec_id": pa.array(ids),
             "embedding": pa.array(
                 [r for r in np.vstack([a_vecs, b_vecs]).astype(np.float32)],
                 type=pa.list_(pa.float32())),
             "label": pa.array([0] * 8 + [1] * 8, pa.int32())}
        )
        ds = rd.from_arrow(emb).repartition(3)
        got = margin_knn_pairs(ds, 0, 1, k=3)
        pairs = set(zip(got["vec_a"], got["vec_b"]))
        assert (0, 8) in pairs and (1, 9) in pairs
        # mutual-best is a partial matching: each side appears at most once
        assert got["vec_a"].is_unique and got["vec_b"].is_unique


class TestUnigram:
    def test_viterbi_prefers_cheap_long_pieces(self):
        costs = {"a": 100, "b": 100, "ab": 150, "aba": 10_000}
        # "abab": ab+ab = 300 beats a+b+a+b = 400 and aba+b = 10100
        pieces, cost = viterbi_segment("abab", costs)
        assert (pieces, cost) == (2, 300)

    def test_tie_prefers_longer_final_piece(self):
        costs = {"a": 100, "aa": 200}
        # "aa": a+a = 200/2 pieces vs aa = 200/1 piece → fewer pieces wins
        pieces, cost = viterbi_segment("aa", costs)
        assert (pieces, cost) == (1, 200)

    def test_select_vocab_topk_ties_by_piece(self):
        counts = {"a": 5, "b": 5, "xy": 3, "ab": 3, "zz": 1}
        costs = select_vocab(counts)
        assert "ab" in costs and "xy" in costs and "zz" in costs
        assert costs["ab"] == costs["xy"]


class TestSceneCuts:
    def test_planted_cut_detected(self, ray_session):
        from commerce_logs_pipeline_ray.functions.media_codecs import encode_video

        h, w = 6, 8
        a = np.zeros((h, w, 3), dtype=np.uint8)
        a2 = a.copy()
        a2[0, 0, 0] = 2  # tiny jitter: below threshold
        b = np.full((h, w, 3), 200, dtype=np.uint8)  # hard cut at index 2
        payload = encode_video([a, a2, b, b], 4)
        t = pa.table({"media_id": pa.array(["v0"]),
                      "payload": pa.array([payload], pa.binary())})
        got = SceneCutDetector()(t).to_pandas()
        assert got["cut_index"].tolist() == [2]

    def test_threshold_boundary_not_a_cut(self):
        from commerce_logs_pipeline_ray.functions.media_codecs import encode_video

        h, w = 4, 4
        a = np.zeros((h, w, 3), dtype=np.uint8)
        b = np.full((h, w, 3), SCENE_DIFF_THRESHOLD, dtype=np.uint8)
        payload = encode_video([a, b], 4)  # sum == T·npix exactly: NOT a cut
        t = pa.table({"media_id": pa.array(["v1"]),
                      "payload": pa.array([payload], pa.binary())})
        got = SceneCutDetector()(t).to_pandas()
        assert len(got) == 0
