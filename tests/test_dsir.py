"""DSIR importance-resampling tests: planted vocabularies and a scalar
reference implementation."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from commerce_logs_pipeline_ray.functions.dsir import (
    N_BUCKETS,
    dsir_bucket_counts,
    dsir_weights,
)
from commerce_logs_pipeline_ray.functions.hashing import fnv1a64_single


def _corpus():
    # target docs speak "alpha beta gamma", raw docs speak "delta epsilon zeta"
    rows = []
    for i in range(30):
        if i % 2 == 0:
            text = " ".join(["alpha", "beta", "gamma"] * 6)
            is_t = True
        else:
            text = " ".join(["delta", "epsilon", "zeta"] * 6)
            is_t = False
        rows.append({"doc_id": i, "source": f"s{i % 3}", "text": text, "is_target": is_t})
    # one mixed doc: target-style gram stream with a raw tail → selected
    rows.append({"doc_id": 100, "source": "s0",
                 "text": " ".join(["alpha", "beta", "gamma"] * 5 + ["delta"]),
                 "is_target": False})
    return pa.Table.from_pylist(rows)


def _scalar_weights(table):
    ct = np.zeros(N_BUCKETS, np.int64)
    cr = np.zeros(N_BUCKETS, np.int64)
    grams_per_doc = {}
    for r in table.to_pylist():
        ws = r["text"].split(" ")
        bs = [fnv1a64_single(f"{a} {b}") % N_BUCKETS for a, b in zip(ws, ws[1:])]
        grams_per_doc[r["doc_id"]] = bs
        for b in bs:
            if r["is_target"]:
                ct[b] += 1
            else:
                cr[b] += 1
    T, R = ct.sum(), cr.sum()
    lam = [
        math.log((ct[b] + 1) / (T + N_BUCKETS)) - math.log((cr[b] + 1) / (R + N_BUCKETS))
        for b in range(N_BUCKETS)
    ]
    return {d: sum(lam[b] for b in bs) / len(bs) for d, bs in grams_per_doc.items()}


def test_bucket_counts_match_scalar():
    t = _corpus()
    ds = rd.from_arrow(t).repartition(5)
    ct, cr = dsir_bucket_counts(ds)
    ct2 = np.zeros(N_BUCKETS, np.int64)
    cr2 = np.zeros(N_BUCKETS, np.int64)
    for r in t.to_pylist():
        ws = r["text"].split(" ")
        for a, b in zip(ws, ws[1:]):
            bkt = fnv1a64_single(f"{a} {b}") % N_BUCKETS
            (ct2 if r["is_target"] else cr2)[bkt] += 1
    assert (ct == ct2).all() and (cr == cr2).all()


def test_weights_sign_follows_vocabulary():
    t = _corpus()
    out = dsir_weights(rd.from_arrow(t).repartition(4)).to_pandas().set_index("doc_id")
    # pure-target docs positive, pure-raw docs negative
    assert (out.loc[[i for i in range(30) if i % 2 == 0], "weight"] > 0).all()
    assert (out.loc[[i for i in range(30) if i % 2 == 1], "weight"] < 0).all()
    # mixed mostly-target doc is selected despite being tagged raw
    assert out.loc[100, "selected"] == 1


def test_weights_match_scalar_reference():
    t = _corpus()
    out = dsir_weights(rd.from_arrow(t).repartition(3)).to_pandas().set_index("doc_id")
    ref = _scalar_weights(t)
    for d, w in ref.items():
        assert abs(out.loc[d, "weight"] - w) < 1e-6


def test_batching_invariance():
    t = _corpus()
    a = dsir_weights(rd.from_arrow(t)).to_pandas().sort_values("doc_id", ignore_index=True)
    b = dsir_weights(rd.from_arrow(t).repartition(7)).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    assert a.equals(b)
