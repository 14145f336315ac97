"""Curation pipeline: planted-truth stage counts, partitioned sink layout,
and determinism (tests/test_flagship.py is the model; corpus plants are
documented in sources/curation.py)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.curate import CurateConfig, CurateResult, run_curate
from commerce_logs_pipeline_ray.sources.curation import (
    EXACT_DUP_MOD,
    FRAGMENT_MOD,
    VARIANT_MOD,
    build_curation_table,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "source", "text"])
    t = build_curation_table(docs)
    d = tmp_path_factory.mktemp("curate_in")
    path = str(d / "curation.parquet")
    pq.write_table(t, path)
    return docs, t, path


def test_plant_schedule_counts(corpus):
    docs, t, _ = corpus
    ids = docs["doc_id"].to_pylist()
    dups = sum(1 for i in ids if i % EXACT_DUP_MOD == 0)
    variants = sum(1 for i in ids if i % VARIANT_MOD == 0)
    frags = sum(1 for i in ids if i % FRAGMENT_MOD == 0)
    assert t.num_rows == len(ids) + dups + variants + frags


def test_curate_planted_truth(corpus, ray_session, tmp_path):
    docs, t, path = corpus
    ids = docs["doc_id"].to_pylist()
    dups = sum(1 for i in ids if i % EXACT_DUP_MOD == 0)
    variants = sum(1 for i in ids if i % VARIANT_MOD == 0)
    frags = sum(1 for i in ids if i % FRAGMENT_MOD == 0)

    res = run_curate(CurateConfig(input_path=path, output_dir=str(tmp_path / "out")))
    assert isinstance(res, CurateResult)
    assert res.rows_in == t.num_rows
    # every fragment fails the min-words gate; no base doc does (all ≥ 15
    # words, stop ratios ≪ 0.5)
    assert res.dropped_quality == frags
    # every exact dup AND every case/space variant collapses onto its base
    # under normalize-then-fingerprint keep-min
    assert res.dropped_duplicate == dups + variants
    assert res.rows_out == len(ids)

    # survivors are exactly the base ids (keep-min wins over offset ids)
    kept = set()
    for f in res.output_files:
        kept.update(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    assert kept == set(ids)


def test_partitioned_sink_layout_and_pruned_read(corpus, ray_session, tmp_path):
    _, _, path = corpus
    out = str(tmp_path / "out")
    res = run_curate(CurateConfig(input_path=path, output_dir=out))
    lang_dirs = sorted(os.path.basename(p) for p in glob.glob(os.path.join(out, "curated", "lang=*")))
    assert lang_dirs and all(d.startswith("lang=") for d in lang_dirs)
    # a pruned read of one partition touches only that directory's files and
    # agrees with the run summary
    lang = lang_dirs[0].split("=", 1)[1]
    files = glob.glob(os.path.join(out, "curated", f"lang={lang}", "*.parquet"))
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert n == res.per_lang[lang][0]


def test_curate_deterministic(corpus, ray_session, tmp_path):
    _, _, path = corpus
    r1 = run_curate(CurateConfig(input_path=path, output_dir=str(tmp_path / "a")))
    r2 = run_curate(CurateConfig(input_path=path, output_dir=str(tmp_path / "b")))
    assert r1.per_lang == r2.per_lang
    assert r1.rows_out == r2.rows_out
    # batch-digest file names are content-addressed → identical names
    assert [os.path.basename(p) for p in r1.output_files] == \
           [os.path.basename(p) for p in r2.output_files]


def test_curate_bloom_path_matches_broadcast(corpus, ray_session, tmp_path):
    """dedup_broadcast_max=0 forces the Bloom prefilter + exact-verify
    survivor path; the survivor SET and summary must equal the broadcast
    path's (Bloom has no false negatives; verify scrubs false positives)."""
    _, _, path = corpus
    bc = run_curate(CurateConfig(input_path=path, output_dir=str(tmp_path / "bc")))
    bl = run_curate(CurateConfig(
        input_path=path, output_dir=str(tmp_path / "bl"), dedup_broadcast_max=0))
    assert bl.rows_out == bc.rows_out
    assert bl.dropped_duplicate == bc.dropped_duplicate
    assert bl.per_lang == bc.per_lang

    def kept(res):
        ids = set()
        for f in res.output_files:
            ids.update(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        return ids

    assert kept(bl) == kept(bc)


def test_curate_md5_fingerprint_matches_fnv(corpus, ray_session, tmp_path):
    """Fingerprint choice must not change dedup semantics (both injective
    on the corpus): md5 (oracle-parity) and fnv128 (scale default) agree."""
    _, _, path = corpus
    fnv = run_curate(CurateConfig(input_path=path, output_dir=str(tmp_path / "f")))
    md5 = run_curate(CurateConfig(
        input_path=path, output_dir=str(tmp_path / "m"), fingerprint="md5"))
    assert md5.per_lang == fnv.per_lang
    assert md5.rows_out == fnv.rows_out
    assert md5.dropped_duplicate == fnv.dropped_duplicate


def test_incremental_curation_cross_run_dedup(corpus, ray_session, tmp_path):
    """Two-batch ingestion with shared content: batch 2 must not re-curate
    docs whose CONTENT batch 1 already kept; re-running either batch is
    idempotent (a run never anti-joins against its own state)."""
    import pyarrow as pa

    docs, _, _ = corpus
    n = docs.num_rows
    half = n // 2
    b1 = docs.slice(0, half)
    # batch 2 = second half + the FIRST 10 docs re-ingested under new ids
    dup = docs.slice(0, 10)
    dup = dup.set_column(0, "doc_id",
                         pa.array([int(x) + 10_000_000 for x in dup["doc_id"].to_pylist()],
                                  pa.int64()))
    b2 = pa.concat_tables([docs.slice(half, n - half), dup])
    p1, p2 = str(tmp_path / "b1.parquet"), str(tmp_path / "b2.parquet")
    pq.write_table(b1, p1)
    pq.write_table(b2, p2)
    state = str(tmp_path / "state")

    r1 = run_curate(CurateConfig(input_path=p1, output_dir=str(tmp_path / "o1"),
                                 state_dir=state))
    assert r1.keepers_dropped_prior == 0
    r2 = run_curate(CurateConfig(input_path=p2, output_dir=str(tmp_path / "o2"),
                                 state_dir=state))
    # every re-ingested doc's content is already in the state → dropped
    assert r2.keepers_dropped_prior == 10
    kept2 = set()
    for f in r2.output_files:
        kept2.update(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    assert not any(i >= 10_000_000 for i in kept2)

    # idempotent re-run of batch 2: its own state is excluded, so the same
    # outputs reproduce (not an empty run)
    import shutil as _sh
    _sh.rmtree(str(tmp_path / "o2"))
    r2b = run_curate(CurateConfig(input_path=p2, output_dir=str(tmp_path / "o2"),
                                  state_dir=state))
    assert r2b.rows_out == r2.rows_out
    assert r2b.keepers_dropped_prior == 10

    # bloom anti path (threshold 0) gives identical results
    _sh.rmtree(str(tmp_path / "o2"))
    r2c = run_curate(CurateConfig(input_path=p2, output_dir=str(tmp_path / "o2"),
                                  state_dir=state, dedup_broadcast_max=0))
    assert r2c.rows_out == r2.rows_out
    assert r2c.keepers_dropped_prior == 10
