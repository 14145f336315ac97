import pyarrow as pa

from commerce_logs_pipeline_ray.datagen import generate_file
from commerce_logs_pipeline_ray.schema import SEQUENCES_SCHEMA, SOURCES


def test_deterministic():
    a = generate_file(3, 500, seed=42)
    b = generate_file(3, 500, seed=42)
    assert a.equals(b)


def test_schema_and_types():
    t = generate_file(0, 300, seed=42)
    assert t.schema.equals(SEQUENCES_SCHEMA)
    assert t.num_rows == 300
    n_tok = t.column("n_tok").to_pylist()
    lens = [len(x) for x in t.column("tokens").to_pylist()]
    assert n_tok == lens
    assert all(1 <= n <= 2048 for n in n_tok)
    assert set(t.column("source").to_pylist()) <= set(SOURCES)


def test_malformed_fraction_present():
    t = generate_file(1, 5000, seed=42, p_malformed=0.02)
    import re

    from commerce_logs_pipeline_ray.schema import DOC_ID_PATTERN

    pat = re.compile(DOC_ID_PATTERN)
    bad = sum(1 for d in t.column("doc_id").to_pylist() if not pat.match(d or ""))
    assert 0.005 < bad / 5000 < 0.05


def test_zipf_skew():
    t = generate_file(2, 8000, seed=42)
    from collections import Counter

    c = Counter(t.column("source").to_pylist())
    assert c["apache-proxy"] == max(c.values())
    assert c["apache-proxy"] > 2 * c["zookeeper"]
