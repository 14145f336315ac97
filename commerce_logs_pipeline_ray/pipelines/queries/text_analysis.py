"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import STOPWORD_PATTERN, _i64, _t, md5_hex, n_words, pa, pc, pd, quality_batch  # noqa: F401

# ---------------------------------------------------------------------------
# Text analysis (training-data ops)
# ---------------------------------------------------------------------------

def q_doc_token_stats(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def stats(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pc.cast(n_words(t["text"]), pa.int64()),
                "n_chars": t["n_chars"],
            }
        )

    out = ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _i64(out, ["doc_id", "n_words", "n_chars"])


SQL_DOC_TOKEN_STATS = """
SELECT doc_id, len(string_split(text, ' ')) AS n_words, n_chars FROM documents
"""


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _i64(out, ["doc_id", "n_words", "stop_hits"])


SQL_DOC_QUALITY = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       len(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS stop_hits,
       ROUND(CAST(len(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS stop_ratio
FROM documents
"""


def q_doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "fp": md5_hex(t["text"])})

    out = ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _i64(out, ["doc_id"])


SQL_DOC_FINGERPRINT = "SELECT doc_id, md5(text) AS fp FROM documents"

