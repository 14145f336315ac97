"""Wave 71: greedy weighted set cover over source vocabularies.

* greedy_set_cover_sources — the classic (1 − 1/e) greedy set-cover
  heuristic: pick, five times, the source whose vocabulary covers the most
  still-uncovered words (ties by source name).  The Ray side folds the
  distinct (source, word) exchange once and replays the five picks
  vectorized; the oracle UNROLLS the same five greedy steps as
  MATERIALIZED CTEs (the k-means-chain pattern) — greedy choices are
  sequential by nature, so the unroll IS the faithful relational form.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_COVER_STEPS = 5


def q_greedy_set_cover_sources(sf_dir: str) -> pd.DataFrame:
    """Five greedy cover picks over source vocabularies: (step, source,
    gain, cum_covered), gain = newly covered distinct words."""
    docs = _t(sf_dir, "documents", ["source", "text"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ")
        flat = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        offs = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = offs[1:] - offs[:-1]
        idx = np.repeat(np.arange(len(t), dtype=np.int64), n_words)
        df = pd.DataFrame({"source": t["source"].to_numpy(zero_copy_only=False)[idx],
                           "word": flat.values.to_numpy(zero_copy_only=False)})
        return df.drop_duplicates()

    sw = grouped_sums(
        docs.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "word"], {}, reduce="driver").to_pandas()
    by_src = {s: set(g["word"]) for s, g in sw.groupby("source")}
    covered: set = set()
    picked: set = set()
    rows = []
    for step in range(1, _COVER_STEPS + 1):
        best_src, best_gain = None, -1
        for s in sorted(set(by_src) - picked):
            gain = len(by_src[s] - covered)
            if gain > best_gain:
                best_src, best_gain = s, gain
        if best_src is None or best_gain <= 0:
            break  # cover complete — the oracle's gain table is empty too
        covered |= by_src[best_src]
        picked.add(best_src)
        rows.append({"step": step, "source": best_src, "gain": best_gain,
                     "cum_covered": len(covered)})
    out = pd.DataFrame(rows)
    return _i64(out, ["step", "gain", "cum_covered"])


def _cover_sql(steps: int) -> str:
    parts = ["""WITH sw AS MATERIALIZED (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS word
  FROM documents)"""]
    prev_cov = None
    prev_picked: list[str] = []
    selects = []
    for k in range(1, steps + 1):
        not_cov = (f"AND word NOT IN (SELECT word FROM cov{k - 1})"
                   if prev_cov else "")
        not_picked = (" AND source NOT IN ("
                      + ", ".join(f"(SELECT src FROM pick{i})"
                                  for i in range(1, k))
                      + ")") if prev_picked else ""
        parts.append(f"""g{k} AS MATERIALIZED (
  SELECT source, COUNT(*) AS gain FROM sw
  WHERE TRUE {not_cov} {not_picked}
  GROUP BY 1)""")
        parts.append(f"""pick{k} AS MATERIALIZED (
  SELECT source AS src, gain FROM g{k}
  ORDER BY gain DESC, source LIMIT 1)""")
        parts.append(f"""cov{k} AS MATERIALIZED (
  SELECT DISTINCT word FROM sw
  WHERE source IN ({", ".join(f"(SELECT src FROM pick{i})" for i in range(1, k + 1))}))""")
        selects.append(
            f"SELECT {k} AS step, (SELECT src FROM pick{k}) AS source,\n"
            f"       CAST((SELECT gain FROM pick{k}) AS BIGINT) AS gain,\n"
            f"       CAST((SELECT COUNT(*) FROM cov{k}) AS BIGINT) AS cum_covered\n"
            f"WHERE EXISTS (SELECT 1 FROM pick{k})")
        prev_cov = f"cov{k}"
        prev_picked.append(f"pick{k}")
    body = ",\n".join(parts)
    union = "\nUNION ALL\n".join(selects)
    return f"{body}\nSELECT * FROM (\n{union}\n) ORDER BY step"


SQL_GREEDY_SET_COVER_SOURCES = _cover_sql(_COVER_STEPS)
