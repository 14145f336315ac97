"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pd, topk  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 33: exact Shapley attribution, token-bucket rate-limit replay
# ---------------------------------------------------------------------------

_SHAP_CHANNELS = ["click", "signup", "view"]


def q_shapley_attribution(sf_dir: str) -> pd.DataFrame:
    """Exact Shapley-value marketing attribution over 3 channels (the
    game-theoretic upgrade of linear attribution): each purchase's
    characteristic function v(S) = its cents when the user's prior-touch
    channel set intersects S (0 otherwise), and the 3-player Shapley value
    enumerates all orderings exactly — every credit is an integer number of
    SIXTH-cents (×6 scale), so the division by 3! never leaves integers.
    One pass classifies each purchase's presence set (8 possibilities);
    the Shapley algebra runs over the 8-row subset table."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        rows = []
        for _, g in df.groupby("user_id", sort=False):
            seen: set[str] = set()
            for et, val in zip(g["event_type"], g["value"]):
                if et == "purchase":
                    cents = int(_rd(np.array([val * 100.0]), 0)[0])
                    key = "".join(
                        "1" if c in seen else "0" for c in _SHAP_CHANNELS
                    )
                    rows.append((key, cents, 1))
                elif et in _SHAP_CHANNELS:
                    seen.add(et)
        out = pd.DataFrame(rows, columns=["subset", "cents", "n"])
        if out.empty:
            return pd.DataFrame({"subset": pd.Series([], dtype=object),
                                 "cents": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        return out.groupby("subset", as_index=False).sum()

    sub = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], per_user),
        ["subset"],
        {"cents": "cents", "n": "n"},
    ).to_pandas()
    mass = {r["subset"]: int(r["cents"]) for _, r in sub.iterrows()}

    def v(members: frozenset[int], present_key: str) -> int:
        # v(S) for one presence set: cents if S ∩ present ≠ ∅
        return 1 if any(present_key[i] == "1" for i in members) else 0

    import itertools

    credit = {c: 0 for c in _SHAP_CHANNELS}  # in sixth-cents
    for key, cents in mass.items():
        for order in itertools.permutations(range(3)):
            coalition: set[int] = set()
            for ch in order:
                before = v(frozenset(coalition), key)
                coalition.add(ch)
                after = v(frozenset(coalition), key)
                credit[_SHAP_CHANNELS[ch]] += (after - before) * cents
    total6 = sum(credit.values())
    rows = []
    for c in _SHAP_CHANNELS:
        share = float("nan") if total6 == 0 else float(credit[c]) / float(total6)
        rows.append((c, credit[c], _rd(share, 6)))
    out = pd.DataFrame(rows, columns=["channel", "shapley_sixth_cents", "share"])
    return _i64(out, ["shapley_sixth_cents"])


def _shap_sql() -> str:
    # marginal-contribution weights for 3 players over the 8 presence sets:
    # Shapley in sixth-units, computed per subset key in closed form
    import itertools

    terms = {c: [] for c in _SHAP_CHANNELS}
    for bits in itertools.product("01", repeat=3):
        key = "".join(bits)
        for ci, c in enumerate(_SHAP_CHANNELS):
            w = 0
            for order in itertools.permutations(range(3)):
                pre = set()
                for ch in order:
                    was = any(key[i] == "1" for i in pre)
                    pre.add(ch)
                    now = any(key[i] == "1" for i in pre)
                    if ch == ci:
                        w += int(now) - int(was)
            if w:
                terms[c].append(f"WHEN '{key}' THEN {w}")
    cases = {c: "CASE subset " + " ".join(ts) + " ELSE 0 END"
             for c, ts in terms.items()}
    chans = ", ".join(f"('{c}', {i})" for i, c in enumerate(_SHAP_CHANNELS))
    per_chan = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, CAST(SUM(cents * ({cases[c]})) AS BIGINT)"
        f" AS shapley_sixth_cents FROM m"
        for c in _SHAP_CHANNELS
    )
    return f"""
WITH r AS (
  SELECT user_id, event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
         epoch_us(ts) AS t, event_id
  FROM events),
p AS (
  SELECT a.user_id, a.cents, a.t, a.event_id,
         MAX(CASE WHEN b.event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
         MAX(CASE WHEN b.event_type = 'signup' THEN 1 ELSE 0 END) AS has_signup,
         MAX(CASE WHEN b.event_type = 'view' THEN 1 ELSE 0 END) AS has_view
  FROM r a
  LEFT JOIN r b ON b.user_id = a.user_id
    AND (b.t < a.t OR (b.t = a.t AND b.event_id < a.event_id))
    AND b.event_type IN ('click', 'signup', 'view')
  WHERE a.event_type = 'purchase'
  GROUP BY 1, 2, 3, 4),
m AS MATERIALIZED (
  SELECT CONCAT(CAST(has_click AS VARCHAR), CAST(has_signup AS VARCHAR),
                CAST(has_view AS VARCHAR)) AS subset,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM p GROUP BY 1),
cr AS ({per_chan}),
tot AS (SELECT CAST(SUM(shapley_sixth_cents) AS BIGINT) AS t6 FROM cr)
SELECT cr.channel, cr.shapley_sixth_cents,
       CASE WHEN (SELECT t6 FROM tot) = 0 THEN CAST('nan' AS DOUBLE)
            ELSE ROUND(CAST(cr.shapley_sixth_cents AS DOUBLE)
                       / CAST((SELECT t6 FROM tot) AS DOUBLE), 6) END AS share
FROM cr ORDER BY cr.channel
"""


SQL_SHAPLEY_ATTRIBUTION = _shap_sql()


_TB_CAP = 5
_TB_REFILL_US = 10_000_000  # one token per 10 s


def q_token_bucket_audit(sf_dir: str) -> pd.DataFrame:
    """Token-bucket rate-limit replay (the API-gateway admission rule): each
    user's stream starts with a full bucket (5 tokens, +1 per 10 s, whole
    tokens per gap); an event consumes a token or drops.  Inherently
    SEQUENTIAL per user — the per-user fold runs inside the user-bucketed
    exchange (streams are short; cross-user parallelism carries the scan),
    and the ORACLE replays the same recursion as a recursive CTE.  Top-10
    throttled users."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        rows = []
        for uid, g in df.groupby("user_id", sort=False):
            tsu = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            level = _TB_CAP - 1  # first event always admitted
            dropped = 0
            prev = tsu[0]
            for t in tsu[1:]:
                level = min(_TB_CAP, level + (t - prev) // _TB_REFILL_US)
                if level >= 1:
                    level -= 1
                else:
                    dropped += 1
                prev = t
            rows.append((int(uid), len(tsu), dropped))
        return pd.DataFrame(rows, columns=["user_id", "n_events", "dropped"])

    per_user = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], per_bucket),
        ["user_id"],
        {"n_events": "n_events", "dropped": "dropped"},
    )
    out = topk(per_user, ["dropped", "user_id"], [True, False], 10).to_pandas()
    return _i64(out, ["user_id", "n_events", "dropped"])


SQL_TOKEN_BUCKET_AUDIT = f"""
WITH RECURSIVE e AS MATERIALIZED (
  SELECT user_id, epoch_us(ts) AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
tb AS (
  SELECT user_id, rn, t, CAST({_TB_CAP - 1} AS BIGINT) AS level,
         CAST(0 AS BIGINT) AS dropped
  FROM e WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.rn, n.t,
         CASE WHEN LEAST({_TB_CAP}, p.level + (n.t - p.t) // {_TB_REFILL_US}) >= 1
              THEN LEAST({_TB_CAP}, p.level + (n.t - p.t) // {_TB_REFILL_US}) - 1
              ELSE LEAST({_TB_CAP}, p.level + (n.t - p.t) // {_TB_REFILL_US}) END,
         p.dropped + CASE WHEN LEAST({_TB_CAP}, p.level + (n.t - p.t)
                                     // {_TB_REFILL_US}) >= 1
                          THEN 0 ELSE 1 END
  FROM tb p JOIN e n ON n.user_id = p.user_id AND n.rn = p.rn + 1),
fin AS (
  SELECT user_id, MAX(rn) AS n_events,
         MAX_BY(dropped, rn) AS dropped
  FROM tb GROUP BY 1)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(dropped AS BIGINT) AS dropped
FROM fin ORDER BY dropped DESC, user_id LIMIT 10
"""


