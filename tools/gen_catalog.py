"""Generate docs/QUERY_CATALOG.md from the live registry — one line per
query: name, DuckDB-oracle flag, description.  Regenerate after adding
queries: python tools/gen_catalog.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY  # noqa: E402


def main() -> None:
    lines = [
        "# Query / operator catalog (auto-generated — tools/gen_catalog.py)",
        "",
        f"{len(REGISTRY)} registry queries; "
        f"{sum(1 for s in REGISTRY.values() if s.sql)} carry a DuckDB oracle "
        "(the rest are pytest-verified against planted truth / exact references).",
        "",
        "| # | Query | Oracle | Description |",
        "|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(sorted(REGISTRY.items()), 1):
        lines.append(f"| {i} | `{name}` | {'SQL' if spec.sql else 'rows-only'} | {spec.description} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "QUERY_CATALOG.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(REGISTRY)} queries")


if __name__ == "__main__":
    main()
