"""Regenerate QUERIES.md from the registry docs (one row per query)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_transparencia_sergipe_spark.plans import registry


def main() -> None:
    registry._ensure_loaded()
    lines = [
        "# QUERIES — the registered surface (generated from plans/registry.py docs)",
        "",
        "One row per `queries()` entry. `oracle` = DuckDB twin exists (the",
        "driver hash-gates it); `rows-only` = non-SQL-expressible by contract.",
        "Driver window = first 50 (see registry.py HEADLINE_50 and its",
        "rotation log). Regenerate with: `python tools/gen_query_catalog.py`.",
        "",
        "| # | query | check | doc |",
        "|---|---|---|---|",
    ]
    for i, (name, q) in enumerate(registry.REGISTRY.items(), 1):
        kind = "oracle" if q.oracle else "rows-only"
        doc = " ".join((q.doc or "").split())
        if len(doc) > 220:
            doc = doc[:217] + "..."
        doc = doc.replace("|", "\\|")
        tier = "W" if i <= 50 else "E"
        lines.append(f"| {i} ({tier}) | {name} | {kind} | {doc} |")
    lines += [
        "",
        "(W = driver certification window, E = extended tier — all",
        "oracle-checked every round in CORRECTNESS_LOCAL.md.)",
    ]
    Path(__file__).resolve().parent.parent.joinpath("QUERIES.md").write_text(
        "\n".join(lines) + "\n")
    print(f"wrote {len(registry.REGISTRY)} rows")


if __name__ == "__main__":
    main()
