"""Regenerate docs/QUERIES.md — the declared-query catalog.

One row per ``queries()`` entry: name, first docstring paragraph,
and whether its oracle twin is static SQL or generated at check time
(IVF-family oracles are trained on the checked fixture).  Run::

    python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entrymod

    from cass_cdc_pg_spark import registry

    queries = entrymod.queries()
    static = set(registry.ORACLE)
    lines = [
        "# Query catalog",
        "",
        "Every declared query, its one-line semantics (from the implementation's",
        "docstring where present), and whether its DuckDB oracle twin is static",
        "SQL or generated at check time.  The driver's correctness gate runs all",
        "of these at sf0.01; `tools/check_oracle.py` replays them locally at any sf.",
        "",
        "| # | Query | Semantics | Oracle |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(queries.items(), 1):
        doc = (fn.__doc__ or "").strip().split("\n\n")[0].replace("\n", " ")
        doc = " ".join(doc.split())
        if len(doc) > 160:
            doc = doc[:157] + "..."
        doc = doc.replace("|", "\\|")
        kind = "static SQL" if name in static else "generated (fixture-trained)"
        lines.append(f"| {i} | `{name}` | {doc} | {kind} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"docs/QUERIES.md written ({len(queries)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
