"""Regenerate QUERIES.md — the query-surface index table — from
pipelines/registry.py docstrings. Paths are anchored on this file, so it
works from any cwd:

    python tools/gen_queries_md.py

No Ray session needed: queries() callables are only introspected, never
called. Keep this in sync with the hand-written header sentence only via
the counts it computes."""

import re
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from resume_ocr_ray.pipelines import registry as reg  # noqa: E402

MAXLEN = 220


def _desc(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    one = re.sub(r"\s+", " ", doc)
    if len(one) > MAXLEN:
        one = one[: MAXLEN - 3].rstrip() + "..."
    return one


def main() -> None:
    qs = reg.queries()
    oracles = set(reg.oracle_sql())
    lines = [
        "# Query surface index",
        "",
        f"Generated from `pipelines/registry.py` docstrings ({len(qs)} "
        f"queries, {len(oracles)} with exact DuckDB oracles). "
        "✓ = exact hash-checked oracle lane; ○ = rows-only "
        "(pytest bound documented in the docstring).",
        "",
        "| Query | Oracle | What it computes |",
        "|---|---|---|",
    ]
    for name, fn in qs.items():
        mark = "✓" if name in oracles else "○"
        lines.append(f"| `{name}` | {mark} | {_desc(fn)} |")
    with open(REPO_ROOT / "QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {len(qs)} queries, {len(oracles)} oracle lanes")


if __name__ == "__main__":
    main()
