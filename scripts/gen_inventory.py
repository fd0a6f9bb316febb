"""Generate docs/operator_inventory.md from the live registry: one row
per registered query key — implementing module:function, oracle status,
and the docstring/comment-derived one-liner. Regenerate after adding
keys so SURVEY §2's inventory and the shipped registry can be
cross-checked mechanically:

    python scripts/gen_inventory.py
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_service_spark.registry import ORACLES, QUERIES, load_all_operators


_MODULE_SRC: dict[str, str] = {}


def _module_source(fn) -> str:
    mod = fn.__module__
    if mod not in _MODULE_SRC:
        try:
            _MODULE_SRC[mod] = inspect.getsource(sys.modules[mod])
        except Exception:
            _MODULE_SRC[mod] = ""
    return _MODULE_SRC[mod]


def one_liner(key: str, fn) -> str:
    doc = inspect.getdoc(fn)
    if doc:
        line = doc.strip().splitlines()[0].strip()
        return line if len(line) <= 110 else line[:107] + "..."
    # Fall back to the module's "# q_xxx — description" banner comment.
    src = _module_source(fn)
    collecting = None
    for raw in src.splitlines():
        line = raw.strip()
        if collecting is not None:
            if line.startswith("#") and not line.startswith("# ---"):
                collecting += " " + line.lstrip("# ").strip()
            else:
                break
        elif line.startswith(f"# {key} ") or line.startswith(f"# {key}:"):
            collecting = line[2 + len(key) :].lstrip(" —:-").strip()
    if collecting:
        return collecting if len(collecting) <= 110 else collecting[:107] + "..."
    return ""


def main() -> None:
    load_all_operators()
    rows = []
    for key in sorted(QUERIES):
        fn = QUERIES[key]
        mod = fn.__module__.rsplit(".", 1)[-1]
        oracle = "full" if key in ORACLES else "rows-only"
        rows.append((key, mod, oracle, one_liner(key, fn)))

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "operator_inventory.md",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    n_full = sum(1 for r in rows if r[2] == "full")
    with open(out, "w") as f:
        f.write(
            "# Operator inventory (generated)\n\n"
            f"{len(rows)} registered query keys; {n_full} with full DuckDB "
            "oracles, "
            f"{len(rows) - n_full} rows-only. Regenerate with "
            "`python scripts/gen_inventory.py`.\n\n"
            "| key | module | oracle | summary |\n|---|---|---|---|\n"
        )
        for key, mod, oracle, desc in rows:
            f.write(f"| `{key}` | {mod} | {oracle} | {desc} |\n")
    print(f"wrote {out}: {len(rows)} keys ({n_full} full-oracle)")


if __name__ == "__main__":
    main()
