"""Generate OPERATORS.md — the user-facing index of every registered
query: name, one-line summary (first docstring sentence), and whether
a DuckDB oracle verifies it. Regenerate after adding operators:

    python tools/gen_operator_index.py
"""
import importlib.util
import re
import sys


def main() -> None:
    sys.path.insert(0, "/root/repo")
    spec = importlib.util.spec_from_file_location(
        "ray_entry", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    oracles = set(mod.oracle_sql())
    lines = [
        "# Operator index",
        "",
        "Auto-generated (`python tools/gen_operator_index.py`) from the",
        "`queries()` registry in `__ray_entry__.py`. Every entry is a",
        "callable `queries()[name](sf_dir)` returning a Ray Dataset /",
        "pandas frame; \"oracle\" marks a DuckDB `oracle_sql()` twin the",
        "parity suite replays (rows + schema + values).",
        "",
        f"Total: **{len(qs)}** operators, "
        f"**{len(oracles & set(qs))}** oracle-verified.",
        "",
        "| # | query | oracle | summary |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(qs.items()):
        doc = (fn.__doc__ or "").strip()
        first = re.split(r"(?<=[.;])\s", doc.replace("\n", " "), 1)[0]
        first = re.sub(r"\s+", " ", first).strip() or "—"
        mark = "yes" if name in oracles else "—"
        lines.append(f"| {i} | `{name}` | {mark} | {first} |")
    with open("/root/repo/OPERATORS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote OPERATORS.md: {len(qs)} rows")


if __name__ == "__main__":
    main()
