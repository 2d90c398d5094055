"""MeTTa output verification: parse emitted s-expressions and run the
reference's smoke queries.

The reference's only query capability is
/root/reference/scripts/metta_space_import.py: load ``type_defs.metta``
plus every ``*.metta`` into a MeTTa space, then (a) fetch the
properties of one node and (b) scan a genomic window (:73-90). hyperon
is not available in this container, so this module re-implements the
checkable part: a minimal s-expression parser plus the two query
shapes over the parsed atom set. Used by tests and by downstream
consumers that want to assert an emitted graph is loadable.
"""

from __future__ import annotations

import glob
import os


def parse_sexpr(line: str):
    """Parse one s-expression line into nested tuples of tokens.
    Honors the writer's escaping (backslash before ``(`` ``)`` ``\\``).
    """
    tokens = []
    buf = []
    i = 0
    out_stack: list[list] = [[]]
    n = len(line)
    while i < n:
        c = line[i]
        if c == "\\" and i + 1 < n:
            buf.append(line[i + 1])
            i += 2
            continue
        if c == "(":
            out_stack.append([])
            i += 1
        elif c == ")":
            if buf:
                out_stack[-1].append("".join(buf))
                buf = []
            done = tuple(out_stack.pop())
            out_stack[-1].append(done)
            i += 1
        elif c in " \t":
            if buf:
                out_stack[-1].append("".join(buf))
                buf = []
            i += 1
        else:
            buf.append(c)
            i += 1
    if buf:
        out_stack[-1].append("".join(buf))
    root = out_stack[0]
    return root[0] if len(root) == 1 else tuple(root)


def load_space(metta_dir: str) -> list:
    """Load type_defs + all part files under a materialized metta dir
    into a list of parsed atoms (the 'space')."""
    atoms = []
    paths = sorted(glob.glob(os.path.join(metta_dir, "**", "*.metta"),
                             recursive=True))
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    atoms.append(parse_sexpr(line))
    return atoms


def match_node_properties(atoms: list, label: str, node_id: str) -> dict:
    """Reference query (a): all properties of ``(label id)``
    (metta_space_import.py:73-77): atoms shaped
    ``(prop (label id) value)``."""
    target = (label, node_id)
    props = {}
    for a in atoms:
        if (
            isinstance(a, tuple)
            and len(a) == 3
            and a[1] == target
            and isinstance(a[0], str)
        ):
            props[a[0]] = a[2]
    return props


def match_edges(atoms: list, pred: str) -> list[tuple]:
    """All ``(pred (src_t src) (tgt_t tgt))`` edge atoms."""
    out = []
    for a in atoms:
        if (
            isinstance(a, tuple)
            and len(a) == 3
            and a[0] == pred
            and isinstance(a[1], tuple)
            and isinstance(a[2], tuple)
        ):
            out.append(a)
    return out


def match_window(atoms: list, label: str, prop: str, lo: float, hi: float) -> list:
    """Reference query (b) shape: nodes whose numeric property lies in
    [lo, hi] (metta_space_import.py:82-90 window scan)."""
    hits = []
    for a in atoms:
        if (
            isinstance(a, tuple)
            and len(a) == 3
            and a[0] == prop
            and isinstance(a[1], tuple)
            and len(a[1]) == 2
            and a[1][0] == label
        ):
            try:
                v = float(a[2])
            except (TypeError, ValueError):
                continue
            if lo <= v <= hi:
                hits.append(a[1][1])
    return hits
