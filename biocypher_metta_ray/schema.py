"""Declarative schema registry: YAML type hierarchy -> validation + rendering.

Reimplements (Ray-side, BioCypher-free) what the reference derives from
``config/schema_config.yaml`` through BioCypher:

- type hierarchy lines for ``type_defs.metta``
  (/root/reference/biocypher_metta/metta_writer.py:28-45) — a type with
  no (known) parent renders ``(: T Type)``, otherwise ``(<: T PARENT)``
  where PARENT is the immediate ``is_a`` ancestor (the reference takes
  the last node of a depth-2 DFS preorder, metta_writer.py:185-189,
  which is exactly the immediate parent);
- data constructors and the ``edge_node_types`` lookup used to render
  edge endpoint types and ``output_label`` substitutions
  (metta_writer.py:47-88,135-144);
- label validation: rows whose label is not declared are dropped and
  counted (the reference crashes on unknown edge labels via the
  ``edge_node_types`` KeyError; we make the drop explicit).

The registry is a small plain-Python object — load it once per worker
(actor ``__init__``) or broadcast it; it is picklable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import yaml

DEFAULT_SCHEMA_PATH = Path(__file__).parent / "config" / "schema.yaml"

# The public Biolink-model core chain above typical schema roots
# (https://biolink.github.io/biolink-model/ — entity is the root;
# named thing and association hang directly off it). The reference
# gets these "extra" ancestors implicitly from BioCypher's biolink
# ontology graph; pass this map to ``hierarchy_lines`` for parity.
# The round-5 full schema port references four more external parents
# ("ontology class", "biological process", "related to at
# instance/concept level", "gene ontology") — they resolve here with
# their public-Biolink placement (compressed to the nearest ancestor
# already in the chain).
BIOLINK_CORE_PARENTS: dict[str, str | None] = {
    "entity": None,
    "named thing": "entity",
    "association": "entity",
    "ontology class": None,
    "biological process": "biological entity",
    "related to": "association",
    "related to at instance level": "related to",
    "related to at concept level": "related to",
    "gene ontology": "ontology class",
}


def convert_input_labels(label: str, replace_char: str = "_") -> str:
    """Spaces -> underscores (reference metta_writer.py:176-183)."""
    return label.replace(" ", replace_char)


def _first(v):
    return v[0] if isinstance(v, list) else v


@dataclass
class EdgeType:
    type_name: str          # schema key, e.g. "enhancer to gene association"
    input_label: str        # e.g. "enhancer_gene" (lowercased key)
    source: str             # lowercased underscore type, e.g. "enhancer"
    target: str
    output_label: str | None  # e.g. "regulates"
    properties: dict = field(default_factory=dict)

    @property
    def render_label(self) -> str:
        return self.output_label if self.output_label is not None else self.input_label


@dataclass
class NodeType:
    type_name: str
    input_label: str
    properties: dict = field(default_factory=dict)


class SchemaRegistry:
    """Parsed schema: node/edge label maps + type hierarchy."""

    def __init__(self, schema_path: str | Path = DEFAULT_SCHEMA_PATH):
        self.schema_path = str(schema_path)
        with open(schema_path) as f:
            raw = yaml.safe_load(f)
        self._raw = raw
        self.nodes: dict[str, NodeType] = {}
        self.edges: dict[str, EdgeType] = {}
        self.parents: dict[str, str | None] = {}

        for key, v in raw.items():
            if not isinstance(v, dict) or "represented_as" not in v:
                continue
            parent = v.get("is_a")
            self.parents[key] = _first(parent) if parent is not None else None
            if v["represented_as"] == "edge":
                label = convert_input_labels(_first(v["input_label"])).lower()
                source = v.get("source")
                target = v.get("target")
                if source is None or target is None:
                    continue
                out_label = v.get("output_label")
                self.edges[label] = EdgeType(
                    type_name=key,
                    input_label=label,
                    source=convert_input_labels(_first(source)).lower(),
                    target=convert_input_labels(_first(target)).lower(),
                    output_label=out_label.lower() if out_label else None,
                    properties=v.get("properties", {}) or {},
                )
            else:
                labels = v["input_label"]
                if not isinstance(labels, list):
                    labels = [labels]
                for lab in labels:
                    lab = convert_input_labels(lab)
                    self.nodes[lab.lower()] = NodeType(
                        type_name=key, input_label=lab.lower(),
                        properties=v.get("properties", {}) or {},
                    )

    # -- validation ---------------------------------------------------------

    def is_node_label(self, label: str) -> bool:
        return label.lower() in self.nodes

    def is_edge_label(self, label: str) -> bool:
        return label.lower() in self.edges

    def edge_node_types(self) -> dict[str, dict]:
        """Same shape as the reference's lookup (metta_writer.py:76-77)."""
        return {
            lab: {"source": e.source, "target": e.target,
                  "output_label": e.output_label}
            for lab, e in self.edges.items()
        }

    # -- type_defs rendering -------------------------------------------------

    def hierarchy_lines(
        self, ontology_parents: dict[str, str | None] | None = None
    ) -> list[str]:
        """``(: T Type)`` / ``(<: T PARENT)`` lines, schema order
        (reference metta_writer.py:28-45; "mixin" types skipped).

        ``ontology_parents`` extends the hierarchy ABOVE the schema
        roots the way the reference's BioCypher/biolink NX ontology
        does (metta_writer.py:31-42 walks every ontology node, so
        ancestors like ``entity`` appear even though no adapter emits
        them): ontology-only types render first (insertion order,
        roots first), and a schema type without an ``is_a`` picks up
        its ontology parent. Pass :data:`BIOLINK_CORE_PARENTS` for the
        public Biolink chain, or a map derived from an OWL file's
        subclass edges.
        """
        lines = []
        onto = ontology_parents or {}
        for key, parent in onto.items():
            if "mixin" in key or key in self.parents:
                continue
            node = convert_input_labels(key)
            if parent is None:
                lines.append(f"(: {node.upper()} Type)")
            else:
                lines.append(
                    f"(<: {node.upper()} {convert_input_labels(parent).upper()})"
                )
        for key in self._raw:
            if "mixin" in key:
                continue
            if key not in self.parents:
                continue
            parent = self.parents[key]
            if parent is None:
                parent = onto.get(key)
            node = convert_input_labels(key)
            if parent is None:
                lines.append(f"(: {node.upper()} Type)")
            else:
                lines.append(f"(<: {node.upper()} {convert_input_labels(parent).upper()})")
        return lines

    def data_constructor_lines(self) -> list[str]:
        """Data constructors (reference metta_writer.py:47-88), schema order."""
        lines = []
        for key, v in self._raw.items():
            if not isinstance(v, dict) or "represented_as" not in v:
                continue
            if v["represented_as"] == "edge":
                source = v.get("source")
                target = v.get("target")
                if source is None or target is None:
                    continue
                edge_type = convert_input_labels(key)
                label = convert_input_labels(_first(v["input_label"]))
                st = convert_input_labels(_first(source))
                tt = convert_input_labels(_first(target))
                lines.append(
                    f"(: {label.lower()} (-> {st.upper()} {tt.upper()} {edge_type.upper()}))"
                )
            else:
                labels = v["input_label"]
                if not isinstance(labels, list):
                    labels = [labels]
                node_type = convert_input_labels(key)
                for lab in labels:
                    lab = convert_input_labels(lab)
                    lines.append(f"(: {lab.lower()} (-> $x {node_type.upper()}))")
        return lines

    def type_defs_text(
        self, ontology_parents: dict[str, str | None] | None = None
    ) -> str:
        """Full ``type_defs.metta`` content (hierarchy + constructors)."""
        return "\n".join(
            self.hierarchy_lines(ontology_parents)
            + self.data_constructor_lines()
        ) + "\n"


def ontology_parents_from_edges(
    subclass_edges, key_to_name=None
) -> dict[str, str | None]:
    """(subj, pred, obj) subclass edges (e.g. sources/owl.py's
    ``ontology_edges`` output, or any parsed ontology) -> a
    child -> parent map usable as ``hierarchy_lines(ontology_parents)``.
    Multi-parent terms keep the min parent (deterministic); roots
    (terms never appearing as a subject) map to None."""
    if hasattr(subclass_edges, "to_pandas"):
        subclass_edges = subclass_edges.to_pandas()
    df = subclass_edges
    df = df[df["pred"] == "subclass"]
    rename = key_to_name or (lambda k: k)
    parents: dict[str, str | None] = {}
    for s, o in sorted(zip(df["subj"], df["obj"])):
        parents.setdefault(rename(s), rename(o))
    for o in df["obj"]:
        parents.setdefault(rename(o), None)
    return parents
