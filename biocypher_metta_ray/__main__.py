"""CLI: the create_knowledge_graph.py analogue.

    python -m biocypher_metta_ray build \
        --config extractors.yaml --output-dir /tmp/kg \
        [--schema schema.yaml] [--prolog] [--dry-run]

Owns its Ray session (guarded init; library code never calls
ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="biocypher_metta_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build", help="run configured extractors -> graph")
    b.add_argument("--config", required=True)
    b.add_argument("--output-dir", required=True)
    b.add_argument("--schema", default=None)
    b.add_argument("--prolog", action="store_true")
    b.add_argument("--dry-run", action="store_true")
    b.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **({"num_cpus": args.num_cpus} if args.num_cpus else {}),
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from .pipelines.registry import run_build

    report = run_build(
        args.config,
        args.output_dir,
        schema_path=args.schema,
        prolog=args.prolog,
        dry_run=args.dry_run,
    )
    json.dump(
        {k: v for k, v in report.items() if not isinstance(v, dict)},
        sys.stdout,
    )
    print()
    if owns_session:
        ray.shutdown()


if __name__ == "__main__":
    main()
