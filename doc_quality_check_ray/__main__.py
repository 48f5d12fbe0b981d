"""CLI runner: ``python -m doc_quality_check_ray --input DIR --out DIR``.

The ``ray job submit`` entry point (SURVEY.md §3.1). Owns its Ray session
(guarded — the library itself never calls ``ray.init``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Transcript validation run")
    ap.add_argument("--input", help="transcript parquet file or dir")
    ap.add_argument("--out", help="output directory")
    ap.add_argument(
        "--verify-equality",
        nargs=2,
        metavar=("OUT_A", "OUT_B"),
        help="compare two completed runs' per-turn text fingerprints and exit",
    )
    ap.add_argument(
        "--curate",
        action="store_true",
        help="run the corpus curation pipeline (gate → dedup → decontaminate) "
        "over a documents parquet dir instead of transcript validation",
    )
    ap.add_argument("--config", help="ValidationConfig JSON")
    ap.add_argument("--snapshot", help="reference stats snapshot for drift")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--report", choices=["txt", "html", "both"], default="txt")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    args = ap.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from .config import DEFAULT_CONFIG, ValidationConfig
        from .pipelines.reports import render_html_report, render_txt_report
        from .pipelines.run import run_validation, verify_text_equality

        cfg = ValidationConfig.from_json(args.config) if args.config else DEFAULT_CONFIG
        if args.verify_equality:
            res = verify_text_equality(*args.verify_equality, cfg)
            print(json.dumps(res, default=str))
            return 0 if res["equal"] else 3
        if not args.input or not args.out:
            ap.error("--input and --out are required (unless --verify-equality)")
        if args.curate:
            from .pipelines.curate import run_curation

            summary = run_curation(args.input, args.out, resume=not args.no_resume)
            print(json.dumps(summary, default=str))
            return 0
        summary = run_validation(
            args.input,
            args.out,
            cfg,
            resume=not args.no_resume,
            snapshot_path=args.snapshot,
        )
        if args.report in ("txt", "both"):
            render_txt_report(args.out)
        if args.report in ("html", "both"):
            render_html_report(args.out)
        print(json.dumps(summary, default=str))
        return 0
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
