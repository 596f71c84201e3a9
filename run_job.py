#!/usr/bin/env python
"""Driver entrypoint for the flagship validation + drift job.

The reference's control plane is a FastAPI service with monitor rows and
a (data-only) cron schedule (main.py:28-77, core/models.py:55-59); the
engine's control plane is this script, submitted via ``ray job submit``
on a cluster (or run directly on a single node):

    python run_job.py --work-dir /data/run1 --rows 100000 \
        --rows-per-shard 1000 --violation-rate 0.02 [--resume] \
        [--report /data/run1/report.html]

It synthesizes (or resumes) the reference and production windows,
validates both (per-partition pass/fail + violations + lineage), runs
the shuffle checks and drift scoring, writes detections/alerts/events,
and optionally renders the self-contained HTML report. Safe to re-run:
completed partitions are skipped via lineage records.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work-dir", required=True)
    p.add_argument("--rows", type=int, default=10_000)
    p.add_argument("--rows-per-shard", type=int, default=1_000)
    p.add_argument("--violation-rate", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: let Ray decide)")
    p.add_argument("--report", default=None, help="write HTML report here")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from aumos_drift_detector_ray.functions.report import generate_html_report
    from aumos_drift_detector_ray.pipelines import flagship as F

    out = F.run_flagship(
        args.work_dir,
        rows=args.rows,
        rows_per_shard=args.rows_per_shard,
        violation_rate=args.violation_rate,
        seed=args.seed,
        resume=not args.no_resume,
    )
    summary = {
        "partitions": int(out["prod_matrix"].partition_id.nunique()),
        "checks": int(out["prod_matrix"].check.nunique()),
        "failed_cells": int((~out["prod_matrix"].passed).sum()),
        "shuffle_checks": out["shuffle_checks"],
        "drift_scores": len(out["drift"]["scores"]),
        "alerts": len(out["drift"]["alerts"]),
        "out_dirs": out["out_dirs"],
    }
    if args.report:
        html = generate_html_report(
            f"flagship-{args.seed}",
            out["drift"]["detections"],
            out["prod_matrix"].to_dict("records"),
        )
        with open(args.report, "w") as f:
            f.write(html)
        summary["report"] = args.report
    print(json.dumps(summary, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
