#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline flagship pipeline (synthesize-once
image+caption table → validate+profile both windows → shuffle checks →
drift scoring) plus a representative set of table queries over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1), using
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32).
Prints ONE JSON line:

  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "validated_rows_per_sec": ..., "drift_score_latency_s": ...}

``--scaling``: runs the same headline job twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same input, reports rows/s at both and
the scaling efficiency eff = (rows/s @32) / (4 x rows/s @8), and records
the result in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("BENCH_IMAGE_ROWS", "120000"))
ROWS_PER_SHARD = int(os.environ.get("BENCH_ROWS_PER_SHARD", "1000"))
INPUT_CACHE = os.environ.get("BENCH_INPUT_DIR", "/tmp/aumos_bench_input")


def _init_ray(num_cpus: int) -> None:
    import logging

    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # ray.data INFO execution logs go to stdout; keep stdout to the one
    # JSON line the driver parses
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    logging.getLogger("ray").setLevel(logging.ERROR)
    # warm the worker pool to steady state before any timed section:
    # worker-process spawn (~100 ms each) otherwise lands inside the
    # first job and penalizes the high-cpu level asymmetrically (the
    # cluster-size-N vs 4N comparison is about steady-state throughput,
    # not cold-start)
    ray.data.range(2 * num_cpus, override_num_blocks=2 * num_cpus) \
        .map_batches(lambda b: b, batch_size=None).materialize()


# bump when the synthesized shard layout changes (v3: certified ref columns)
INPUT_SCHEMA_VERSION = "3"


def _ensure_inputs() -> tuple[str, str]:
    """Synthesize (once, cached) the reference and production windows."""
    from aumos_drift_detector_ray import synth
    from aumos_drift_detector_ray.pipelines import flagship as F

    marker = os.path.join(INPUT_CACHE, "schema_version")
    cur = open(marker).read().strip() if os.path.exists(marker) else ""
    if cur != INPUT_SCHEMA_VERSION:
        shutil.rmtree(INPUT_CACHE, ignore_errors=True)
        os.makedirs(INPUT_CACHE, exist_ok=True)
        with open(marker, "w") as f:
            f.write(INPUT_SCHEMA_VERSION)

    ref_dir = os.path.join(INPUT_CACHE, f"ref_{BENCH_ROWS}")
    prod_dir = os.path.join(INPUT_CACHE, f"prod_{BENCH_ROWS}")
    F.synthesize_dataset(ref_dir, BENCH_ROWS, ROWS_PER_SHARD,
                         synth.SynthConfig(seed=42, run="ref"))
    F.synthesize_dataset(prod_dir, BENCH_ROWS, ROWS_PER_SHARD,
                         synth.SynthConfig(seed=43, run="prod",
                                           violation_rate=0.02, drift=True))
    return ref_dir, prod_dir


def run_headline(num_cpus: int) -> dict:
    from aumos_drift_detector_ray import synth
    from aumos_drift_detector_ray.pipelines import flagship as F

    ref_in, prod_in = _ensure_inputs()
    work = tempfile.mkdtemp(prefix="aumos_bench_out_")
    ref_out = os.path.join(work, "ref")
    prod_out = os.path.join(work, "prod")
    # default None = elastic decode task pool (decode state is free to
    # build; a fixed actor pool paid ~1s startup per actor and capped
    # effective parallelism). BENCH_DECODE_CONC=N forces the actor-pool
    # shape with N actors per window for comparison.
    decode_conc = int(os.environ.get("BENCH_DECODE_CONC", "0")) or None
    try:
        # warm the page cache so we measure compute+shuffle, not first read
        from aumos_drift_detector_ray.sources.reader import read_table
        read_table(ref_in).count()
        read_table(prod_in).count()

        t0 = time.time()
        ref_cfg = F.FlagshipConfig(rows=BENCH_ROWS, rows_per_shard=ROWS_PER_SHARD,
                                   synth_cfg=synth.SynthConfig(seed=42, run="ref"),
                                   decode_concurrency=decode_conc)
        prod_cfg = F.FlagshipConfig(rows=BENCH_ROWS, rows_per_shard=ROWS_PER_SHARD,
                                    synth_cfg=synth.SynthConfig(seed=43, run="prod",
                                                                violation_rate=0.02,
                                                                drift=True),
                                    decode_concurrency=decode_conc)
        # A/B measured 2026-08-17: two concurrent per-window jobs beat one
        # combined multi-window job (16-18s vs 29-30s t_validate at 32
        # cpus) - the combined job's single wide writer shuffle and
        # union-fed pool pack worse than two overlapping pipelines
        mode = os.environ.get("BENCH_VALIDATE_MODE", "concurrent")
        if mode == "multi":
            # ONE validation job over both windows: shared decode pool,
            # merged allowlist bloom, single writer shuffle
            F.run_validation_multi(
                [(ref_in, ref_out, ref_cfg), (prod_in, prod_out, prod_cfg)],
                decode_concurrency=decode_conc,
                resume=False,
            )
            t_validate = time.time() - t0
            t1 = time.time()
            F.run_shuffle_checks(prod_out)
            t_shuffle = time.time() - t1
        else:
            from concurrent.futures import ThreadPoolExecutor

            # the prod-window shuffle checks depend only on the prod
            # flags output, so they OVERLAP the still-running ref-window
            # validation instead of waiting for both windows
            with ThreadPoolExecutor(max_workers=2) as pool:
                f1 = pool.submit(F.run_validation, ref_in, ref_out, ref_cfg, False)
                f2 = pool.submit(F.run_validation, prod_in, prod_out, prod_cfg, False)
                f2.result()
                F.run_shuffle_checks(prod_out)
                t_checks_done = time.time() - t0
                f1.result()
                t_validations_done = time.time() - t0
            # honest wall: everything before drift scoring. The segment
            # split is approximate under overlap (checks run while the
            # ref window may still be validating).
            wall_vs = max(t_checks_done, t_validations_done)
            t_validate = t_validations_done
            t_shuffle = wall_vs - t_validations_done

        t2 = time.time()
        F.run_drift(ref_out, prod_out, run_id="bench")
        t_drift = time.time() - t2

        total_rows = 2 * BENCH_ROWS
        return {
            "rows": total_rows,
            "t_validate_s": round(t_validate, 3),
            "t_shuffle_checks_s": round(t_shuffle, 3),
            "t_drift_s": round(t_drift, 3),
            "t_total_s": round(t_validate + t_shuffle + t_drift, 3),
            "validated_rows_per_sec": round(total_rows / (t_validate + t_shuffle), 1),
            "drift_score_latency_s": round(t_drift, 3),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_queries() -> dict[str, float]:
    import __ray_entry__ as E

    names = [
        "q1_pricing_summary", "events_by_type", "distinct_users_per_type",
        "hourly_event_counts", "orders_per_segment", "profile_lineitem",
        "psi_events_value", "ks_events_value", "chi2_events_type",
        "ann_topk_embeddings", "minhash_dedup_docs", "doc_token_stats",
        "concept_adwin_events",
        # round-2 operators
        "anderson_darling_events", "lineitem_price_quantiles",
        "value_quantiles_per_type", "sliding_4h_event_stats",
        "events_value_band_counts", "exact_dup_docs", "user_session_stats",
        "curated_training_split",
        # round-3 operators
        "verified_neardup_pairs", "label_cosine_pairs", "bpe_token_stats",
        "media_feature_stats",
    ]
    qs = E.queries()
    out = {}
    for name in names:
        t0 = time.time()
        qs[name](SF_DIR)
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    _init_ray(NCPU)
    headline = run_headline(NCPU)
    queries = {} if os.environ.get("BENCH_SKIP_QUERIES") else run_queries()
    result = {
        "metric": "flagship validate+profile+score wall time "
                  f"({headline['rows']} image rows) + per-query secs at {SF_DIR}",
        "value": headline["t_total_s"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        **headline,
    }
    import ray

    ray.shutdown()
    print(json.dumps(result))


def scaling() -> None:
    # the efficiency ratio amplifies run-to-run noise (~±10% per level on
    # this shared sandbox), so report the MEDIAN of `repeats` runs per
    # parallelism level rather than a single draw
    repeats = int(os.environ.get("BENCH_SCALING_REPEATS", "5"))
    results = {}
    for ncpu in (8, 32):
        runs = []
        for _ in range(repeats):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       BENCH_SKIP_QUERIES="1")
            out = subprocess.run([sys.executable, __file__], env=env,
                                 capture_output=True, text=True, check=True).stdout
            runs.append(json.loads(out.strip().splitlines()[-1]))
        runs.sort(key=lambda r: r["t_total_s"])
        results[ncpu] = runs[len(runs) // 2]
        results[ncpu]["all_rows_per_sec"] = sorted(
            r["validated_rows_per_sec"] for r in runs
        )
    rps8 = results[8]["validated_rows_per_sec"]
    rps32 = results[32]["validated_rows_per_sec"]
    eff = rps32 / (4.0 * rps8)
    summary = {
        "rows": results[32]["rows"],
        "rows_per_sec_8cpu": rps8,
        "rows_per_sec_32cpu": rps32,
        "scaling_efficiency": round(eff, 3),
        "drift_score_latency_s_32cpu": results[32]["drift_score_latency_s"],
        "t_total_s_8cpu": results[8]["t_total_s"],
        "t_total_s_32cpu": results[32]["t_total_s"],
        "breakdown_8cpu": {k: results[8][k] for k in
                           ("t_validate_s", "t_shuffle_checks_s", "t_drift_s")},
        "breakdown_32cpu": {k: results[32][k] for k in
                            ("t_validate_s", "t_shuffle_checks_s", "t_drift_s")},
        "all_rows_per_sec_8cpu": results[8].get("all_rows_per_sec"),
        "all_rows_per_sec_32cpu": results[32].get("all_rows_per_sec"),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — measured\n\n"
            "Headline: flagship image validate+profile+score pipeline "
            f"({summary['rows']} rows, two windows), same input at two "
            "parallelism levels in fresh processes (sandbox proxy for N vs "
            "4N nodes).\n\n"
            "| metric | value |\n|---|---|\n"
            f"| validated rows/s @ 8 cpus | {rps8} |\n"
            f"| validated rows/s @ 32 cpus | {rps32} |\n"
            f"| scaling efficiency (rps32 / (4 x rps8)) | {summary['scaling_efficiency']} |\n"
            f"| drift-score latency @ 32 cpus (s) | {summary['drift_score_latency_s_32cpu']} |\n"
            f"| total @ 8 cpus (s) | {summary['t_total_s_8cpu']} |\n"
            f"| total @ 32 cpus (s) | {summary['t_total_s_32cpu']} |\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
