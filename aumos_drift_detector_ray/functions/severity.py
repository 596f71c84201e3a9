"""Severity mapping, detection/alert/event row builders.

Reproduces the reference's alerting semantics as *row constructors* for
output Datasets instead of ORM writes + Kafka publishes:

* severity rule — core/services.py:40-68 verbatim semantics,
* detection rows — shaped like the ``drf_detections`` ORM model
  (core/models.py:110-147),
* alert rows — shaped like ``drf_alerts`` (core/models.py:186-221),
* event rows — payload fields of the Kafka publisher
  (adapters/kafka.py:78-156: drift.detected / drift.alert_raised /
  drift.retraining_required),
* alert dedup fingerprint — sha256(rule:scope:metric)[:16]
  (adapters/alert_system.py:651-668).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

CONCEPT_TESTS = ("adwin", "ddm", "eddm")

# Tests whose score is a p-value (drift when score < threshold); everything
# else drifts when score exceeds its threshold (retrain_trigger.py:239-244).
P_VALUE_TESTS = ("ks", "chi2", "anderson_darling")


def compute_severity(score: float, threshold: float, test_name: str) -> str:
    """'info' | 'warning' | 'critical' per core/services.py:40-68:
    concept tests are always critical; PSI escalates at 1.5x / 2x the
    threshold; p-value tests escalate as p falls below 0.5x / 0.1x."""
    if test_name in CONCEPT_TESTS:
        return "critical"
    if test_name == "psi":
        if score > threshold * 2:
            return "critical"
        if score > threshold * 1.5:
            return "warning"
        return "info"
    if score < threshold * 0.1:
        return "critical"
    if score < threshold * 0.5:
        return "warning"
    return "info"


def is_drifted(score: float, threshold: float, test_name: str) -> bool:
    """Drift verdict direction by test family: p-value tests fire below
    the threshold (ks_test.py:139, chi_squared.py:168); score tests fire
    at/above it (psi.py:181 uses >=, the GAP-166 tests use >)."""
    if test_name in P_VALUE_TESTS:
        return score < threshold
    if test_name == "psi":
        return score >= threshold
    return score > threshold


def detection_row(
    run_id: str,
    partition_id: int,
    feature: str,
    test_name: str,
    score: float,
    threshold: float,
    drifted: bool,
    details: dict[str, Any] | None = None,
    detected_at: str = "",
) -> dict[str, Any]:
    """One row of the ``detections`` output table (fields mirror
    core/models.py:110-147: monitor scope → (run_id, partition_id),
    JSONB details → JSON string column)."""
    return {
        "run_id": run_id,
        "partition_id": int(partition_id),
        "feature": feature,
        "test_name": test_name,
        "score": float(score),
        "threshold": float(threshold),
        "is_drifted": bool(drifted),
        "severity": compute_severity(score, threshold, test_name),
        "details": json.dumps(details or {}, sort_keys=True, default=str),
        "detected_at": detected_at,
    }


def alert_fingerprint(rule_id: str, scope: str, metric: str) -> str:
    """sha256('{rule}:{scope}:{metric}')[:16] — alert_system.py:667-668."""
    return hashlib.sha256(f"{rule_id}:{scope}:{metric}".encode()).hexdigest()[:16]


def alert_row(
    run_id: str,
    partition_id: int,
    feature: str,
    test_name: str,
    score: float,
    threshold: float,
    detected_at: str = "",
) -> dict[str, Any]:
    """One row of the ``alerts`` output table (core/models.py:186-221
    fields; message template mirrors core/services.py:328-331)."""
    severity = compute_severity(score, threshold, test_name)
    return {
        "run_id": run_id,
        "partition_id": int(partition_id),
        "feature": feature,
        "test_name": test_name,
        "severity": severity,
        "score": float(score),
        "threshold": float(threshold),
        "message": (
            f"Drift detected on feature '{feature}' by {test_name}: "
            f"score={score:.6g} vs threshold={threshold:.6g} ({severity})"
        ),
        "fingerprint": alert_fingerprint(test_name, f"{run_id}:{partition_id}", feature),
        "acknowledged": False,
        "created_at": detected_at,
    }


def event_row(
    event_type: str,
    run_id: str,
    partition_id: int,
    feature: str,
    test_name: str,
    score: float,
    threshold: float,
    drifted: bool,
    detected_at: str = "",
) -> dict[str, Any]:
    """One row of the ``events`` output table standing in for a Kafka
    publish; field set per adapters/kafka.py:78-156 payloads. Valid
    event types: drift.detected, drift.alert_raised,
    drift.retraining_required (kafka.py:19-21)."""
    return {
        "event_type": event_type,
        "run_id": run_id,
        "partition_id": int(partition_id),
        "feature": feature,
        "test_name": test_name,
        "score": float(score),
        "threshold": float(threshold),
        "is_drifted": bool(drifted),
        "timestamp": detected_at,
    }


def rows_for_score(
    run_id: str,
    partition_id: int,
    feature: str,
    test_name: str,
    score: float,
    threshold: float,
    details: dict[str, Any] | None = None,
    detected_at: str = "",
    retraining_enabled: bool = True,
) -> tuple[dict[str, Any], list[dict[str, Any]], list[dict[str, Any]]]:
    """Full record-detection flow for one score, mirroring
    DriftDetectionService.record_detection (core/services.py:265-370):
    always a detection row + a drift.detected event; when drifted, also
    an alert row + drift.alert_raised, and (if enabled) a
    drift.retraining_required event.

    Returns (detection, alerts, events)."""
    drifted = is_drifted(score, threshold, test_name)
    det = detection_row(
        run_id, partition_id, feature, test_name, score, threshold, drifted,
        details, detected_at,
    )
    events = [
        event_row("drift.detected", run_id, partition_id, feature, test_name,
                  score, threshold, drifted, detected_at)
    ]
    alerts: list[dict[str, Any]] = []
    if drifted:
        alerts.append(alert_row(run_id, partition_id, feature, test_name,
                                score, threshold, detected_at))
        events.append(event_row("drift.alert_raised", run_id, partition_id,
                                feature, test_name, score, threshold, drifted,
                                detected_at))
        if retraining_enabled:
            events.append(event_row("drift.retraining_required", run_id,
                                    partition_id, feature, test_name, score,
                                    threshold, drifted, detected_at))
    return det, alerts, events
