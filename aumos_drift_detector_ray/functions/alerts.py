"""Rule-driven alert evaluation and retraining-trigger policy.

Driver-side post-processing over the (small) merged score/metric rows —
the distributed analogue of DriftAlertSystem.evaluate_and_dispatch
(adapters/alert_system.py:267-344) and
RetrainTrigger.evaluate_drift_trigger (adapters/retrain_trigger.py:
197-310). State (last-dispatched per dedup key, last-triggered per
model) lives in run metadata instead of process memory, so cooldowns
survive across resumable runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .severity import alert_fingerprint

P_VALUE_TESTS = ("ks", "chi2", "ks_2samp")


@dataclass(frozen=True)
class AlertRule:
    """Mirror of the reference AlertRule fields that affect evaluation."""

    rule_id: str
    metric: str
    threshold: float
    comparison: str = "gt"  # 'gt' | 'lt'
    severity: str = "warning"
    channel: str = "log"
    cooldown_minutes: int = 60
    scope: str | None = None  # optional monitor/model scope
    enabled: bool = True


@dataclass
class AlertState:
    """Serializable cooldown state: dedup_key → last dispatch time (s)."""

    last_dispatched: dict[str, float] = field(default_factory=dict)


def evaluate_rules(
    rules: list[AlertRule],
    metric_values: dict[str, float],
    scope: str,
    now_s: float,
    state: AlertState,
) -> list[dict[str, Any]]:
    """Evaluate enabled rules; returns alert dicts (status 'pending' or
    'suppressed' under cooldown), mutating ``state`` for fired alerts.
    Dedup key = sha256(rule:scope:metric)[:16] (alert_system.py:651-668)."""
    out: list[dict[str, Any]] = []
    for rule in rules:
        if not rule.enabled:
            continue
        if rule.scope is not None and rule.scope != scope:
            continue
        value = metric_values.get(rule.metric)
        if value is None:
            continue
        crossed = (rule.comparison == "gt" and value > rule.threshold) or (
            rule.comparison == "lt" and value < rule.threshold
        )
        if not crossed:
            continue
        key = alert_fingerprint(rule.rule_id, scope, rule.metric)
        last = state.last_dispatched.get(key)
        suppressed = last is not None and (now_s - last) < rule.cooldown_minutes * 60
        direction = "exceeded" if rule.comparison == "gt" else "fell below"
        alert = {
            "rule_id": rule.rule_id,
            "scope": scope,
            "metric": rule.metric,
            "metric_value": float(value),
            "threshold": rule.threshold,
            "severity": rule.severity,
            "channel": rule.channel,
            "status": "suppressed" if suppressed else "pending",
            "dedup_key": key,
            "message": (
                f"Drift alert [{rule.severity.upper()}]: {rule.metric} {direction} "
                f"threshold {rule.threshold:.4f} (observed {value:.4f}) on {scope}."
            ),
        }
        if not suppressed:
            state.last_dispatched[key] = now_s
        out.append(alert)
    return out


@dataclass(frozen=True)
class RetrainPolicy:
    """Per-model trigger policy (retrain_trigger.py policy fields)."""

    drift_score_threshold: float = 0.2
    cooldown_hours: int = 1
    enabled: bool = True


@dataclass
class RetrainState:
    last_triggered: dict[str, float] = field(default_factory=dict)  # model → time (s)


def evaluate_drift_trigger(
    model_id: str,
    drift_score: float,
    test_name: str,
    policy: RetrainPolicy,
    now_s: float,
    state: RetrainState,
) -> dict[str, Any]:
    """Threshold direction by test family (p-value tests fire BELOW the
    threshold, retrain_trigger.py:239-244), then cooldown, then trigger.
    Outcomes mirror TriggerOutcome values."""
    if not policy.enabled:
        return {"model_id": model_id, "triggered": False,
                "outcome": "suppressed_disabled", "drift_score": drift_score,
                "test_name": test_name}
    crossed = (
        drift_score < policy.drift_score_threshold
        if test_name in P_VALUE_TESTS
        else drift_score > policy.drift_score_threshold
    )
    if not crossed:
        return {"model_id": model_id, "triggered": False,
                "outcome": "suppressed_threshold", "drift_score": drift_score,
                "test_name": test_name}
    last = state.last_triggered.get(model_id)
    if last is not None and (now_s - last) < policy.cooldown_hours * 3600:
        return {"model_id": model_id, "triggered": False,
                "outcome": "suppressed_cooldown", "drift_score": drift_score,
                "test_name": test_name}
    state.last_triggered[model_id] = now_s
    return {"model_id": model_id, "triggered": True, "outcome": "triggered",
            "drift_score": drift_score, "test_name": test_name,
            "event_type": "drift.retraining_required"}


# ---------------------------------------------------------------------------
# alert lifecycle / monitor status transitions (core/services.py control
# plane: _VALID_STATUS_TRANSITIONS services.py:33-37, acknowledge_alert
# services.py:455-497 — NotFound / already-acknowledged conflicts)
# ---------------------------------------------------------------------------

VALID_STATUS_TRANSITIONS: dict[str, tuple[str, ...]] = {
    "active": ("paused", "disabled"),
    "paused": ("active", "disabled"),
    "disabled": ("active",),
}


class TransitionConflict(ValueError):
    """Raised for an invalid monitor status transition or a duplicate
    alert acknowledgement (the reference's ConflictError)."""


def validate_status_transition(current: str, new: str) -> str:
    """Monitor status state machine (services.py:199-204): returns the
    new status or raises TransitionConflict."""
    allowed = VALID_STATUS_TRANSITIONS.get(current, ())
    if new not in allowed:
        raise TransitionConflict(
            f"Cannot transition monitor from '{current}' to '{new}'."
        )
    return new


def acknowledge_alerts(
    alerts: "Any",
    alert_ids: "list[str]",
    acknowledged_by: str,
    acknowledged_at: str = "",
    id_col: str = "fingerprint",
) -> "Any":
    """Acknowledge alert rows in an alerts table (pandas frame of the
    engine's alerts output): sets acknowledged / acknowledged_by /
    acknowledged_at (models.py:204-212 fields). Raises
    TransitionConflict for an already-acknowledged alert and KeyError
    for an unknown id — the reference's conflict semantics
    (services.py:473-483). Returns the updated frame (the caller
    rewrites the alerts parquet — idempotent partition-addressed
    output)."""
    import pandas as pd

    df = alerts.copy()
    for col, default in (("acknowledged", False),
                         ("acknowledged_by", None),
                         ("acknowledged_at", None)):
        if col not in df.columns:
            df[col] = default
    for aid in alert_ids:
        mask = df[id_col] == aid
        if not mask.any():
            raise KeyError(f"Drift alert {aid} not found.")
        if bool(df.loc[mask, "acknowledged"].any()):
            raise TransitionConflict(f"Alert {aid} is already acknowledged.")
        df.loc[mask, "acknowledged"] = True
        df.loc[mask, "acknowledged_by"] = acknowledged_by
        df.loc[mask, "acknowledged_at"] = acknowledged_at or pd.Timestamp.utcnow().isoformat()
    return df
