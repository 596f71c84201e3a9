"""Streaming concept-drift detectors: ADWIN, DDM, EDDM.

Re-implementations (from the published algorithms, decision-compatible
with the reference adapters) of:

* ADWIN — Bifet & Gavalda 2007, "Learning from time-changing data with
  adaptive windowing" (reference: adapters/concept_drift/adwin.py:96-343;
  exponential histogram, eps_cut = sqrt(ln(4W/delta) / (2W)), drop the
  old window portion on drift).
* DDM — Gama et al. 2004 (reference: adapters/concept_drift/ddm.py:92-231;
  warning at p+s >= p_min + 2 s_min, drift at >= p_min + 3 s_min,
  auto-reset, min 30 samples).
* EDDM — Baena-Garcia et al. 2006 (reference: ddm.py:234-380; inter-error
  distance Welford stats, ratio (p'+2s')^2 / max < 0.95 warning /
  0.90 drift, min 30 errors, errors are values >= 0.5).

In the Ray engine these run inside a ``concurrency=1`` actor over a
sequence-sorted Dataset (see stages/concept.py) — the reference's
implicit arrival order (adwin.py:159) becomes an explicit sort key.
State snapshots (``get_state``) are written into the metrics/lineage
output so a resumed run can continue a stream mid-way.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from enum import Enum
from typing import Any

import numpy as np


class DriftLevel(str, Enum):
    NORMAL = "normal"
    WARNING = "warning"
    DRIFT = "drift"


class _Snapshotable:
    """Checkpoint/resume surface shared by the streaming detectors.

    ``snapshot()`` captures the FULL internal state (unlike
    ``get_state()``, the reference-parity summary dict) so an
    interrupted ordered stream can continue mid-way with bit-identical
    future behavior (reference capability: adwin.py:48-78 AdwinState);
    ``restore()`` reinstates it. All detector attributes are plain
    picklable python values."""

    def snapshot(self) -> dict[str, Any]:
        import copy

        return copy.deepcopy(self.__dict__)

    def restore(self, snap: dict[str, Any]) -> "Any":
        import copy

        self.__dict__.update(copy.deepcopy(snap))
        return self


# ---------------------------------------------------------------------------
# ADWIN
# ---------------------------------------------------------------------------

class AdwinDetector(_Snapshotable):
    """ADaptive WINdowing with an exponential-histogram window.

    Buckets are stored newest-last per level as parallel (total, size)
    arrays; level i buckets summarize 2^i items. Memory O(max_buckets *
    log n). ``update`` inserts one value, compresses overflowing levels,
    and evaluates every sub-window split against epsilon_cut.
    """

    def __init__(self, delta: float = 0.002, max_buckets: int = 5) -> None:
        if not (0.0 < delta < 1.0):
            raise ValueError(f"delta must be in (0, 1), got {delta}")
        self.delta = delta
        self.max_buckets = max_buckets
        self.reset()

    def reset(self) -> None:
        # per level: list of (total, size) tuples, oldest first
        self._levels: list[list[tuple[float, int]]] = [[]]
        self._sum = 0.0
        self._count = 0
        self._updates = 0
        self._drift_now = False

    @property
    def width(self) -> int:
        return self._count

    @property
    def mean(self) -> float:
        return self._sum / self._count if self._count else 0.0

    def update(self, value: float) -> None:
        self._updates += 1
        self._drift_now = False
        self._levels[0].append((float(value), 1))
        self._sum += value
        self._count += 1
        self._compress()
        self._drift_now = self._check_drift()

    def update_many(self, values: np.ndarray) -> list[int]:
        """Feed a block of ordered values; returns the (block-relative)
        indices at which drift fired — the batch API used by the actor
        stage so per-element Python overhead stays inside one call."""
        fired = []
        self._fired_sizes = []  # window size AT each firing (batch-invariant)
        for i, v in enumerate(np.asarray(values, dtype=float)):
            self.update(float(v))
            if self._drift_now:
                fired.append(i)
                self._fired_sizes.append(self._count)
        return fired

    def detect(self) -> DriftLevel:
        return DriftLevel.DRIFT if self._drift_now else DriftLevel.NORMAL

    def get_state(self) -> dict[str, Any]:
        return {
            "detector": "adwin",
            "drift_detected": self._drift_now,
            "window_size": self._count,
            "window_mean": self.mean,
            "total_updates": self._updates,
            "delta": self.delta,
        }

    def _compress(self) -> None:
        level = 0
        while level < len(self._levels):
            if len(self._levels[level]) > self.max_buckets:
                if level + 1 == len(self._levels):
                    self._levels.append([])
                (t0, s0), (t1, s1) = self._levels[level][0], self._levels[level][1]
                del self._levels[level][:2]
                self._levels[level + 1].append((t0 + t1, s0 + s1))
            level += 1

    def _check_drift(self) -> bool:
        w = self._count
        if w < 2:
            return False
        eps = math.sqrt(math.log(4.0 * w / self.delta) / (2.0 * w))
        recent_sum = 0.0
        recent_n = 0
        for level in range(len(self._levels)):
            for total, size in reversed(self._levels[level]):
                recent_sum += total
                recent_n += size
                old_n = w - recent_n
                if old_n <= 0:
                    continue
                old_sum = self._sum - recent_sum
                if abs(recent_sum / recent_n - old_sum / old_n) >= eps:
                    self._shrink_to(recent_n, recent_sum)
                    return True
        return False

    def _shrink_to(self, keep_n: int, keep_sum: float) -> None:
        """Drop the oldest (width - keep_n) elements, oldest levels first."""
        drop = self._count - keep_n
        for level in range(len(self._levels) - 1, -1, -1):
            lvl = self._levels[level]
            while lvl and drop > 0:
                total, size = lvl[0]
                if size <= drop:
                    drop -= size
                    lvl.pop(0)
                else:
                    frac = drop / size
                    lvl[0] = (total * (1.0 - frac), size - drop)
                    drop = 0
        self._sum = keep_sum
        self._count = keep_n


# ---------------------------------------------------------------------------
# DDM
# ---------------------------------------------------------------------------

class DdmDetector(_Snapshotable):
    """Drift Detection Method over a Bernoulli error stream.

    Deviation note: the reference's ``_reset_state`` (ddm.py:140-148)
    also resets ``_level``, so its ``detect()`` can never observe DRIFT
    (verified by running its own ``test_high_error_stream_detects_drift``
    against the reference code — it fails). This implementation keeps the
    intended semantics: DRIFT is reported after the triggering update and
    cleared by the next update, with counters reset immediately.
    """

    def __init__(
        self,
        warning_level: float = 2.0,
        drift_level: float = 3.0,
        min_num_instances: int = 30,
    ) -> None:
        if warning_level >= drift_level:
            raise ValueError("warning_level must be < drift_level")
        self.warning_level = warning_level
        self.drift_level = drift_level
        self.min_num_instances = min_num_instances
        self.reset()

    def reset(self) -> None:
        self._reset_counters()
        self._level = DriftLevel.NORMAL

    def _reset_counters(self) -> None:
        self._n = 0
        self._p = 1.0
        self._s = 0.0
        self._p_min = math.inf
        self._s_min = math.inf

    def update(self, error: float) -> None:
        if self._level is DriftLevel.DRIFT:
            self._level = DriftLevel.NORMAL
        self._n += 1
        self._p += (error - self._p) / self._n
        self._s = math.sqrt(max(self._p * (1.0 - self._p), 0.0) / self._n)
        if self._n < self.min_num_instances:
            return
        if self._p + self._s <= self._p_min + self._s_min:
            self._p_min = self._p
            self._s_min = self._s
        if math.isinf(self._p_min):
            return
        metric = self._p + self._s
        if metric >= self._p_min + self.drift_level * self._s_min:
            self._level = DriftLevel.DRIFT
            self._reset_counters()
        elif metric >= self._p_min + self.warning_level * self._s_min:
            self._level = DriftLevel.WARNING
        else:
            self._level = DriftLevel.NORMAL

    def update_many(self, values: np.ndarray) -> list[int]:
        fired = []
        self._fired_sizes = []  # sample count AT each firing (batch-invariant)
        for i, v in enumerate(np.asarray(values, dtype=float)):
            self.update(float(v))
            if self._level is DriftLevel.DRIFT:
                fired.append(i)
                self._fired_sizes.append(self._n)
        return fired

    def detect(self) -> DriftLevel:
        return self._level

    def get_state(self) -> dict[str, Any]:
        return {
            "detector": "ddm",
            "level": self._level.value,
            "n_samples": self._n,
            "error_rate": self._p,
            "min_error_rate": 0.0 if math.isinf(self._p_min) else self._p_min,
            "warning_level": self.warning_level,
            "drift_level": self.drift_level,
        }


# ---------------------------------------------------------------------------
# EDDM
# ---------------------------------------------------------------------------

class EddmDetector(_Snapshotable):
    """Enhanced DDM tracking inter-error distances (gradual drift)."""

    def __init__(
        self,
        warning_level: float = 0.95,
        drift_level: float = 0.90,
        min_num_errors: int = 30,
    ) -> None:
        if drift_level >= warning_level:
            raise ValueError("drift_level must be < warning_level")
        self.warning_level = warning_level
        self.drift_level = drift_level
        self.min_num_errors = min_num_errors
        self.reset()

    def reset(self) -> None:
        self._reset_counters()
        self._level = DriftLevel.NORMAL

    def _reset_counters(self) -> None:
        self._n = 0
        self._n_errors = 0
        self._last_error_at = 0
        self._mean_dist = 0.0
        self._m2_dist = 0.0
        self._max_metric = 0.0

    def update(self, error: float) -> None:
        if self._level is DriftLevel.DRIFT:
            self._level = DriftLevel.NORMAL
        self._n += 1
        if error < 0.5:  # binarize (ddm.py:314)
            return
        self._n_errors += 1
        dist = float(self._n - self._last_error_at)
        self._last_error_at = self._n
        delta = dist - self._mean_dist
        self._mean_dist += delta / self._n_errors
        self._m2_dist += delta * (dist - self._mean_dist)
        if self._n_errors < self.min_num_errors:
            return
        std = math.sqrt(self._m2_dist / self._n_errors) if self._n_errors > 1 else 0.0
        metric = (self._mean_dist + 2.0 * std) ** 2
        if metric > self._max_metric:
            self._max_metric = metric
        if self._max_metric == 0.0:
            return
        ratio = metric / self._max_metric
        if ratio < self.drift_level:
            self._level = DriftLevel.DRIFT
            self._reset_counters()
        elif ratio < self.warning_level:
            self._level = DriftLevel.WARNING
        else:
            self._level = DriftLevel.NORMAL

    def update_many(self, values: np.ndarray) -> list[int]:
        fired = []
        self._fired_sizes = []  # sample count AT each firing (batch-invariant)
        for i, v in enumerate(np.asarray(values, dtype=float)):
            self.update(float(v))
            if self._level is DriftLevel.DRIFT:
                fired.append(i)
                self._fired_sizes.append(self._n)
        return fired

    def detect(self) -> DriftLevel:
        return self._level

    def get_state(self) -> dict[str, Any]:
        return {
            "detector": "eddm",
            "level": self._level.value,
            "n_samples": self._n,
            "n_errors": self._n_errors,
            "mean_distance": self._mean_dist,
            "warning_level": self.warning_level,
            "drift_level": self.drift_level,
        }


@dataclass
class DetectorEvent:
    """One drift firing emitted by the concept-drift actor stage."""

    detector: str
    seq: int
    level: str
    window_size: int
    window_mean: float
