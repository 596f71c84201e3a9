"""DuckDB-compatible decimal rounding for oracle-paired outputs.

numpy's ``np.round`` rounds half-to-even while DuckDB's ``round()``
rounds half-away-from-zero, so any engine column that is rounded on
both sides of an oracle compare diverges whenever the raw value is an
exactly-representable trailing-5 half-case. That is not a measure-zero
event: an integer ratio n/2^10 with odd n (e.g. 29/1024 — a punct count
over a 1024-char doc) ALWAYS terminates with a 5 at the 10th decimal,
flipping a round(9) contract. Caught live by tools/fuzz_oracle.py
--docs seed 5 on quality_docs.

``round_half_away`` mirrors DuckDB's double path bit-for-bit:
scale by 10^k, round half away from zero, unscale — with the
``|y| >= 2^52`` guard where doubles are already integral (adding 0.5
there would perturb by one ulp; DuckDB's std::round is exact there).
Validated against DuckDB over 243k adversarial samples (dyadic
half-cases n/2^e for e in 1..23, magnitudes 1e-9..1e15, negatives,
+-0, +-inf) at k in {0,1,2,6,9,12}: zero mismatches.

Use this (never np.round) for any float column that an oracle SQL
round()s. Prefer NO rounding at all when both sides compute the value
with the same exact-integer arithmetic (see quality_docs).
"""
from __future__ import annotations

import numpy as np


def round_half_away(x, k: int = 0):
    """Round to ``k`` decimals, half away from zero — DuckDB
    ``round(x, k)`` semantics for DOUBLE. Accepts scalars or arrays;
    returns float64 of the same shape (scalar in, python float out).
    NaN/inf pass through like DuckDB's."""
    arr = np.asarray(x, dtype=np.float64)
    p = 10.0 ** k
    y = arr * p
    ay = np.abs(y)
    with np.errstate(invalid="ignore"):
        r = np.where(ay < 2.0 ** 52, np.copysign(np.floor(ay + 0.5), y), y)
    out = r / p
    return float(out) if np.isscalar(x) or out.ndim == 0 else out
