"""Deterministic synthetic image+caption table generator.

Produces the exact ``input_hint`` schema from BASELINE.json:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``.

Determinism contract (required for checkpoint/resume and the per-row
fidelity invariant): every row is generated from an RNG keyed by
``(seed, row_index)`` (numpy SeedSequence entropy list), so

* any shard ``[start, start+count)`` is reproducible independently of
  how the table is partitioned,
* the ground-truth pixel array and caption of row *i* are re-derivable
  anywhere (the decode-validator actor regenerates them to check
  decoded-pixel allclose / PSNR >= 40 dB / caption equality),
* the expected violation label of every row is recomputable, giving the
  tests an exact per-partition pass/fail matrix oracle.

Skew knobs (exercising the salted-repartition path): ``fmt`` is drawn
from a hot categorical distribution (default 70% jpg / 25% png / 5% raw)
and (w, h) from a few hot size buckets — mirroring the FIXTURES.md F1
spec. A ``drift`` preset regenerates the numeric/categorical columns
with injected shifts for the two-window drift fixtures (F2).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from functools import lru_cache
from typing import Any

import numpy as np
import pyarrow as pa

from . import codecs

# violation codes (FIXTURES.md F1 table)
V_NONE = ""
V_NULL = "V-NULL"
V_RANGE = "V-RANGE"
V_FMT = "V-FMT"
V_CORRUPT = "V-CORRUPT"
V_PSNR = "V-PSNR"
V_DUP = "V-DUP"
V_NEARDUP = "V-NEARDUP"
V_REF = "V-REF"
V_CAP = "V-CAP"

ALL_VIOLATIONS = (
    V_NULL, V_RANGE, V_FMT, V_CORRUPT, V_PSNR, V_DUP, V_NEARDUP, V_REF, V_CAP,
)

_VOCAB = (
    "sunset over the mountain lake with golden light reflecting on calm water "
    "a small red fox crossing snowy field near pine forest during early morning "
    "city skyline at night with neon signs and wet streets after heavy rain "
    "close up of a green leaf with dew drops and soft background blur "
    "an old wooden boat resting on empty beach under cloudy grey sky"
).split()

IMAGE_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
    ]
)


@dataclass(frozen=True)
class SynthConfig:
    """Generator knobs. ``violation_rate`` is the total fraction of rows
    carrying exactly one (uniformly chosen) violation; 0 disables
    injection. ``drift`` shifts distributions for the production window."""

    seed: int = 42
    run: str = "r0"
    size_buckets: tuple[tuple[int, int], ...] = ((32, 32), (48, 32), (64, 64), (96, 64), (128, 128))
    size_probs: tuple[float, ...] = (0.40, 0.25, 0.20, 0.10, 0.05)
    fmt_probs: tuple[float, ...] = (0.05, 0.25, 0.70)  # raw, png, jpg
    caption_tokens: tuple[int, int] = (5, 40)
    jpg_quality: int = 90
    violation_rate: float = 0.0
    drift: bool = False  # production-window preset: shifted dims/caption/fmt

    def effective(self) -> "SynthConfig":
        if not self.drift:
            return self
        # drifted window: hotter large sizes, fmt mix shift, longer captions
        return replace(
            self,
            drift=False,
            size_probs=(0.05, 0.10, 0.25, 0.30, 0.30),
            fmt_probs=(0.20, 0.40, 0.40),
            caption_tokens=(15, 60),
        )


# independent child streams per row aspect, so each ground-truth piece
# (shape, pixels, caption, violation) re-derives WITHOUT generating the
# others — the decode validator regenerates captions cheaply and the
# violation oracle never renders pixels
_STREAM_SHAPE = 0
_STREAM_PIXELS = 1
_STREAM_CAPTION = 2
_STREAM_VIOLATION = 3


def _row_rng(seed: int, row_index: int, stream: int) -> np.random.Generator:
    return np.random.default_rng([seed, row_index, stream])


def image_id_for(run: str, row_index: int) -> str:
    return f"img-{run}-{row_index:012d}"


def parse_row_index(image_id: str, run: str) -> int | None:
    """Recover the row index from a well-formed id; None if malformed
    (e.g. a V-REF ghost id)."""
    prefix = f"img-{run}-"
    if not image_id.startswith(prefix):
        return None
    tail = image_id[len(prefix):]
    return int(tail) if tail.isdigit() else None


def draw_shape_fmt(seed: int, row_index: int, cfg: SynthConfig) -> tuple[int, int, str]:
    """Re-derive row ``row_index``'s (w, h, fmt) draw."""
    eff = cfg.effective()
    return _draw_shape_fmt(_row_rng(seed, row_index, _STREAM_SHAPE), eff)


def ground_truth_pixels(seed: int, row_index: int, cfg: SynthConfig | None = None) -> np.ndarray:
    """Re-derive row ``row_index``'s exact pixel array (h, w, 3) uint8."""
    cfg = cfg or SynthConfig(seed=seed)
    w, h, _fmt = draw_shape_fmt(seed, row_index, cfg)
    return _render(_row_rng(seed, row_index, _STREAM_PIXELS), w, h)


def _draw_shape_fmt(rng: np.random.Generator, cfg: SynthConfig) -> tuple[int, int, str]:
    sizes = cfg.size_buckets
    si = int(rng.choice(len(sizes), p=np.asarray(cfg.size_probs) / np.sum(cfg.size_probs)))
    w, h = sizes[si]
    fi = int(rng.choice(3, p=np.asarray(cfg.fmt_probs) / np.sum(cfg.fmt_probs)))
    return w, h, ("raw", "png", "jpg")[fi]


@lru_cache(maxsize=64)
def _axis01(n: int) -> np.ndarray:
    """Cached linspace(0, 1, n) — _render calls it twice per row and
    the size buckets repeat, so the per-row allocation is pure waste.
    Frozen read-only: a mutation would silently corrupt every later
    render of the same size bucket."""
    arr = np.linspace(0.0, 1.0, n)
    arr.flags.writeable = False
    return arr


def _render(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Smooth gradient + three random-phase sinusoids + seeded noise —
    compressible and PSNR-friendly, yet diverse enough that distinct
    rows' pHashes are far apart (measured pairwise Hamming floor ~10 of
    64, so pHash near-dup detection has no natural false candidates).

    Perf note (round-5 no-cert-rate investigation): this kernel IS the
    honest-decode-rate bottleneck (~1 ms/row: rng.normal ~0.45 ms
    irreducible under the bit-identity contract, sin + broadcasts the
    rest) and the per-channel (h, w) loop is the FASTEST bit-identical
    form measured — fused (h, w, 3) and channel-first (3, h, w)
    variants were 10-50% SLOWER (3-element / strided inner loops).
    Only the linspace is cached; everything else must replay the
    original draw order and IEEE op order to keep every existing
    payload, crc certificate and parity fixture byte-identical."""
    y = _axis01(h)[:, None]
    x = _axis01(w)[None, :]
    base = np.empty((h, w, 3), dtype=np.float64)
    for ch in range(3):
        a, b, c = rng.uniform(0.0, 255.0), rng.uniform(-120.0, 120.0), rng.uniform(-120.0, 120.0)
        fx, fy = rng.uniform(0.5, 8.0), rng.uniform(0.5, 8.0)
        amp = rng.uniform(8.0, 30.0)
        phase = rng.uniform(0.0, 2.0 * np.pi)
        base[:, :, ch] = (
            a + b * x + c * y
            + amp * np.sin(2 * np.pi * (fx * x + fy * y) + phase)
        )
    base += rng.normal(0.0, 2.0, size=base.shape)
    return np.clip(base, 0.0, 255.0).astype(np.uint8)


def ground_truth_caption(seed: int, row_index: int, cfg: SynthConfig | None = None) -> str:
    cfg = (cfg or SynthConfig(seed=seed)).effective()
    return _draw_caption(_row_rng(seed, row_index, _STREAM_CAPTION), cfg)


def _draw_caption(rng: np.random.Generator, cfg: SynthConfig) -> str:
    lo, hi = cfg.caption_tokens
    n = int(rng.integers(lo, hi + 1))
    idx = rng.integers(0, len(_VOCAB), size=n)
    return " ".join(_VOCAB[i] for i in idx)


def _violation_for(rng: np.random.Generator, cfg: SynthConfig) -> str:
    if cfg.violation_rate <= 0.0:
        return V_NONE
    if rng.random() >= cfg.violation_rate:
        return V_NONE
    return ALL_VIOLATIONS[int(rng.integers(0, len(ALL_VIOLATIONS)))]


def expected_violation(seed: int, row_index: int, cfg: SynthConfig) -> str:
    """Recompute which violation (if any) row ``row_index`` carries — the
    per-row oracle for the pass/fail matrix fixtures."""
    eff = cfg.effective()
    v = _violation_for(_row_rng(seed, row_index, _STREAM_VIOLATION), eff)
    if v in (V_DUP, V_NEARDUP) and row_index == 0:
        return V_NONE
    return v


def anchor_row(seed: int, cfg: SynthConfig, row_index: int, avoid: tuple[str, ...]) -> int:
    """Nearest previous row whose own violation is not in ``avoid`` — the
    stable partner for V-DUP (needs a row keeping its canonical id) and
    V-NEARDUP (needs a row keeping its canonical pixels/phash). Stateless:
    derived purely from (seed, cfg), so any shard resolves it identically."""
    j = row_index - 1
    while j > 0 and expected_violation(seed, j, cfg) in avoid:
        j -= 1
    return j


def make_batch(
    start: int,
    count: int,
    cfg: SynthConfig | None = None,
    with_truth: bool = False,
    with_ref_truth: bool = False,
) -> pa.Table:
    """Generate rows [start, start+count) as an Arrow table in the
    input_hint schema (+ a ``truth_violation`` column when asked).

    ``with_ref_truth`` additionally emits per-row SOURCE-CERTIFIED
    reference columns — the ingest-time pattern a 100 TB pipeline uses
    when a second pixel copy is unaffordable:

    * ``ref_row``      — the row's true index (detects forged ids),
    * ``ref_caption``  — ground-truth caption,
    * ``ref_dec_crc``  — crc32 of the CANONICAL decoded raster
      (-1 when the canonical payload is undecodable),
    * ``ref_psnr``     — psnr(ground-truth pixels, canonical decode),
      computed here on the full arrays with codecs.psnr (inf = pixel
      equality, NaN = shape mismatch/undecodable).

    Parquet is columnar, so the ~50 B/row cost is pruned by every
    reader except the decode validator, which verifies the decoded
    raster against ``ref_dec_crc`` and reuses the certified fidelity
    metrics — bit-identical flags and psnr values to the seeded
    re-render (the re-render was ~55% of decode-stage CPU; it remains
    the fallback whenever a guard mismatches and for inputs without
    reference columns, equivalence verified by
    tests/test_ray_validate.py)."""
    import zlib

    cfg = cfg or SynthConfig()
    eff = cfg.effective()
    ids: list[str | None] = []
    blobs: list[bytes | None] = []
    ws: list[int] = []
    hs: list[int] = []
    fmts: list[str] = []
    caps: list[str | None] = []
    hashes: list[int] = []
    truths: list[str] = []
    ref_rows: list[int] = []
    ref_crcs: list[int] = []
    ref_psnrs: list[float] = []
    ref_caps: list[str] = []

    for row in range(start, start + count):
        rng = _row_rng(cfg.seed, row, _STREAM_PIXELS)
        w, h, fmt = _draw_shape_fmt(_row_rng(cfg.seed, row, _STREAM_SHAPE), eff)
        img = _render(rng, w, h)
        caption = _draw_caption(_row_rng(cfg.seed, row, _STREAM_CAPTION), eff)
        violation = expected_violation(cfg.seed, row, cfg)
        vrng = _row_rng(cfg.seed, row, _STREAM_VIOLATION + 10)  # injection detail draws

        image_id: str | None = image_id_for(cfg.run, row)
        blob: bytes | None = codecs.encode(img, fmt, eff.jpg_quality)
        ph = int(codecs.phash64(img))
        cap: str | None = caption
        w_out, h_out = w, h

        if violation == V_NULL:
            cap = None
        elif violation == V_RANGE:
            w_out = -w if vrng.random() < 0.5 else w + 3
        elif violation == V_FMT:
            fmt = "bmp"
        elif violation == V_CORRUPT:
            blob = blob[: max(4, len(blob) // 2)]
        elif violation == V_PSNR:
            # posterize to 24-level steps before the lossy encode: PSNR vs
            # ground truth ~31 dB regardless of image size — deterministic
            # violation of the >= 40 dB invariant
            fmt = "jpg"
            degraded = ((img.astype(np.int16) // 24) * 24).astype(np.uint8)
            blob = codecs.encode(degraded, "jpg", quality=eff.jpg_quality)
        elif violation == V_DUP and row > 0:
            image_id = image_id_for(
                cfg.run, anchor_row(cfg.seed, cfg, row, (V_DUP, V_REF))
            )
        elif violation == V_NEARDUP and row > 0:
            # near-identical pixels to the anchor row: tiny perturbation
            prev = ground_truth_pixels(
                cfg.seed, anchor_row(cfg.seed, cfg, row, (V_NEARDUP,)), cfg
            )
            noisy = np.clip(
                prev.astype(np.int16) + vrng.integers(-1, 2, size=prev.shape),
                0, 255,
            ).astype(np.uint8)
            h_out, w_out = noisy.shape[0], noisy.shape[1]
            blob = codecs.encode(noisy, fmt if fmt in codecs.FORMATS else "png", eff.jpg_quality)
            ph = int(codecs.phash64(noisy))
        elif violation == V_REF:
            image_id = f"ghost-{cfg.run}-{row:012d}"
        elif violation == V_CAP:
            cap = caption + " extra"

        ids.append(image_id)
        blobs.append(blob)
        ws.append(int(w_out))
        hs.append(int(h_out))
        fmts.append(fmt)
        caps.append(cap)
        hashes.append(ph)
        truths.append(violation)
        if with_ref_truth:
            # certify against the row's OWN ground truth (img); ref_row
            # lets the validator detect forged-id rows (V-DUP), whose
            # truth is keyed by the CLAIMED id, and fall back to the
            # seeded re-render for them
            ref_rows.append(row)
            ref_caps.append(caption)
            dec = None
            if blob is not None and fmt in codecs.FORMATS:
                try:
                    dec = codecs.decode(blob, fmt)
                except codecs.CodecError:
                    dec = None
            if dec is None:
                ref_crcs.append(-1)
                ref_psnrs.append(float("nan"))
            else:
                ref_crcs.append(zlib.crc32(dec.tobytes()))
                ref_psnrs.append(
                    codecs.psnr(img, dec) if img.shape == dec.shape
                    else float("nan"))

    cols: dict[str, Any] = {
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(hashes, pa.int64()),
    }
    if with_truth:
        cols["truth_violation"] = pa.array(truths, pa.string())
    if with_ref_truth:
        cols["ref_row"] = pa.array(ref_rows, pa.int64())
        cols["ref_dec_crc"] = pa.array(ref_crcs, pa.int64())
        cols["ref_psnr"] = pa.array(ref_psnrs, pa.float64())
        cols["ref_caption"] = pa.array(ref_caps, pa.string())
    return pa.table(cols)


def write_sharded(
    out_dir: str,
    total_rows: int,
    rows_per_shard: int = 10_000,
    cfg: SynthConfig | None = None,
) -> list[str]:
    """Write the table as one parquet file per shard (partition-addressed
    layout: ``shard=<k>/part.parquet``) — the resumable-output layout the
    checkpoint stage expects. Driver-side helper for tests; the scalable
    path is synthesize_dataset() in pipelines/flagship.py (Ray tasks)."""
    import os

    import pyarrow.parquet as pq

    cfg = cfg or SynthConfig()
    paths = []
    for shard, start in enumerate(range(0, total_rows, rows_per_shard)):
        count = min(rows_per_shard, total_rows - start)
        d = os.path.join(out_dir, f"shard={shard}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part.parquet")
        pq.write_table(make_batch(start, count, cfg, with_ref_truth=True), path)
        paths.append(path)
    return paths
