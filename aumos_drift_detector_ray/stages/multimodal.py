"""Multimodal binary-column stages: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payloads with typed metadata.

Images are fully supported via the in-repo codecs (stages/validate.py).
Audio/video decoding libraries are not available in this environment, so
those decode paths are STUBS: the Ray-side plumbing — schema handling,
actor signature, batch sizing for wide binary rows, output layout — is
real and tested, and each stub either raises ``NotImplementedError``
(``strict=True``) or produces a clearly-labelled deterministic fake
derived from the payload bytes (``strict=False``), so downstream
pipeline shapes can be exercised end-to-end.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

import ray.data

from .. import codecs
from ..sketches import hash_any_array

MODALITIES = ("image", "audio", "video")


class MediaDecoder:
    """Actor-pool decode/feature stage over a binary column.

    Output columns: ``decoded_ok`` (bool), ``media_nbytes`` (int64), and
    per-modality features:

    * image — ``width``/``height``/``mean_pixel`` via the real codecs;
    * audio — ``duration_s``/``rms`` (STUB: deterministic fake from a
      hash of the payload, or NotImplementedError when strict);
    * video — ``n_frames``/``fps`` (STUB, same policy).
    """

    def __init__(self, modality: str, bytes_col: str = "bytes",
                 fmt_col: str | None = "fmt", strict: bool = False) -> None:
        if modality not in MODALITIES:
            raise ValueError(f"unknown modality {modality!r}")
        self.modality = modality
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.strict = strict

    def _fake_scalar(self, blob: bytes, lo: float, hi: float) -> float:
        h = int(hash_any_array([blob[:64].hex()])[0])
        return lo + (h % 10_000) / 10_000.0 * (hi - lo)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = (batch[self.fmt_col].to_pylist()
                if self.fmt_col and self.fmt_col in batch.column_names
                else [None] * len(blobs))
        n = len(blobs)
        ok = np.zeros(n, dtype=bool)
        nbytes = np.zeros(n, dtype=np.int64)
        f1 = np.full(n, np.nan)
        f2 = np.full(n, np.nan)
        f3 = np.full(n, np.nan)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            if blob is None:
                continue
            nbytes[i] = len(blob)
            if self.modality == "image":
                try:
                    img = codecs.decode(blob, fmt or "png")
                    ok[i] = True
                    f1[i] = img.shape[1]
                    f2[i] = img.shape[0]
                    f3[i] = float(img.mean())
                except codecs.CodecError:
                    pass
            else:
                if self.strict:
                    raise NotImplementedError(
                        f"{self.modality} decoding requires codec libraries not "
                        "available in this environment; pass strict=False for a "
                        "deterministic stub"
                    )
                ok[i] = len(blob) >= 8
                if self.modality == "audio":
                    f1[i] = self._fake_scalar(blob, 0.5, 30.0)   # duration_s
                    f2[i] = self._fake_scalar(blob, 0.01, 0.5)   # rms
                else:
                    f1[i] = float(int(self._fake_scalar(blob, 24, 3000)))  # n_frames
                    f2[i] = 24.0 if nbytes[i] % 2 == 0 else 30.0          # fps

        names = {
            "image": ("width", "height", "mean_pixel"),
            "audio": ("duration_s", "rms", "unused"),
            "video": ("n_frames", "fps", "unused"),
        }[self.modality]
        out = batch.append_column("decoded_ok", pa.array(ok)) \
                   .append_column("media_nbytes", pa.array(nbytes, pa.int64())) \
                   .append_column(names[0], pa.array(f1, pa.float64())) \
                   .append_column(names[1], pa.array(f2, pa.float64()))
        if self.modality == "image":
            out = out.append_column(names[2], pa.array(f3, pa.float64()))
        return out


def decode_media(
    ds: ray.data.Dataset,
    modality: str,
    bytes_col: str = "bytes",
    fmt_col: str | None = "fmt",
    strict: bool = False,
    concurrency: Any = (1, 8),
    batch_size: int | None = None,
) -> ray.data.Dataset:
    """Run the decode/feature stage and DROP the binary column after —
    the standard wide-payload discipline (shuffles move scalars only).
    ``batch_size=None`` keeps one task per (small) input block, which is
    how wide binary rows should flow (see stages/validate.py notes)."""
    out = ds.map_batches(
        MediaDecoder,
        fn_constructor_args=(modality, bytes_col, fmt_col, strict),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return out.drop_columns([bytes_col])


class ImageResizer:
    """Actor-pool resize stage (area-average box filter, the same
    dependency-free kernel pHash uses). Re-encodes with the lossless
    in-repo codec; output column replaces the payload."""

    def __init__(self, size: int, bytes_col: str = "bytes",
                 fmt_col: str = "fmt") -> None:
        self.size = size
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out_blobs: list[bytes | None] = []
        for blob, fmt in zip(blobs, fmts):
            if blob is None:
                out_blobs.append(None)
                continue
            try:
                img = codecs.decode(blob, fmt)
            except codecs.CodecError:
                out_blobs.append(None)
                continue
            resized = np.stack(
                [codecs._resize_area(img[:, :, c].astype(np.float64), self.size)
                 for c in range(3)], axis=-1,
            )
            out_blobs.append(codecs.encode(
                np.clip(resized, 0, 255).astype(np.uint8), "png"
            ))
        idx = batch.column_names.index(self.bytes_col)
        return batch.set_column(idx, self.bytes_col, pa.array(out_blobs, pa.binary()))


def frame_sample_stub(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling plan (video stub): indices of the
    frames a real decoder would extract."""
    return list(range(0, max(0, n_frames), max(1, every)))
