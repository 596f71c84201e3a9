"""Text-embedding stage + LLM-output semantic drift.

The reference embeds texts through an external HTTP service
(adapters/embedding_client.py:52-78) and flags semantic drift of LLM
outputs with MMD over those embeddings
(adapters/llm_output_monitor.py:22-99). The Ray-native shape:

* :class:`TextEmbedder` — actor-pool ``map_batches`` stage. The default
  backend is a deterministic **feature-hashing n-gram embedder**
  (hash-kernel / "hashing trick", Weinberger et al. 2009): character
  n-grams hashed into ``dim`` buckets with signed counts, L2-normalized.
  It is a real, fast, dependency-free embedding suitable for drift
  detection of text distributions; a model-based client drops in by
  passing ``embed_fn`` (constructed once per actor — the actor pool
  exists precisely to amortize model load).
* :func:`llm_output_drift` — embed both windows (bounded samples, like
  the reference which embeds full lists driver-side) and run the MMD^2
  test with the reference's thresholds/result shape.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import stats
from ..sketches import hash_char_shingles


def hashing_embed(texts: list[str], dim: int = 64, ngram: int = 3) -> np.ndarray:
    """Deterministic signed n-gram hashing embeddings, L2-normalized.
    Batched across rows: ONE scatter-add over a flat (n*dim) buffer
    (row offsets fold the row index into the bucket index) — exact
    (±1 integer-valued adds are order-independent), no per-row loop."""
    n = len(texts)
    out = np.zeros(n * dim, dtype=np.float64)
    shingles = [hash_char_shingles((t or "").lower(), ngram) for t in texts]
    lens = np.fromiter((len(s) for s in shingles), dtype=np.int64, count=n)
    if n and lens.sum():
        allh = np.concatenate(shingles)
        idx = (allh % np.uint64(dim)).astype(np.int64)
        sign = np.where((allh >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        np.add.at(out, rows * dim + idx, sign)
    out = out.reshape(n, dim)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


class TextEmbedder:
    """Actor-pool embedding stage: backend constructed once per actor."""

    def __init__(
        self,
        text_col: str = "text",
        out_col: str = "embedding",
        dim: int = 64,
        embed_fn: Callable[[list[str]], Any] | None = None,
    ) -> None:
        self.text_col = text_col
        self.out_col = out_col
        self.dim = dim
        self.embed_fn = embed_fn or (lambda ts: hashing_embed(ts, dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        emb = np.asarray(self.embed_fn(texts), dtype=np.float64)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(emb.ravel(), pa.float64()), emb.shape[1]
        )
        return batch.append_column(self.out_col, col)


def embed_texts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    dim: int = 64,
    concurrency: Any = (1, 8),
    embed_fn: Callable[[list[str]], Any] | None = None,
) -> ray.data.Dataset:
    return ds.map_batches(
        TextEmbedder,
        fn_constructor_args=(text_col, "embedding", dim, embed_fn),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )


def llm_output_drift(
    ref_ds: ray.data.Dataset,
    prod_ds: ray.data.Dataset,
    text_col: str = "text",
    threshold: float = 0.05,
    sample_per_side: int = 500,
    dim: int = 64,
    id_col: str | None = None,
) -> dict[str, Any]:
    """Semantic drift between two text windows: embed bounded samples of
    each side (the MMD U-statistic is O(n^2), and the reference itself
    caps the bandwidth sample at 500 — mmd.py:56-60), then MMD^2 with
    the llm_output_mmd result shape (llm_output_monitor.py:63-99).

    With ``id_col`` the samples come from the deterministic hash
    bottom-k sketch (uniform, order-independent); without an id column
    ``limit()`` takes the first N in block order — fine for unordered
    storage, biased if the table is time-clustered."""
    if id_col is not None:
        from .sample import bottom_k_by_group

        def pick(ds):
            import pandas as pd

            s = bottom_k_by_group(ds.select_columns([id_col, text_col]),
                                  id_col, text_col, sample_per_side)["None"]
            texts = [t or "" for t in s.rows]
            return pd.DataFrame({
                text_col: texts,
                "embedding": list(hashing_embed(texts, dim)),
            })

        ref, prod = pick(ref_ds), pick(prod_ds)
    else:
        ref = embed_texts(ref_ds.limit(sample_per_side), text_col, dim).to_pandas()
        prod = embed_texts(prod_ds.limit(sample_per_side), text_col, dim).to_pandas()
    if len(ref) == 0 or len(prod) == 0:
        return {"test": "llm_output_mmd", "drift_detected": False,
                "mmd_squared": 0.0, "reason": "empty_inputs"}
    result = stats.mmd_test(
        np.asarray(ref["embedding"].to_list()),
        np.asarray(prod["embedding"].to_list()),
        threshold=threshold,
    )
    result["test"] = "llm_output_mmd"
    result["n_reference_texts"] = int(len(ref))
    result["n_production_texts"] = int(len(prod))
    return result
