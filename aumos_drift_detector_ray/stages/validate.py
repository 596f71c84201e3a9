"""Schema + constraint validation stages over the image+caption table.

The north rule adds what the reference never had (its schema checks are
key-equality only — ks_test.py:165-170, psi.py:211-212): a real
column-type / constraint validation engine emitting per-partition
pass/fail + violation rows. Layout:

* :func:`check_schema` — pyarrow.Schema conformance (castability) of the
  incoming Dataset vs the expected input_hint schema.
* :class:`ScalarValidator` — **stateless-shape but actor-pooled** batch
  stage for the cheap vector checks (nulls, dim ranges, fmt domain,
  Bloom referential). The Bloom filter is fetched from the object store
  once per actor (``ray.put`` broadcast, no shuffle).
* :class:`DecodeValidator` — actor-pool ``map_batches`` stage that
  decodes every payload, verifies header/decoded dims against the
  ``w``/``h`` columns, re-derives the ground-truth pixels/caption from
  the row's seeded identity and enforces the per-row fidelity invariant
  (decoded-pixel allclose for lossless fmts, PSNR >= 40 dB for lossy —
  BASELINE.json input_hint), recomputes the pHash, and then **drops the
  ``bytes`` column** so every downstream shuffle moves only scalars.
* :func:`violations_from_flags` / :func:`passfail_matrix` — reshape the
  wide per-row flag table into violation rows and the per-(partition,
  check) pass/fail matrix (the north-rule output contract).

Uniqueness and pHash near-dup are shuffle stages in stages/dedup.py.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import codecs, synth

# check names — the rows of the pass/fail matrix
SCALAR_CHECKS = (
    "not_null_id",
    "not_null_bytes",
    "not_null_caption",
    "range_dims",
    "fmt_domain",
    "referential",
)
DECODE_CHECKS = (
    "decodable",
    "dims_match",
    "pixel_fidelity",
    "caption_match",
    "phash_match",
)
SHUFFLE_CHECKS = ("uniqueness", "near_dup")
ALL_CHECKS = SCALAR_CHECKS + DECODE_CHECKS + SHUFFLE_CHECKS


@dataclass(frozen=True)
class ValidationConfig:
    """Constraint thresholds + the seeded identity needed to re-derive
    ground truth per row."""

    synth_cfg: synth.SynthConfig = field(default_factory=synth.SynthConfig)
    max_dim: int = 4096
    allowed_fmts: tuple[str, ...] = codecs.FORMATS
    psnr_min: float = 40.0
    # self-consistency tolerance for the pHash recompute check: lossy
    # round-trips of the diversified content flip up to ~8 bits (measured
    # p100=8), while a *different* image is >= ~10 bits away — 9 separates
    # the two regimes
    phash_tol: int = 9
    check_fidelity: bool = True  # decode + pixel/caption/phash invariants


def check_schema(ds: ray.data.Dataset, expected: pa.Schema = synth.IMAGE_SCHEMA) -> list[str]:
    """Schema conformance: every expected field must exist with an
    equal or losslessly-castable type. Returns a list of problems
    (empty = conforms). Extra columns are allowed (metadata columns like
    the read path)."""
    actual = ds.schema()
    names = dict(zip(actual.names, actual.types))
    problems = []
    for fld in expected:
        if fld.name not in names:
            problems.append(f"missing column {fld.name!r}")
            continue
        t = names[fld.name]
        if t.equals(fld.type):
            continue
        try:
            pa.compute.cast(pa.array([], t), fld.type)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            problems.append(f"column {fld.name!r} type {t} not castable to {fld.type}")
    return problems


def attach_partition_id(ds: ray.data.Dataset, rows_per_shard: int) -> ray.data.Dataset:
    """Derive ``partition_id`` = row_index // rows_per_shard from each
    row's seeded identity (the trailing digits of image_id survive every
    injected violation, including ghost ids). Rows with no parseable
    index get partition -1. Used when the input is synthesized in memory;
    parquet inputs carry partition identity via their shard path."""

    def fn(batch: pa.Table) -> pa.Table:
        # vectorized: trailing digit run → int → // rows_per_shard
        tail = pc.extract_regex(batch["image_id"], r"-(?P<idx>[0-9]+)$")
        idx = pc.struct_field(tail, "idx").cast(pa.int64())
        pids = pc.fill_null(
            pc.divide(idx, pa.scalar(rows_per_shard, pa.int64())), -1)
        return batch.append_column("partition_id", pids)

    return ds.map_batches(fn, batch_format="pyarrow")


def partition_id_from_path(ds: ray.data.Dataset, path_column: str = "path") -> ray.data.Dataset:
    """Turn a ``shard=<k>`` component of the read path into partition_id
    (parquet inputs read with include_paths=True)."""

    def fn(batch: pa.Table) -> pa.Table:
        # vectorized: first "shard=<k>" path component
        m = pc.extract_regex(batch[path_column], r"(?:^|/)shard=(?P<k>[0-9]+)")
        pids = pc.fill_null(pc.struct_field(m, "k").cast(pa.int64()), -1)
        out = batch.drop_columns([path_column])
        return out.append_column("partition_id", pids)

    return ds.map_batches(fn, batch_format="pyarrow")


# per-worker-process cache of deserialized broadcast objects, so stateless
# tasks pay the ray.get deserialization once per worker, not once per batch
_BROADCAST_CACHE: dict[str, Any] = {}


def _get_broadcast(ref: Any) -> Any:
    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def make_scalar_validator(cfg: ValidationConfig, bloom_ref: Any | None = None):
    """Vectorized scalar constraint checks as a STATELESS task function
    (no actor reservation — the decode pool downstream needs the CPUs).
    Bloom referential membership runs against the broadcast id allowlist
    (``ray.put`` once; negatives exact, positives ~0.8% FP at 10
    bits/element — see sketches.BloomFilter), cached per worker."""

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ok_id = pc.is_valid(batch["image_id"])
        ok_bytes = pc.is_valid(batch["bytes"])
        ok_caption = pc.is_valid(batch["caption"])
        w = batch["w"].to_numpy(zero_copy_only=False)
        h = batch["h"].to_numpy(zero_copy_only=False)
        ok_range = pa.array(
            (w > 0) & (w <= cfg.max_dim) & (h > 0) & (h <= cfg.max_dim)
        )
        ok_fmt = pc.is_in(batch["fmt"], value_set=pa.array(list(cfg.allowed_fmts)))
        if bloom_ref is not None:
            bloom = _get_broadcast(bloom_ref)
            ids = batch["image_id"].to_pylist()
            present = bloom.contains([s if s is not None else "" for s in ids])
            ok_ref = pa.array(present)
        else:
            ok_ref = pa.array(np.ones(n, dtype=bool))
        return (
            batch.append_column("ok_not_null_id", ok_id)
            .append_column("ok_not_null_bytes", ok_bytes)
            .append_column("ok_not_null_caption", ok_caption)
            .append_column("ok_range_dims", ok_range)
            .append_column("ok_fmt_domain", ok_fmt)
            .append_column("ok_referential", ok_ref)
        )

    return fn


class DecodeValidator:
    """Actor-pool decode + fidelity stage.

    Per row: decode the payload with the declared codec; compare header
    and decoded dims with the ``w``/``h`` columns; regenerate the row's
    ground-truth pixels+caption from its seeded identity and enforce
    decoded-pixel equality (lossless) / PSNR >= psnr_min (lossy), exact
    caption equality, and pHash recompute within phash_tol Hamming bits.
    Emits derived scalar features (byte_len, decoded dims, psnr) and
    DROPS ``bytes`` — downstream stages shuffle scalars only.

    The per-row Python loop is unavoidable (codec work is per-image);
    the actor pool amortizes setup and parallelizes across the pool.
    """

    def __init__(self, cfg: "ValidationConfig | dict[str, ValidationConfig]") -> None:
        # single config, or one per run namespace (multi-window jobs share
        # one decode pool; the row's run is recovered from its id prefix)
        if isinstance(cfg, dict):
            self.cfgs = dict(cfg)
        else:
            self.cfgs = {cfg.synth_cfg.run: cfg}
        self.default_cfg = next(iter(self.cfgs.values()))
        self.prefixes = [
            (f"img-{run}-", run) for run in self.cfgs
        ] + [(f"ghost-{run}-", run) for run in self.cfgs]

    def _cfg_for(self, image_id: str | None) -> "ValidationConfig":
        if image_id and len(self.cfgs) > 1:
            for prefix, run in self.prefixes:
                if image_id.startswith(prefix):
                    return self.cfgs[run]
        return self.default_cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        caps = batch["caption"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        phs = batch["phash"].to_numpy(zero_copy_only=False)
        # source-certified reference columns (synth.make_batch
        # with_ref_truth): when present AND the decoded raster's crc32
        # matches the certified canonical-decode crc, the fidelity
        # metrics come from the certificate instead of the seeded
        # per-row re-render (~55% of this stage's CPU); any guard
        # mismatch (forged id, altered payload) falls back to the full
        # re-render, so flags and psnr are bit-identical either way
        # (tested by tests/test_ray_validate.py TestRefTruthColumns)
        has_ref = "ref_dec_crc" in batch.column_names
        if has_ref:
            ref_rows = batch["ref_row"].to_numpy(zero_copy_only=False)
            ref_crcs = batch["ref_dec_crc"].to_numpy(zero_copy_only=False)
            ref_psnrs = batch["ref_psnr"].to_numpy(zero_copy_only=False)
            ref_caps = batch["ref_caption"].to_pylist()

        ok_dec = np.zeros(n, dtype=bool)
        ok_dims = np.zeros(n, dtype=bool)
        ok_pix = np.zeros(n, dtype=bool)
        ok_cap = np.zeros(n, dtype=bool)
        ok_ph = np.zeros(n, dtype=bool)
        byte_len = np.zeros(n, dtype=np.int64)
        psnr_out = np.full(n, np.nan)
        mean_px = np.full(n, np.nan)

        rec_phs = np.zeros(n, dtype=np.int64)
        has_img = np.zeros(n, dtype=bool)
        tols = np.zeros(n, dtype=np.int64)
        for i in range(n):
            blob, fmt = blobs[i], fmts[i]
            cfg = self._cfg_for(ids[i])
            tols[i] = cfg.phash_tol
            byte_len[i] = len(blob) if blob is not None else 0
            img = None
            if blob is not None and fmt in codecs.FORMATS:
                try:
                    img = codecs.decode(blob, fmt)
                    ok_dec[i] = True
                except codecs.CodecError:
                    pass
            if img is not None:
                dh, dw = img.shape[0], img.shape[1]
                ok_dims[i] = (dw == ws[i]) and (dh == hs[i])
                mean_px[i] = float(img.mean())
                rec_phs[i] = int(codecs.phash64(img))
                has_img[i] = True
            row_idx = (
                synth.parse_row_index(ids[i], cfg.synth_cfg.run) if ids[i] else None
            )
            if cfg.check_fidelity and row_idx is not None:
                # the certificate is keyed by ROW; fidelity is keyed by
                # the CLAIMED id — equal except forged-id rows (V-DUP),
                # which re-render the claimed id's truth (rare)
                use_ref = has_ref and row_idx == ref_rows[i]
                if use_ref:
                    truth_cap = ref_caps[i]
                else:
                    truth_cap = synth.ground_truth_caption(
                        cfg.synth_cfg.seed, row_idx, cfg.synth_cfg
                    )
                ok_cap[i] = caps[i] == truth_cap
                if img is not None:
                    if use_ref and zlib.crc32(img) == ref_crcs[i]:
                        # decoded raster IS the certified canonical
                        # decode → reuse the certified psnr-vs-truth
                        # (NaN encodes the truth/decode shape mismatch)
                        p = ref_psnrs[i]
                        if not np.isnan(p):
                            psnr_out[i] = p
                            if fmt == "jpg":
                                ok_pix[i] = p >= cfg.psnr_min
                            else:
                                ok_pix[i] = bool(np.isinf(p))
                    else:
                        truth = synth.ground_truth_pixels(
                            cfg.synth_cfg.seed, row_idx, cfg.synth_cfg
                        )
                        if truth.shape == img.shape:
                            p = codecs.psnr(truth, img)
                            psnr_out[i] = p
                            if fmt == "jpg":
                                ok_pix[i] = p >= cfg.psnr_min
                            else:
                                ok_pix[i] = bool(np.array_equal(truth, img))
            elif not cfg.check_fidelity:
                ok_cap[i] = caps[i] is not None
                ok_pix[i] = img is not None

        # vectorized pHash recompute check across the whole batch
        dists = codecs.hamming64(rec_phs, np.asarray(phs, dtype=np.int64))
        ok_ph[:] = has_img & (dists <= tols)

        drop = ["bytes"] + (["ref_row", "ref_dec_crc", "ref_psnr",
                             "ref_caption"] if has_ref else [])
        out = batch.drop_columns(drop)
        for name, arr in (
            ("ok_decodable", ok_dec),
            ("ok_dims_match", ok_dims),
            ("ok_pixel_fidelity", ok_pix),
            ("ok_caption_match", ok_cap),
            ("ok_phash_match", ok_ph),
        ):
            out = out.append_column(name, pa.array(arr))
        out = out.append_column("byte_len", pa.array(byte_len, pa.int64()))
        out = out.append_column("psnr", pa.array(psnr_out, pa.float64()))
        out = out.append_column("mean_pixel", pa.array(mean_px, pa.float64()))
        return out


def run_row_validation(
    ds: ray.data.Dataset,
    cfg: ValidationConfig,
    bloom_ref: Any | None = None,
    decode_concurrency: "int | tuple[int, int] | None" = None,
    decode_batch_size: int | None = None,
) -> ray.data.Dataset:
    """Scalar checks (stateless tasks) then decode/fidelity checks.

    ``decode_concurrency=None`` (default) runs the decode stage as an
    ELASTIC TASK pool: this repo's decode state (codec tables) measures
    ~0 ms to build, so pinning a fixed actor pool only pays ~1 s of
    process startup per actor and caps elasticity — measured effective
    parallelism was ~10 of 28 actors on a 7 s stage. Pass a concurrency
    to get the actor-pool shape instead, which is the right one when
    per-worker state is genuinely heavy (model weights, big indexes):
    setup runs once per actor in ``__init__``, not per task.

    ``batch_size=None`` is deliberate: with a batch_size set, Ray Data
    BUNDLES many input blocks into one task (until the bundle reaches
    batch_size rows — and a read task's whole output arrives as one
    bundle), which collapses a 100-block input to ~5 huge tasks. With
    None, every block is its own task, so parallelism is governed by the
    input block count — which the synth writer guarantees via small
    shard files + 512-row row groups."""
    ds = ds.map_batches(
        make_scalar_validator(cfg, bloom_ref),
        batch_format="pyarrow",
        batch_size=decode_batch_size,
    )
    if decode_concurrency is None:
        ds = ds.map_batches(
            DecodeValidator(cfg),
            batch_format="pyarrow",
            batch_size=decode_batch_size,
        )
    else:
        ds = ds.map_batches(
            DecodeValidator,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            batch_size=decode_batch_size,
            concurrency=decode_concurrency,
        )
    return ds


def unpivot_violations(batch: pa.Table) -> pa.Table:
    """Vectorized unpivot of failed ``ok_*`` checks into violation rows
    (partition_id, image_id, check, detail): one boolean mask + fancy
    index per check column, no per-row Python."""
    check_cols = [c for c in batch.column_names if c.startswith("ok_")]
    ids = np.asarray(batch["image_id"].to_pylist(), dtype=object)
    if "partition_id" in batch.column_names:
        pid_arr = pc.fill_null(batch["partition_id"], -1)
        pid = np.asarray(pid_arr.to_numpy(zero_copy_only=False), dtype=np.int64)
    else:
        pid = np.full(len(batch), -1, dtype=np.int64)
    out_p, out_i, out_c = [], [], []
    for c in check_cols:
        mask = pc.fill_null(pc.invert(batch[c]), True).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(mask)
        out_p.append(pid[idx])
        out_i.append(ids[idx])
        out_c.append(np.full(idx.size, c[3:], dtype=object))
    n = sum(a.size for a in out_p)
    return pa.table(
        {
            "partition_id": pa.array(
                np.concatenate(out_p) if out_p else [], pa.int64()),
            "image_id": pa.array(
                np.concatenate(out_i) if out_i else [], pa.string()),
            "check": pa.array(
                np.concatenate(out_c) if out_c else [], pa.string()),
            "detail": pa.array([""] * n, pa.string()),
        }
    )


def violations_from_flags(flags: ray.data.Dataset) -> ray.data.Dataset:
    """Unpivot failed checks into violation rows
    (partition_id, image_id, check, detail)."""
    return flags.map_batches(unpivot_violations, batch_format="pyarrow")


def passfail_matrix(flags: ray.data.Dataset) -> "Any":
    """Per-(partition, check) pass/fail + violation counts as a small
    pyarrow Table: partial sums per block + grouped merge (no row-level
    shuffle — counts per partition/check are pre-aggregated inside
    map_batches, then reduced)."""

    def partial(batch: pa.Table) -> pa.Table:
        check_cols = [c for c in batch.column_names if c.startswith("ok_")]
        pid = (
            batch["partition_id"].to_numpy(zero_copy_only=False)
            if "partition_id" in batch.column_names
            else np.full(len(batch), -1, dtype=np.int64)
        )
        uniq = np.unique(pid)
        rows: dict[str, list[Any]] = {"partition_id": [], "check": [], "violations": [], "rows": []}
        for p in uniq:
            sel = pid == p
            total = int(sel.sum())
            for c in check_cols:
                col = pc.fill_null(batch[c], False).to_numpy(zero_copy_only=False)
                bad = int(total - col[sel].sum())
                rows["partition_id"].append(int(p))
                rows["check"].append(c[3:])
                rows["violations"].append(bad)
                rows["rows"].append(total)
        return pa.table(
            {
                "partition_id": pa.array(rows["partition_id"], pa.int64()),
                "check": pa.array(rows["check"], pa.string()),
                "violations": pa.array(rows["violations"], pa.int64()),
                "rows": pa.array(rows["rows"], pa.int64()),
            }
        )

    partials = flags.map_batches(partial, batch_format="pyarrow")
    tbl = partials.to_pandas()
    agg = (
        tbl.groupby(["partition_id", "check"], as_index=False)
        .agg(violations=("violations", "sum"), rows=("rows", "sum"))
        .sort_values(["partition_id", "check"])
        .reset_index(drop=True)
    )
    agg["passed"] = agg["violations"] == 0
    # "rows" was double-counted across checks within a block only if a
    # check appears once per block — it does, so rows is consistent per
    # (partition, check) pair.
    return pa.Table.from_pandas(agg, preserve_index=False)


def build_allowlist_bloom(
    n_rows: int,
    run: str,
    bits_per_element: int = 10,
    chunk: int = 200_000,
    n_ranges: int | None = None,
) -> Any:
    """Build the id-allowlist Bloom filter (all canonical ids for the
    run) with parallel Ray tasks over id ranges, merged on the driver,
    then ``ray.put`` for broadcast. At 10^12 ids a single Bloom at
    10 bits/elt is ~1.2 TB, so pass ``n_ranges`` to build the
    hash-range-sharded variant instead (sketches.RangePartitionedBloom):
    each shard is its own object-store entry and probe tasks fetch only
    the shards their batch's ids hash into — same ``contains`` contract,
    never the whole filter in one heap. For this engine's bench scales
    (<=10^7) the single broadcast filter is the right call and stays
    the default."""
    from ..sketches import BloomFilter, RangePartitionedBloom, hash_any_array

    if n_ranges is None:
        @ray.remote
        def _build(start: int, count: int) -> BloomFilter:
            b = BloomFilter(capacity=n_rows, bits_per_element=bits_per_element)
            ids = [synth.image_id_for(run, i)
                   for i in range(start, start + count)]
            b.add(ids)
            return b

        refs = [
            _build.remote(s, min(chunk, n_rows - s))
            for s in range(0, n_rows, chunk)
        ]
        blooms = ray.get(refs)
        acc = blooms[0]
        for b in blooms[1:]:
            acc.merge(b)
        return ray.put(acc)

    cap = max(64, n_rows // n_ranges + 1)

    @ray.remote
    def _build_sharded(start: int, count: int) -> list[BloomFilter]:
        shards = [BloomFilter(capacity=cap, bits_per_element=bits_per_element)
                  for _ in range(n_ranges)]
        ids = [synth.image_id_for(run, i) for i in range(start, start + count)]
        h = hash_any_array(ids)
        rr = RangePartitionedBloom.range_of(h, n_ranges)
        for r in np.unique(rr):
            shards[int(r)].add_hashes(h[rr == r])
        return shards

    chunk_refs = [
        _build_sharded.remote(s, min(chunk, n_rows - s))
        for s in range(0, n_rows, chunk)
    ]
    per_chunk = ray.get(chunk_refs)
    shard_refs = []
    for r in range(n_ranges):
        acc = per_chunk[0][r]
        for shards in per_chunk[1:]:
            acc.merge(shards[r])
        shard_refs.append(ray.put(acc))  # one store entry PER shard
    return ray.put(RangePartitionedBloom(shard_refs))
