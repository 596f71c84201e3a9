"""aumos_drift_detector_ray — a Ray-Data-native schema + constraint validation
and distribution-drift engine.

Brand-new engine (NOT a port) with the computational capabilities of the
reference service ``invincible-jha/aumos-drift-detector`` (single-process
FastAPI monitoring API), re-expressed as streaming ``ray.data.Dataset``
pipelines over Arrow batches:

* per-column statistics via mergeable partial aggregates + sketches
  (moments, KLL quantiles, HyperLogLog, fixed-edge histograms),
* distribution-drift scores (PSI / KS / chi^2 / JS / Hellinger /
  Wasserstein / MMD) with the reference's thresholds and severity
  mapping (reference: core/services.py:40-68, settings.py:24-56),
* schema/constraint validation (nulls, ranges, enums, uniqueness,
  Bloom-filter referential checks, image decode + PSNR, pHash dedup)
  emitting per-partition pass/fail + violation rows,
* streaming concept-drift detectors (ADWIN / DDM / EDDM; reference:
  adapters/concept_drift/),
* dedup family (exact, MinHash-LSH, SimHash, n-gram Jaccard,
  embedding-cosine), text analysis, ANN similarity search,
* checkpoint/resume via per-partition lineage records.

Nothing here calls ``ray.init()``; callers own the Ray session.
"""

__version__ = "0.1.0"
