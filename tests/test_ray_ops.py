"""Tests for textops, similarity search, dedup family, and the ordered
concept-drift stage on the driver test tables."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


class TestTextOps:
    def test_token_counts_match_python(self, ray_session):
        from aumos_drift_detector_ray.sources.reader import sf_table
        from aumos_drift_detector_ray.stages import textops as T

        ds = sf_table(SF, "documents")
        out = T.add_token_counts(ds).to_pandas()
        for _, r in out.head(20).iterrows():
            assert r.ws_tokens == len(r.text.split())

    def test_quality_scores_ranges(self, ray_session):
        from aumos_drift_detector_ray.sources.reader import sf_table
        from aumos_drift_detector_ray.stages import textops as T

        out = T.quality_scores(sf_table(SF, "documents")).to_pandas()
        for col in ("stopword_ratio", "punct_ratio", "upper_ratio",
                    "digit_ratio", "distinct_token_ratio",
                    "bullet_line_frac", "ellipsis_line_frac",
                    "alpha_word_frac"):
            assert out[col].between(0, 1).all(), col
        assert (out.n_tokens > 0).all()

    def test_gopher_rules_fixtures(self, ray_session):
        """Gopher §A1.1 rule fixtures: each rule exercised on a doc
        engineered to sit on the right side of its threshold."""
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray.stages import textops as T

        texts = [
            "- one\n- two\n- three\nplain",     # 3/4 bullet lines
            "wait...\nmore…\nplain\nplain",     # 2/4 ellipsis lines
            "## tags # here...",                # 4 symbols / 2 words
            "a b c 1 2 3",                      # 3/6 alpha words
            " ".join(["word"] * 60),            # clean: all rules pass
        ]
        out = T.quality_scores(
            rd.from_arrow(pa.table({"text": texts}))).to_pandas()
        assert out.n_lines.tolist() == [4, 4, 1, 1, 1]
        assert out.bullet_line_frac[0] == 0.75
        assert bool(out.gopher_bullet_ok[0])            # 0.75 <= 0.9
        assert out.ellipsis_line_frac[1] == 0.5
        assert not bool(out.gopher_ellipsis_ok[1])      # 0.5 > 0.3
        assert out.symbol_word_ratio[2] == 2.0          # (3+1)/2
        assert not bool(out.gopher_symbol_ok[2])
        assert out.alpha_word_frac[3] == 0.5
        assert not bool(out.gopher_alpha_ok[3])
        assert not bool(out.gopher_word_count_ok[3])    # 3 words < 50
        r = out.iloc[4]
        assert bool(r.gopher_word_count_ok and r.gopher_mean_word_ok
                    and r.gopher_symbol_ok and r.gopher_bullet_ok
                    and r.gopher_ellipsis_ok and r.gopher_alpha_ok)

    def test_language_id_english(self, ray_session):
        import ray.data as rd
        import pyarrow as pa
        from aumos_drift_detector_ray.stages import textops as T

        texts = [
            "the quick brown fox jumps over the lazy dog and the cat",
            "this is another english sentence with the usual words in it",
            "der schnelle braune fuchs springt und die katze ist auch da",
        ]
        out = T.language_id(rd.from_arrow(pa.table({"text": texts}))).to_pandas()
        assert out.lang_pred.iloc[0] == "en"
        assert out.lang_pred.iloc[1] == "en"
        assert out.lang_pred.iloc[2] == "de"

    def test_fingerprints_deterministic_and_dedupable(self, ray_session):
        import ray.data as rd
        import pyarrow as pa
        from aumos_drift_detector_ray.stages import textops as T

        texts = ["hello world " * 20, "hello world " * 20, "different text entirely"]
        out = T.add_fingerprints(
            rd.from_arrow(pa.table({"doc_id": [0, 1, 2], "text": texts}))
        ).to_pandas().sort_values("doc_id")
        assert out.md5.iloc[0] == out.md5.iloc[1] != out.md5.iloc[2]
        assert out.min_rolling_hash.iloc[0] == out.min_rolling_hash.iloc[1]


class TestSimilarity:
    def test_brute_force_matches_numpy(self, ray_session):
        import pyarrow.parquet as pq
        from aumos_drift_detector_ray.sources.reader import sf_table
        from aumos_drift_detector_ray.stages import similarity as S

        tbl = pq.read_table(f"{SF}/embeddings.parquet")
        emb = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
        ids = np.asarray(tbl["vec_id"].to_pylist())
        queries = emb[:3]
        out = S.brute_force_topk(sf_table(SF, "embeddings"), queries, k=5,
                                 query_ids=[0, 1, 2])
        # numpy oracle
        un = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        uq = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        sims = un @ uq.T
        for qi in range(3):
            order = np.lexsort((ids, -sims[:, qi]))[:5]
            got = out[out.query_id == qi].sort_values("rank").neighbor_id.tolist()
            assert got == list(ids[order]), qi
        # self-similarity rank 1
        assert (out[out["rank"] == 1].neighbor_id.to_numpy() == np.array([0, 1, 2])).all()

    def test_ivf_recall(self, ray_session):
        from aumos_drift_detector_ray.sources.reader import sf_table
        from aumos_drift_detector_ray.stages import similarity as S
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{SF}/embeddings.parquet")
        emb = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
        queries = emb[5:8]
        ds = sf_table(SF, "embeddings")
        cents = S.fit_ivf_centroids(ds, n_centroids=8)
        with_cells = S.assign_ivf_partitions(ds, cents).materialize()
        exact = S.brute_force_topk(ds, queries, k=5, query_ids=[5, 6, 7])
        approx = S.ivf_topk(with_cells, cents, queries, k=5, nprobe=4,
                            query_ids=[5, 6, 7])
        # recall@5 of IVF with half the cells probed should be high
        recall = []
        for q in (5, 6, 7):
            e = set(exact[exact.query_id == q].neighbor_id)
            a = set(approx[approx.query_id == q].neighbor_id)
            recall.append(len(e & a) / 5)
        assert np.mean(recall) >= 0.6


class TestDocDedup:
    def test_minhash_lsh_finds_near_dups(self, ray_session):
        import ray.data as rd
        import pyarrow as pa
        from aumos_drift_detector_ray.stages import dedup as D

        base = ("the quick brown fox jumps over the lazy dog while the sun "
                "sets slowly behind the distant purple mountains tonight")
        texts = [base, base.replace("purple", "orange"), "completely different text "
                 "about database engines and distributed query processing systems",
                 base]
        ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2, 3], "text": texts}))
        pairs = D.minhash_lsh_pairs(ds, num_hashes=64, bands=16,
                                    jaccard_threshold=0.5).to_pandas()
        found = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
        assert (0, 3) in found  # exact dup
        assert (0, 1) in found or (1, 3) in found  # near dup
        assert all(2 not in p for p in found)

    def test_minhash_lsh_paths_agree(self, ray_session):
        """sig-in-shuffle (small-side default) and scalars-only +
        re-gather (the 100 TB shape) must produce identical pairs AND
        identical signature-jaccard values."""
        import ray.data as rd
        import pyarrow as pa
        from aumos_drift_detector_ray.stages import dedup as D

        rng = np.random.default_rng(7)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                 "river", "mountain", "forest", "desert", "ocean", "valley"]
        texts = [" ".join(rng.choice(words, 30)) for _ in range(60)]
        for i in range(0, 12, 2):  # plant near-dup twins
            texts[i + 1] = texts[i].replace(texts[i].split()[0], "omega", 1)
        ds = rd.from_arrow(pa.table(
            {"doc_id": list(range(60)), "text": texts}))
        kw = dict(num_hashes=64, bands=16, jaccard_threshold=0.4)
        fast = D.minhash_lsh_pairs(ds, **kw).to_pandas() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        scal = D.minhash_lsh_pairs(ds, sig_in_shuffle_limit=None, **kw) \
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert len(fast) > 0
        assert fast.id_a.tolist() == scal.id_a.tolist()
        assert fast.id_b.tolist() == scal.id_b.tolist()
        assert np.allclose(fast.jaccard, scal.jaccard)

    def test_minhash_lsh_scalars_path_no_candidates(self, ray_session):
        """Scalars-only path with a corpus of all-distinct texts: no
        band collisions anywhere → empty typed result (the all-empty
        candidate collect must not KeyError on lost columns)."""
        import ray.data as rd
        import pyarrow as pa
        from aumos_drift_detector_ray.stages import dedup as D

        rng = np.random.default_rng(3)
        texts = ["".join(rng.choice(list("abcdefghijklmnop"), 120))
                 for _ in range(20)]
        ds = rd.from_arrow(pa.table(
            {"doc_id": list(range(20)), "text": texts}))
        out = D.minhash_lsh_pairs(ds, num_hashes=64, bands=16,
                                  jaccard_threshold=0.5,
                                  sig_in_shuffle_limit=None).to_pandas()
        assert len(out) == 0

    def test_simhash_close_for_similar_texts(self, ray_session):
        from aumos_drift_detector_ray.stages.dedup import simhash64
        from aumos_drift_detector_ray.codecs import hamming64

        a = "the quick brown fox jumps over the lazy dog near the river bank"
        b = "the quick brown fox jumps over the lazy cat near the river bank"
        c = "astronomy telescopes reveal distant galaxies and cosmic microwave radiation"
        h = simhash64([a, b, c])
        assert hamming64(h[:1], h[1:2])[0] < hamming64(h[:1], h[2:3])[0]

    def test_ngram_jaccard(self):
        from aumos_drift_detector_ray.stages.dedup import ngram_jaccard

        assert ngram_jaccard("abcdef", "abcdef") == 1.0
        assert ngram_jaccard("abcdef", "uvwxyz") == 0.0
        assert 0.0 < ngram_jaccard("abcdefgh", "abcdefzz") < 1.0

    def test_exact_dedup_keeps_one_per_key(self, ray_session):
        import ray.data as rd
        import pyarrow as pa
        from aumos_drift_detector_ray.stages import dedup as D

        ds = rd.from_arrow(pa.table({
            "k": ["a", "a", "b", "c", "c", "c"],
            "v": [3, 1, 9, 5, 4, 6],
        }))
        out = D.dedup_exact(ds, "k", order_col="v").to_pandas().sort_values("k")
        assert out.k.tolist() == ["a", "b", "c"]
        assert out.v.tolist() == [1, 9, 4]  # min v kept per key

    def test_embedding_near_dup(self, ray_session):
        import ray.data as rd
        import pyarrow as pa
        from aumos_drift_detector_ray.stages import dedup as D

        rng = np.random.default_rng(0)
        base = rng.normal(size=16)
        vecs = [base, base + rng.normal(scale=0.01, size=16),
                rng.normal(size=16), rng.normal(size=16)]
        ds = rd.from_arrow(pa.table({
            "vec_id": [0, 1, 2, 3],
            "embedding": [list(map(float, v)) for v in vecs],
        }))
        pairs = D.embedding_near_dup_pairs(ds, threshold=0.98).to_pandas()
        found = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
        assert (0, 1) in found
        assert all(p == (0, 1) for p in found)

    def test_embedding_bucketer_ships_scalars_only(self):
        """Scale regression: the LSH candidate shuffle must carry ONLY
        scalar columns — no embedding payload (the old explode shipped
        the unit vector x n_tables as python lists through the shuffle)."""
        import pyarrow as pa
        from aumos_drift_detector_ray.stages.dedup import HyperplaneBucketer

        rng = np.random.default_rng(1)
        batch = pa.table({
            "vec_id": list(range(8)),
            "embedding": [list(map(float, rng.normal(size=16)))
                          for _ in range(8)],
        })
        out = HyperplaneBucketer("embedding", "vec_id", n_planes=12,
                                 n_tables=4, n_coarse=32)(batch)
        assert out.column_names == ["vec_id", "bucket", "coarse"]
        for name in out.column_names:
            t = out.schema.field(name).type
            assert not (pa.types.is_list(t) or pa.types.is_fixed_size_list(t))
        assert len(out) == 8 * 4


class TestConceptStage:
    def test_ordered_adwin_fires_at_shift(self, ray_session):
        import ray.data as rd
        import pyarrow as pa
        from aumos_drift_detector_ray.stages.concept import ordered_concept_drift

        n1, n2 = 400, 400
        seq = np.arange(n1 + n2, dtype=np.int64)
        err = np.concatenate([np.full(n1, 0.1), np.full(n2, 0.9)])
        # shuffle input rows — the stage must sort by seq itself
        perm = np.random.default_rng(0).permutation(n1 + n2)
        ds = rd.from_arrow(pa.table({"seq": seq[perm], "err": err[perm]})).repartition(4)
        events = ordered_concept_drift(ds, "adwin")
        assert len(events) >= 1
        assert events.seq.iloc[0] >= n1  # fires after the shift point

    def test_per_key_detectors_independent(self, ray_session):
        import ray.data as rd
        import pyarrow as pa
        from aumos_drift_detector_ray.stages.concept import per_key_concept_drift

        n = 600
        seq = np.arange(n, dtype=np.int64)
        stable = np.full(n, 0.1)
        shifting = np.concatenate([np.full(n // 2, 0.1), np.full(n - n // 2, 0.9)])
        tbl = pa.table({
            "key": ["stable"] * n + ["shifty"] * n,
            "seq": np.concatenate([seq, seq]),
            "err": np.concatenate([stable, shifting]),
        })
        events = per_key_concept_drift(rd.from_arrow(tbl), "key", "adwin")
        assert len(events) >= 1
        assert set(events.key) == {"shifty"}


class TestSampling:
    def test_reservoir_uniformity_and_merge(self):
        from aumos_drift_detector_ray.stages.sample import ReservoirSample

        # distributed union: 10 per-block reservoirs over 0..9999
        parts = []
        for i, blk in enumerate(np.array_split(np.arange(10_000), 10)):
            r = ReservoirSample(k=500, seed=i)
            r.update(blk.tolist())
            parts.append(r)
        acc = parts[0]
        for p in parts[1:]:
            acc.merge(p)
        assert acc.n_seen == 10_000
        assert len(acc.items) == 500
        # roughly uniform across the range
        items = np.array(acc.items)
        assert items.mean() == pytest.approx(5000, abs=600)
        assert len(set(items.tolist())) > 450

    def test_hash_split_stable_and_partition_independent(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray.stages.sample import hash_split

        ids = list(range(1000))
        a = hash_split(rd.from_arrow(pa.table({"k": ids})).repartition(2), "k") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        b = hash_split(rd.from_arrow(pa.table({"k": ids})).repartition(13), "k") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        assert (a.split == b.split).all()
        frac_train = (a.split == "train").mean()
        assert 0.7 < frac_train < 0.9

    def test_stratified_sample_fractions(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray.stages.sample import stratified_sample

        n = 20_000
        rng = np.random.default_rng(0)
        t = pa.table({
            "k": list(range(n)),
            "s": rng.choice(["a", "b"], n).tolist(),
        })
        out = stratified_sample(rd.from_arrow(t), "s", {"a": 0.1, "b": 0.9}, "k") \
            .to_pandas()
        counts = out.s.value_counts()
        total = pd.Series([s for s in t["s"].to_pylist()]).value_counts()
        assert counts["a"] / total["a"] == pytest.approx(0.1, abs=0.02)
        assert counts["b"] / total["b"] == pytest.approx(0.9, abs=0.02)
        # determinism across partitionings
        out2 = stratified_sample(
            rd.from_arrow(t).repartition(7), "s", {"a": 0.1, "b": 0.9}, "k"
        ).to_pandas()
        assert set(out.k) == set(out2.k)


class TestSequencePacking:
    def test_packing_invariants(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.textops import pack_sequences

        rng = np.random.default_rng(4)
        texts = [" ".join(["w"] * int(n))
                 for n in rng.integers(5, 120, size=400)]
        texts.append(" ".join(["w"] * 999))  # over-long: must truncate alone
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        packed = pack_sequences(
            rd.from_pandas(df).repartition(4), max_tokens=256).to_pandas()

        # every doc lands in exactly one sequence
        assert int(packed.n_docs.sum()) == len(texts)
        # non-truncated sequences respect the budget
        ok = packed[~packed.truncated]
        assert (ok.total_tokens <= 256).all()
        # the over-long doc is a lone truncated sequence
        tr = packed[packed.truncated]
        assert len(tr) == 1 and int(tr.n_docs.iloc[0]) == 1 \
            and int(tr.total_tokens.iloc[0]) == 999
        # first-fit-decreasing packs reasonably tight
        fill = ok.total_tokens.sum() / (256 * len(ok))
        assert fill > 0.7
        # content-addressed keys: re-running yields identical rows
        again = pack_sequences(
            rd.from_pandas(df).repartition(4), max_tokens=256).to_pandas()
        a = packed.sort_values("seq_key").reset_index(drop=True)
        b = again.sort_values("seq_key").reset_index(drop=True)
        assert a.equals(b)

    def test_empty_batches_keep_explode_schemas(self):
        """Empty input batches must not poison actor state (the LSH
        bucketer builds its hyperplanes from the first batch's dim) or
        infer null-typed columns in the band explode."""
        import pyarrow as pa
        import numpy as np
        from aumos_drift_detector_ray.stages.dedup import (
            HyperplaneBucketer, _explode_band_pairs)

        b = HyperplaneBucketer("embedding", "vec_id", 12, 4, 32)
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "embedding": pa.array([], pa.list_(pa.float64()))})
        out0 = b(empty)
        assert out0.schema.field("bucket").type == pa.int64()
        assert b.planes is None  # dim not pinned by the empty batch
        full = pa.table({
            "vec_id": [0, 1],
            "embedding": [list(map(float, np.arange(16))),
                          list(map(float, np.arange(16)[::-1]))],
        })
        out1 = b(full)
        assert len(out1) == 2 * 4 and b.planes[0].shape == (12, 16)

        fn = _explode_band_pairs("phash", ["image_id"], 8, 32)
        e = fn(pa.table({"image_id": pa.array([], pa.string()),
                         "phash": pa.array([], pa.int64())}))
        assert e.schema.field("band_key").type == pa.int64()
        assert e.schema.field("image_id").type == pa.string()
        assert len(e) == 0
