"""Round-4 tests: TF-IDF broadcast-vs-hash-join path agreement and the
null/NaN value contract (sf_events_clean)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


class TestTfidfPaths:
    def test_join_path_matches_broadcast_path(self, ray_session):
        """The vocabulary size gate: below TFIDF_BROADCAST_GATE the df
        table broadcasts as a dict; forcing the gate to 0 runs the
        token-keyed hash_join path instead — identical output."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        fast = Q.tfidf_top_terms_per_doc(SF)
        slow = Q.tfidf_top_terms_per_doc(SF, broadcast_gate=0)
        assert len(fast) > 0
        pd.testing.assert_frame_equal(fast, slow)


class TestEventsCleanContract:
    def test_null_and_nan_rows_dropped(self, ray_session, tmp_path):
        """sf_events_clean drops BOTH SQL-NULL and float-NaN value rows
        (pandas cannot tell them apart downstream) and keeps everything
        else, including +-inf (finite-ness is a separate, per-stat
        decision — clean_finite)."""
        from aumos_drift_detector_ray.pipelines.table_queries import (
            sf_events_clean,
        )

        vals = np.array([1.5, np.nan, -0.0, np.inf, 7.0], dtype=np.float64)
        mask = np.array([False, False, False, False, True])  # last is NULL
        t = pa.table({
            "event_id": pa.array(np.arange(5, dtype=np.int64)),
            "event_type": pa.array(["a", "b", "c", "d", "e"]),
            "value": pa.array(vals, mask=mask),
        })
        os.makedirs(tmp_path / "x", exist_ok=True)
        pq.write_table(t, str(tmp_path / "x" / "events.parquet"))
        out = sf_events_clean(str(tmp_path / "x"),
                              ["event_id", "event_type", "value"]) \
            .to_pandas().sort_values("event_id")
        assert list(out.event_id) == [0, 2, 3]

    def test_value_filter_applied_to_every_listed_oracle(self):
        """Every query in __ray_entry__._VALUE_CLEAN_QUERIES must have
        had its `FROM events` references swapped for the filtered
        derived table — no bare events reference may survive."""
        import re

        import __ray_entry__ as E

        d = E.oracle_sql()
        for n in E._VALUE_CLEAN_QUERIES:
            assert n in d
            bare = re.findall(r"\bFROM events\b(?! WHERE value IS NOT NULL)",
                              d[n])
            assert not bare, f"{n} still references unfiltered events"


class TestDocRepetitionStats:
    def test_known_micro_corpus(self, ray_session, tmp_path):
        """Hand-checked metrics: 'a b a b a' -> top token a x3, top
        bigram ('a b' or 'b a') x2, no duplicated trigram ('a b a' and
        'b a b' each occur... 'a b a' occurs twice -> 2 dup positions);
        'x y z' -> all counts 1, not repetitive (1*10 < 3 is false ->
        top_token covers 1/3 >= 10% so repetitive IS true for tiny
        docs; assert the integer rule, not intuition)."""
        import pyarrow.parquet as pq2

        t = pa.table({
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["a b a b a", "p q r s t u v w x y z"]),
        })
        os.makedirs(tmp_path / "d", exist_ok=True)
        pq2.write_table(t, str(tmp_path / "d" / "documents.parquet"))
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.doc_repetition_stats(str(tmp_path / "d"))
        r0 = out[out.doc_id == 0].iloc[0]
        assert r0.n_tokens == 5 and r0.top_token_n == 3
        assert r0.top_bigram_n == 2
        # trigrams of doc0: 'a b a','b a b','a b a' -> 'a b a' has c=2
        assert r0.dup_trigram_pos_n == 2
        assert bool(r0.repetitive)
        r1 = out[out.doc_id == 1].iloc[0]
        assert r1.n_tokens == 11 and r1.top_token_n == 1
        assert r1.top_bigram_n == 1 and r1.dup_trigram_pos_n == 0
        assert not bool(r1.repetitive)  # 1*10 < 11 and no dup trigram


class TestSemanticDedup:
    def test_greedy_chain_keeps_endpoints(self, ray_session, tmp_path):
        """Chain a~b~c with a!~c (2-D unit vectors at 0, 50 and 100
        degrees, threshold 0.4): greedy SemDeDup keeps a AND c, pruning
        only b — the naive any-lower-id rule would wrongly prune c."""
        import math

        import pyarrow.parquet as pq2
        import ray as _ray

        ang = [0.0, math.radians(50), math.radians(100)]
        t = pa.table({
            "vec_id": pa.array([0, 1, 2], type=pa.int64()),
            "embedding": pa.array(
                [[math.cos(a), math.sin(a)] for a in ang],
                type=pa.list_(pa.float32())),
            "label": pa.array([0, 0, 0], type=pa.int32()),
        })
        os.makedirs(tmp_path / "e", exist_ok=True)
        pq2.write_table(t, str(tmp_path / "e" / "embeddings.parquet"))
        from aumos_drift_detector_ray.stages import dedup as D
        from aumos_drift_detector_ray.sources.reader import read_table

        ds = read_table(str(tmp_path / "e" / "embeddings.parquet"))
        out = D.semantic_dedup(ds, k=1, threshold=0.4).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        assert list(out.kept) == [True, False, True]
        assert out.keeper_id.iloc[1] == 0
        assert abs(out.keeper_cos.iloc[1] - math.cos(ang[1])) < 1e-6

    def test_audit_booleans_hold_on_sf0001(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        a = Q.semantic_dedup_audit("/root/testdata/sf0.001")
        assert len(a) > 0
        assert a.witness_ok.all() and a.separation_ok.all()


class TestIncrementalDedupPaths:
    def test_shuffle_path_matches_broadcast_path(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        fast = Q.incremental_dedup_docs(SF)
        slow = Q.incremental_dedup_docs(SF, force_shuffle=True)
        assert len(fast) > 0
        pd.testing.assert_frame_equal(fast, slow)


class TestDupNgramSpans:
    """Exact-substring (duplicated 8-gram span) dedup: engine output vs
    hand-computed ground truth on a crafted corpus covering the edge
    cases — exact-dup docs, a partially-overlapping doc, a within-doc
    repeated gram (must NOT count as cross-doc), an empty doc, and a
    doc shorter than n."""

    def _write_docs(self, tmp_path):
        docs = [
            (0, "a b c d e f g h i j"),          # 3 gram positions
            (1, "x a b c d e f g h z"),          # shares 1 gram with 0/4
            (2, "q w e r t y u i"),              # 1 unique position
            (3, ""),                             # no positions
            (4, "a b c d e f g h i j"),          # exact dup of doc 0
            (5, "m m m m m m m m m"),            # same gram twice, 1 doc
            (6, "a b c"),                        # shorter than n
        ]
        t = pa.table({
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs], pa.string()),
        })
        os.makedirs(tmp_path / "sf", exist_ok=True)
        pq.write_table(t, str(tmp_path / "sf" / "documents.parquet"))
        return str(tmp_path / "sf")

    def test_dup_grams_ground_truth(self, ray_session, tmp_path):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.dup_ngram_grams(self._write_docs(tmp_path))
        expect = pd.DataFrame({
            "gram": ["a b c d e f g h",
                     "b c d e f g h i",
                     "c d e f g h i j"],
            "ndocs": np.array([3, 2, 2], dtype=np.int64),
        })
        pd.testing.assert_frame_equal(out, expect)

    def test_coverage_ground_truth(self, ray_session, tmp_path):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.doc_dup_span_coverage(self._write_docs(tmp_path))
        expect = pd.DataFrame({
            "doc_id": np.array([0, 1, 2, 4, 5], dtype=np.int64),
            "n_pos": np.array([3, 3, 1, 3, 2], dtype=np.int64),
            "dup_pos": np.array([3, 1, 0, 3, 0], dtype=np.int64),
            "half_dup": [True, False, False, True, False],
        })
        pd.testing.assert_frame_equal(out, expect)

    def test_matches_bruteforce_at_sf0001(self, ray_session):
        """Invariant vs a driver-side brute force over the real table:
        every (gram, ndocs) the engine reports must equal the python
        recount, and coverage must equal the per-doc recount."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        import collections

        docs = pd.read_parquet(SF + "/documents.parquet",
                               columns=["doc_id", "text"])
        gram_docs: dict = collections.defaultdict(set)
        per_doc: dict = {}
        for did, txt in zip(docs.doc_id, docs.text.fillna("")):
            toks = str(txt).replace("\x00", "").split(" ")
            grams = [" ".join(toks[i:i + 8])
                     for i in range(len(toks) - 7)]
            if grams:
                per_doc[int(did)] = grams
            for g in grams:
                gram_docs[g].add(int(did))

        out = Q.dup_ngram_grams(SF)
        for g, nd in zip(out.gram, out.ndocs):
            assert len(gram_docs[g]) == nd >= 2

        cov = Q.doc_dup_span_coverage(SF).set_index("doc_id")
        assert sorted(cov.index) == sorted(per_doc)
        for did, grams in per_doc.items():
            dup = sum(1 for g in grams if len(gram_docs[g]) >= 2)
            assert cov.loc[did, "n_pos"] == len(grams)
            assert cov.loc[did, "dup_pos"] == dup


class TestKllQuantileAudit:
    def test_gate_true_and_exact_matches_duckdb(self, ray_session):
        """The sandwich's exact column must equal DuckDB quantile_disc
        on the same clean-value relation, and every KLL rank-error gate
        must hold on the real table."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.kll_quantile_audit(SF)
        assert out.kll_ok.all()
        exp = duckdb.sql(f"""
            SELECT unnest(quantile_disc(value,
                [0.01,0.1,0.25,0.5,0.75,0.9,0.99])) AS q
            FROM read_parquet('{SF}/events.parquet')
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        np.testing.assert_array_equal(out.exact_q.to_numpy(),
                                      exp.q.to_numpy())


class TestDupNgramHashPath:
    """The scalars-only shuffle + bounded candidate re-gather path must
    be bit-identical to the gram-string shuffle path (superset-exact:
    hash collisions only ever ADD candidates, the exact groupby prunes
    them)."""

    def test_grams_path_agreement(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        a = Q.dup_ngram_grams(SF)
        b = Q.dup_ngram_grams(SF, hash_shuffle=True)
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b)

    def test_coverage_path_agreement(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        a = Q.doc_dup_span_coverage(SF)
        b = Q.doc_dup_span_coverage(SF, hash_shuffle=True)
        assert a.dup_pos.sum() > 0
        pd.testing.assert_frame_equal(a, b)

    def test_candidate_gate_fails_loudly(self, ray_session):
        from aumos_drift_detector_ray.stages.textops import (
            dup_gram_candidate_pairs,
        )
        from aumos_drift_detector_ray.pipelines.table_queries import sf_table

        ds = sf_table(SF, "documents", columns=["doc_id", "text"])
        with pytest.raises(ValueError, match="candidate_gate"):
            dup_gram_candidate_pairs(ds, candidate_gate=0).count()

    def test_hash_path_agreement_adversarial(self, ray_session, tmp_path):
        """Path agreement again, on the adversarial fuzz corpus (NUL,
        giant tokens, planted dup clusters / near-dup pairs) — the
        inputs most likely to expose a hash/re-gather divergence."""
        sys.path.insert(0, "/root/repo/tools")
        from fuzz_oracle import synth_docs

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        df = synth_docs(seed=7, n=200)
        os.makedirs(tmp_path / "fz", exist_ok=True)
        df.to_parquet(str(tmp_path / "fz" / "documents.parquet"),
                      index=False)
        sf = str(tmp_path / "fz")
        a = Q.dup_ngram_grams(sf)
        b = Q.dup_ngram_grams(sf, hash_shuffle=True)
        assert len(a) > 0  # planted dup clusters guarantee shared spans
        pd.testing.assert_frame_equal(a, b)
        ca = Q.doc_dup_span_coverage(sf)
        cb = Q.doc_dup_span_coverage(sf, hash_shuffle=True)
        pd.testing.assert_frame_equal(ca, cb)


class TestDupSpanStats:
    def test_ground_truth(self, ray_session, tmp_path):
        """Crafted corpus: whole-doc duplication (span = full doc), a
        single shared gram inside a longer doc (span = n), a unique
        doc, and a within-doc-only repeat (span = 0)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        sf = TestDupNgramSpans()._write_docs(tmp_path)
        out = Q.doc_dup_span_stats(sf)
        expect = pd.DataFrame({
            "doc_id": np.array([0, 1, 2, 4, 5], dtype=np.int64),
            "n_pos": np.array([3, 3, 1, 3, 2], dtype=np.int64),
            "dup_pos": np.array([3, 1, 0, 3, 0], dtype=np.int64),
            "longest_dup_span": np.array([10, 8, 0, 10, 0],
                                         dtype=np.int64),
        })
        pd.testing.assert_frame_equal(out, expect)

    def test_broadcast_gate_fails_loudly(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with pytest.raises(ValueError, match="broadcast_gate"):
            Q.doc_dup_span_stats(SF, broadcast_gate=0)


class TestBigramLmPaths:
    def test_join_path_matches_broadcast_path(self, ray_session):
        """Size gate on the bigram/prefix count table: below the gate
        the counts broadcast as dicts and scoring is shuffle-free;
        forcing the gate to 0 runs the gram-keyed then prefix-keyed
        hash_join path — identical output."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        fast = Q.bigram_lm_doc_scores(SF)
        slow = Q.bigram_lm_doc_scores(SF, broadcast_gate=0)
        assert len(fast) > 0
        pd.testing.assert_frame_equal(fast, slow)

    def test_count_space_semantics_vs_brute_force(self, ray_session):
        """Tiny corpus brute-force: corpus bigram counts / prefix counts
        / hapax flags computed by a dict loop must match the distributed
        result row for row."""
        import pyarrow.parquet as pq
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE
        import collections, tempfile, os

        docs = ["the cat sat on the mat",
                "the cat ran",
                "a dog sat on the mat",
                "singleton",          # < 2 tokens: no output row
                "THE CAT SAT on the MAT!"]
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(pa.table({
                "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
                "text": pa.array(docs),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["t"] * len(docs)),
                "n_chars": pa.array([len(t) for t in docs],
                                    pa.int64()),
            }), os.path.join(d, "documents.parquet"))
            out = Q.bigram_lm_doc_scores(d)

        bg = collections.Counter()
        pf = collections.Counter()
        toks_by_doc = {}
        for i, t in enumerate(docs):
            toks = WORD_RE.findall(t.lower())
            toks_by_doc[i] = toks
            for a, b in zip(toks, toks[1:]):
                bg[(a, b)] += 1
                pf[a] += 1
        expect = []
        for i, toks in toks_by_doc.items():
            pairs = list(zip(toks, toks[1:]))
            if not pairs:
                continue
            expect.append({
                "doc_id": i, "n_bigrams": len(pairs),
                "sum_bg_count": sum(bg[p] for p in pairs),
                "sum_prefix_count": sum(pf[a] for a, _ in pairs),
                "n_hapax_bigrams": sum(bg[p] == 1 for p in pairs),
            })
        e = pd.DataFrame(expect)
        e["avg_bg_count"] = e.sum_bg_count / e.n_bigrams
        pd.testing.assert_frame_equal(
            out, e.astype({c: "int64" for c in e.columns[:5]}))


class TestDegenerateCorpus:
    def test_one_doc_corpus_runs_everywhere(self, ray_session, tmp_path):
        """A 1-document corpus (empty history split, zero cross-doc
        dup grams) must degrade to empty/zero results, not
        AttributeError on column-less empty materializations — the
        empty-shard reality of a 100 TB ingest. Caught by running the
        docs fuzz gate at n=1."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        pq.write_table(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["the cat sat on the mat " * 4]),
            "lang": pa.array(["en"]),
            "source": pa.array(["t"]),
            "n_chars": pa.array([92], pa.int64()),
        }), os.path.join(tmp_path, "documents.parquet"))
        d = str(tmp_path)

        inc = Q.incremental_dedup_docs(d)
        assert len(inc) == 1 and not inc.dup_of_history.iloc[0]
        inc2 = Q.incremental_dedup_docs(d, force_shuffle=True)
        pd.testing.assert_frame_equal(inc, inc2)
        assert len(Q.dup_ngram_grams(d)) == 0
        assert len(Q.dup_ngram_grams(d, hash_shuffle=True)) == 0
        cov = Q.doc_dup_span_coverage(d)
        assert cov.dup_pos.tolist() == [0]
        cov2 = Q.doc_dup_span_coverage(d, hash_shuffle=True)
        pd.testing.assert_frame_equal(cov, cov2)
        st = Q.doc_dup_span_stats(d)
        assert st.longest_dup_span.tolist() == [0]
        lm = Q.bigram_lm_doc_scores(d)
        assert len(lm) == 1 and lm.n_bigrams.iloc[0] == 23


class TestBpeMerges:
    def _brute(self, words, counts, k):
        import collections
        exp, out, ws = {}, [], list(words)
        for i in range(k):
            stats = collections.Counter()
            for w, c in zip(ws, counts):
                for a, b in zip(w, w[1:]):
                    stats[a + b] += c
            if not stats:
                break
            pair, c = sorted(stats.items(),
                             key=lambda kv: (-kv[1], kv[0]))[0]
            ch = chr(ord("A") + i)
            expn = exp.get(pair[0], pair[0]) + exp.get(pair[1], pair[1])
            exp[ch] = expn
            out.append((i + 1, pair, c, expn))
            ws = [w.replace(pair, ch) for w in ws]
        return out

    def test_overlap_and_double_merge_conventions(self, ray_session):
        """'aaa' counts two (a,a) pairs but applies leftmost
        non-overlapping ('Aa'); 'abab' merges twice ('AA'); a later
        merge may consume an earlier merge char (expansion tracks it)."""
        from aumos_drift_detector_ray.stages.textops import learn_bpe_merges

        words = ["aaa", "abab", "xab"]
        counts = np.array([5, 3, 4], dtype=np.int64)
        got = learn_bpe_merges(words, counts, k=3)
        want = self._brute(words, counts, 3)
        assert list(map(tuple, got.to_numpy())) == want
        # merge 1 must be (a,b): count 3+3+4=10 beats (a,a)'s 10? tie ->
        # 'aa' < 'ab' lexicographically, so (a,a) wins the tie
        assert got.pair.iloc[0] == "aa" and got.pair_count.iloc[0] == 10

    def test_random_vocab_matches_brute_force(self, ray_session):
        from aumos_drift_detector_ray.stages.textops import learn_bpe_merges

        rng = np.random.default_rng(17)
        alpha = list("abcde'")
        words = list({"".join(rng.choice(alpha,
                                         rng.integers(1, 9)))
                      for _ in range(300)})
        counts = rng.integers(1, 50, len(words)).astype(np.int64)
        got = learn_bpe_merges(words, counts, k=10)
        want = self._brute(words, counts, 10)
        assert list(map(tuple, got.to_numpy())) == want

    def test_exhausted_vocab_stops_early(self, ray_session):
        from aumos_drift_detector_ray.stages.textops import learn_bpe_merges

        got = learn_bpe_merges(["ab"], np.array([1]), k=5)
        # merge 1 consumes the only pair; nothing left to merge
        assert got.pair.tolist() == ["ab"] and len(got) == 1
        empty = learn_bpe_merges(["a", "b"], np.array([2, 3]), k=5)
        assert len(empty) == 0

    def test_apply_matches_training_final_state(self, ray_session):
        """apply_bpe_merges replays the same leftmost-non-overlapping
        replaces the trainer did, so applying the learned merges to the
        training vocab reproduces the trainer's final encoded words."""
        from aumos_drift_detector_ray.stages.textops import (
            apply_bpe_merges, learn_bpe_merges)

        rng = np.random.default_rng(23)
        alpha = list("abcd'")
        words = list({"".join(rng.choice(alpha, rng.integers(1, 9)))
                      for _ in range(200)})
        counts = rng.integers(1, 30, len(words)).astype(np.int64)
        merges = learn_bpe_merges(words, counts, k=6)
        # brute: replay the replace chain by hand
        ws = list(words)
        for i, p in enumerate(merges.pair):
            ws = [w.replace(p, chr(ord("A") + i)) for w in ws]
        assert apply_bpe_merges(words, merges.pair.tolist()) == ws


class TestBpeTokenizedDocStats:
    def test_invariants_and_conservation(self, ray_session):
        """Per-doc BPE tokenization stats: symbol count >= token count
        >= word count (each merge shrinks, each word is >= 1 token),
        compression is the exact ratio, and the summed word/symbol
        counts conserve against an independent corpus-side count."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.bpe_tokenized_doc_stats(SF)
        assert len(out) > 0
        assert (out.n_syms >= out.n_bpe_tokens).all()
        assert (out.n_bpe_tokens >= out.n_words).all()
        assert np.allclose(out.compression,
                           out.n_syms / out.n_bpe_tokens)
        docs = pd.read_parquet(os.path.join(SF, "documents.parquet"),
                               columns=["doc_id", "text"])
        lists = docs.text.fillna("").str.lower().str.findall(WORD_RE)
        nw = lists.map(len)
        want_words = int(nw.sum())
        want_syms = int(lists.map(lambda ws: sum(map(len, ws))).sum())
        assert int(out.n_words.sum()) == want_words
        assert int(out.n_syms.sum()) == want_syms
        # inner-join semantics: zero-word docs are absent
        assert set(out.doc_id) == set(docs.doc_id[nw > 0])


class TestShingleCosinePairs:
    def test_segment_pairs_enumeration(self):
        from aumos_drift_detector_ray.pipelines.table_queries import \
            _segment_pairs

        import itertools
        sizes = np.array([3, 1, 0, 4, 2], dtype=np.int64)
        li, ri = _segment_pairs(sizes)
        got = set(zip(li.tolist(), ri.tolist()))
        want, off = set(), 0
        for s in sizes:
            want |= set(itertools.combinations(range(off, off + s), 2))
            off += s
        assert got == want and len(li) == len(want)
        li0, ri0 = _segment_pairs(np.array([], dtype=np.int64))
        assert len(li0) == 0 and len(ri0) == 0

    def test_invariants(self, ray_session):
        """Pairs are ordered and unique, integer parts satisfy the
        cross-multiplied threshold exactly, and cosine is the single
        fp op over the integer parts (Cauchy-Schwarz bounds dot)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.shingle_cosine_pairs(SF)
        assert len(out) > 0
        assert (out.doc_a < out.doc_b).all()
        assert not out.duplicated(["doc_a", "doc_b"]).any()
        for _, r in out.iterrows():
            d, na, nb = int(r["dot"]), int(r.norm_a), int(r.norm_b)
            assert d * d * 4 >= na * nb          # t = 1/2 predicate
            assert d * d <= na * nb              # Cauchy-Schwarz
        assert np.array_equal(
            out.cosine.to_numpy(),
            out["dot"].to_numpy(np.int64)
            / np.sqrt(out.norm_a.to_numpy(np.float64)
                      * out.norm_b.to_numpy(np.float64)))


class TestOhlcResample:
    def test_matches_pandas_brute(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.ohlc_resample_events(SF)
        e = pd.read_parquet(os.path.join(SF, "events.parquet"),
                            columns=["event_id", "ts", "event_type",
                                     "value"])
        e = e[e.value.notna()]
        e["bucket"] = e.ts.astype("int64") // 21_600_000_000
        e = e.sort_values(["event_type", "bucket", "ts", "event_id"])
        want = e.groupby(["event_type", "bucket"], as_index=False).agg(
            open=("value", "first"), high=("value", "max"),
            low=("value", "min"), close=("value", "last"),
            n=("value", "size"))
        want["n"] = want.n.astype("int64")
        pd.testing.assert_frame_equal(
            out, want.sort_values(["event_type", "bucket"])
            .reset_index(drop=True))


class TestQ7Paths:
    def test_join_fallback_matches_broadcast(self, ray_session,
                                             monkeypatch):
        """Above the broadcast gate Q7 must run the hash_join path for
        customer AND supplier — output identical to the broadcast
        dicts."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        # default pair is empty at sf0.001 — use a populated one here
        # (the sf0.01 oracle gate checks the default parameters)
        kw = dict(nations=("NATION_11", "NATION_20"), years=(1995, 2001))
        fast = Q.tpch_q7_trade_matrix(SF, **kw)
        monkeypatch.setattr(Q, "_BROADCAST_JOIN_MAX_ROWS", 0)
        slow = Q.tpch_q7_trade_matrix(SF, **kw)
        assert len(fast) > 0
        pd.testing.assert_frame_equal(fast, slow)


class TestQuantizationAudit:
    def test_constant_dim_and_bound(self, ray_session, tmp_path):
        """Constant dims quantize with zero error (the scale==0 guard);
        non-degenerate dims keep max error within scale/2 + fp slack."""
        import pyarrow.parquet as pq
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(11)
        m = rng.normal(0, 1, (50, 4)).astype(np.float32)
        m[:, 2] = 7.5                       # constant dim
        t = pa.table({"vec_id": pa.array(range(50), pa.int64()),
                      "embedding": pa.array(list(m),
                                            pa.list_(pa.float32())),
                      "label": pa.array([0] * 50, pa.int32())})
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        out = Q.embedding_quantization_audit(str(tmp_path))
        assert len(out) == 4
        row = out[out.dim == 3].iloc[0]
        assert row.scale == 0.0 and row.max_abs_err == 0.0
        ok = out[out.dim != 3]
        assert (ok.max_abs_err <= ok.scale / 2 * (1 + 1e-9)).all()


class TestSkyline:
    def test_kernel_matches_brute_dominance(self):
        from aumos_drift_detector_ray.functions.arrays import skyline2d_mask

        rng = np.random.default_rng(5)
        for trial in range(30):
            n = int(rng.integers(1, 120))
            # coarse grids force ties, duplicates, and equal-axis cases
            p = rng.integers(0, 8, n).astype(np.float64)
            d = rng.integers(0, 8, n).astype(np.int64)
            got = skyline2d_mask(p, d)
            want = np.array([
                not any((p[j] <= p[i] and d[j] <= d[i]
                         and (p[j] < p[i] or d[j] < d[i]))
                        for j in range(n))
                for i in range(n)])
            assert np.array_equal(got, want), (trial, p, d)

    def test_merge_property_and_query(self, ray_session):
        from aumos_drift_detector_ray.functions.arrays import skyline2d_mask
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(6)
        p = rng.normal(0, 1, 400)
        d = rng.integers(0, 50, 400).astype(np.int64)
        whole = skyline2d_mask(p, d)
        ka, kb = skyline2d_mask(p[:200], d[:200]), skyline2d_mask(
            p[200:], d[200:])
        cp = np.concatenate([p[:200][ka], p[200:][kb]])
        cd = np.concatenate([d[:200][ka], d[200:][kb]])
        merged = set(zip(cp[skyline2d_mask(cp, cd)], cd[skyline2d_mask(cp, cd)]))
        assert merged == set(zip(p[whole], d[whole]))
        out = Q.order_skyline(SF)
        assert len(out) > 0
        assert out.o_orderkey.is_monotonic_increasing


class TestTpchQ18Q10:
    def test_q18_threshold_and_order(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.tpch_q18_large_orders(SF)
        assert len(out) > 0
        assert (out.sum_qty > 250).all()
        # top-k order: totalprice desc, orderkey asc on ties
        v = list(zip(-out.o_totalprice, out.o_orderkey))
        assert v == sorted(v)
        assert out.c_name.notna().all()

    def test_q10_revenue_matches_brute(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.tpch_q10_returned_items(SF)
        li = pd.read_parquet(os.path.join(SF, "lineitem.parquet"))
        o = pd.read_parquet(os.path.join(SF, "orders.parquet"))
        li = li[li.l_returnflag == "R"]
        j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        j = j[(j.o_orderdate >= "1997-01-01") & (j.o_orderdate < "1997-04-01")]
        rev_c = np.round(
            (j.l_extendedprice * (1 - j.l_discount)).to_numpy() * 10000
        ).astype(np.int64)
        want = pd.DataFrame({"c": j.o_custkey.to_numpy(), "r": rev_c}) \
            .groupby("c").r.sum().sort_values(ascending=False)
        assert len(out) == min(20, len(want))
        got = dict(zip(out.c_custkey,
                       np.round(out.revenue * 10000).astype(np.int64)))
        for ck, rc in got.items():
            assert want[ck] == rc
