"""Tests for text embedding / LLM-output drift, multimodal stub stages,
C2ST, and the HTML report."""

from __future__ import annotations

import numpy as np
import pytest

from aumos_drift_detector_ray import synth


class TestEmbedding:
    def test_hashing_embed_deterministic_normalized(self):
        from aumos_drift_detector_ray.stages.embed import hashing_embed

        a = hashing_embed(["hello world", "other text"], dim=32)
        b = hashing_embed(["hello world", "other text"], dim=32)
        assert np.allclose(a, b)
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)

    def test_similar_texts_closer_than_different(self):
        from aumos_drift_detector_ray.stages.embed import hashing_embed

        e = hashing_embed([
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "completely unrelated database query planning text",
        ], dim=64)
        assert e[0] @ e[1] > e[0] @ e[2]

    def test_llm_output_drift(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray.stages.embed import llm_output_drift

        rng = np.random.default_rng(42)
        vocab_a = "alpha beta gamma delta epsilon zeta eta theta".split()
        vocab_b = "uno dos tres cuatro cinco seis siete ocho".split()

        def mk(vocab, n):
            return [" ".join(rng.choice(vocab, 12)) for _ in range(n)]

        same_a = rd.from_arrow(pa.table({"text": mk(vocab_a, 200)}))
        same_b = rd.from_arrow(pa.table({"text": mk(vocab_a, 200)}))
        diff = rd.from_arrow(pa.table({"text": mk(vocab_b, 200)}))
        stable = llm_output_drift(same_a, same_b)
        shifted = llm_output_drift(same_a, diff)
        assert not stable["drift_detected"]
        assert shifted["drift_detected"]
        assert shifted["test"] == "llm_output_mmd"


class TestMultimodal:
    def test_image_decode_stage(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.multimodal import decode_media

        tbl = synth.make_batch(0, 30, synth.SynthConfig(seed=1, run="m"))
        out = decode_media(rd.from_arrow(tbl), "image").to_pandas()
        assert "bytes" not in out.columns
        assert out.decoded_ok.all()
        assert (out.width == out.w).all() and (out.height == out.h).all()

    def test_audio_stub_fake(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray.stages.multimodal import decode_media

        ds = rd.from_arrow(pa.table({
            "bytes": [b"FAKEAUDIO" * 10, b"OTHERBYTES" * 20],
        }))
        out = decode_media(ds, "audio", fmt_col=None).to_pandas()
        assert out.decoded_ok.all()
        assert out.duration_s.between(0.5, 30).all()

    def test_audio_stub_strict_raises(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray.stages.multimodal import decode_media

        ds = rd.from_arrow(pa.table({"bytes": [b"x" * 32]}))
        with pytest.raises(Exception):  # NotImplementedError inside the task
            decode_media(ds, "audio", fmt_col=None, strict=True).materialize()

    def test_resize_stage(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray import codecs
        from aumos_drift_detector_ray.stages.multimodal import ImageResizer

        tbl = synth.make_batch(0, 5, synth.SynthConfig(seed=2, run="m"))
        out = rd.from_arrow(tbl).map_batches(
            ImageResizer, fn_constructor_args=(16,), batch_format="pyarrow",
            concurrency=1,
        ).to_pandas()
        img = codecs.decode(out.bytes.iloc[0], "png")
        assert img.shape == (16, 16, 3)

    def test_frame_sample_plan(self):
        from aumos_drift_detector_ray.stages.multimodal import frame_sample_stub

        assert frame_sample_stub(10, 3) == [0, 3, 6, 9]


class TestC2ST:
    def test_same_distribution_near_half(self):
        from aumos_drift_detector_ray.functions.stats import classifier_two_sample_test

        rng = np.random.default_rng(42)
        r = classifier_two_sample_test(rng.normal(size=(400, 4)),
                                       rng.normal(size=(400, 4)))
        assert abs(r["auroc"] - 0.5) < 0.08
        assert not r["drift_detected"]

    def test_shifted_detected(self):
        from aumos_drift_detector_ray.functions.stats import classifier_two_sample_test

        rng = np.random.default_rng(42)
        r = classifier_two_sample_test(rng.normal(size=(400, 4)),
                                       rng.normal(size=(400, 4)) + 1.0)
        assert r["auroc"] > 0.6 and r["drift_detected"]
        assert len(r["feature_importances"]) == 4


class TestReport:
    def test_html_report_contains_content(self):
        from aumos_drift_detector_ray.functions.report import (
            executive_summary, generate_html_report,
        )

        dets = [
            {"feature": "w", "test_name": "psi", "score": 0.55, "threshold": 0.2,
             "is_drifted": True, "severity": "critical"},
            {"feature": "h", "test_name": "ks", "score": 0.4, "threshold": 0.05,
             "is_drifted": False, "severity": "info"},
        ]
        htm = generate_html_report("run1", dets,
                                   [{"partition_id": 0, "check": "fmt_domain",
                                     "violations": 2, "rows": 100, "passed": False}])
        assert "<html" in htm and "critical" in htm and "fmt_domain" in htm
        assert "svg" in htm
        summ = executive_summary(dets)
        assert "1 of 2" in summ and "critical" in summ
        assert executive_summary([]) == "No drift checks were run."


class TestRealMediaCodecs:
    def test_wav_roundtrip_mono_and_stereo(self):
        import numpy as np
        from aumos_drift_detector_ray import media_codecs as M

        rng = np.random.default_rng(3)
        mono = (rng.normal(0, 0.2, 800) * 32767).astype(np.int16)
        s, rate = M.decode_wav(M.encode_wav(mono, 8000))
        assert rate == 8000 and np.array_equal(s[:, 0], mono)
        stereo = (rng.normal(0, 0.2, (500, 2)) * 32767).astype(np.int16)
        s2, rate2 = M.decode_wav(M.encode_wav(stereo, 16000))
        assert rate2 == 16000 and np.array_equal(s2, stereo)

    def test_wav_rejects_garbage_and_nonpcm(self):
        import pytest as _pytest
        from aumos_drift_detector_ray import media_codecs as M

        with _pytest.raises(M.MediaError):
            M.decode_wav(b"not a wav at all" * 4)

    def test_audio_features_match_numpy_reference(self):
        import numpy as np
        from aumos_drift_detector_ray import media_codecs as M

        rate = 8000
        t = np.arange(rate) / rate
        pcm = np.clip(0.5 * np.sin(2 * np.pi * 440.0 * t) * 32767,
                      -32768, 32767).astype(np.int16)
        f = M.audio_features(pcm, rate)
        assert abs(f["duration_s"] - 1.0) < 1e-9
        # RMS of 0.5 sine ~ 0.3536 (int16 quantization tolerance)
        assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 1e-3
        # a pure 440 Hz tone's spectral centroid is ~440 Hz
        assert abs(f["spectral_centroid_hz"] - 440.0) < 15.0
        # zero crossings of a 440 Hz tone: 2 * 440 per second
        assert abs(f["zcr"] - 2 * 440.0 / rate) < 5e-3

    def test_video_container_roundtrip_and_sampling(self):
        import numpy as np
        from aumos_drift_detector_ray import media_codecs as M

        rng = np.random.default_rng(4)
        frames = [rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
                  for _ in range(7)]
        blob = M.encode_video(frames, fps=24.0, frame_fmt="raw")
        n, fps = M.video_info(blob)
        assert (n, fps) == (7, 24.0)
        dec = M.decode_video_frames(blob)
        assert len(dec) == 7
        assert all(np.array_equal(a, b) for a, b in zip(dec, frames))
        every3 = M.decode_video_frames(blob, every=3)
        assert len(every3) == 3
        assert np.array_equal(every3[1], frames[3])

    def test_audio_stage_real_wav(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray import media_codecs as M
        from aumos_drift_detector_ray.stages.multimodal import decode_media

        blobs = [M.synth_audio(42, i) for i in range(10)]
        ds = rd.from_arrow(pa.table({"bytes": blobs}))
        out = decode_media(ds, "audio", fmt_col=None, strict=True).to_pandas()
        assert out.decoded_ok.all()          # real decode, strict mode OK
        assert (out.duration_s > 0).all()
        assert out.rms.between(0.001, 1.0).all()
        assert (out.spectral_centroid_hz > 0).all()
        # features equal the direct numpy reference for row 0
        s, r = M.decode_wav(blobs[0])
        f = M.audio_features(s, r)
        assert abs(out.duration_s.iloc[0] - f["duration_s"]) < 1e-12

    def test_video_stage_real_container(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray import media_codecs as M
        from aumos_drift_detector_ray.stages.multimodal import decode_media

        blobs = [M.synth_video(42, i, n_frames=6) for i in range(5)]
        ds = rd.from_arrow(pa.table({"bytes": blobs}))
        out = decode_media(ds, "video", fmt_col=None, strict=True).to_pandas()
        assert out.decoded_ok.all()
        assert (out.n_frames == 6).all() and (out.fps == 24.0).all()
        assert out.mean_frame_luma.between(0, 255).all()

    def test_frame_sampler_explodes_video_rows(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray import codecs, media_codecs as M
        from aumos_drift_detector_ray.stages.multimodal import sample_frames

        blobs = [M.synth_video(42, i, n_frames=8) for i in range(3)]
        ds = rd.from_arrow(pa.table({
            "media_id": [f"v{i}" for i in range(3)], "bytes": blobs,
        }))
        out = sample_frames(ds, every=4).to_pandas()
        assert len(out) == 3 * 2  # 8 frames sampled every 4 → 2 per video
        assert sorted(out.frame_index.unique()) == [0, 4]
        img = codecs.decode(out.frame_bytes.iloc[0], "png")
        assert img.shape == (32, 32, 3)

    def test_compressed_audio_still_stubbed(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        import pytest as _pytest
        from aumos_drift_detector_ray.stages.multimodal import decode_media

        ds = rd.from_arrow(pa.table({"bytes": [b"ID3\x04fakemp3" * 4]}))
        with _pytest.raises(Exception):  # NotImplementedError inside task
            decode_media(ds, "audio", fmt_col=None, strict=True).materialize()
        out = decode_media(ds, "audio", fmt_col=None, strict=False).to_pandas()
        assert out.decoded_ok.all() and out.duration_s.between(0.5, 30).all()


class TestMediaFingerprints:
    def test_audio_fingerprint_near_dup_vs_distinct(self):
        import numpy as np
        from aumos_drift_detector_ray import codecs, media_codecs as M

        rng = np.random.default_rng(5)
        s0, r = M.decode_wav(M.synth_audio(42, 0))
        fp0 = M.audio_fingerprint64(s0, r)
        # tiny additive noise → few bits flip
        noisy = np.clip(s0.astype(np.int32)
                        + rng.integers(-50, 51, s0.shape), -32768, 32767
                        ).astype(np.int16)
        fp_noisy = M.audio_fingerprint64(noisy, r)
        d_near = int(codecs.hamming64(np.array([fp0]), np.array([fp_noisy]))[0])
        assert d_near <= 6
        # unrelated clip → far apart
        s1, r1 = M.decode_wav(M.synth_audio(42, 1))
        fp1 = M.audio_fingerprint64(s1, r1)
        d_far = int(codecs.hamming64(np.array([fp0]), np.array([fp1]))[0])
        assert d_far > d_near and d_far >= 10

    def test_audio_fingerprint_gain_invariant(self):
        """Difference-of-density bits compare RATIOS of band energies, so
        an ATTENUATING gain change (volume down) leaves the fingerprint
        essentially unchanged — only int16 re-quantization at near-equal
        adjacent densities can flip a bit or two. (Amplifying gains are
        excluded: they clip these near-full-scale synth clips, which
        legitimately spreads harmonics across bands.)"""
        import numpy as np
        from aumos_drift_detector_ray import codecs, media_codecs as M

        for i in range(6):
            s0, r = M.decode_wav(M.synth_audio(42, i))
            fp0 = M.audio_fingerprint64(s0, r)
            for gain in (0.25, 0.5):
                scaled = np.clip(s0.astype(np.float64) * gain,
                                 -32768, 32767).astype(np.int16)
                fp_g = M.audio_fingerprint64(scaled, r)
                d = int(codecs.hamming64(np.array([fp0]),
                                         np.array([fp_g]))[0])
                assert d <= 4, (i, gain, d)

    def test_video_fingerprint_near_dup_vs_distinct(self):
        import numpy as np
        from aumos_drift_detector_ray import codecs, media_codecs as M

        rng = np.random.default_rng(6)
        blob0 = M.synth_video(42, 0, n_frames=6)
        frames = M.decode_video_frames(blob0)
        noisy = [np.clip(f.astype(np.int16)
                         + rng.integers(-1, 2, f.shape), 0, 255
                         ).astype(np.uint8) for f in frames]
        blob_noisy = M.encode_video(noisy, 24.0, frame_fmt="png")
        fp0 = M.video_fingerprint64(blob0)
        fpn = M.video_fingerprint64(blob_noisy)
        d_near = int(codecs.hamming64(np.array([fp0]), np.array([fpn]))[0])
        assert d_near <= 4
        blob1 = M.synth_video(42, 3, n_frames=6)
        fp1 = M.video_fingerprint64(blob1)
        d_far = int(codecs.hamming64(np.array([fp0]), np.array([fp1]))[0])
        assert d_far > d_near and d_far >= 8

    def test_media_neardup_pipeline_end_to_end(self, ray_session):
        """Planted near-identical audio pair found by the fingerprint
        stage + the existing banded-Hamming shuffle; distinct clips are
        not paired."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray import media_codecs as M
        from aumos_drift_detector_ray.stages import dedup
        from aumos_drift_detector_ray.stages.multimodal import (
            add_media_fingerprint)

        rng = np.random.default_rng(9)
        blobs, ids = [], []
        for i in range(12):
            blobs.append(M.synth_audio(42, i))
            ids.append(i)
        # plant: clip 12 = noisy copy of clip 0
        s0, r = M.decode_wav(blobs[0])
        noisy = np.clip(s0.astype(np.int32)
                        + rng.integers(-30, 31, s0.shape), -32768, 32767
                        ).astype(np.int16)
        blobs.append(M.encode_wav(noisy, r))
        ids.append(12)
        ds = rd.from_arrow(pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "bytes": pa.array(blobs, pa.binary()),
        }))
        fp = add_media_fingerprint(ds, "audio")
        pairs = dedup.near_dup_pairs_hamming(
            fp, hash_col="media_fp", id_col="media_id", tol=6).to_pandas()
        found = {tuple(sorted((a, b)))
                 for a, b in zip(pairs.id_a, pairs.id_b)}
        assert (0, 12) in found
