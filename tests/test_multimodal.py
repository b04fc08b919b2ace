"""Multimodal plumbing + the real WAV decode path."""

from __future__ import annotations

import math

import pytest

from bio2bel_spark.operators.multimodal import (
    FEATURE_DIM,
    _wav_bytes,
    _wav_features,
    audio_from_documents,
    decode_features,
    media_from_documents,
)


def test_wav_roundtrip_features_match_signal_theory():
    doc_id = 5  # freq = 110 + 5*55 = 385 Hz, amp = 0.1 + 5*0.1 = 0.6
    feats = _wav_features(_wav_bytes(doc_id, sample_rate=8000, seconds=0.25))
    duration, rms, zcr, peak = feats[0], feats[1], feats[2], feats[3]
    assert duration == pytest.approx(0.25)
    # a sine at amplitude A has rms A/sqrt(2) and peak ~A
    assert rms == pytest.approx(0.6 / math.sqrt(2), rel=0.02)
    assert peak == pytest.approx(0.6, rel=0.02)
    # zero crossings per sample ~ 2*freq/sr
    assert zcr == pytest.approx(2 * 385.0 / 8000.0, rel=0.05)
    # band energies sum to ~1
    assert sum(feats[5:8]) == pytest.approx(1.0, rel=1e-6)


def test_decode_features_wav_backend_end_to_end(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    audio = audio_from_documents(docs)
    out = decode_features(audio, backend="wav").collect()
    assert len(out) == 8
    for row in out:
        assert row["kind"] == "audio"
        assert len(row["features"]) == FEATURE_DIM
        assert row["features"][0] == pytest.approx(0.25)
    # deterministic: same doc_id -> same features
    again = decode_features(audio_from_documents(docs), backend="wav").collect()
    assert {r["doc_id"]: r["features"] for r in out} == {
        r["doc_id"]: r["features"] for r in again
    }


def test_decode_features_stub_and_unknown_backend(spark, tables):
    media = media_from_documents(tables["documents"].limit(4))
    assert decode_features(media, backend="stub").count() == 4
    with pytest.raises(Exception, match="NotImplementedError|backend"):
        decode_features(media, backend="pillow").collect()
