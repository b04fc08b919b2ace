"""Golden-value anchors for the six rows-only driver queries.

These queries carry no DuckDB value oracle (binary decode / physical
packing), so the driver only row-counts them. The media generators are
deterministic functions of ``(doc_id, n_chars)``, which means an
INDEPENDENT numpy/zlib re-implementation can compute the FULL expected
output — not just round-trip samples — and compare it against the entire
Spark result (round-4 verdict ask #2).

Independence notes: the audio anchor recomputes features from the signal
formula directly, bypassing both the RIFF/WAVE encoder and decoder; the
image/video anchors recompute pixel statistics from the gradient formulas,
bypassing the PPM/Y4M container round-trip; packing/compression anchors are
pure-Python re-implementations over pandas.
"""

from __future__ import annotations

import math
import sys
import zlib

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _collect_sorted(df, keys):
    pdf = df.toPandas().sort_values(keys).reset_index(drop=True)
    return pdf


def test_golden_audio_features(spark, docs_pd):
    """Full-output anchor: generator → WAV encode → wave decode → features
    must equal direct signal math for EVERY document."""
    import __spark_entry__ as e

    got = _collect_sorted(e.queries()["audio_features"](spark, SF_DIR), ["doc_id"])

    rows = []
    sr, seconds = 8000, 0.25
    n = int(sr * seconds)
    t = np.arange(n, dtype=np.float64)
    for doc_id in sorted(docs_pd["doc_id"]):
        freq = 110.0 + float(doc_id % 32) * 55.0
        amp = 0.1 + float(doc_id % 7) * 0.1
        sig = np.clip(amp * np.sin(2.0 * np.pi * freq * t / sr), -1, 1)
        x = (sig * 32767.0).astype("<i2").astype(np.float64) / 32768.0
        rows.append(
            (
                doc_id,
                "audio",
                round(n / sr, 4),
                round(float(np.sqrt(np.mean(x * x))), 4),
                round(float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))), 4),
                round(float(np.max(np.abs(x))), 4),
            )
        )
    want = pd.DataFrame(
        rows, columns=["doc_id", "kind", "duration_sec", "rms", "zcr", "peak"]
    )
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64"}), want, check_dtype=False
    )


def _expected_image(doc_id: int, n_chars: int):
    w, h = n_chars % 640 + 32, n_chars % 480 + 32
    y, x = np.mgrid[0:h, 0:w]
    r = ((x * (doc_id % 7 + 1)) % 256).astype(np.float64)
    g = ((y * (doc_id % 5 + 1)) % 256).astype(np.float64)
    b = ((x + y + doc_id) % 256).astype(np.float64)
    return w, h, r, g, b


def _nn_idx(src: int, dst: int):
    return (np.arange(dst) * src // dst).clip(0, src - 1)


def test_golden_image_features(spark, docs_pd):
    """Full-output anchor: PPM encode → parse → nn-resize → channel stats
    must equal direct gradient math for every 10th document."""
    import __spark_entry__ as e

    got = _collect_sorted(e.queries()["image_features"](spark, SF_DIR), ["doc_id"])

    rows = []
    sub = docs_pd[docs_pd["doc_id"] % 10 == 0].sort_values("doc_id")
    for doc_id, n_chars in zip(sub["doc_id"], sub["n_chars"]):
        w, h, r, g, b = _expected_image(int(doc_id), int(n_chars))
        scale = min(64 / w, 64 / h, 1.0)
        tw = int(math.floor(w * scale + 0.5))
        th = int(math.floor(h * scale + 0.5))
        ys, xs = _nn_idx(h, th), _nn_idx(w, tw)
        sr_, sg, sb = (c[ys][:, xs] for c in (r, g, b))
        luma = 0.299 * sr_ + 0.587 * sg + 0.114 * sb
        rows.append(
            (
                int(doc_id), w, h, tw, th,
                round(float(sr_.mean()), 4),
                round(float(sg.mean()), 4),
                round(float(sb.mean()), 4),
                round(float(luma.std()), 4),
            )
        )
    want = pd.DataFrame(
        rows,
        columns=[
            "doc_id", "width", "height", "target_width", "target_height",
            "mean_r", "mean_g", "mean_b", "std_luma",
        ],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_golden_video_features(spark, docs_pd):
    """Full-output anchor: Y4M encode → stream-parse → sampled-frame luma
    stats must equal direct gradient math for every (doc, sampled frame)."""
    import __spark_entry__ as e

    got = _collect_sorted(
        e.queries()["video_features"](spark, SF_DIR), ["doc_id", "frame_index"]
    )

    rows = []
    for doc_id, n_chars in zip(
        docs_pd.sort_values("doc_id")["doc_id"], docs_pd.sort_values("doc_id")["n_chars"]
    ):
        doc_id, n_chars = int(doc_id), int(n_chars)
        w, h = n_chars % 32 + 16, n_chars % 24 + 16
        nf = n_chars % 8 + 2
        y, x = np.mgrid[0:h, 0:w]
        for f in range(0, nf, 2):
            plane = ((x * (doc_id % 7 + 1) + y * (f + 1) + doc_id + f) % 256)
            arr = plane.astype(np.float64)
            rows.append(
                (
                    doc_id, f,
                    round(float(arr.mean()), 6),
                    round(float(arr.std()), 6),
                    int(plane.min()),
                    int(plane.max()),
                )
            )
    want = pd.DataFrame(
        rows,
        columns=[
            "doc_id", "frame_index", "mean_luma", "std_luma",
            "min_luma", "max_luma",
        ],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_golden_compression_ratio(spark, docs_pd):
    """Full-output anchor vs direct zlib-level-6 on every document."""
    import __spark_entry__ as e

    got = _collect_sorted(e.queries()["compression_ratio"](spark, SF_DIR), ["doc_id"])

    rows = []
    for doc_id, text in zip(
        docs_pd.sort_values("doc_id")["doc_id"], docs_pd.sort_values("doc_id")["text"]
    ):
        raw = (text if isinstance(text, str) else "").encode("utf-8")
        nb, nc = len(raw), len(zlib.compress(raw, 6))
        rows.append((int(doc_id), nb, nc, round(nc / nb, 6) if nb else None))
    want = pd.DataFrame(rows, columns=["doc_id", "n_bytes", "n_compressed", "ratio"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_golden_pack_first_fit(spark, docs_pd):
    """Anchor vs an independent pure-Python first-fit-decreasing packer:
    per-source pack counts, doc counts, and char totals must all agree."""
    import __spark_entry__ as e

    got = _collect_sorted(e.queries()["pack_first_fit"](spark, SF_DIR), ["source"])

    budget = 2048
    rows = []
    for source, grp in docs_pd.groupby("source"):
        grp = grp.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        remaining: list[int] = []
        for tok in grp["n_chars"]:
            for i, cap in enumerate(remaining):
                if tok <= cap:
                    remaining[i] = cap - tok
                    break
            else:
                remaining.append(max(budget - tok, 0))
        rows.append(
            (source, len(remaining), len(grp), int(grp["n_chars"].sum()))
        )
    want = pd.DataFrame(
        rows, columns=["source", "n_packs", "n_docs", "total_chars"]
    ).sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _ahash(doc_id_pixels: int, n_chars: int) -> int:
    """Independent aHash: gradient image → luma → 8×8 nn-downsample →
    mean-threshold bits packed row-major into a signed 64-bit int."""
    w, h, r, g, b = _expected_image(doc_id_pixels, n_chars)
    luma = 0.299 * r + 0.587 * g + 0.114 * b
    ys, xs = _nn_idx(h, 8), _nn_idx(w, 8)
    small = luma[ys][:, xs]
    bits = (small > small.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= 1 << 63 else v


def test_golden_image_phash_pairs(spark, docs_pd):
    """Anchor vs brute-force hamming over independently-computed aHashes.
    The pigeonhole banding (8 bands / 64 bits, threshold 7) guarantees
    FULL recall at hamming ≤ 7, so the banded join must return exactly
    the brute-force pair set."""
    import __spark_entry__ as e

    got = _collect_sorted(
        e.queries()["image_phash_pairs"](spark, SF_DIR), ["id_a", "id_b"]
    )

    sub = docs_pd[docs_pd["doc_id"] % 10 == 0]
    fps = {
        int(d): _ahash(int(d), int(n))
        for d, n in zip(sub["doc_id"], sub["n_chars"])
    }
    # twins: regenerated with the ORIGINAL doc_id's pixels, shifted id
    for d, n in zip(sub["doc_id"], sub["n_chars"]):
        if int(d) % 50 == 0:
            fps[int(d) + 1_000_000] = _ahash(int(d), int(n))
    ids = sorted(fps)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
            if ham <= 7:
                rows.append((a, b, ham))
    want = (
        pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(want) > 0  # the planted twins must surface
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
