"""Multimodal columns: opaque binary payloads + typed metadata processed
by stateful actor-pool stages (the format-filter analogue of the
reference's pdf/antiword converters, ``SURVEY.md`` §2.1).

The decode step is REAL for the uncompressed container formats this
environment can handle without codec libraries:

- ``image/x-portable-pixmap`` (PPM P6): header parse + raw RGB plane via
  numpy, channel statistics + a strided-mean RESIZE to a 2×2 gray
  thumbnail — actual pixel math, no fakes;
- ``audio/wav`` (PCM16): stdlib ``wave`` + numpy — RMS, zero-crossing
  rate, spectral centroid via FFT, duration; FRAME-SAMPLE takes every
  k-th frame.

Compressed codecs (JPEG/PNG/MP3/H.264) still raise ``NotImplementedError``
behind a clearly-marked gate — those genuinely need external libraries.
The Ray plumbing — binary schema, payload-sized batches, per-actor state —
is identical for both classes, so swapping a real JPEG decoder in is a
one-method change.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pyarrow as pa

FEAT_DIM = 8
SAMPLE_RATE = 8000

_COMPRESSED = {"image/jpeg", "image/png", "audio/mpeg", "video/mp4"}


# --- deterministic payload synthesis (the corpus has no binary columns;
# payloads derive from doc_id so every run regenerates identical bytes) ---

def _make_ppm(doc_id: int) -> bytes:
    rng = np.random.default_rng([99, doc_id])
    h, w = 16 + int(doc_id) % 17, 16 + (int(doc_id) // 3) % 13
    pixels = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def _make_wav(doc_id: int) -> bytes:
    rng = np.random.default_rng([98, doc_id])
    n = 400 + int(doc_id) % 800
    freq = 100.0 + float(doc_id % 900)
    t = np.arange(n) / SAMPLE_RATE
    sig = (0.6 * np.sin(2 * np.pi * freq * t)
           + 0.1 * rng.standard_normal(n))
    pcm = np.clip(sig * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(SAMPLE_RATE)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def payloads_dataset(sf_dir: str):
    """documents → (doc_id, payload binary, media_type, n_bytes) with REAL
    encoded payloads.  At 100 TB the payload column dominates the row
    weight → small batches, streaming all the way down."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def to_payload(b: pa.Table) -> pa.Table:
        payloads, media = [], []
        for d in b["doc_id"].to_numpy():
            if int(d) % 3 == 0:
                payloads.append(_make_ppm(int(d)))
                media.append("image/x-portable-pixmap")
            else:
                payloads.append(_make_wav(int(d)))
                media.append("audio/wav")
        return pa.table({
            "doc_id": b["doc_id"],
            "payload": pa.array(payloads, pa.large_binary()),
            "media_type": pa.array(media, pa.string()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        })

    return ds.map_batches(to_payload, batch_format="pyarrow")


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM → (h, w, 3) uint8 (pure numpy, no codec library)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = []
    pos = 2
    end = len(payload)
    while len(parts) < 3:
        while pos < end and payload[pos:pos + 1].isspace():
            pos += 1
        if pos >= end:
            raise ValueError("truncated PPM header")
        if payload[pos:pos + 1] == b"#":       # comment line
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("truncated PPM header")
            pos = nl + 1
            continue
        start = pos
        while pos < end and not payload[pos:pos + 1].isspace():
            pos += 1
        if pos >= end:
            raise ValueError("truncated PPM header")
        parts.append(int(payload[start:pos]))
    pos += 1                                    # single whitespace after maxval
    w, h, _maxval = parts
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3,
                         offset=pos).reshape(h, w, 3)


def resize_gray(img: np.ndarray, out_h: int = 2, out_w: int = 2) -> np.ndarray:
    """Strided-mean downsample of the luminance plane (real resize op)."""
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = np.linspace(0, h, out_h + 1).astype(int)
    xs = np.linspace(0, w, out_w + 1).astype(int)
    out = np.empty((out_h, out_w))
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    return out


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV (PCM16 mono) → (float64 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    return pcm.astype(np.float64) / 32768.0, rate


def frame_sample(samples: np.ndarray, k: int = 4) -> np.ndarray:
    """Every k-th frame (the video frame-sampling analogue)."""
    return samples[::k]


class DecodeStage:
    """Actor-pool decode/feature-extract stage: __init__ = per-actor state
    (once), __call__ = batched decode.  Emits an 8-dim feature vector per
    payload: images → (mean R/G/B, gray std, 2×2 thumbnail); audio →
    (rms, zero-cross rate, spectral centroid, duration, 4 band energies)."""

    def __init__(self, feat_dim: int = FEAT_DIM):
        self.feat_dim = feat_dim

    def _features_for(self, payload: bytes, media_type: str) -> np.ndarray:
        if media_type in _COMPRESSED:
            raise NotImplementedError(
                f"{media_type} needs a codec library not present in this "
                "environment; supported here: PPM images, PCM16 WAV audio")
        if media_type == "image/x-portable-pixmap":
            img = decode_ppm(payload)
            thumb = resize_gray(img).reshape(-1) / 255.0
            return np.concatenate([
                img.reshape(-1, 3).mean(axis=0) / 255.0,
                [img.astype(np.float64).std() / 255.0],
                thumb])
        if media_type == "audio/wav":
            samples, rate = decode_wav(payload)
            rms = float(np.sqrt((samples ** 2).mean()))
            zcr = float((np.diff(np.signbit(samples)) != 0).mean())
            spec = np.abs(np.fft.rfft(samples))
            freqs = np.fft.rfftfreq(len(samples), 1.0 / rate)
            centroid = float((spec * freqs).sum() / max(spec.sum(), 1e-12)
                             / (rate / 2))
            dur = len(samples) / rate
            bands = np.array_split(spec ** 2, 4)
            e = np.array([b.sum() for b in bands])
            e = e / max(e.sum(), 1e-12)
            return np.concatenate([[rms, zcr, centroid, dur], e])
        raise NotImplementedError(f"unknown media type {media_type}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack([
            self._features_for(p, m) for p, m in
            zip(batch["payload"].to_pylist(),
                batch["media_type"].to_pylist())])
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_type": batch["media_type"],
            "n_bytes": batch["n_bytes"],
            "features": pa.array(np.round(feats, 6).tolist(),
                                 pa.list_(pa.float64(), FEAT_DIM)),
        })


def multimodal_features(sf_dir: str):
    """→ (doc_id, media_type, n_bytes, features list<double>[8]) via the
    actor-pool decode stage with payload-sized batches."""
    return payloads_dataset(sf_dir).map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4), num_cpus=1)
