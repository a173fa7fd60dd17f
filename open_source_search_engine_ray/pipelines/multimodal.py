"""Multimodal column plumbing: opaque binary payloads + typed metadata
processed by stateful actor-pool stages.

The decode step is a clearly-marked STUB (no image/audio libs in this
container): ``DecodeStage.decode_real`` raises NotImplementedError and
``_fake_decode`` produces a deterministic feature vector instead.  The
Ray-side plumbing — binary schema, batch sizing for large payloads, actor
signature with per-actor model state, output layout — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.ghash import hash64_batch

FEAT_DIM = 8


def payloads_dataset(sf_dir: str):
    """Synthesize a binary-payload table from documents: (doc_id,
    payload: binary, media_type, n_bytes).  At 100 TB the payload column is
    the dominant weight → small batches, streaming all the way."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])

    def to_payload(b: pa.Table) -> pa.Table:
        payloads = [(t or "").encode("utf-8") for t in b["text"].to_pylist()]
        media = ["image/fake" if int(d) % 3 == 0 else "audio/fake"
                 for d in b["doc_id"].to_numpy()]
        return pa.table({
            "doc_id": b["doc_id"],
            "payload": pa.array(payloads, pa.large_binary()),
            "media_type": pa.array(media, pa.string()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        })

    return ds.map_batches(to_payload, batch_format="pyarrow")


class DecodeStage:
    """Actor-pool decode/feature-extract stage.

    __init__ = model load (once per actor); __call__ = batched decode.
    Real decode is stubbed — see class docstring.
    """

    def __init__(self, feat_dim: int = FEAT_DIM):
        # "model load": deterministic projection matrix, once per actor
        self.feat_dim = feat_dim
        self.proj = np.random.default_rng(4242).standard_normal((8, feat_dim))

    def decode_real(self, payload: bytes, media_type: str):
        raise NotImplementedError(
            "real image/audio decode needs codec libraries not present in "
            "this environment; _fake_decode stands in deterministically")

    def _fake_decode(self, payloads: list[bytes]) -> np.ndarray:
        """Deterministic 8-dim 'decoded signal' per payload from its hash."""
        hs = hash64_batch(payloads)
        bytes_ = hs.view(np.uint8).reshape(len(payloads), 8)
        return bytes_.astype(np.float64) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        sig = self._fake_decode(payloads)
        feats = sig @ self.proj
        cols = {
            "doc_id": batch["doc_id"],
            "media_type": batch["media_type"],
            "n_bytes": batch["n_bytes"],
        }
        feats = np.round(feats, 6)
        cols["features"] = pa.array(feats.tolist(),
                                    pa.list_(pa.float64(), self.feat_dim))
        return pa.table(cols)


def multimodal_features(sf_dir: str):
    """→ (doc_id, media_type, n_bytes, features list<double>[8]) via the
    actor-pool decode stage with payload-sized batches."""
    return payloads_dataset(sf_dir).map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4), num_cpus=1)
