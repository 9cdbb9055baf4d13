"""Multimodal column plumbing: opaque binary payloads + actor-pool codecs.

Media (image/audio/video) travels as an opaque ``binary`` column with typed
metadata; decode / feature-extraction / resize are actor-pool ``map_batches``
stages.  The actual codecs (PIL/ffmpeg/torchvision) are NOT in this container,
so the decode kernel is stubbed: ``DecodeMedia(mode="fake")`` produces a
deterministic fake decode (so the Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested), and ``mode="real"``
raises ``NotImplementedError`` at the exact call site a codec would occupy.

Batch-size note: binary payloads make rows wide — callers should size
``batch_size`` so ``batch_size × payload × concurrency`` fits worker heaps
(e.g. 64 for ~1 MB images), and rely on the streaming executor's backpressure
for the rest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_META_STRUCT = pa.struct(
    [
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("n_frames", pa.int32()),
    ]
)


def attach_fake_payloads(ds, ref_col: str = "media_ref", payload_bytes: int = 256):
    """Materialize a deterministic binary payload per media_ref (test stand-in
    for reading blob storage)."""

    def fn(batch: pa.Table) -> pa.Table:
        refs = batch[ref_col].to_pylist()
        payloads = []
        metas = []
        for r in refs:
            seed = hashlib.blake2b((r or "").encode(), digest_size=8).digest()
            rng = np.random.default_rng(int.from_bytes(seed, "little"))
            payloads.append(rng.bytes(payload_bytes))
            metas.append(
                {"mime": "image/fake", "width": 16, "height": 16, "n_frames": 1}
            )
        return batch.append_column(
            "payload", pa.array(payloads, pa.binary())
        ).append_column("media_meta", pa.array(metas, MEDIA_META_STRUCT))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=64)


class DecodeMedia:
    """Actor-pool decode stage: payload binary → feature vector column.

    ``mode="fake"``: deterministic hash-features (pipeline plumbing testable
    without codecs).  ``mode="real"``: the integration point for an actual
    decoder — loads would happen once here in ``__init__``.
    """

    def __init__(self, mode: str = "fake", feat_dim: int = 16):
        self.mode = mode
        self.feat_dim = feat_dim
        if mode == "real":
            # codec import/model load would go here (once per actor)
            raise NotImplementedError(
                "no image/audio codecs in this environment; use mode='fake'"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.empty((len(payloads), self.feat_dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            digest = hashlib.blake2b(p or b"", digest_size=8).digest()
            rng = np.random.default_rng(int.from_bytes(digest, "little"))
            v = rng.standard_normal(self.feat_dim)
            feats[i] = v / np.linalg.norm(v)
        return batch.append_column(
            "media_features",
            pa.array([row.tolist() for row in feats], pa.list_(pa.float32())),
        )


def decode_media(ds, mode: str = "fake", feat_dim: int = 16,
                 concurrency=(1, 4), batch_size: int = 64):
    return ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"mode": mode, "feat_dim": feat_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
