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
    for reading blob storage).  Refs hashing to an even byte get video-shaped
    metadata (n_frames > 1) so the frame-sampling stage has real work."""

    def fn(batch: pa.Table) -> pa.Table:
        refs = batch[ref_col].to_pylist()
        payloads = []
        metas = []
        for r in refs:
            seed = hashlib.blake2b((r or "").encode(), digest_size=8).digest()
            rng = np.random.default_rng(int.from_bytes(seed, "little"))
            is_video = seed[0] % 2 == 0
            n_frames = 1 + (seed[1] % 8) if is_video else 1
            payloads.append(rng.bytes(payload_bytes * n_frames))
            metas.append(
                {
                    "mime": "video/fake" if is_video else "image/fake",
                    "width": 16,
                    "height": 16,
                    "n_frames": n_frames,
                }
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
            # codec import/model load goes here (once per actor); fetch the
            # model weights through the node-local artifact cache:
            #   from entity_resolution_ray.state.artifacts import ensure_artifact
            #   path = ensure_artifact(model_uri)  # once per node
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


class ResizeMedia:
    """Actor-pool resize stage: payload → (target_h × target_w) pixel grid.

    ``mode="fake"``: the payload bytes ARE the source pixel grid
    (``media_meta.width × height``, row-major), average-pooled to the target
    — deterministic and shape-correct, so batch sizing / metadata rewrite /
    output layout are real.  ``mode="real"`` is the PIL/torchvision seam.
    """

    def __init__(self, target_w: int = 8, target_h: int = 8, mode: str = "fake"):
        self.tw = target_w
        self.th = target_h
        if mode == "real":
            raise NotImplementedError(
                "no image codecs in this environment; use mode='fake'"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = batch["media_meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out = []
        new_meta = []
        for p, m in zip(payloads, metas):
            w, h = m["width"], m["height"]
            src = np.frombuffer((p or b"")[: w * h], dtype=np.uint8)
            if len(src) < w * h:
                src = np.pad(src, (0, w * h - len(src)))
            grid = src.reshape(h, w).astype(np.float32)
            # average-pool to target: split rows/cols into target bins
            pooled = (
                grid.reshape(self.th, h // self.th, self.tw, w // self.tw)
                .mean(axis=(1, 3))
                if h % self.th == 0 and w % self.tw == 0
                else np.array(
                    [
                        [
                            grid[
                                int(r * h / self.th): max(int((r + 1) * h / self.th), int(r * h / self.th) + 1),
                                int(c * w / self.tw): max(int((c + 1) * w / self.tw), int(c * w / self.tw) + 1),
                            ].mean()
                            for c in range(self.tw)
                        ]
                        for r in range(self.th)
                    ],
                    dtype=np.float32,
                )
            )
            out.append(pooled.reshape(-1).tolist())
            new_meta.append({**m, "width": self.tw, "height": self.th})
        return batch.append_column(
            "pixels", pa.array(out, pa.list_(pa.float32()))
        ).set_column(
            batch.column_names.index("media_meta"),
            "media_meta",
            pa.array(new_meta, MEDIA_META_STRUCT),
        )


def resize_media(ds, target_w: int = 8, target_h: int = 8, mode: str = "fake",
                 concurrency=(1, 4), batch_size: int = 64):
    return ds.map_batches(
        ResizeMedia,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h,
                               "mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(ds, every_k: int = 2):
    """Frame sampling: one output row per kept frame (frame_index column),
    deterministic every-k policy; single-frame media passes through as frame
    0.  Payload slices per frame ride along (fake layout: equal byte spans).
    """

    def fn(batch: pa.Table) -> pa.Table:
        metas = batch["media_meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        keep_rows, frame_idx, frame_payloads = [], [], []
        for i, (p, m) in enumerate(zip(payloads, metas)):
            n = max(1, m["n_frames"])
            span = len(p or b"") // n if n else 0
            for f in range(0, n, every_k):
                keep_rows.append(i)
                frame_idx.append(f)
                frame_payloads.append((p or b"")[f * span: (f + 1) * span])
        taken = batch.take(pa.array(keep_rows, pa.int64()))
        taken = taken.drop_columns(["payload"])
        return taken.append_column(
            "frame_index", pa.array(frame_idx, pa.int32())
        ).append_column("payload", pa.array(frame_payloads, pa.binary()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=64)
