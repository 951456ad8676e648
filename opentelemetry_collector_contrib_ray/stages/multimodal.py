"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with sidecar
metadata (media_type, width/height/duration).  The Ray-side plumbing —
schema, small-batch actor-pool stages, output layout — is real and tested;
the actual codec work is STUBBED (no image/audio libs in this container):

- ``decode_fn=None`` raises ``NotImplementedError`` (the clearly-marked
  production hook — plug in PIL/soundfile per actor in ``__init__``).
- ``FakeDecode`` is the deterministic test double: "decodes" a payload to
  (n_bytes, checksum) features so the pipeline shape is exercised end-to-end.

Large payloads need SMALL batches: size batch_size so
``batch_size × payload × concurrency`` fits in worker heaps (SURVEY/guide
memory rule) — callers pass ``batch_size=32``-ish, not the 1024 default.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image/png", "audio/wav", ...
        ("payload", pa.large_binary()),
        ("meta_json", pa.string()),
    ]
)


class MediaFeatureExtract:
    """Actor-pool stage: payload binary -> feature columns.

    ``decode`` is called once per payload inside the batch loop; real
    decoders (PIL.Image.open, librosa.load) are injected per actor — loaded
    ONCE in ``__init__`` by subclasses, never per batch.
    """

    def __init__(self, decode=None):
        self.decode = decode

    def _decode(self, payload: bytes, media_type: str):
        if self.decode is None:
            raise NotImplementedError(
                "media decode stub: no codec libraries in this environment; "
                "inject decode=... (e.g. PIL-based) to enable"
            )
        return self.decode(payload, media_type)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        feats = [self._decode(p, t) for p, t in zip(payloads, types)]
        out = batch.drop_columns(["payload"])  # features replace raw bytes
        out = out.append_column(
            "feature", pa.array(feats, pa.list_(pa.float32()))
        )
        return out


def fake_decode(payload: bytes, media_type: str) -> list[float]:
    """Deterministic stand-in decoder: 4 float features from the bytes."""
    digest = hashlib.md5(payload or b"").digest()
    return [
        float(len(payload or b"")),
        float(digest[0]),
        float(digest[1]),
        float(int.from_bytes(digest[2:4], "little")),
    ]


def media_features(ds, decode=fake_decode, batch_size: int = 32, concurrency=(1, 4)):
    """Attach the (stub-)decode actor-pool stage with payload-safe batches."""
    return ds.map_batches(
        MediaFeatureExtract,
        fn_constructor_kwargs=dict(decode=decode),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def documents_as_media(ds):
    """Adapter: documents table -> MEDIA_SCHEMA (text bytes as the payload)."""

    def conv(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(batch.column("doc_id"), pa.string())
        payload = pc.cast(batch.column("text"), pa.large_binary())
        n = batch.num_rows
        return pa.table(
            {
                "media_id": ids,
                "media_type": pa.array(["text/plain"] * n, pa.string()),
                "payload": payload,
                "meta_json": pa.array(["{}"] * n, pa.string()),
            }
        )

    return ds.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)


class MediaResize:
    """Actor-pool stage: payload -> resized payload + updated meta.

    The codec call is injected (``resize_fn(payload, media_type, w, h) ->
    bytes``) and loaded once per actor; without one, ``fake_resize``
    deterministically truncates/pads the byte payload proportionally —
    the Ray-side plumbing (meta rewrite, binary output layout, small-batch
    sizing) is the real production shape.
    """

    def __init__(self, width: int, height: int, resize_fn=None):
        import json as _json

        self.width = width
        self.height = height
        self.resize_fn = resize_fn or fake_resize
        self._json = _json

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        out_payload = [self.resize_fn(p, t, self.width, self.height)
                       for p, t in zip(payloads, types)]
        metas = []
        for m in batch.column("meta_json").to_pylist():
            try:
                d = self._json.loads(m or "{}")
            except ValueError:
                d = {}
            d["width"], d["height"] = self.width, self.height
            metas.append(self._json.dumps(d, separators=(",", ":"),
                                          sort_keys=True))
        i = batch.column_names.index("payload")
        batch = batch.set_column(
            i, "payload", pa.array(out_payload, pa.large_binary())
        )
        j = batch.column_names.index("meta_json")
        return batch.set_column(j, "meta_json", pa.array(metas, pa.string()))


def fake_resize(payload: bytes, media_type: str, w: int, h: int) -> bytes:
    """Deterministic stand-in: scale the byte length to w*h, truncating or
    repeating — preserves determinism for tests without codec libs."""
    target = max(1, (w * h) // 64)
    data = payload or b"\0"
    reps = target // len(data) + 1
    return (data * reps)[:target]


class FrameSample:
    """Actor-pool stage: video payload -> k sampled frame rows (flat-map
    shape: ONE input row fans out to ``k`` frame rows with frame_idx).

    Frame extraction is injected (``extract_fn(payload, media_type, idx) ->
    bytes``); the deterministic fake slices the payload into k equal spans.
    """

    def __init__(self, k: int, extract_fn=None):
        self.k = k
        self.extract_fn = extract_fn or fake_frame_extract

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        idx = np.repeat(np.arange(n), self.k)
        frames = np.tile(np.arange(self.k, dtype=np.int32), n)
        rep = batch.take(pa.array(idx, pa.int32()))
        payloads = rep.column("payload").to_pylist()
        types = rep.column("media_type").to_pylist()
        out = [self.extract_fn(p, t, int(f))
               for p, t, f in zip(payloads, types, frames)]
        i = rep.column_names.index("payload")
        rep = rep.set_column(i, "payload", pa.array(out, pa.large_binary()))
        return rep.append_column("frame_idx", pa.array(frames, pa.int32()))


def fake_frame_extract(payload: bytes, media_type: str, idx: int) -> bytes:
    """Deterministic stand-in: the idx-th of k=8 equal payload spans."""
    data = payload or b"\0"
    span = max(1, len(data) // 8)
    return data[idx * span:(idx + 1) * span] or data[-span:]


def media_resize(ds, width: int, height: int, resize_fn=None,
                 batch_size: int = 32, concurrency=(1, 4)):
    return ds.map_batches(
        MediaResize,
        fn_constructor_kwargs=dict(width=width, height=height,
                                   resize_fn=resize_fn),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
    )


def frame_sample(ds, k: int, extract_fn=None, batch_size: int = 16,
                 concurrency=(1, 4)):
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs=dict(k=k, extract_fn=extract_fn),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
    )
