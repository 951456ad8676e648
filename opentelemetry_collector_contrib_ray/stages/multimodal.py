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
