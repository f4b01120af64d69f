"""Multimodal (image/audio/video) pipeline plumbing for PySpark.

Media is an opaque BINARY payload plus typed metadata; decode /
feature-extract / resize / frame-sample run as pandas functions over
``mapInPandas`` so per-partition codec setup happens once and rows
stream through in Arrow batches — the batch shape a 100 TB media lake
needs. The byte-level codecs are STUBBED (this environment has no
image/audio libraries) with deterministic fakes that mirror
``graft.operators.Multimodal`` on the Scala side; the schema,
partitioning, UDF signatures, and batch iteration are real.
"""

import pandas as pd

FEATURE_DIM = 8


def _init_codec():
    """STUB per-partition codec initialization. A real pipeline opens
    the image/audio codec (PIL, libav, ...) here, once per partition,
    NOT once per row."""
    return {"initialized": True}


def _decode_and_pool(payload: bytes, dim: int) -> list:
    """STUB decode+pool, identical to the Scala
    ``Multimodal.decodeAndPoolStub``: hash byte windows into a fixed
    ``dim``-width float vector. A real implementation decodes pixels /
    samples and average-pools."""
    out = [0.0] * dim
    for i, b in enumerate(payload):
        out[i % dim] += b / 255.0
    return out


def extract_features(df, dim=FEATURE_DIM):
    """media (media_id, kind, payload BINARY, width, height) →
    (media_id, kind, n_bytes, features ARRAY<FLOAT>) via mapInPandas."""
    schema = ("media_id long, kind string, n_bytes int, "
              "features array<float>")

    def batches(iterator):
        _codec = _init_codec()  # once per partition
        for pdf in iterator:
            payloads = pdf["payload"].map(bytes)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(len),
                "features": payloads.map(
                    lambda p: _decode_and_pool(p, dim)),
            })

    return df.mapInPandas(batches, schema)


def sample_frames(df, every_n_bytes=256):
    """Frame sampling signature for video payloads: one output row per
    sampled frame index (STUB: a frame every ``every_n_bytes`` of
    payload stands in for fixed-interval video frame extraction)."""
    schema = "media_id long, frame_no int, frame_offset long"

    def batches(iterator):
        for pdf in iterator:
            ids, nos, offs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(bytes(payload))
                for frame_no, off in enumerate(
                        range(0, n, every_n_bytes)):
                    ids.append(mid)
                    nos.append(frame_no)
                    offs.append(off)
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame_offset": offs})

    return df.mapInPandas(batches, schema)


def resize_meta(df, max_side=64):
    """Resize plan as metadata (STUB: computes target dimensions only —
    a real pipeline would also transform the payload)."""
    schema = ("media_id long, width int, height int, "
              "new_width int, new_height int")

    def batches(iterator):
        for pdf in iterator:
            scale = pdf[["width", "height"]].max(axis=1).map(
                lambda m: min(1.0, max_side / m) if m else 1.0)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "new_width": (pdf["width"] * scale).astype(int),
                "new_height": (pdf["height"] * scale).astype(int),
            })

    return df.mapInPandas(batches, schema)
