"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media decode libraries (PIL/ffmpeg/librosa) are not in this container, so
the decode kernels are deterministic fakes clearly marked as stubs — but the
Spark-side plumbing (binary schema, Arrow batch shape, mapInPandas
signatures, partitioning) is real and tested; swapping in a real decoder is
a one-function change.
"""

from __future__ import annotations

__all__ = ["with_binary_payload", "binary_metadata", "decode_image_stub",
            "frame_sample_stub"]

STUB_NOTE = ("decode is a deterministic stub (media libs unavailable in "
             "this environment); replace _fake_decode with a real codec")


def with_binary_payload(df, src_col: str, payload_col: str = "payload"):
    """Treat a column's bytes as an opaque media payload column."""
    from pyspark.sql import functions as F

    return df.withColumn(payload_col, F.col(src_col).cast("binary"))


def binary_metadata(df, payload_col: str = "payload", id_col: str = "doc_id"):
    """Typed metadata for a binary column — JVM-side, no UDF."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col),
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )


def _fake_decode(payload: bytes):
    """Deterministic stand-in for an image decoder: derives a plausible
    (width, height, channels) from the payload bytes."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % 1_000_003
    return (64 + h % 1920, 64 + (h // 7) % 1080, 3)


def decode_image_stub(df, payload_col: str = "payload",
                      id_col: str = "doc_id"):
    """mapInPandas decode: Arrow-batched, schema-stable — the real shape of
    a distributed media-decode stage. STUB: see STUB_NOTE."""
    import pandas as pd

    schema = f"{id_col} long, width int, height int, channels int"

    def decode(batches):
        for pdf in batches:
            out = {"width": [], "height": [], "channels": []}
            for payload in pdf[payload_col]:
                w, h, c = _fake_decode(bytes(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
            yield pd.DataFrame({id_col: pdf[id_col], **out})

    return df.select(id_col, payload_col).mapInPandas(decode, schema)


def frame_sample_stub(df, payload_col: str = "payload",
                      id_col: str = "doc_id", every_n: int = 10):
    """Video frame-sampling plumbing: one row per sampled frame index.
    STUB decode; real batch/explode shape."""
    import pandas as pd

    schema = f"{id_col} long, frame_idx int, frame_sha int"

    def sample(batches):
        for pdf in batches:
            ids, fidx, fsha = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                n_frames = max(1, len(data) // 97)
                for f in range(0, n_frames, every_n):
                    ids.append(i)
                    fidx.append(f)
                    fsha.append(sum(data[f:f + 8]) % 65536)
            yield pd.DataFrame({id_col: ids, "frame_idx": fidx,
                                "frame_sha": fsha})

    return df.select(id_col, payload_col).mapInPandas(sample, schema)
