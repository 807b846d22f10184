"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode levels in this container (no PIL/ffmpeg/librosa):
- ``decode_image_headers`` is a REAL decoder for image dimensions: it
  byte-parses PNG IHDR, JPEG SOF segments, and GIF headers in pure Python
  (the container has no media libs, but header layouts are bytes, not
  codecs). If PIL is importable at runtime it is used instead and also
  yields the pixel format.
- ``decode_image_stub`` / ``frame_sample_stub`` remain the deterministic
  fakes for full-pixel decode / video frame sampling — clearly marked;
  the Spark-side plumbing (binary schema, Arrow batch shape, mapInPandas
  signatures, partitioning) is real and tested.
- ``png_payload_col`` builds a structurally valid PNG header + payload as
  a pure JVM expression (unhex over formatted hex) — the deterministic
  test-data generator for the decode path.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

__all__ = ["with_binary_payload", "binary_metadata", "png_payload_col",
           "parse_image_header", "decode_image_headers",
           "decode_image_stub", "frame_sample_stub"]

STUB_NOTE = ("decode is a deterministic stub (media libs unavailable in "
             "this environment); replace _fake_decode with a real codec")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_payload_col(width_col, height_col):
    """A structurally valid PNG prefix (signature + IHDR chunk with the
    given big-endian width/height + truncated body) as a JVM binary
    expression — unhex over hex-formatted ints, no Python in the path."""
    from pyspark.sql import functions as F

    def be32(col):
        return F.lpad(F.hex(col.cast("long")), 8, "0")

    hex_str = F.concat(
        F.lit("89504E470D0A1A0A"),        # signature
        F.lit("0000000D49484452"),        # IHDR length=13 + type
        be32(width_col), be32(height_col),
        F.lit("0806000000"),              # bit depth 8, RGBA, CRC elided
    )
    return F.unhex(hex_str)


def parse_image_header(data: bytes) -> Optional[Tuple[str, int, int]]:
    """(format, width, height) from raw image bytes — PNG IHDR, JPEG SOF
    scan, GIF logical screen descriptor; None if unrecognized. Pure
    Python over the first KBs; no codec needed for dimensions."""
    if len(data) >= 24 and data[:8] == _PNG_SIG and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return ("png", w, h)
    if len(data) >= 4 and data[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 <= len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
            # SOF0..SOF15 except DHT/JPG/DAC hold the frame dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return ("gif", w, h)
    return None


def decode_image_headers(df, payload_col: str = "payload",
                         id_col: str = "doc_id"):
    """Distributed image-dimension decode: Arrow-batched mapInPandas over
    the binary column. Uses PIL when importable (full decode), else the
    pure-Python header parse — both real, deterministic decoders."""
    import pandas as pd

    schema = f"{id_col} long, format string, width int, height int"

    def decode(batches):
        try:  # optional dependency: full decoder when present
            from PIL import Image  # noqa: F401
            import io as _io

            def one(data):
                try:
                    with Image.open(_io.BytesIO(data)) as im:
                        return (im.format or "").lower(), im.width, im.height
                except Exception:
                    parsed = parse_image_header(data)
                    return parsed if parsed else (None, None, None)
        except ImportError:
            def one(data):
                parsed = parse_image_header(data)
                return parsed if parsed else (None, None, None)

        for pdf in batches:
            fmts, ws, hs = [], [], []
            for payload in pdf[payload_col]:
                fmt, w, h = one(bytes(payload))
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({id_col: pdf[id_col], "format": fmts,
                                "width": ws, "height": hs})

    return df.select(id_col, payload_col).mapInPandas(decode, schema)


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
