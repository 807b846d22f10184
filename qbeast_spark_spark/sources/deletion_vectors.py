"""Delta deletion vectors: pure-Python codec + Spark-side row filtering.

Implements the public Delta protocol's deletion-vector storage format
(delta-io PROTOCOL.md, "Deletion Vectors" + "Deletion Vector Descriptor
Schema"), so this engine can

1. IMPORT Delta tables whose add-actions carry ``deletionVector``
   descriptors (previously rejected — sources/delta_import.py), and
2. DELETE rows from its own tables WITHOUT rewriting data files — the
   100 TB answer: a small bitmap sidecar per file instead of a rewrite
   of every matched file (sources/dml.py ``mode="dv"``), and
3. EXPORT its own DV'd tables back out as valid Delta logs
   (sources/delta_export.py) — sidecars are written in the Delta ``.bin``
   framing with the standard UUID naming from the start, so export is a
   metadata-only descriptor emit.

Format layers (all little-endian unless noted, per the spec):

- Z85 text codec (ZeroMQ RFC 32) for inline DVs and UUID path encoding.
- 32-bit Roaring Bitmap, standard interchange format (RoaringFormatSpec):
  cookie 12346 (no runs, +int32 container count) or 12347 (run-capable,
  count-1 in the upper 16 bits + a run-flag bitset); container descriptors
  (uint16 key, uint16 cardinality-1); optional int32 offsets; then array
  (uint16 values), bitmap (1024 x int64), or run (uint16 pairs) container
  payloads. The encoder here emits cookie-12346 array/bitmap containers
  only (always legal); the decoder accepts all three container types.
- RoaringBitmapArray "portable" format (delta-io RoaringBitmapArray):
  int32 magic 1681511377, int64 number of 32-bit bitmaps, then each
  bitmap in the standard format. A 64-bit row index v lives in bitmap
  ``v >> 32`` at value ``v & 0xFFFFFFFF``.
- DV file (``deletion_vector_<uuid>.bin``): 1 format-version byte (1);
  each stored vector is [int32 BIG-endian dataSize][dataSize bytes of
  portable bitmap][int32 BIG-endian CRC-32 of those bytes]; the
  descriptor's ``offset`` points at the size prefix and ``sizeInBytes``
  is dataSize (framing excluded).

The reference engine inherits DVs from delta-spark when users run Delta
DML against its tables (docs/Quickstart.md:409-427 tells them the index
is lost afterwards); reading them here keeps such tables importable.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "z85_encode", "z85_decode", "roaring_array_encode",
    "roaring_array_decode", "write_dv_file", "read_dv_file",
    "DVDescriptor", "dv_abs_path", "with_dv_filter", "positions_df",
]

_Z85_CHARS = ("0123456789abcdefghijklmnopqrstuvwxyz"
              "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

MAGIC_NUMBER = 1681511377          # RoaringBitmapArray portable magic
_SERIAL_COOKIE = 12347             # run-capable roaring stream
_SERIAL_COOKIE_NO_RUN = 12346      # array/bitmap containers only
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096                  # larger containers switch to bitmap
DV_FORMAT_VERSION = 1


# -- Z85 ------------------------------------------------------------------

def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"Z85 input must be 4-byte aligned, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 text must be 5-char aligned, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i:i + 5]:
            v = v * 85 + _Z85_INDEX[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


# -- 32-bit roaring bitmap ------------------------------------------------

def _encode_bitmap32(values: np.ndarray) -> bytes:
    """Standard-format serialization of one 32-bit roaring bitmap.
    ``values``: sorted unique uint32. Emits cookie-12346 (array/bitmap
    containers, offsets always present) — every reader accepts it."""
    keys = (values >> 16).astype(np.uint32)
    uniq, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(values)]
    containers: List[Tuple[int, int, bytes]] = []   # (key, card, payload)
    for j, key in enumerate(uniq):
        lo = values[bounds[j]:bounds[j + 1]] & 0xFFFF
        card = len(lo)
        if card <= _ARRAY_MAX:
            payload = lo.astype("<u2").tobytes()
        else:
            bits = np.zeros(1024, dtype="<u8")
            idx = lo.astype(np.uint64)
            # shift operand must already be uint64: a uint32 shift count
            # promotes the whole expression down and wraps for counts >= 32
            np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                             np.left_shift(np.uint64(1),
                                           idx & np.uint64(63)))
            payload = bits.tobytes()
        containers.append((int(key), card, payload))
    n = len(containers)
    head = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(struct.pack("<HH", k, c - 1) for k, c, _ in containers)
    # offsets are from the start of the serialized bitmap
    off = len(head) + len(desc) + 4 * n
    offsets = []
    for _k, _c, payload in containers:
        offsets.append(off)
        off += len(payload)
    return (head + desc +
            b"".join(struct.pack("<i", o) for o in offsets) +
            b"".join(p for _k, _c, p in containers))


def _decode_bitmap32(buf: memoryview, pos: int) -> Tuple[np.ndarray, int]:
    """Decode one standard-format 32-bit roaring bitmap starting at
    ``pos``; returns (sorted uint32 values, next position)."""
    start = pos
    (cookie,) = struct.unpack_from("<i", buf, pos)
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        n_flag = (n + 7) // 8
        run_flags = bytes(buf[pos:pos + n_flag])
        pos += n_flag
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, cm1 + 1
        pos += 4
    has_offsets = (cookie == _SERIAL_COOKIE_NO_RUN or
                   n >= _NO_OFFSET_THRESHOLD)
    if has_offsets:
        pos += 4 * n    # we read containers sequentially anyway
    parts: List[np.ndarray] = []
    for i in range(n):
        is_run = bool(run_flags and (run_flags[i // 8] >> (i % 8)) & 1)
        base = np.uint32(int(keys[i]) << 16)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs,
                                 offset=pos).reshape(-1, 2)
            pos += 4 * n_runs
            vals = np.concatenate([
                np.arange(int(s), int(s) + int(l) + 1, dtype=np.uint32)
                for s, l in runs]) if n_runs else \
                np.empty(0, dtype=np.uint32)
        elif cards[i] <= _ARRAY_MAX:
            vals = np.frombuffer(buf, dtype="<u2", count=int(cards[i]),
                                 offset=pos).astype(np.uint32)
            pos += 2 * int(cards[i])
        else:
            bits = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            vals = np.flatnonzero(
                np.unpackbits(bits.view(np.uint8), bitorder="little")
            ).astype(np.uint32)
        parts.append(base + vals)
    del start
    return (np.concatenate(parts) if parts else
            np.empty(0, dtype=np.uint32)), pos


def roaring_array_encode(positions: Sequence[int]) -> bytes:
    """Portable-format RoaringBitmapArray of sorted 64-bit row indexes."""
    uniq = sorted(set(int(p) for p in positions))
    if uniq and uniq[0] < 0:
        raise ValueError("row indexes must be non-negative")
    vals = np.asarray(uniq, dtype=np.uint64)
    highs = (vals >> np.uint64(32)).astype(np.uint32)
    n_maps = int(highs[-1]) + 1 if len(vals) else 0
    out = [struct.pack("<iq", MAGIC_NUMBER, n_maps)]
    for h in range(n_maps):
        lows = (vals[highs == h] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        out.append(_encode_bitmap32(lows))
    return b"".join(out)


def roaring_array_decode(data: bytes) -> np.ndarray:
    """Portable-format RoaringBitmapArray -> sorted int64 row indexes."""
    buf = memoryview(data)
    magic, n_maps = struct.unpack_from("<iq", buf, 0)
    if magic != MAGIC_NUMBER:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    parts: List[np.ndarray] = []
    for h in range(n_maps):
        vals, pos = _decode_bitmap32(buf, pos)
        parts.append(vals.astype(np.int64) + (h << 32))
    return (np.concatenate(parts) if parts else
            np.empty(0, dtype=np.int64))


# -- DV descriptor + .bin file I/O ---------------------------------------

class DVDescriptor:
    """The log-side deletion-vector pointer (Delta "Deletion Vector
    Descriptor Schema"): storageType 'u' (UUID-named sidecar, path
    encoded as optional prefix + Z85 UUID), 'i' (inline Z85 payload) or
    'p' (absolute path)."""

    __slots__ = ("storage_type", "path_or_inline", "offset",
                 "size_in_bytes", "cardinality")

    def __init__(self, storage_type: str, path_or_inline: str,
                 offset: Optional[int], size_in_bytes: int,
                 cardinality: int) -> None:
        self.storage_type = storage_type
        self.path_or_inline = path_or_inline
        self.offset = offset
        self.size_in_bytes = int(size_in_bytes)
        self.cardinality = int(cardinality)

    def to_json(self) -> Dict:
        out = {"storageType": self.storage_type,
               "pathOrInlineDv": self.path_or_inline,
               "sizeInBytes": self.size_in_bytes,
               "cardinality": self.cardinality}
        if self.offset is not None:
            out["offset"] = int(self.offset)
        return out

    @staticmethod
    def from_json(o: Dict) -> "DVDescriptor":
        return DVDescriptor(o["storageType"], o["pathOrInlineDv"],
                            o.get("offset"), o["sizeInBytes"],
                            o["cardinality"])


def dv_abs_path(table_path: str, desc: DVDescriptor) -> Optional[str]:
    """Absolute sidecar path for a file-backed descriptor (None when
    inline). 'u': pathOrInlineDv = <random prefix><20-char Z85 UUID>,
    resolving to <table>/<prefix>/deletion_vector_<uuid>.bin."""
    if desc.storage_type == "i":
        return None
    if desc.storage_type == "p":
        return desc.path_or_inline
    if desc.storage_type != "u":
        raise ValueError(f"unknown DV storageType {desc.storage_type!r}")
    enc = desc.path_or_inline
    prefix, uid_part = enc[:-20], enc[-20:]
    uid = _uuid.UUID(bytes=z85_decode(uid_part))
    name = f"deletion_vector_{uid}.bin"
    return os.path.join(table_path, prefix, name) if prefix \
        else os.path.join(table_path, name)


def write_dv_file(path: str, data: bytes) -> Tuple[int, int]:
    """Write one DV into a fresh ``.bin`` sidecar with the Delta framing;
    returns (offset, sizeInBytes) for the descriptor."""
    payload = (bytes([DV_FORMAT_VERSION]) +
               struct.pack(">i", len(data)) + data +
               struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "wb") as fh:
        fh.write(payload)
    os.replace(tmp, path)
    return 1, len(data)


def read_dv_file(path: str, offset: Optional[int],
                 size_in_bytes: int) -> bytes:
    """Read one framed DV payload out of a ``.bin`` sidecar, verifying
    the CRC. ``offset`` points at the int32 size prefix (defaults to 1,
    right after the format-version byte)."""
    off = 1 if offset is None else int(offset)
    with open(path, "rb") as fh:
        if fh.read(1)[0] != DV_FORMAT_VERSION:
            raise ValueError(f"unsupported DV file version in {path}")
        fh.seek(off)
        (n,) = struct.unpack(">i", fh.read(4))
        if size_in_bytes and n != size_in_bytes:
            raise ValueError(
                f"DV size mismatch in {path}: framed {n}, "
                f"descriptor {size_in_bytes}")
        data = fh.read(n)
        (crc,) = struct.unpack(">I", fh.read(4))
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch in {path}")
    return data


def descriptor_positions(table_path: str, desc: DVDescriptor) -> np.ndarray:
    """Deleted row indexes of one descriptor (any storage type)."""
    if desc.storage_type == "i":
        data = z85_decode(desc.path_or_inline)
    else:
        data = read_dv_file(dv_abs_path(table_path, desc), desc.offset,
                            desc.size_in_bytes)
    return roaring_array_decode(data)


# -- Spark-side filtering -------------------------------------------------

def _file_uri(abs_path: str) -> str:
    """The string ``_metadata.file_path`` produces for a local file
    (Hadoop Path URI: scheme + path, no authority)."""
    from urllib.parse import quote

    return "file:" + quote(os.path.abspath(abs_path))


def _ensure_shipped() -> None:
    """This module loads lazily (after the package's import-time
    pickle-by-value registration), so register it here before any closure
    referencing its functions is shipped to Python workers."""
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


def positions_df(spark, entries: List[Tuple[str, DVDescriptor]],
                 table_path: str):
    """(file_path, row_index) DataFrame of every deleted row across
    ``entries`` [(absolute data file path, descriptor)]. The decode runs
    on EXECUTORS (one task per DV, Arrow-batched): the driver ships only
    O(#DV files) descriptors, never the position lists — at 100 TB a
    snapshot can carry billions of deleted positions, which must stay
    distributed."""
    from pyspark.sql import types as T

    _ensure_shipped()
    rows = []
    for abs_file, desc in entries:
        rows.append((
            _file_uri(abs_file), desc.storage_type, desc.path_or_inline,
            -1 if desc.offset is None else int(desc.offset),
            desc.size_in_bytes,
            "" if desc.storage_type == "i"
            else dv_abs_path(table_path, desc)))
    schema = T.StructType([
        T.StructField("file_path", T.StringType()),
        T.StructField("st", T.StringType()),
        T.StructField("enc", T.StringType()),
        T.StructField("off", T.IntegerType()),
        T.StructField("size", T.IntegerType()),
        T.StructField("dv_path", T.StringType()),
    ])
    desc_df = spark.createDataFrame(rows, schema)
    n = max(1, len(rows))

    def _expand(iterator):
        import pandas as pd

        for pdf in iterator:
            for r in pdf.itertuples(index=False):
                if r.st == "i":
                    data = z85_decode(r.enc)
                else:
                    data = read_dv_file(r.dv_path,
                                        None if r.off < 0 else r.off,
                                        r.size)
                pos = roaring_array_decode(data)
                yield pd.DataFrame({
                    "file_path": np.repeat(r.file_path, len(pos)),
                    "row_index": pos})

    out_schema = T.StructType([
        T.StructField("file_path", T.StringType()),
        T.StructField("row_index", T.LongType()),
    ])
    return desc_df.repartition(n).mapInPandas(_expand, out_schema)


# with_dv_filter small-snapshot fast path: while the TOTAL deleted
# positions fit under this bound (known from descriptor cardinalities,
# no decode needed), the masks are decoded on the DRIVER and shipped as
# an explicitly-broadcast join side — same anti-join as the large path,
# minus its per-execution Python decode stage (worker spinup +
# exchange), which every DML verb re-paid. A/B on the real qb_dml flow:
# 7.7 s vs 10.9 s. (A literal-map array_contains filter was tried first
# and measured 2x SLOWER inside MERGE/matview plans — it costs
# O(per-file cardinality) per row.) Above the bound the distributed
# anti-join keeps billions of positions off the driver (the 100 TB
# path). Bound rationale (r8 second session): 256k positions decode in
# <100 ms and the worst-case frame — each row repeating a full file
# URI string, ~120-200 bytes/row — is 30-60 MB, still comfortably
# driver-safe on any real driver; the r8 merge-on-read verbs
# routinely leave 50k+ masked positions between optimize() runs, and
# the old 16k cap silently demoted every post-UPDATE read to the slow
# lane (measured: the whole qb_dml A/B gap above). The decoded
# broadcast frame is CACHED per exact descriptor set (below), so the
# several _df_for_files calls one DML verb or matview refresh issues
# pay the driver decode once, not per plan.
_SMALL_DV_MAX_POSITIONS = 262_144

# (session id, table path, frozen descriptor set) -> (broadcast-ready
# position DataFrame, decoded position count, weakref to the session).
# Tiny bounded LRU: entries die as soon as any DV changes (the
# descriptor uuids change), so staleness is impossible — the key IS the
# content identity. Bounded by TOTAL decoded positions (not entry
# count): eight worst-case 262k-position frames would otherwise pin
# ~0.5 GB of driver-side local relations for the process lifetime.
# Entries whose SparkSession has stopped are evicted on the next call
# (the cached DataFrame would otherwise keep the dead session alive).
_SMALL_DV_CACHE: "OrderedDict" = None  # type: ignore[assignment]
_SMALL_DV_CACHE_MAX_ENTRIES = 32
_SMALL_DV_CACHE_MAX_TOTAL_POSITIONS = 1_048_576


def _session_stopped(sess) -> bool:
    """True when the session's SparkContext is gone or stopped."""
    try:
        sc = getattr(sess, "_sc", None) or sess.sparkContext
        return sc is None or getattr(sc, "_jsc", None) is None
    except Exception:
        return True


def _small_dv_frame(spark, entries, table_path: str):
    """Driver-decoded (file_path, row_index) frame for a small
    descriptor set, cached per exact content identity."""
    import pandas as pd
    import weakref
    from collections import OrderedDict
    from pyspark.sql import functions as F

    global _SMALL_DV_CACHE
    if _SMALL_DV_CACHE is None:
        _SMALL_DV_CACHE = OrderedDict()
    # evict dead entries first: their session is stopped (or collected),
    # so the cached frame is unusable and only pins JVM-side memory
    for k in [k for k, (_pos, _n, wr) in _SMALL_DV_CACHE.items()
              if (s := wr()) is None or _session_stopped(s)]:
        del _SMALL_DV_CACHE[k]
    key = (id(spark), os.path.abspath(table_path), tuple(sorted(
        (abs_file, d.path_or_inline, d.offset, d.size_in_bytes)
        for abs_file, d in entries)))
    hit = _SMALL_DV_CACHE.get(key)
    if hit is not None:
        _SMALL_DV_CACHE.move_to_end(key)
        return hit[0]
    frames = []
    for abs_file, desc in entries:
        p = descriptor_positions(table_path, desc)
        frames.append(pd.DataFrame({
            "file_path": np.repeat(_file_uri(abs_file), len(p)),
            "row_index": p.astype("int64")}))
    # explicit schema: an all-empty position set (cardinality-0
    # descriptors on an imported table) must not crash inference
    pdf = pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame({"file_path": pd.Series(dtype="str"),
                      "row_index": pd.Series(dtype="int64")})
    pos = F.broadcast(spark.createDataFrame(
        pdf, schema="file_path string, row_index long"))
    try:
        wr = weakref.ref(spark)
    except TypeError:       # session type not weakref-able: no caching
        return pos
    _SMALL_DV_CACHE[key] = (pos, len(pdf), wr)
    while len(_SMALL_DV_CACHE) > 1 and (
            len(_SMALL_DV_CACHE) > _SMALL_DV_CACHE_MAX_ENTRIES
            or sum(n for (_p, n, _w) in _SMALL_DV_CACHE.values())
            > _SMALL_DV_CACHE_MAX_TOTAL_POSITIONS):
        _SMALL_DV_CACHE.popitem(last=False)
    return pos


def with_dv_filter(df, spark, entries: List[Tuple[str, DVDescriptor]],
                   table_path: str):
    """Anti-join ``df`` (a parquet scan) against its deleted positions.

    Scale shape: the scan gains two generated metadata columns (no
    extra I/O); the anti-join keys on (file_path, row_index). Small
    snapshots (<= _SMALL_DV_MAX_POSITIONS total, the common case —
    optimize() purges DVs continuously) decode on the driver and
    broadcast the position side; larger snapshots decode on executors
    (positions_df). No O(rows) data ever moves through Python either
    way."""
    from pyspark.sql import functions as F

    if not entries:
        return df
    cols = df.columns
    if sum(d.cardinality for _, d in entries) <= _SMALL_DV_MAX_POSITIONS:
        pos = _small_dv_frame(spark, entries, table_path)
    else:
        pos = positions_df(spark, entries, table_path)
    return (df.withColumn("__fp", F.col("_metadata.file_path"))
              .withColumn("__ri", F.col("_metadata.row_index"))
              .join(pos, on=[F.col("__fp") == pos.file_path,
                             F.col("__ri") == pos.row_index],
                    how="left_anti")
              .select(*cols))
