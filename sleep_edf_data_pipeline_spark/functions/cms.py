"""Pure-Python reader for Spark's serialized CountMinSketch.

``F.count_min_sketch`` returns the byte serialization produced by
``org.apache.spark.util.sketch.CountMinSketchImpl.writeTo`` (public
Spark source, sketch/ module; itself a port of stream-lib).  The
layout is a stable versioned wire format (big-endian):

    int32   version            (1)
    int64   totalCount
    int32   depth
    int32   width
    int64   hashA[depth]       (per-row hash multipliers)
    int64   table[depth][width] (row-major counters)

Parsing it here lets registered queries probe the sketch WITHOUT
touching the private ``spark._jvm`` gateway — the parse + probe are
plain Python over ``bytes``, so they run identically on executors
(inside mapInPandas), on the driver, under classic PySpark, and under
Spark Connect.  tests/test_sketch_tolerance.py cross-checks
``estimate_long`` against the JVM implementation's ``estimateCount``
for the same serialized sketch.

The long-item hash mirrors CountMinSketchImpl.hash(long, int):
``h = hashA[i] * item`` in wrapping 64-bit signed arithmetic, then
``h += h >> 32`` (arithmetic shift), ``h &= (2^31 - 1)``, ``h % width``.
Only the final 31 bits survive the mask, so the Java overflow on the
addition is irrelevant; the multiply and shift DO need exact 64-bit
signed semantics, handled by ``_signed64``.
"""

from __future__ import annotations

import struct

_PRIME_MODULUS = (1 << 31) - 1
_U64 = (1 << 64) - 1


def _signed64(x: int) -> int:
    x &= _U64
    return x - (1 << 64) if x >= (1 << 63) else x


class CountMinSketchReader:
    """Parse Spark's serialized CMS and estimate long-item counts."""

    __slots__ = ("total_count", "depth", "width", "hash_a", "table")

    def __init__(self, data: bytes) -> None:
        version, total, depth, width = struct.unpack_from(">iqii", data, 0)
        if version != 1:
            raise ValueError(f"unsupported CountMinSketch version {version}")
        off = 20
        self.total_count = total
        self.depth = depth
        self.width = width
        self.hash_a = struct.unpack_from(f">{depth}q", data, off)
        off += 8 * depth
        expected = off + 8 * depth * width
        if len(data) < expected:
            raise ValueError(
                f"truncated sketch: {len(data)} bytes, expected {expected}"
            )
        rows = []
        for _ in range(depth):
            rows.append(struct.unpack_from(f">{width}q", data, off))
            off += 8 * width
        self.table = rows

    def _bucket(self, item: int, row: int) -> int:
        h = _signed64(self.hash_a[row] * item)
        h = (h + (h >> 32)) & _PRIME_MODULUS
        return h % self.width

    def estimate_long(self, item: int) -> int:
        """Mirror estimateCountForLongItem: min over depth rows."""
        return min(
            self.table[i][self._bucket(item, i)] for i in range(self.depth)
        )

    def to_bytes(self) -> bytes:
        """Re-serialize in the same wire format (inverse of __init__)."""
        parts = [struct.pack(">iqii", 1, self.total_count, self.depth, self.width)]
        parts.append(struct.pack(f">{self.depth}q", *self.hash_a))
        for row in self.table:
            parts.append(struct.pack(f">{self.width}q", *row))
        return b"".join(parts)


def merge_sketch_bytes(*parts: bytes) -> bytes:
    """Merge serialized sketches (same geometry + seed) element-wise.

    CountMinSketch merge is exact: counters and totalCount add, so a
    fold over per-micro-batch sketches is bit-identical to one sketch
    over the concatenated stream (integer addition is order-free).
    Mirrors CountMinSketchImpl.mergeInPlace, including its geometry
    check.
    """
    if not parts:
        raise ValueError("merge_sketch_bytes: nothing to merge")
    readers = [CountMinSketchReader(p) for p in parts]
    first = readers[0]
    merged = CountMinSketchReader(parts[0])
    merged.table = [list(row) for row in merged.table]
    for r in readers[1:]:
        if (r.depth, r.width, r.hash_a) != (
            first.depth,
            first.width,
            first.hash_a,
        ):
            raise ValueError(
                "merge_sketch_bytes: incompatible sketch geometry/seed"
            )
        merged.total_count += r.total_count
        for i in range(first.depth):
            row = merged.table[i]
            other = r.table[i]
            for j in range(first.width):
                row[j] += other[j]
    return merged.to_bytes()
