"""The engine's ONE deterministic hash-bucket primitive.

Every content-hash decision in the engine — sampling keeps, split
assignment, Count-Min cells, DSIR feature buckets, dedup fingerprint
derivatives — reduces to the same expression: the first 8 md5 hex
chars of a string as a bigint, optionally modulo a bucket count. It is
defined ONCE here because each use site must stay literal-identical to
its DuckDB oracle mirror (``('0x' || substr(md5(x), 1, 8))::BIGINT
% n``); a drift in any copy (substring width, cast, salt placement)
silently breaks hash parity for just that query, which is exactly the
class of bug a single definition makes impossible.

md5 (not xxhash64/murmur) because it is the hash both engines —
and Python's hashlib, used by test references — implement
identically; the value range is [0, 2^32), so no sign handling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_hex8", "md5_bucket"]


def md5_hex8(expr: Column) -> Column:
    """First 8 md5 hex chars → bigint in [0, 2^32)."""
    return F.conv(F.substring(F.md5(expr), 1, 8), 16, 10).cast("bigint")


def md5_bucket(expr: Column, n: int) -> Column:
    """Deterministic bucket in [0, n) from the md5 content hash."""
    return md5_hex8(expr) % n
