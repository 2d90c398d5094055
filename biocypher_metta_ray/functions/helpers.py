"""Pure helper kernels shared across stages.

Reimplements (from public semantics, not code) the reference's helper
surface — float clamping, composite id builders, range filtering —
see /root/reference/biocypher_metta/adapters/helpers.py:30-39 (id
builders), :92-115 (``to_float`` exponent clamp), :118-142
(``check_genomic_location`` window filter) — plus the stable hashing
primitives our distributed stages key on.
"""

from __future__ import annotations

import hashlib
from math import floor, isinf, log10

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_EXPONENT = 307


def to_float(value) -> float:
    """Parse ``value`` to float, clamping the exponent to ±1e307.

    Mirrors the reference's signed-64-bit-safe normalizer
    (/root/reference/biocypher_metta/adapters/helpers.py:92-115):
    +inf -> 1e307, -inf -> 1e-307 (sic — reference behavior), and any
    magnitude whose decimal exponent exceeds ±307 is rescaled back
    into range.
    """
    number = float(value)
    if number == 0:
        return number
    if isinf(number) and number > 0:
        return float("1e307")
    if isinf(number) and number < 0:
        return float("1e-307")
    exponent = floor(log10(abs(number)))
    if abs(exponent) > MAX_EXPONENT:
        if exponent < 0:
            number = number * float(f"1e{abs(exponent) - MAX_EXPONENT}")
        else:
            number = number / float(f"1e{abs(exponent) - MAX_EXPONENT}")
    return number


def build_region_id(chrom: str, start: int, end: int, assembly: str = "GRCh38") -> str:
    """Composite region key ``{chr}_{start}_{end}_{assembly}``
    (reference: helpers.py:36-39)."""
    return f"{chrom}_{start}_{end}_{assembly}"


def build_variant_id(chrom, pos, ref, alt, assembly: str = "GRCh38") -> str:
    """Composite variant key (reference: helpers.py:29-34)."""
    return f"{str(chrom).lower()}_{pos}_{ref}_{alt}_{assembly}"


def in_window(
    values_start, values_end, lo: int | None, hi: int | None
) -> np.ndarray:
    """Vectorized window predicate over Arrow/numpy start+end columns.

    Generalizes the reference's per-row ``check_genomic_location``
    (helpers.py:118-142): ``lo is None`` selects everything; otherwise
    keep rows with ``start >= lo`` and (if ``hi``) ``end <= hi``.
    Returns a boolean numpy mask.
    """
    starts = np.asarray(values_start)
    ends = np.asarray(values_end)
    mask = np.ones(len(starts), dtype=bool)
    if lo is not None:
        mask &= starts >= lo
    if hi is not None:
        mask &= ends <= hi
    return mask


# ---------------------------------------------------------------------------
# Stable hashing — every distributed key (dedup, canonicalization buckets,
# salting) uses these, never Python's randomized hash().
# ---------------------------------------------------------------------------

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def stable_hash64(text: str) -> int:
    """First 8 bytes of md5 as an unsigned 64-bit int; stable across
    processes/partitionings (unlike ``hash()``)."""
    return int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8], "big")


def hash64_column(arr: pa.Array | list[str]) -> np.ndarray:
    """Vectorized stable 64-bit hash of a string column -> uint64 ndarray.

    Uses a per-value md5 (C speed via hashlib) — the hot path for
    exact dedup and hash-partition bucketing.
    """
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_pylist()
    out = np.empty(len(arr), dtype=np.uint64)
    for i, s in enumerate(arr):
        if s is None:
            out[i] = 0
        else:
            out[i] = int.from_bytes(
                hashlib.md5(s.encode("utf-8")).digest()[:8], "big"
            )
    return out


def bucket_of(keys, num_buckets: int) -> np.ndarray:
    """Stable hash-bucket assignment for a string column."""
    return (hash64_column(keys) % np.uint64(num_buckets)).astype(np.int64)


def escape_ws(s: str) -> str:
    """Collapse runs of whitespace to single spaces (normalization used
    by fingerprinting)."""
    return " ".join(s.split())
