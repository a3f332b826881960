"""Per-file bloom-filter key index — the engine's analog of Hudi's
default ``BLOOM`` index (the index family the reference configures via
``hoodie.index.type=GLOBAL_BLOOM``, ``SRC/Log2Hudi.scala:78-79``).

Why a third index next to range stats and the record index:

- **Range stats** (``key_min``/``key_max`` in the manifest) prune
  upsert/delete candidates driver-side for *clustered* keys — but with
  random keys (UUIDs, content hashes) every file spans the full key
  space and min/max prunes nothing. That is exactly the workload
  Hudi's bloom index exists for.
- The **record index** is exact but stores one row per record — at
  100 TB that is an index table of 10^11 rows that itself needs a
  shuffle join to probe. A bloom is a fixed ``nbits/8`` bytes per
  FILE (default 16 KiB), probed with zero I/O beyond the sidecar read.

Determinism: positions derive from ``blake2b(key)`` double hashing
(``h1 + i*h2 mod nbits``) — stable across processes, hosts and Python
versions (no ``PYTHONHASHSEED`` dependence), so blooms written by one
writer are valid for every future reader.

Sizing is TABLE-WIDE (``bloom_bits``/``bloom_hashes`` on
:class:`~emr_hudi_example_spark.lake.table.LakeTable`), not per-file:
fixed geometry means a key's k positions are computed ONCE per lookup
batch and tested against every candidate file's bitset — the probe
cost is O(keys·k) hashing plus O(keys·k·files) vectorized bit loads,
independent of file sizes. Size for the LARGEST file you will write
(``nbits ≈ 14·rows_per_file`` keeps the false-positive rate ≤ ~1 %
at k=7; the default 2^20 bits = 128 KiB covers ~75k keys/file).
False positives only ever cost a redundant exact key scan of one
file — never a wrong result.

100 TB shape: blooms are BUILT distributively (one Arrow-batched
``applyInPandas`` pass over the commit's files, one output row per
file) and PROBED distributively (``mapInPandas`` over the batch's
distinct keys with the candidate blooms broadcast — ~16 KiB × the
range-prune survivors). Nothing here collects data rows to the
driver; the only driver-side state is the per-file sidecar JSON,
bounded by file count.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np

#: default geometry: 2^20 bits (128 KiB) / 7 hashes → FPR ≈ 1% at
#: ~100k keys per file, ≈ 3e-7 at 10k keys per file
DEFAULT_NBITS = 1 << 20
DEFAULT_HASHES = 7


def key_positions(keys, nbits: int, k: int) -> np.ndarray:
    """Bit positions for each key: shape ``(len(keys), k)`` uint64.

    Double hashing over one 16-byte blake2b digest per key: the first
    8 bytes are ``h1``, the last 8 ``h2`` (forced odd so it is a unit
    mod the power-of-two ``nbits``); position_i = (h1 + i*h2) % nbits.
    """
    n = len(keys)
    h = np.empty((n, 2), dtype=np.uint64)
    for j, key in enumerate(keys):
        d = hashlib.blake2b(
            str(key).encode("utf-8"), digest_size=16
        ).digest()
        h[j, 0] = int.from_bytes(d[:8], "little")
        h[j, 1] = int.from_bytes(d[8:], "little") | 1
    i = np.arange(k, dtype=np.uint64)
    return (h[:, :1] + i[None, :] * h[:, 1:2]) % np.uint64(nbits)


def build_bloom(keys, nbits: int = DEFAULT_NBITS, k: int = DEFAULT_HASHES) -> bytes:
    """Bitset (``nbits/8`` bytes, little-bit-order) covering ``keys``."""
    bits = np.zeros(nbits, dtype=np.uint8)
    if len(keys):
        bits[key_positions(keys, nbits, k).ravel()] = 1
    return np.packbits(bits, bitorder="little").tobytes()


def bloom_to_b64(bloom: bytes) -> str:
    return base64.b64encode(bloom).decode("ascii")


def bloom_from_b64(s: str) -> np.ndarray:
    """Unpacked bit array (uint8 per bit) ready for vectorized probes."""
    raw = np.frombuffer(base64.b64decode(s), dtype=np.uint8)
    return np.unpackbits(raw, bitorder="little")


def might_contain(bits: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """Vectorized membership: ``positions`` is the ``(n, k)`` matrix
    from :func:`key_positions`; returns an ``(n,)`` bool array — True
    where ALL k bits are set (key *possibly* present)."""
    return bits[positions].all(axis=1)
