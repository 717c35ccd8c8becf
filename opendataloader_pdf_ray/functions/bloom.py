"""Mergeable Bloom filter for distributed semi/anti joins.

The broadcast-key-set anti-join (``tpch.customers_without_orders``) ships
the DISTINCT key set to every task — fine while the key set fits in a
broadcast, wrong when the big side has billions of keys. The Bloom pattern
bounds the broadcast at a fixed bit budget regardless of key count:

1. each batch of the big side hashes its keys into an m-bit partial bitmap
   (mergeable: bitwise OR — associative, commutative),
2. one group task ORs the ≤ n_batches partials into the final filter,
3. the probe side splits on the broadcast filter: *definitely absent* rows
   pass the anti-join immediately (Bloom has no false negatives); *maybe
   present* rows are verified exactly against the distinct key set
   RESTRICTED to the maybe keys — the only shuffle, sized by the true
   matches + the false-positive tail (≈ 1% at 10 bits/key), never by the
   big side.

The final result is exact for ANY filter contents — the Bloom only routes
rows between the fast path and the verify path — so the SQL oracle is the
plain anti-join and hashing needs determinism, not SQL parity.
"""

from __future__ import annotations

import numpy as np

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(keys: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer — vectorized 64-bit avalanche hash."""
    x = keys.astype(np.uint64) + np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _MASK
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _MASK
    return x ^ (x >> np.uint64(31))


def bit_positions(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(len(keys), k_hashes) bit indices via double hashing h1 + i·h2."""
    h1 = _mix(keys, 1)
    h2 = _mix(keys, 2) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) & _MASK) % np.uint64(m_bits)


def partial_bitmap(keys: np.ndarray, m_bits: int, k_hashes: int) -> bytes:
    """One batch's Bloom contribution as an m_bits-wide packed bitmap."""
    words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    pos = bit_positions(keys, m_bits, k_hashes).ravel()
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))
    return words.tobytes()


def or_bitmaps(blobs: list) -> bytes:
    """Merge partial bitmaps (bitwise OR)."""
    acc = np.frombuffer(blobs[0], dtype=np.uint64).copy()
    for b in blobs[1:]:
        acc |= np.frombuffer(b, dtype=np.uint64)
    return acc.tobytes()


def maybe_contains(bitmap: bytes, keys: np.ndarray, m_bits: int,
                   k_hashes: int) -> np.ndarray:
    """Boolean mask: True where the key MIGHT be in the filter (all k bits
    set); False means definitely absent."""
    words = np.frombuffer(bitmap, dtype=np.uint64)
    pos = bit_positions(keys, m_bits, k_hashes)
    bits = (words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)
