"""Deterministic hashing kernels: shingle hashes, MinHash signatures, SimHash.

Process-stable by construction (blake2b digests + fixed-seed permutations) —
``hash()`` randomization never leaks in, so signatures agree across workers,
runs and the resume path.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


def md5_hash64(s: str) -> int:
    """First 8 md5 bytes, big-endian — chosen so a DuckDB oracle can derive
    the identical value as ``('0x' || substr(md5(t), 1, 16))::UBIGINT``,
    making the simhash pipeline oracle-checkable end-to-end."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def shingle_hashes(tokens: list[str], n: int = 3) -> np.ndarray:
    """Distinct n-gram shingle hashes (uint64) of a token list."""
    if len(tokens) < n:
        return np.empty(0, dtype=np.uint64)
    shingles = {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}
    return np.fromiter(
        (stable_hash64(s) for s in shingles), dtype=np.uint64, count=len(shingles)
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a bijection on uint64 with well-mixed ordering
    (public-domain constants, Steele et al. / xorshift family)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class FastMinHasher:
    """Vectorized minhash: permutation i = splitmix64(x ^ seed_i).

    A linear ``(a*x+b) mod p`` with small ``a`` never wraps, making the map
    monotone — every 'permutation' would pick the same min element. The
    xor-then-mix construction is a true 64-bit bijection with effectively
    random ordering, so P(sig_i(A) == sig_i(B)) == Jaccard(A, B).
    """

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        lo = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)
        hi = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)
        self.seeds = (hi << np.uint64(32)) | lo
        self.num_perm = num_perm

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        mixed = _splitmix64(hashes[None, :] ^ self.seeds[:, None])  # (k, m)
        return mixed.min(axis=1)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over unigram token counts (md5-derived bit hashes so
    the DuckDB oracle can reproduce signatures exactly — see md5_hash64)."""
    if not tokens:
        return 0
    uniq, counts = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
    hs = np.fromiter((md5_hash64(t) for t in uniq), dtype=np.uint64, count=len(uniq))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    weights = counts[:, None] * (2 * bits - 1)
    v = weights.sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two distinct-hash sets (uint64 arrays)."""
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return float(inter) / union if union else 0.0
