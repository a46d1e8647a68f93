"""Pin the vectorized minhash-signature kernel against a naive per-doc
reference: same shingle SETS (as hash sets), same signatures, for ragged
batches including empty texts, short docs, repeated shingles and
multi-space token gaps. Pure-kernel tests — no Ray session needed."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tabular_data_semantics_py_ray.functions.hashing import (
    _MERSENNE,
    _splitmix64,
)
from tabular_data_semantics_py_ray.stages.dedup import (
    _minhash_seeds,
    shingle_signatures_batch,
)


def _naive(texts, num_perm=128, ngram=3, seed=42):
    """Per-doc reference: token-hash chain per shingle, python set, then
    minhash = min over splitmix64(shingle ^ seed_i)."""
    seeds = _minhash_seeds(num_perm, seed)
    out = []
    for t in texts:
        toks = t.split(" ")
        tok_h = pd.util.hash_pandas_object(
            pd.Series(toks, dtype=object), index=False
        ).to_numpy().astype(np.uint64)
        if len(toks) < ngram:
            out.append((set(), np.full(num_perm, _MERSENNE, dtype=np.uint64)))
            continue
        hs = set()
        for i in range(len(toks) - ngram + 1):
            acc = _splitmix64(tok_h[i : i + 1])[0]
            for j in range(1, ngram):
                acc = _splitmix64(np.array([acc ^ tok_h[i + j]],
                                           dtype=np.uint64))[0]
            hs.add(int(acc))
        arr = np.fromiter(hs, dtype=np.uint64, count=len(hs))
        sig = _splitmix64(arr[None, :] ^ seeds[:, None]).min(axis=1)
        out.append((hs, sig))
    return out


def _run(texts):
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = shingle_signatures_batch(batch)
    ref = _naive(texts)
    for i in range(len(texts)):
        raw = got.column("shingles")[i].as_py()
        got_set = set(np.frombuffer(raw, dtype="<u8").tolist())
        got_sig = np.array(got.column("sig")[i].as_py(), dtype=np.uint64)
        ref_set, ref_sig = ref[i]
        assert got_set == ref_set, f"doc {i}: shingle set mismatch"
        assert (got_sig == ref_sig).all(), f"doc {i}: signature mismatch"
        assert got.column("n_shingles")[i].as_py() == len(ref_set)


def test_mixed_batch_matches_naive():
    _run([
        "the quick brown fox jumps over the lazy dog",
        "",  # empty -> [''] single token -> sentinel
        "a b",  # < ngram tokens -> sentinel
        "a b c",  # exactly one shingle
        "x y z x y z x y z",  # repeated shingles -> set dedup
        "double  space  tokens keep empties like str split",
        "identical text here now",
        "identical text here now",  # byte-identical doc
    ])


def test_identical_docs_share_everything():
    batch = pa.table({"doc_id": [1, 2], "text": ["p q r s t", "p q r s t"]})
    got = shingle_signatures_batch(batch)
    assert got.column("shingles")[0].as_py() == got.column("shingles")[1].as_py()
    assert got.column("sig")[0].as_py() == got.column("sig")[1].as_py()


def test_sliced_batch_offsets():
    """A zero-copy slice of a batch carries a nonzero list-offset start;
    the kernel must normalize offsets before the ragged arange."""
    full = pa.table({
        "doc_id": [10, 11, 12, 13],
        "text": ["a b c d", "e f g h", "i j k l", "m n o p"],
    })
    sliced = full.slice(2)  # combine_chunks keeps the offset view
    got = shingle_signatures_batch(sliced)
    ref = shingle_signatures_batch(
        pa.table({"doc_id": [12, 13], "text": ["i j k l", "m n o p"]})
    )
    assert got.column("shingles").to_pylist() == ref.column("shingles").to_pylist()
    assert got.column("sig").to_pylist() == ref.column("sig").to_pylist()


def test_simhash_batch_matches_scalar():
    """The vectorized batch SimHash equals the scalar simhash64 per doc,
    including repeated tokens, single-token docs and empty text (Python
    .split(' ') and Arrow split_pattern both yield [''] for '')."""
    import pyarrow as pa

    from tabular_data_semantics_py_ray.functions.hashing import simhash64
    from tabular_data_semantics_py_ray.stages.dedup import _simhash_batch

    texts = ["alpha beta gamma", "alpha alpha beta", "zeta", "",
             "beta gamma delta epsilon zeta eta theta"]
    batch = pa.Table.from_pydict(
        {"doc_id": list(range(len(texts))), "text": texts})
    got = _simhash_batch(batch).column("simhash").to_pylist()
    want = [simhash64(t.split(" ")) for t in texts]
    assert got == want
