"""Text-analysis kernels for the training-data pipeline ops: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All formulas are deliberately SQL-expressible so the DuckDB oracle can verify
values bit-for-bit (identical integer counts; identical IEEE double division).
Vectorized over Arrow batches — no per-row Python in the hot path except the
C-speed md5 loop.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constants import STOPWORDS

# trailing ' dup' token runs mark planted near-duplicates in the corpus
_DUP_TAIL = re.compile(r"( dup)+$")


def token_counts(texts: pa.ChunkedArray | pa.Array):
    """n_tokens per text (split on single space, like the corpus layout)."""
    toks = pc.split_pattern(texts, " ")
    return pc.list_value_length(toks).cast(pa.int64())


def stopword_counts(texts) -> pa.Array:
    toks = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))).to_numpy(
        zero_copy_only=False
    )
    out = np.zeros(len(texts), dtype=np.int64)
    np.add.at(out, parent, is_stop.astype(np.int64))
    return pa.array(out)


def text_stats_batch(batch: pa.Table) -> pa.Table:
    """documents -> (doc_id, n_tokens, stop_ratio, quality_ok).

    quality_ok mirrors a length+stopword-ratio quality gate; stop_ratio is
    plain double division so DuckDB reproduces it exactly.
    """
    texts = batch.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_tok = token_counts(texts)
    n_stop = stopword_counts(texts)
    n_tok_np = n_tok.to_numpy(zero_copy_only=False).astype(np.float64)
    ratio = n_stop.to_numpy(zero_copy_only=False).astype(np.float64) / n_tok_np
    quality = (
        (n_tok_np >= 20) & (n_tok_np <= 400) & (ratio < 0.3)
    )
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            n_tok,
            pa.array(ratio, type=pa.float64()),
            pa.array(quality, type=pa.bool_()),
        ],
        names=["doc_id", "n_tokens", "stop_ratio", "quality_ok"],
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stopword-ratio language heuristic: 'en' iff stop_ratio >= 0.05.

    (A real n-gram language model is meaningless over this single-vocabulary
    synthetic corpus; the point is the distributed scoring plumbing plus a
    deterministic, oracle-checkable decision rule.)
    """
    stats = text_stats_batch(batch)
    ratio = stats.column("stop_ratio").to_numpy(zero_copy_only=False)
    pred = np.where(ratio >= 0.05, "en", "unk")
    return pa.Table.from_arrays(
        [stats.column("doc_id"), pa.array(pred.tolist(), type=pa.string())],
        names=["doc_id", "lang_pred"],
    )


# GPT-2-style pre-tokenizer shape (contraction suffixes, letter runs, digit
# runs, punctuation runs, whitespace), restricted to ASCII classes so the
# SAME RE2 pattern runs in pyarrow.compute and the DuckDB oracle with
# identical match counts (both are RE2; \p{L} is avoided because Python's
# re can't mirror it in unit tests).
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_bpe_batch(batch: pa.Table) -> pa.Table:
    """documents -> (doc_id, n_tokens_ws, n_tokens_bpe): whitespace token
    count plus a BPE-ish regex token count (non-overlapping RE2 matches of
    ``BPE_ISH_PATTERN``) — the two token-budget estimators a training-data
    pipeline runs over every document. Fully vectorized (RE2 inside Arrow)."""
    texts = batch.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            token_counts(texts),
            pc.count_substring_regex(texts, BPE_ISH_PATTERN).cast(pa.int64()),
        ],
        names=["doc_id", "n_tokens_ws", "n_tokens_bpe"],
    )


def _md5_array(strings: list[str]) -> pa.Array:
    return pa.array(
        [hashlib.md5(s.encode("utf-8")).hexdigest() for s in strings],
        type=pa.string(),
    )


def normalize_dup_tail(text: str) -> str:
    return _DUP_TAIL.sub("", text)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """documents -> (doc_id, fp, fp_norm): md5 of raw text and of text with
    the planted ' dup' tail stripped (exact-dedup key)."""
    texts = batch.column("text").to_pylist()
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            _md5_array(texts),
            _md5_array([normalize_dup_tail(t) for t in texts]),
        ],
        names=["doc_id", "fp", "fp_norm"],
    )
