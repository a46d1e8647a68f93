"""String/scalar kernels from the reference (SURVEY §2.2/§2.8), vectorized.

Each function documents its source (path:line in
/root/reference/TabularSemantics/src/). These are the cell-normalization
primitives a SemTab-style pipeline applies before lookup; the synthetic
corpus is single-token so the flagship only needs the token path, but the
kernels are part of capability parity and are unit-tested directly.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BRACKET = re.compile(r"\((.*?)\)")


def normalize_mention(text: str, *, min_len: int = 3) -> list[str]:
    """M1 (kg/dbpedia.py:19-31,59-70): strip parenthesized spans from the
    cell text; the stripped main text AND each bracket content become
    separate lookup items; items shorter than ``min_len`` are dropped."""
    brackets = _BRACKET.findall(text)
    main = _BRACKET.sub("", text).strip()
    # collapse doubled spaces left by bracket removal
    main = re.sub(r"\s{2,}", " ", main)
    items = [main] + [b.strip() for b in brackets]
    return [i for i in items if len(i) >= min_len]


def entity_name(uri: str) -> str:
    """M2 (util/utilities.py:44-63): URI -> local name, split on '#' if
    present else the last '/' segment."""
    if "#" in uri:
        return uri.rsplit("#", 1)[1]
    return uri.rstrip("/").rsplit("/", 1)[-1]


def filter_by_prefix(uris: list[str], prefixes: tuple[str, ...]) -> list[str]:
    """M3/M4 (util/utilities.py:18-41): keep URIs starting with one of the
    selected KG prefixes."""
    return [u for u in uris if u.startswith(prefixes)]


def prefix_mask_batch(uris: pa.Array | pa.ChunkedArray,
                      prefixes: tuple[str, ...]) -> pa.Array:
    """M3/M4/M5 vectorized: boolean whitelist mask — URI starts with one of
    the selected KG prefixes (util/utilities.py:18-41; the result-URI
    whitelist of kg/lookup.py:422-435)."""
    if isinstance(uris, pa.ChunkedArray):
        uris = uris.combine_chunks()
    filled = pc.fill_null(uris, "")
    mask = pa.array(np.zeros(len(filled), dtype=bool))
    for p in prefixes:
        mask = pc.or_(mask, pc.starts_with(filled, p))
    return pc.and_(mask, pc.is_valid(uris))


def strip_accents(text: str) -> str:
    """M11 (oaei/dbpedia_fragment.py:72-78): NFD-decompose and drop
    combining marks."""
    return "".join(
        c for c in unicodedata.normalize("NFD", text)
        if unicodedata.category(c) != "Mn"
    )


def is_valid_uri(uri: str) -> bool:
    """M11 (oaei/dbpedia_fragment.py:57-78): structural URI check + the
    reference's ascii-after-accent-strip requirement."""
    if not uri or any(c in uri for c in ' <>"{}|\\^`\n\r\t'):
        return False
    if "://" not in uri:
        return False
    return strip_accents(uri).isascii()


def escape_quotes_uri(uri: str) -> str:
    """M12 (test/challenge_utils.py:365, test/mergeFiles.py:124):
    '"' -> '%22' inside entity URIs."""
    return uri.replace('"', "%22")


# ---- vectorized (Arrow) versions for batch stages -------------------------

def normalize_mentions_batch(texts: pa.Array | pa.ChunkedArray,
                             *, min_len: int = 3) -> pa.Table:
    """M1 over a batch: (item, parent_idx) rows, one per lookup item."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    items, parents = [], []
    for i, t in enumerate(texts.to_pylist()):
        for item in normalize_mention(t or "", min_len=min_len):
            items.append(item)
            parents.append(i)
    return pa.table({
        "item": pa.array(items, type=pa.string()),
        "parent_idx": pa.array(np.asarray(parents, dtype=np.int64)),
    })


def valid_uris_batch(uris: pa.Array | pa.ChunkedArray) -> pa.Array:
    """M11 vectorized: boolean mask of :func:`is_valid_uri` over a batch.

    Arrow regex kernels handle the all-ascii fast path; rows containing
    non-ascii bytes fall back to the scalar accent-strip check (they may
    still be valid if their accents decompose to ascii).
    """
    if isinstance(uris, pa.ChunkedArray):
        uris = uris.combine_chunks()
    filled = pc.fill_null(uris, "")
    ok = pc.and_(
        pc.and_(
            pc.is_valid(uris),
            pc.match_substring(filled, "://"),
        ),
        pc.invert(pc.match_substring_regex(filled, '[ <>"{}|\\\\^`\n\r\t]')),
    )
    is_ascii = pc.match_substring_regex(filled, r"^[\x00-\x7F]*$")
    need_scalar = pc.and_(ok, pc.invert(is_ascii))
    if not pc.any(need_scalar).as_py():
        return pc.and_(ok, is_ascii)
    mask = pc.and_(ok, is_ascii).to_numpy(zero_copy_only=False).copy()
    idx = np.flatnonzero(need_scalar.to_numpy(zero_copy_only=False))
    vals = filled.take(pa.array(idx)).to_pylist()
    for i, v in zip(idx, vals):
        mask[i] = strip_accents(v).isascii()
    return pa.array(mask)


def entity_names_batch(uris: pa.Array | pa.ChunkedArray) -> pa.Array:
    """M2 vectorized: last '#' / '/' segment via Arrow string kernels."""
    if isinstance(uris, pa.ChunkedArray):
        uris = uris.combine_chunks()
    def _last(parts: pa.ListArray) -> pa.Array:
        flat = pc.list_flatten(parts)
        offs = parts.offsets.to_numpy(zero_copy_only=False)
        return flat.take(pa.array(offs[1:] - 1 - offs[0]))

    # split on '#': take last element; else split on '/' and take last —
    # trailing slashes stripped first so the no-hash branch matches the
    # scalar kernel's rstrip('/') (ADVICE r1)
    hash_parts = pc.split_pattern(uris, "#")
    slash_parts = pc.split_pattern(
        pc.replace_substring_regex(uris, "/+$", ""), "/"
    )
    has_hash = pc.greater(pc.list_value_length(hash_parts), 1)
    return pc.if_else(has_hash, _last(hash_parts), _last(slash_parts))
