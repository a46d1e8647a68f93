"""Canonicalization / consensus shuffle: type voting, most-specific-class,
salted two-phase aggregation.

Reference semantics being preserved:
- G1 type voting per key with first-max tie-break made deterministic as
  (count desc, type asc)  (test/challenge_utils.py:96-126,184-193);
- G2 most-specific-class reduction: drop the Agent class, then keep classes
  that are not strict ancestors of another member
  (test/challenge_utils.py:196-245, onto_access.py:352-354);
- top-concept filter (kg/entity.py:63-74).

Scale design (north rule: explicit skew handling): the count is a TWO-PHASE
aggregation — partial counts per batch inside ``map_batches`` (so a hot key
like a popular surface form contributes at most one row per (batch, salt)),
then a small ``groupby().aggregate(Sum)`` over the partials. The optional
``salt`` keeps even a single pathological key spread over ``salt_buckets``
reducers before the final combine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
from ray.data.aggregate import Sum

from ..constants import AGENT_CLASS, AVOID_TOP_CONCEPTS
from ..util import bucket_aggregate, bucket_map_keyed
from .. import fixture_kg


def partial_count(ds, keys: list[str], *, salt_buckets: int = 0,
                  num_buckets: int = 64):
    """Two-phase count of rows per key tuple -> Dataset[keys..., n:int64].

    Per-batch partial counts (a hot key contributes ONE row per batch — the
    combiner/salting step) then a bucket-hash shuffle with one vectorized
    reduce per bucket. ``salt_buckets``, when set, overrides the bucket
    count for the shuffle (kept for explicit skew experiments)."""
    return bucket_aggregate(
        ds,
        keys,
        {"n": (keys[0], "count")},
        num_buckets=salt_buckets if salt_buckets > 1 else num_buckets,
    )


class TypeJoiner:
    """linked mentions -> (key cols, type_uri) rows via pinned entity->type
    table (broadcast, never shuffled: the small side of J2)."""

    def __init__(self, types_ref=None, drop_top_concepts: bool = True):
        types = (
            ray.get(types_ref) if types_ref is not None else fixture_kg.entity_types_df()
        )
        if drop_top_concepts:
            types = types[~types["type_uri"].isin(AVOID_TOP_CONCEPTS)]
        self.types = types

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.types, on="entity_uri", how="inner")


def vote_types(linked_ds, key: str = "doc_id", *, salt_buckets: int = 0):
    """linked -> (key, type_uri) winner per key.

    Vote = number of linked mention occurrences whose entity has the type;
    winner = max count, ties broken by type_uri ascending (deterministic
    version of the reference's first-max dict-iteration tie-break).
    """
    types_ref = ray.put(fixture_kg.entity_types_df())
    typed = linked_ds.map_batches(
        TypeJoiner,
        fn_constructor_kwargs={"types_ref": types_ref},
        batch_format="pandas",
        concurrency=(1, 4),
    )
    counts = partial_count(typed, [key, "type_uri"], salt_buckets=salt_buckets)

    def _winners(bucket: pd.DataFrame) -> pd.DataFrame:
        # vectorized argmax over the whole bucket: stable sort then first
        # row per key == (count desc, type asc) winner
        g = bucket.sort_values(["n", "type_uri"], ascending=[False, True],
                               kind="mergesort")
        return g.drop_duplicates(subset=[key], keep="first")[[key, "type_uri"]]

    return bucket_map_keyed(counts, [key], _winners)


def most_specific_classes(type_uris: set[str], ancestors: dict[str, set[str]]) -> set[str]:
    """G2: remove Agent, then keep classes that are not strict ancestors of
    another member (test/challenge_utils.py:196-245)."""
    cands = {t for t in type_uris if t != AGENT_CLASS}
    out = set()
    for t in cands:
        if not any(t in ancestors.get(o, set()) for o in cands if o != t):
            out.add(t)
    return out


def resolve_alias_closure(edges: pd.DataFrame) -> pd.DataFrame:
    """(uri_a, uri_b, kind) -> (uri, canonical) canonicalization map.

    redirect: follow the chain exactly twice (2-iteration closure,
    challenge_utils.py:441-453). sameas: canonical = min(uri) of the pair
    (deterministic keep-one, D2).
    """
    red = edges[edges["kind"] == "redirect"]
    one = dict(zip(red["uri_a"], red["uri_b"]))
    rows = {s: one.get(one.get(s, s), one.get(s, s)) for s in one}
    for _, r in edges[edges["kind"] == "sameas"].iterrows():
        a, b = r["uri_a"], r["uri_b"]
        canon = min(a, b)
        for u in (a, b):
            if u != canon:
                rows[u] = canon
    return pd.DataFrame(sorted(rows.items()), columns=["uri", "canonical"])
