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


from ..constants import AGENT_CLASS, AVOID_TOP_CONCEPTS
from ..util import bucket_aggregate, bucket_map_keyed
from .. import fixture_kg


def partial_count(ds, keys: list[str], *, salt_buckets: int = 0,
                  num_buckets: int | None = None):
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


_TYPES_CACHE: dict = {}


def _types_pairmap(types: pd.DataFrame):
    from ..util import _PairMap

    return _PairMap(types[["entity_uri", "type_uri"]])


def _join_types_arrow(t, pmap):
    """Arrow inner-join of a linked batch against the pinned entity->type
    CSR: index_in + integer gathers; a mention with k types repeats k
    times (pandas merge semantics), typeless mentions drop."""
    import pyarrow as _pa

    par, tvals = pmap.expand(t.column("entity_uri"))
    return t.take(_pa.array(par)).append_column("type_uri", tvals)


def join_types_batches(ds, *, types_ref=None, batch_size: int = 32768):
    """Stateless-task version of TypeJoiner: the tiny entity->type table is
    fetched once per WORKER PROCESS (module-level cache keyed by object ref)
    instead of once per actor — no pool startup cost, elastic parallelism.
    Top concepts are filtered driver-side before the broadcast; the
    per-batch body is Arrow-native (no pandas on the corpus-sized stream)."""
    import pyarrow as _pa

    if types_ref is None:
        t = fixture_kg.entity_types_df()
        t = t[~t["type_uri"].isin(AVOID_TOP_CONCEPTS)]
        types_ref = ray.put(t)
    key = types_ref.hex()

    def _join(t: _pa.Table) -> _pa.Table:
        pmap = _TYPES_CACHE.get(key)
        if pmap is None:
            pmap = _types_pairmap(ray.get(types_ref))
            _TYPES_CACHE[key] = pmap
        return _join_types_arrow(t, pmap)

    return ds.map_batches(_join, batch_format="pyarrow", batch_size=batch_size)


class TypeJoiner:
    """linked mentions -> (key cols, type_uri) rows via pinned entity->type
    table (broadcast, never shuffled: the small side of J2). CSR built once
    per actor; the per-batch body is Arrow-native."""

    def __init__(self, types_ref=None, drop_top_concepts: bool = True):
        types = (
            ray.get(types_ref) if types_ref is not None else fixture_kg.entity_types_df()
        )
        if drop_top_concepts:
            types = types[~types["type_uri"].isin(AVOID_TOP_CONCEPTS)]
        self.pmap = _types_pairmap(types)

    def __call__(self, batch):
        return _join_types_arrow(batch, self.pmap)


def vote_types(linked_ds, key: str = "doc_id", *, salt_buckets: int = 0,
               concurrency=(1, 4)):
    """linked -> (key, type_uri) winner per key.

    Vote = number of linked mention occurrences whose entity has the type;
    winner = max count, ties broken by type_uri ascending (deterministic
    version of the reference's first-max dict-iteration tie-break).
    """
    types_ref = ray.put(fixture_kg.entity_types_df())
    typed = linked_ds.map_batches(
        TypeJoiner,
        fn_constructor_kwargs={"types_ref": types_ref},
        batch_format="pyarrow",
        batch_size=32768,
        concurrency=concurrency,
    )
    return vote_types_from_typed(typed, key, salt_buckets=salt_buckets)


def vote_types_from_typed(typed_ds, key: str = "doc_id", *, salt_buckets: int = 0):
    """Voting over an already type-joined stream (lets the pipeline share
    one TypeJoiner pass between voting and type-triple emission)."""
    # ONE shuffle: per-batch partial counts (combiner/salt step, Arrow
    # hash aggregate — corpus-sized typed batches never convert to
    # pandas), co-locate by hash(key), then sum + argmax per bucket.
    import pyarrow as _pa

    def _pre(t: _pa.Table) -> _pa.Table:
        g = t.group_by([key, "type_uri"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.select([key, "type_uri", "count_all"]).rename_columns(
            [key, "type_uri", "n"])

    def _winners(bucket: pd.DataFrame) -> pd.DataFrame:
        c = (
            bucket.groupby([key, "type_uri"], sort=False, observed=True)["n"]
            .sum()
            .reset_index()
        )
        # vectorized argmax: stable sort then first row per key ==
        # (count desc, type asc) winner
        c = c.sort_values(["n", "type_uri"], ascending=[False, True],
                          kind="mergesort")
        return c.drop_duplicates(subset=[key], keep="first")[[key, "type_uri"]]

    return bucket_map_keyed(typed_ds, [key], _winners, pre=_pre,
                            pre_format="pyarrow")


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
