"""KGBackend protocol — the engine's user-extension surface (SURVEY §2.10).

The reference adds new knowledge graphs by subclassing ``Lookup`` /
``SPARQLEndpoint`` per service (kg/lookup.py:19,65,227,319;
kg/endpoints.py:13,377,541). Here a backend is DATA, not code: four tables
(lexical index, entity types, alias edges, class closure) registered by
name. Actors pin whichever backend the pipeline names; tables can come from
in-memory frames (fixtures) or parquet paths (offline-prepared closures —
the A10/A11 offline projection artifacts).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pandas as pd


@dataclass(frozen=True)
class KGBackend:
    """Four loaders so registration stays cheap; loading happens at pin time
    (actor __init__ / driver broadcast)."""

    name: str
    lexicon: Callable[[], pd.DataFrame]        # surface_form, entity_uri, rank
    entity_types: Callable[[], pd.DataFrame]   # entity_uri, type_uri
    alias_edges: Callable[[], pd.DataFrame]    # uri_a, uri_b, kind
    class_closure: Callable[[], pd.DataFrame]  # cls_uri, ancestor_uri, distance


_REGISTRY: dict[str, KGBackend] = {}


def register_backend(backend: KGBackend) -> None:
    _REGISTRY[backend.name] = backend


def get_backend(name: str) -> KGBackend:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown KG backend {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def parquet_backend(name: str, base_dir: str) -> KGBackend:
    """Backend whose four tables live as parquet under ``base_dir`` —
    either one file per table (the offline-prep layout of
    pipelines/prep.py) or one DIRECTORY of part files per table (the
    distributed-write layout of pipelines/kg_ingest.ingest_backend_tables);
    ``pq.read_table`` handles both."""
    import os

    import pyarrow.parquet as pq

    def _loader(fname):
        return lambda: pq.read_table(os.path.join(base_dir, fname)).to_pandas()

    return KGBackend(
        name=name,
        lexicon=_loader("lexical_index.parquet"),
        entity_types=_loader("entity_types.parquet"),
        alias_edges=_loader("alias_edges.parquet"),
        class_closure=_loader("class_closure.parquet"),
    )


def _register_fixture_backend() -> None:
    from .. import fixture_kg

    register_backend(
        KGBackend(
            name="fixture",
            lexicon=fixture_kg.lexicon_df,
            entity_types=fixture_kg.entity_types_df,
            alias_edges=fixture_kg.alias_edges_df,
            class_closure=fixture_kg.class_closure_df,
        )
    )


_register_fixture_backend()
