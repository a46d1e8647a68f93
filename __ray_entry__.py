"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing in
this module or the library calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``       — flagship interleaved-docs -> triples pipeline at
                      sf0.001 (doc-local variant of SURVEY §7.1: votes
                      finalized inside the linker actors).
- ``queries()``     — one callable per implemented operator/pipeline.
- ``oracle_sql()``  — DuckDB-equivalent SQL per query; fixture KG tables are
                      inline VALUES generated from the same Python data the
                      Ray actors pin (``tabular_data_semantics_py_ray.fixture_kg``).

Every registered query carries an oracle (105/105): even the sketch /
signature pipelines (simhash, HLL, count-min, PQ) derive their hashes from
md5 on both sides so the full pipeline is SQL-checkable.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from tabular_data_semantics_py_ray.pipelines.kg_pipeline import build_triples

    return build_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from tabular_data_semantics_py_ray.api import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from tabular_data_semantics_py_ray.oracles import oracle_sql as _oracle_sql

    return _oracle_sql()
