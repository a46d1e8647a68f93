"""Interleaved-corpus input source: Lance first, Parquet fallback.

The north rule's input is "Lance tables of interleaved text + media
documents" with columns ``(doc_id:string, spans:list<struct<kind,text,
media_ref,offset>>)``.  Ray Data ships a native ``read_lance`` (Lance is a
random-access columnar format with built-in versioning — well suited to the
resumable 100 TB corpus), but the ``lance`` package is an optional runtime
dependency.  This module dispatches on the dataset layout:

- ``*.lance`` path (a Lance dataset directory) -> ``ray.data.read_lance``,
  raising a clear ImportError when the lance package is absent;
- anything else -> ``ray.data.read_parquet`` (the sandbox path; every test
  and bench corpus is parquet).

Both return the same Dataset shape, validated against ``DOCS_SCHEMA`` so a
malformed corpus fails at the read, not three stages later.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from ..schemas import DOCS_SCHEMA

_DOC_COLUMNS = [f.name for f in DOCS_SCHEMA]


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def is_lance_path(path: str) -> bool:
    """A Lance dataset is a directory named ``*.lance`` (it keeps manifests
    under ``_versions/`` inside)."""
    return path.rstrip("/").endswith(".lance") or os.path.isdir(
        os.path.join(path, "_versions")
    )


def read_interleaved(path: str, *, columns: list[str] | None = None):
    """Read the interleaved docs table (input_hint shape) from ``path``.

    ``columns`` prunes at the read on both formats (a 100 TB corpus never
    ships columns a stage does not need).
    """
    cols = columns if columns is not None else list(_DOC_COLUMNS)
    if is_lance_path(path):
        if not lance_available():
            raise ImportError(
                "input looks like a Lance dataset (%r) but the 'lance' "
                "package is not installed; install 'pylance' or convert the "
                "corpus to parquet" % path
            )
        from ..util import strip_schema_metadata

        return strip_schema_metadata(rd.read_lance(path, columns=cols))
    from ..util import read_parquet_clean

    return read_parquet_clean(path, columns=cols)


def validate_interleaved_schema(schema: pa.Schema) -> None:
    """Fail fast when a corpus does not match the input_hint shape."""
    names = set(schema.names)
    missing = [c for c in _DOC_COLUMNS if c not in names]
    if missing:
        raise ValueError(
            f"interleaved corpus is missing columns {missing}; "
            f"expected {DOCS_SCHEMA}"
        )
    if not pa.types.is_string(schema.field("doc_id").type):
        raise ValueError(
            f"doc_id must be string, got {schema.field('doc_id').type}"
        )
    spans_t = schema.field("spans").type
    if not (pa.types.is_list(spans_t) or pa.types.is_large_list(spans_t)):
        raise ValueError(f"spans must be list<struct>, got {spans_t}")
    span_fields = {f.name for f in spans_t.value_type}
    want = {f.name for f in DOCS_SCHEMA.field("spans").type.value_type}
    if not want <= span_fields:
        raise ValueError(
            f"span struct is missing fields {sorted(want - span_fields)}"
        )


def read_interleaved_checked(path: str, *, columns: list[str] | None = None):
    """``read_interleaved`` + schema validation (one cheap metadata fetch)."""
    ds = read_interleaved(path, columns=columns)
    validate_interleaved_schema(pa.schema(ds.schema().base_schema))
    return ds


def write_interleaved(ds, path: str) -> None:
    """Persist an interleaved corpus: Lance when the package is present and
    the path asks for it, parquet otherwise (partitioned files either way —
    never one giant file)."""
    if path.rstrip("/").endswith(".lance"):
        if not lance_available():
            raise ImportError(
                "cannot write %r: the 'lance' package is not installed" % path
            )
        ds.write_lance(path)
    else:
        ds.write_parquet(path)
