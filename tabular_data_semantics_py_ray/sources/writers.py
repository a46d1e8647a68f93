"""Sinks (SURVEY §2.1).

S5  deterministic per-partition parquet (see pipelines/materialize.py for
    the manifest-committed resumable variant).
S6  N-Triples text sink — replaces the reference's rdflib Turtle
    serialization (oaei/tabular2rdf.py:89-110) with vectorized N-Triples
    line formatting + ``write_csv`` (header-less, one column).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _escape_literal(arr):
    # N-Triples literal escaping for the characters present in our corpora
    out = pc.replace_substring(arr, "\\", "\\\\")
    out = pc.replace_substring(out, '"', '\\"')
    out = pc.replace_substring(out, "\n", "\\n")
    return out


def triples_to_ntriples_lines(t: pa.Table) -> pa.Table:
    """(subj,pred,obj,obj_is_literal) -> one N-Triples line per row."""
    subj = t.column("subj").combine_chunks()
    pred = t.column("pred").combine_chunks()
    obj = t.column("obj").combine_chunks()
    lit = t.column("obj_is_literal").combine_chunks()
    uri_obj = pc.binary_join_element_wise(
        pa.scalar("<"), obj.cast(pa.string()), pa.scalar(">"), pa.scalar("")
    )
    lit_obj = pc.binary_join_element_wise(
        pa.scalar('"'), _escape_literal(obj.cast(pa.string())), pa.scalar('"'),
        pa.scalar(""),
    )
    obj_term = pc.if_else(lit, lit_obj, uri_obj)
    line = pc.binary_join_element_wise(
        pc.binary_join_element_wise(pa.scalar("<"), subj, pa.scalar("> <"), pa.scalar("")),
        pred,
        pc.binary_join_element_wise(pa.scalar("> "), obj_term, pa.scalar(" ."), pa.scalar("")),
        pa.scalar(""),
    )
    return pa.Table.from_arrays([line], names=["line"])


def filter_valid_triples(t: pa.Table) -> tuple[pa.Table, int]:
    """M11 (oaei/dbpedia_fragment.py:57-78): drop rows whose subj/pred —
    or obj, when it is a URI — fail the structural URI check. Returns the
    kept rows and the dropped count."""
    from ..functions.text import valid_uris_batch

    subj_ok = valid_uris_batch(t.column("subj"))
    pred_ok = valid_uris_batch(t.column("pred"))
    lit = t.column("obj_is_literal").combine_chunks()
    obj_ok = pc.or_(lit, valid_uris_batch(t.column("obj").cast(pa.string())))
    ok = pc.and_(pc.and_(subj_ok, pred_ok), obj_ok)
    kept = t.filter(ok)
    return kept, t.num_rows - kept.num_rows


def write_ntriples(triples_ds, out_dir: str, *, validate: bool = True):
    """S6: serialize a triples Dataset as N-Triples text files (one dir of
    part files — the distributed version of one .ttl per table).

    Plain-text lines can't go through the CSV writer (it must quote the
    literal lines' quotes), so each task writes its batch itself; file names
    are content-hashed, so a rerun overwrites identical files (idempotent).
    Validation (M11) runs inside the same pass as formatting+writing — no
    extra scan — and per-batch drop counts roll up into the returned stats.
    """
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _write(t: pa.Table) -> pa.Table:
        dropped = 0
        if validate:
            t, dropped = filter_valid_triples(t)
        stats = pa.table({
            "rows": pa.array([t.num_rows], type=pa.int64()),
            "dropped_invalid_uri": pa.array([dropped], type=pa.int64()),
        })
        if t.num_rows == 0:
            return stats
        lines = triples_to_ntriples_lines(t)
        text = "\n".join(lines.column("line").to_pylist())
        name = hashlib.blake2b(text.encode("utf-8"), digest_size=12).hexdigest()
        path = os.path.join(out_dir, f"part-{name}.nt")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text + "\n")
        os.replace(tmp, path)
        return stats

    manifest = triples_ds.map_batches(
        _write, batch_size=None, batch_format="pyarrow"
    ).to_pandas()  # one tiny row per block
    return {
        "out_dir": out_dir,
        "rows": int(manifest["rows"].sum()),
        "dropped_invalid_uri": int(manifest["dropped_invalid_uri"].sum()),
    }
