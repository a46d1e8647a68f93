"""Small dataset helpers.

Ray 2.49's ``Project`` operator (behind ``Dataset.rename_columns`` /
``drop_columns`` / ``select_columns``) assumes Arrow blocks and crashes on
the pandas blocks that grouped aggregates emit. These helpers do the same
projections inside ``map_batches(batch_format="pyarrow")``, which converts
any block type to Arrow first.
"""

from __future__ import annotations

import pyarrow as pa


def rename_cols(ds, mapping: dict[str, str]):
    def _r(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(_r, batch_format="pyarrow")


def drop_cols(ds, cols: list[str]):
    def _d(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in cols if c in t.column_names])

    return ds.map_batches(_d, batch_format="pyarrow")


def select_cols(ds, cols: list[str]):
    def _s(t: pa.Table) -> pa.Table:
        return t.select(cols)

    return ds.map_batches(_s, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bucketed two-phase aggregation.
#
# Ray 2.49's ``groupby(keys).aggregate(...)`` reduces key-by-key in Python:
# ~1 ms per distinct key (measured: 88k groups = 320 s hash-shuffle / 57 s
# sort-shuffle). For high-cardinality keys we instead (1) pre-aggregate each
# batch with vectorized pandas, (2) shuffle on a LOW-cardinality bucket id =
# hash(keys) % B, (3) finish each bucket with one vectorized pandas groupby.
# B Python calls total instead of one per key; the same shape scales out —
# the bucket column is the explicit partitioning key, and a hot logical key
# still lands in one bucket whose *partials* are already one row per
# (batch, key), which is the salting story for skew.
# ---------------------------------------------------------------------------

import numpy as np
import pandas as pd

_AGG_FNS = {"sum", "min", "max", "count"}


def _to_arrow(df: pd.DataFrame) -> pa.Table:
    """pandas -> Arrow that stays schema-stable on EMPTY frames.

    ``pa.Table.from_pandas`` maps an empty object column to ``null`` type,
    which poisons downstream shuffles/joins with mismatched block schemas
    (zero-column/null-typed empties). Empty object columns are typed as
    string — the only thing object columns hold in this engine.

    Schema metadata is stripped: ``from_pandas`` attaches a ``pandas`` dict
    that makes the Arrow schema UNHASHABLE, so every Ray block-schema
    unification logs 'Failed to hash the schemas (for deduplication)' and
    skips its dedup fast path."""
    if len(df):
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)
    sch = pa.Schema.from_pandas(df, preserve_index=False)
    fields = [
        pa.field(f.name, pa.string() if pa.types.is_null(f.type) else f.type)
        for f in sch
    ]
    return pa.Table.from_arrays(
        [pa.array([], type=f.type) for f in fields], schema=pa.schema(fields)
    )


def strip_schema_metadata(ds):
    """Drop Arrow schema metadata from every block.

    Parquet files written via pandas embed a ``pandas`` schema-metadata
    dict; pyarrow schemas WITH metadata are unhashable, so every Ray
    block-schema unification (repartition / sort / union / aggregate)
    logs 'Failed to hash the schemas (for deduplication)' and falls off
    its dedup fast path. The strip fuses into the upstream read task
    (zero-copy) — no extra pass over the data. For parquet READS prefer
    ``read_parquet_clean``, which fixes the schema at the source (Ray's
    read-side block splitting unifies schemas BEFORE any downstream
    stage can strip them)."""

    def _strip(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(_strip, batch_format="pyarrow", zero_copy_batch=True)


def read_parquet_clean(path, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` with an explicit METADATA-FREE schema.

    See strip_schema_metadata for why: the embedded ``pandas`` metadata
    dict makes every derived block schema unhashable. Passing the footer
    schema with metadata removed makes the read itself emit clean blocks —
    no extra stage, and the read-side SplitBlocks dedup fast path works."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    probe = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(probe):
        for root, _, files in os.walk(probe):
            hits = sorted(f for f in files if f.endswith(".parquet"))
            if hits:
                probe = os.path.join(root, hits[0])
                break
    full = pq.read_schema(probe).remove_metadata()
    sch = pa.schema([full.field(c) for c in columns]) if columns else full
    return rd.read_parquet(path, columns=columns, schema=sch, **kwargs)


def conform_schema(ds, schema: pa.Schema):
    """Force every block to ``schema`` (column order + types).

    Ray 2.49's hash-shuffle join emits ZERO-COLUMN blocks for empty
    partitions; feeding those into a second join fails inside Acero
    ("no match for key field"). Conforming empty blocks to the declared
    schema keeps multi-join pipelines robust at any data size."""

    def _c(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in schema], schema=schema
            )
        return t.select(schema.names).cast(schema)

    return ds.map_batches(_c, batch_format="pyarrow")


def adaptive_buckets(multiplier: int = 2, lo: int = 8, hi: int = 65536) -> int:
    """Default bucket count for the hash-partitioned shuffle helpers, sized
    to the cluster: ~2 bucket tasks per core. Bucket count is a pure
    parallelism knob — too many buckets at low parallelism is per-task
    overhead (a fixed 64 measured 4-8x slower than 16 on the dedup verify
    join in a 4-CPU session), too few at high parallelism starves cores.
    The floor keeps tiny test sessions on the multi-bucket code path; the
    cap sits far above any realistic cluster width."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
    except Exception:  # not initialised yet (import time, offline tools)
        cpus = 8
    return min(hi, max(lo, multiplier * cpus))


def parquet_num_rows(path: str) -> int:
    """Row count from parquet FOOTER metadata only (file or directory of
    files) — no data pass; used to size range decompositions without an
    extra scan."""
    import os as _os

    import pyarrow.parquet as _pq

    if _os.path.isdir(path):
        return sum(
            _pq.read_metadata(_os.path.join(path, f)).num_rows
            for f in _os.listdir(path) if f.endswith(".parquet"))
    return _pq.read_metadata(path).num_rows


def guarded_fanout(ds, path: str, blocks: int):
    """Repartition ``ds`` (read from ``path``) up to ``blocks`` ONLY when
    that increases parallelism. A parquet directory already yields one
    block per file; repartitioning it DOWN coalesces into few giant
    multi-chunk blocks — measured 26x slower per map_batches pass at 5M
    docs (see relational._read) — while reducing parallelism."""
    import os as _os

    if _os.path.isdir(path):
        nfiles = sum(1 for f in _os.listdir(path) if f.endswith(".parquet"))
    else:
        nfiles = 1
    return ds.repartition(blocks) if nfiles < blocks else ds


def fanout_blocks(frac: float = 1.0, lo: int = 4, hi: int = 4096) -> int:
    """Read fan-out width, ~``frac`` x cluster CPUs. Single-row-group test
    parquet arrives as ONE block, serializing every task stage, so reads
    fan out with a shuffle-free repartition — but downstream shuffle cost
    scales with block COUNT (each block pays a fixed tag/sample/reduce
    overhead, ~70 ms at 4 CPUs), so the width must track the session's
    parallelism rather than a fixed 32. At cluster scale inputs are many
    files and the repartition is a near-no-op coalesce/split."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
    except Exception:  # not initialised yet
        cpus = 8
    return min(hi, max(lo, int(cpus * frac)))


def seed_fsspec_http_stub() -> None:
    """Make Ray's per-IO probe `from fsspec.implementations.http import
    HTTPFileSystem` deterministic when aiohttp is absent.

    The probe is executed on EVERY dataset read/write path resolution;
    without aiohttp the module import fails and is removed from
    sys.modules each time, so CONCURRENT importers (threaded parquet
    writers) can observe the module mid-deletion and crash with an
    uncaught `ImportError: cannot import name 'HTTPFileSystem'` (Ray
    catches only ModuleNotFoundError). Seeding a stub module whose
    HTTPFileSystem class never matches any isinstance check makes the
    probe succeed cheaply and identically in every thread. No-op when the
    real module imports."""
    import sys
    import types

    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        __import__(name)
    except ImportError:
        stub = types.ModuleType(name)
        stub.HTTPFileSystem = type("HTTPFileSystem", (), {})
        sys.modules[name] = stub


def coalesce_blocks(ds, cap: int | None = None):
    """Coalesce a MATERIALIZED dataset down to ``cap`` blocks (default:
    ~cluster CPUs) when it exceeds it. Iterative shuffle loops (frontier
    relaxation, label propagation) otherwise accumulate blocks each round —
    a bucket groupby emits one block per group per input block lineage, so
    round N's shuffle carries N x the fixed per-block cost (measured on the
    closure loop: 182 -> 364 -> 546 blocks of ~30 rows, 16.8 s -> 32.7 s
    per iteration). Tiny-row block counts are pure overhead; coalescing is
    a shuffle-free split/merge."""
    cap = cap or fanout_blocks()
    try:
        n = ds.num_blocks()
    except Exception:  # not materialized: caller's responsibility
        return ds
    return ds.repartition(cap).materialize() if n > cap else ds


def list_column_matrix(col) -> np.ndarray:
    """Fixed-length ``list<float>`` column -> (n, d) float64 matrix via the
    flattened Arrow values buffer — no per-row Python lists (the
    ``np.stack(col.to_pylist())`` idiom materializes every row as a Python
    list of floats; this reads one contiguous buffer)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False)
    return flat.reshape(n, -1)


def _bucket_of(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
    return (h % num_buckets).astype(np.int64)


def bucket_aggregate(ds, keys: list[str], agg_spec: dict[str, tuple[str, str]],
                     *, num_buckets: int | None = None):
    """agg_spec: out_col -> (in_col, fn), fn in {sum,min,max,count}.

    count counts rows per key (in_col ignored). Output: keys + out cols.
    """
    num_buckets = num_buckets or adaptive_buckets()
    for out, (_, fn) in agg_spec.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported agg fn {fn} for {out}")

    # Arrow-native combiner: the corpus-sized input batch never converts
    # to pandas — the C++ hash aggregate reduces it first, and only the
    # (combiner-reduced, <= batch-sized) partial crosses into pandas for
    # the bucket hash (_bucket_of must stay pandas-hashed: bucket_join
    # unions two tagged streams and their hashes must agree).
    agg_list: list = []
    outmap: dict[str, str] = {}
    for out, (col, fn) in agg_spec.items():
        if fn == "count":
            spec, gen = ([], "count_all"), "count_all"
        else:
            spec, gen = (col, fn), f"{col}_{fn}"
        if spec not in agg_list:
            agg_list.append(spec)
        outmap[out] = gen

    def _partial(t: pa.Table):
        import pyarrow.compute as pc

        for k in keys:  # pandas groupby drops null keys (dropna=True)
            col = t.column(k)
            if col.null_count:
                t = t.filter(pc.is_valid(col))
        g = t.group_by(keys, use_threads=False).aggregate(agg_list)
        gdf = g.to_pandas()
        for out, gen in outmap.items():
            gdf[out] = (gdf[gen].astype("int64") if gen == "count_all"
                        else gdf[gen])
        gdf = gdf[keys + list(agg_spec)]
        gdf["_b"] = _bucket_of(gdf, keys, num_buckets)
        return _to_arrow(gdf)

    def _final(g: pd.DataFrame):
        named = {}
        for out, (_, fn) in agg_spec.items():
            named[out] = (out, "sum" if fn in ("sum", "count") else fn)
        out_df = g.groupby(keys, sort=False, observed=True).agg(**named).reset_index()
        # emit Arrow: downstream sorts/shuffles are far faster on Arrow
        # blocks than on pandas object-dtype blocks
        return _to_arrow(out_df.drop(columns=["_b"], errors="ignore"))

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return partials.groupby("_b").map_groups(_final, batch_format="pandas")


def bucket_distinct(ds, keys: list[str], *, num_buckets: int | None = None):
    """Global DISTINCT on the key tuple via bucket shuffle (exact dedup)."""
    num_buckets = num_buckets or adaptive_buckets()

    def _partial(t: pa.Table):
        # Arrow hash-distinct first; only the deduped (<= batch-sized)
        # result crosses into pandas for the bucket hash
        g = t.select(keys).group_by(keys, use_threads=False).aggregate([])
        gdf = g.to_pandas()[keys]
        gdf["_b"] = _bucket_of(gdf, keys, num_buckets)
        return _to_arrow(gdf)

    def _final(g: pa.Table):
        # Arrow group_by distinct (nulls compare equal, same as pandas
        # drop_duplicates). pyarrow batch format also keeps Ray's
        # synthesized empty-partition blocks Arrow-typed — pandas-format
        # map_groups emits empty PANDAS blocks whose arrow conversion
        # carries schema metadata, tripping schema-unify hashing at the
        # consume boundary.
        return g.group_by(keys, use_threads=False).aggregate([]).select(keys)

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return partials.groupby("_b").map_groups(_final, batch_format="pyarrow")


def bucket_join(left_ds, right_ds, *, key: str, right_key: str | None = None,
                left_cols: dict[str, pa.DataType],
                right_cols: dict[str, pa.DataType],
                key_type: pa.DataType = pa.int64(),
                num_buckets: int | None = None, post=None,
                how: str = "inner"):
    """Hash-partitioned inner equi-join on one key column, built on the
    bucket-groupby machinery (both sides shuffled on the key — the
    scale-safe large-large join shape).

    Exists because Ray 2.49's ``Dataset.join`` raises ArrowInvalid whenever
    an input contains empty blocks (zero-column partition builds inside
    Acero) — routine for filtered/aggregated intermediates. Sides are
    tagged into one union-able superset schema (missing columns
    null-filled), co-located by key hash, and merged per bucket with
    vectorized pandas. Output columns: ``key`` + left_cols + right_cols,
    cast back to their declared types.

    ``post`` (pandas df -> pandas df), when given, runs on each bucket's
    joined frame INSIDE the shuffle stage — fusing a post-join transform /
    partial aggregate into the join saves a whole extra all-to-all
    downstream (every sort-shuffle carries a fixed sampling-barrier cost
    that scales with block count, independent of data size).

    ``how``: "inner" (default), "left", or "full". Outer variants keep
    unmatched rows; missing payload columns come back NULL (pandas
    NaN/NaT — int columns are left in their float-upcast form rather
    than cast back, since the nulls are the point; restore a nullable
    dtype in ``post`` if needed). The shuffle shape is identical to
    inner, and the per-bucket merge is globally correct because BOTH
    sides are co-located by the same key hash.
    """
    if how not in ("inner", "left", "full"):
        raise ValueError(
            f"bucket_join: how={how!r} not in ('inner','left','full')")
    right_key = right_key or key
    declared = {**left_cols, **right_cols}

    def _mk_tagger(side: int, own: set, key_col: str):
        def _f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrs = [t.column(key_col).cast(key_type)]
            names = [key]
            for c, tp in declared.items():
                arrs.append(t.column(c).cast(tp) if c in own
                            else pa.nulls(n, tp))
                names.append(c)
            arrs.append(pa.array(np.full(n, side, dtype=np.int8)))
            names.append("_side")
            return pa.Table.from_arrays(arrs, names=names)

        return _f

    tagged = left_ds.map_batches(
        _mk_tagger(0, set(left_cols), key), batch_format="pyarrow"
    ).union(right_ds.map_batches(
        _mk_tagger(1, set(right_cols), right_key), batch_format="pyarrow"))

    lsel = [key] + list(left_cols)
    rsel = [key] + list(right_cols)
    dtypes = {c: tp.to_pandas_dtype() for c, tp in declared.items()}

    def _join(g: pd.DataFrame) -> pd.DataFrame:
        out = g.loc[g["_side"] == 0, lsel].merge(
            g.loc[g["_side"] == 1, rsel], on=key,
            how=("outer" if how == "full" else how))
        # null-filling upcasts int columns to float in the union; restore
        # (outer variants: unmatched-side cols legitimately hold NaN —
        # left restores only left cols, full restores none)
        restore = (dtypes if how == "inner"
                   else left_cols if how == "left" else {})
        out = out.astype({c: dtypes[c] for c in out.columns if c in restore})
        return post(out) if post is not None else out

    return bucket_map_keyed(tagged, [key], _join, num_buckets=num_buckets)


def bucket_join_salted(fact_ds, dim_ds, *, key: str,
                       fact_cols: dict[str, "pa.DataType"],
                       dim_cols: dict[str, "pa.DataType"],
                       key_type=None, salts: int = 8,
                       num_buckets: int | None = None, post=None):
    """Skew-safe MANY-TO-ONE equi-join: the salted-hot-key pattern the
    plain ``bucket_join`` lacks. A hot key in ``bucket_join`` sends every
    matching row of BOTH sides to one bucket — one straggling reduce task
    owns the whole key. Here the FACT side's shuffle key becomes
    (key, salt) with the salt assigned round-robin by row POSITION within
    each batch (np.arange(n) % salts — uniform and key-independent, so a
    hot key's rows spread over ``salts`` buckets regardless of its hash),
    and each DIM row is REPLICATED to all salts (legal precisely because
    the dim side is unique per key — the many-to-one contract; a
    many-to-many join cannot be salted this way without pair
    replication). Dim replication cost: |dim| x salts tiny rows.

    Output: key + fact_cols + dim_cols (inner join), exactly equal to
    ``bucket_join`` on the same inputs — asserted by a differential test.
    """
    key_type = key_type or pa.int64()
    if not 1 <= salts <= 127:  # salt column is int8
        raise ValueError(f"salts must be in [1, 127], got {salts}")
    declared = {**fact_cols, **dim_cols}

    def _tag_fact(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = t.column(key).cast(key_type)
        # row-position hash: uniform, key-independent salt assignment
        salt = pa.array((np.arange(n) % salts).astype(np.int8))
        arrs, names = [k, salt], [key, "_salt"]
        for c, tp in declared.items():
            arrs.append(t.column(c).cast(tp) if c in fact_cols
                        else pa.nulls(n, tp))
            names.append(c)
        arrs.append(pa.array(np.zeros(n, dtype=np.int8)))
        names.append("_side")
        return pa.Table.from_arrays(arrs, names=names)

    def _tag_dim(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = t.column(key).cast(key_type).to_numpy(zero_copy_only=False)
        rep_k = np.repeat(k, salts)
        salt = pa.array(np.tile(np.arange(salts, dtype=np.int8), n))
        arrs = [pa.array(rep_k), salt]
        names = [key, "_salt"]
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), salts))
        for c, tp in declared.items():
            if c in dim_cols:
                arrs.append(t.column(c).cast(tp).take(idx))
            else:
                arrs.append(pa.nulls(n * salts, tp))
            names.append(c)
        arrs.append(pa.array(np.ones(n * salts, dtype=np.int8)))
        names.append("_side")
        return pa.Table.from_arrays(arrs, names=names)

    tagged = fact_ds.map_batches(_tag_fact, batch_format="pyarrow").union(
        dim_ds.map_batches(_tag_dim, batch_format="pyarrow"))

    fsel = [key, "_salt"] + list(fact_cols)
    dsel = [key, "_salt"] + list(dim_cols)
    dtypes = {c: tp.to_pandas_dtype() for c, tp in declared.items()}

    def _join(g: pd.DataFrame) -> pd.DataFrame:
        out = g.loc[g["_side"] == 0, fsel].merge(
            g.loc[g["_side"] == 1, dsel], on=[key, "_salt"], how="inner")
        out = out.drop(columns=["_salt"])
        out = out.astype({c: dtypes[c] for c in out.columns if c in dtypes})
        return post(out) if post is not None else out

    return bucket_map_keyed(tagged, [key, "_salt"], _join,
                            num_buckets=num_buckets)


def bucket_anti_join(left_ds, right_ds, *, key: str, right_key: str | None = None,
                     left_cols: dict[str, pa.DataType] | None = None,
                     key_type: pa.DataType = pa.int64(),
                     num_buckets: int | None = None):
    """J8 anti-join: left rows whose key has NO match on the right
    (kg/dbpedia.py:89-105 'generated minus training entities'), as a
    hash-partitioned bucket shuffle — both sides shuffled, no broadcast."""
    right_key = right_key or key
    left_cols = left_cols or {}

    def _tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrs = [t.column(key).cast(key_type)]
        names = [key]
        for c, tp in left_cols.items():
            arrs.append(t.column(c).cast(tp))
            names.append(c)
        arrs.append(pa.array(np.zeros(n, dtype=np.int8)))
        names.append("_side")
        return pa.Table.from_arrays(arrs, names=names)

    def _tag_right(t: pa.Table) -> pa.Table:
        import pandas as _pd

        ks = _pd.Series(
            t.column(right_key).cast(key_type).to_numpy(zero_copy_only=False)
        ).drop_duplicates()
        n = len(ks)
        arrs = [pa.array(ks.to_numpy())]
        names = [key]
        for c, tp in left_cols.items():
            arrs.append(pa.nulls(n, tp))
            names.append(c)
        arrs.append(pa.array(np.ones(n, dtype=np.int8)))
        names.append("_side")
        return pa.Table.from_arrays(arrs, names=names)

    tagged = left_ds.map_batches(_tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(_tag_right, batch_format="pyarrow"))
    sel = [key] + list(left_cols)
    dtypes = {c: tp.to_pandas_dtype() for c, tp in left_cols.items()}

    def _anti(g: pd.DataFrame) -> pd.DataFrame:
        present = set(g.loc[g["_side"] == 1, key])
        out = g.loc[(g["_side"] == 0) & ~g[key].isin(present), sel]
        return out.astype(dtypes) if dtypes else out

    return bucket_map_keyed(tagged, [key], _anti, num_buckets=num_buckets)


def bucket_map_keyed(ds, keys: list[str], bucket_fn, *,
                     num_buckets: int | None = None, pre=None,
                     pre_format: str = "pandas"):
    """Co-locate rows by key hash, then run ``bucket_fn`` (vectorized pandas
    over the whole bucket; all rows of a key tuple are guaranteed present).
    ``pre`` optionally thins each batch before the shuffle;
    ``pre_format="pyarrow"`` runs it as pa.Table -> pa.Table so a
    corpus-sized input batch never converts to pandas — only the thinned
    pre output crosses over for the bucket hash (_bucket_of stays
    pandas-hashed for cross-helper consistency)."""
    num_buckets = num_buckets or adaptive_buckets()

    if pre_format == "pyarrow":
        def _tag(t: pa.Table):
            if pre is not None:
                t = pre(t)
            b = t.to_pandas()
            b["_b"] = _bucket_of(b, keys, num_buckets)
            return _to_arrow(b)
    else:
        def _tag(b: pd.DataFrame):
            if pre is not None:
                b = pre(b)
            b = b.copy()
            b["_b"] = _bucket_of(b, keys, num_buckets)
            return _to_arrow(b)

    def _final(g: pd.DataFrame):
        out = bucket_fn(g.drop(columns=["_b"]))
        if isinstance(out, pd.DataFrame):
            out = _to_arrow(out)
        return out

    return ds.map_batches(
        _tag, batch_format=pre_format
    ).groupby("_b").map_groups(_final, batch_format="pandas")


class _PairMap:
    """Driver-built CSR over an ontology-bounded (key -> values) pair set,
    for Arrow-native broadcast-join expansion inside corpus scans: a
    schema-side pandas merge per batch becomes ``pc.index_in`` + two
    integer gathers. Picklable (numpy + pyarrow arrays only), shipped once
    per actor via ray.put."""

    def __init__(self, pairs):
        if isinstance(pairs, pd.DataFrame):
            pairs = list(pairs.itertuples(index=False, name=None))
        m: dict[str, list[str]] = {}
        for a, b in pairs:
            m.setdefault(a, []).append(b)
        keys = sorted(m)
        self.keys = pa.array(keys, type=pa.string())
        self.counts = np.array([len(m[k]) for k in keys], dtype=np.int64)
        self.offsets = np.concatenate(
            ([0], np.cumsum(self.counts)[:-1])).astype(np.int64)
        self.flat_vals = pa.array(
            [v for k in keys for v in sorted(m[k])], type=pa.string())

    def expand(self, col) -> tuple[np.ndarray, pa.Array]:
        """col (Array/ChunkedArray of keys) -> (parent row indices, value
        array): one output row per (row, value) pair for rows whose key is
        mapped; rows with unmapped keys emit nothing."""
        import pyarrow.compute as pc

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        idx = pc.fill_null(pc.index_in(col, value_set=self.keys), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.nonzero(idx >= 0)[0]
        code = idx[sel]
        tc = self.counts[code]
        tot = int(tc.sum())
        if not tot:
            return (np.empty(0, dtype=np.int64),
                    pa.array([], type=pa.string()))
        first = np.cumsum(tc) - tc
        within = np.arange(tot, dtype=np.int64) - np.repeat(first, tc)
        flat_pos = np.repeat(self.offsets[code], tc) + within
        parent = np.repeat(sel, tc)
        return parent, self.flat_vals.take(pa.array(flat_pos))


class _TableMap:
    """CSR from a key column of a SMALL table to its row indices — the
    multi-column generalization of _PairMap (an Arrow-native broadcast
    inner join): ``expand(col)`` returns (parent row indices into the
    probe column, row positions into the small table); gather any value
    column with ``.col(name).take(row_positions)``."""

    def __init__(self, df: pd.DataFrame, key: str):
        self._tbl = _to_arrow(df.reset_index(drop=True))
        m: dict[str, list[int]] = {}
        for i, k in enumerate(df[key]):
            m.setdefault(k, []).append(i)
        keys = sorted(m)
        self.keys = pa.array(keys, type=pa.string())
        self.counts = np.array([len(m[k]) for k in keys], dtype=np.int64)
        self.offsets = np.concatenate(
            ([0], np.cumsum(self.counts)[:-1])).astype(np.int64)
        self.flat_rows = np.array(
            [r for k in keys for r in m[k]], dtype=np.int64)

    def col(self, name: str):
        return self._tbl.column(name)

    def expand(self, col) -> tuple[np.ndarray, pa.Array]:
        import pyarrow.compute as pc

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        idx = pc.fill_null(pc.index_in(col, value_set=self.keys), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.nonzero(idx >= 0)[0]
        code = idx[sel]
        tc = self.counts[code]
        tot = int(tc.sum())
        if not tot:
            return (np.empty(0, dtype=np.int64),
                    pa.array(np.empty(0, dtype=np.int64)))
        first = np.cumsum(tc) - tc
        within = np.arange(tot, dtype=np.int64) - np.repeat(first, tc)
        flat_pos = self.flat_rows[np.repeat(self.offsets[code], tc) + within]
        return np.repeat(sel, tc), pa.array(flat_pos)
