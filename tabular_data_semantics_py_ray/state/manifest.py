"""Per-partition lineage manifests — the transactional version of the
reference's skip-if-output-exists resume (oaei/dbpedia_fragment.py:712-716,
append-mode caches test/challenge_utils.py:317-347).

A partition is COMMITTED iff its manifest JSON exists; the manifest is
written only after the partition's parquet directory has been atomically
renamed into place, so a killed run can never leave a half-written
partition that looks complete. Manifests carry lineage (input filter,
partition id) and metrics (rows, order-insensitive content hash) keyed on
content, never timestamps.
"""

from __future__ import annotations

import hashlib
import json
import os


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def manifest_path(out_dir: str, partition: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{partition:05d}.json")


def partition_dir(out_dir: str, partition: int) -> str:
    return os.path.join(out_dir, f"part={partition:05d}")


def is_committed(out_dir: str, partition: int) -> bool:
    return os.path.exists(manifest_path(out_dir, partition))


def rows_hash_update(acc: int, key_strings) -> int:
    """Order-insensitive content hash: sum of per-row blake2 digests mod
    2^64 — mergeable across blocks/partitions in any order."""
    for s in key_strings:
        acc = (acc + int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
        )) & 0xFFFFFFFFFFFFFFFF
    return acc


def commit(out_dir: str, partition: int, *, rows: int, content_hash: int,
           lineage: dict) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    tmp = manifest_path(out_dir, partition) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "partition": partition,
                "rows": rows,
                "content_hash": f"{content_hash:016x}",
                "lineage": lineage,
            },
            f,
            indent=2,
            sort_keys=True,
        )
    os.replace(tmp, manifest_path(out_dir, partition))


def load(out_dir: str, partition: int) -> dict:
    with open(manifest_path(out_dir, partition)) as f:
        return json.load(f)


def committed_partitions(out_dir: str) -> list[int]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("part-") and name.endswith(".json"):
            out.append(int(name[5:-5]))
    return out
