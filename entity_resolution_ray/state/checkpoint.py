"""Per-stage checkpointing with lineage + metrics (north rule: resumable).

Reference analogue: the Mongo feature cache with already-processed-URL
filtering (``am_combiner/utils/build_feature_cache.py:76-86``) and the
sanctions input JSON cache (``am_combiner/__sanction_main__.py:263-288``) —
re-expressed as partitioned Parquet stage outputs:

    <root>/<stage>/part-*.parquet     one file per output block
    <root>/<stage>/_lineage.json      fingerprint + per-partition metrics

A stage runs only when no committed lineage with a matching fingerprint
exists; otherwise the checkpoint is read back (skip).  Writes go to a temp
directory and are committed with an atomic rename, so a killed run never
leaves a half-written stage that a resume would trust.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow.parquet as pq

import ray.data as rd

from entity_resolution_ray.utils.hashing import stable_hash64


def fingerprint_of(*parts) -> str:
    """Stable fingerprint from input identifiers + stage config reprs."""
    return format(stable_hash64("\x1f".join(str(p) for p in parts)), "016x")


def _lineage_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_lineage.json")


def is_committed(root: str, stage: str, fingerprint: str) -> bool:
    lp = _lineage_path(os.path.join(root, stage))
    if not os.path.exists(lp):
        return False
    try:
        with open(lp) as f:
            lineage = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return lineage.get("fingerprint") == fingerprint


def read_stage(root: str, stage: str):
    """Read a committed stage back as a Dataset."""
    stage_dir = os.path.join(root, stage)
    files = sorted(
        os.path.join(stage_dir, f)
        for f in os.listdir(stage_dir)
        if f.endswith(".parquet")
    )
    return rd.read_parquet(files)


def checkpoint_stage(ds_factory, root: str, stage: str, fingerprint: str):
    """Run (or skip) one stage; returns (Dataset, lineage_dict, skipped).

    ``ds_factory`` is a zero-arg callable producing the stage Dataset — only
    invoked when the checkpoint is missing or stale.
    """
    stage_dir = os.path.join(root, stage)
    if is_committed(root, stage, fingerprint):
        with open(_lineage_path(stage_dir)) as f:
            lineage = json.load(f)
        return read_stage(root, stage), lineage, True

    tmp_dir = stage_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)

    t0 = time.time()
    ds = ds_factory()
    ds.write_parquet(tmp_dir)
    wall = time.time() - t0

    partitions = []
    total_rows = 0
    total_bytes = 0
    for f in sorted(os.listdir(tmp_dir)):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(tmp_dir, f)
        md = pq.ParquetFile(path).metadata
        partitions.append(
            {
                "file": f,
                "rows": md.num_rows,
                "bytes": os.path.getsize(path),
            }
        )
        total_rows += md.num_rows
        total_bytes += os.path.getsize(path)

    lineage = {
        "stage": stage,
        "fingerprint": fingerprint,
        "wall_sec": round(wall, 3),
        "rows": total_rows,
        "bytes": total_bytes,
        "n_partitions": len(partitions),
        "partitions": partitions,
    }
    with open(_lineage_path(tmp_dir), "w") as f:
        json.dump(lineage, f, indent=2)
    os.rename(tmp_dir, stage_dir)  # atomic commit
    return read_stage(root, stage), lineage, False
