"""Key-range partitioned Parquet sink with per-partition resume.

The resumable-output discipline at corpus scale: output lands as one
directory per key range (``part_00000/ … part_{P-1}/``), each committed
atomically with a ``_COMMITTED`` marker holding the partition's row count
and key bounds.  A rerun of the same write skips every committed partition
and re-executes ONLY the missing ones — a failed 100 TB job resumes from
where it stopped instead of rewriting everything (the complement of
``state/checkpoint.py``, which checkpoints whole STAGES; this checkpoints
within one output).

Partition bounds come from exact key percentiles computed distributed
(``analytics.grouped_percentiles`` machinery is overkill for one global
column — a per-block value-count partial + driver merge of the
value-histogram suffices and is vocabulary-sized for key columns, or use
explicit ``bounds``).  Each row routes to ``searchsorted(bounds, key)`` —
one shuffle by partition id, then one task per partition writes its file
set.  Reference parity: the reference's savers
(``am_combiner/utils/storage.py:56-119``) write one CSV per result set
with no resume; this is the scale-out restatement.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa


def compute_range_bounds(ds, key_col: str, num_partitions: int) -> list:
    """(num_partitions - 1) split points from exact key quantiles.

    Per-block (value, count) partials — distinct-value-sized, not
    row-sized — are merged on the driver into the exact key histogram;
    splits are the ceil(q·N)-th order statistics.  For unbounded
    continuous keys swap in the histogram-refinement percentile stage;
    for known layouts pass explicit bounds to ``write_partitioned``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(
            batch[key_col].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"v": pa.array(v), "c": pa.array(c.astype(np.int64))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict = {}
    for r in rows:
        agg[r["v"]] = agg.get(r["v"], 0) + r["c"]
    values = np.array(sorted(agg))
    counts = np.array([agg[v] for v in values], dtype=np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1])
    bounds = []
    for k in range(1, num_partitions):
        target = int(np.ceil(total * k / num_partitions))
        bounds.append(values[int(np.searchsorted(cum, target))])
    return [b.item() if hasattr(b, "item") else b for b in bounds]


def _marker(part_dir: str) -> str:
    return os.path.join(part_dir, "_COMMITTED")


def write_partitioned(ds, out_dir: str, key_col: str,
                      num_partitions: int = 16, bounds: list | None = None):
    """Write ``ds`` as range-partitioned Parquet under ``out_dir``.

    Returns a manifest dict: per-partition rows / bounds / skipped flag.
    Committed partitions (marker present, matching bounds) are SKIPPED —
    their data is not recomputed or rewritten; only missing partitions
    execute.  The skip test is on the driver; the per-partition write is
    a Ray task via ``write_parquet`` on the filtered stream.
    """
    if bounds is None:
        bounds = compute_range_bounds(ds, key_col, num_partitions)
    bounds = list(bounds)
    n_parts = len(bounds) + 1
    os.makedirs(out_dir, exist_ok=True)

    meta_path = os.path.join(out_dir, "_bounds.json")
    bounds_payload = {"key_col": key_col, "bounds": [str(b) for b in bounds]}
    if os.path.exists(meta_path):
        prior = json.load(open(meta_path))
        if prior != bounds_payload:
            raise ValueError(
                f"{out_dir} was partitioned with different bounds; "
                "remove it or pass the original bounds")
    else:
        with open(meta_path, "w") as f:
            json.dump(bounds_payload, f)

    todo = [p for p in range(n_parts)
            if not os.path.exists(_marker(os.path.join(
                out_dir, f"part_{p:05d}")))]
    manifest = {"partitions": [], "skipped": n_parts - len(todo)}
    if not todo:
        return manifest

    barr = np.array(bounds)

    def route(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        pid = np.searchsorted(barr, keys, side="left")
        return batch.append_column("__part", pa.array(pid.astype(np.int64)))

    routed = ds.map_batches(route, batch_format="pyarrow").materialize()

    for p in todo:
        part_dir = os.path.join(out_dir, f"part_{p:05d}")
        tmp_dir = part_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)
        sub = routed.filter(expr=f"__part == {p}").drop_columns(["__part"])
        # Skewed/degenerate range bounds can make a partition empty; Ray's
        # write_parquet creates no directory for 0 rows, so pre-create it —
        # the empty partition still gets a _COMMITTED marker and resume works.
        os.makedirs(tmp_dir, exist_ok=True)
        sub.write_parquet(tmp_dir)
        rows = sub.count()
        os.replace(tmp_dir, part_dir)
        with open(_marker(part_dir), "w") as f:
            json.dump({"rows": rows, "part": p}, f)
        manifest["partitions"].append({"part": p, "rows": rows})
    return manifest


def read_partition_manifest(out_dir: str) -> list[dict]:
    """Committed-partition summaries (for monitoring / resume auditing)."""
    out = []
    for name in sorted(os.listdir(out_dir)):
        m = _marker(os.path.join(out_dir, name))
        if os.path.exists(m):
            out.append({"dir": name, **json.load(open(m))})
    return out
