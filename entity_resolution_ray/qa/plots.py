"""Histogram / report sidecars — the engine's analogue of the reference's
plot artifacts, without a rendering dependency.

Reference parity (semantics, not pixels):

- ``plot_sensitivity_analysis_histograms`` (``am_combiner/utils/plots.py:10-45``)
  dumps a histogram per holdout-resample metric (e.g. V-score) → here
  ``metric_histogram`` + ``write_histogram_json`` emit the binned counts as a
  deterministic JSON sidecar any plotting frontend can render.
- ``plot_time_performance_histograms`` (``am_combiner/utils/plots.py:48-73``)
  bars mean combine-time by mention count → here
  ``time_performance_table`` reshapes ``BlockTimingCollector.summary()`` into
  the same (n_mentions → mean_ms) table and JSON sidecar.

The histogram itself is a DISTRIBUTED aggregate: fixed edges are broadcast
with the closure, each ``map_batches`` task emits one fixed-size count
vector (a mergeable partial — the same shape as the sketch tier), and the
driver folds the ≤ num_blocks partials.  No stage grows with the data; only
``bins + 1`` numbers ever reach the driver per partial.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa


def metric_histogram(ds, col: str, lo: float, hi: float, bins: int = 20):
    """Fixed-edge histogram of ``col`` over a Dataset (or DataFrame).

    Edges are ``bins`` equal-width intervals on [lo, hi]; values outside
    clamp into the end bins (np.clip), nulls are dropped.  Returns
    ``{"edges": [...], "counts": [...], "n": int}`` with exact integer
    counts — deterministic for any partitioning because integer partial
    sums are associative.
    """
    edges = np.linspace(float(lo), float(hi), bins + 1)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.clip(np.searchsorted(edges, v, side="right") - 1, 0, bins - 1)
        counts = np.bincount(idx, minlength=bins).astype(np.int64)
        return pa.table({"counts": pa.array([counts.tobytes()], pa.binary()),
                         "n": pa.array([len(v)], pa.int64())})

    if isinstance(ds, pd.DataFrame):
        t = pa.Table.from_pandas(ds[[col]], preserve_index=False)
        rows = [partial(t).to_pylist()[0]]
    else:
        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()

    counts = np.zeros(bins, dtype=np.int64)
    n = 0
    for r in rows:
        counts += np.frombuffer(r["counts"], dtype=np.int64)
        n += r["n"]
    return {"edges": [round(float(e), 10) for e in edges],
            "counts": counts.tolist(), "n": int(n)}


def write_histogram_json(hist: dict, path: str, title: str = "") -> str:
    """Write a histogram sidecar (atomic rename, stable key order)."""
    payload = {"title": title, **hist}
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True, indent=1)
    os.replace(tmp, path)
    return path


def time_performance_table(summary: dict[int, dict]) -> pd.DataFrame:
    """``BlockTimingCollector.summary()`` → (n_mentions, mean_ms, n_blocks)
    rows sorted by mention count — the reference's time-performance bar
    input (``am_combiner/utils/plots.py:48-73``)."""
    rows = [
        {"n_mentions": int(k),
         "mean_ms": round(float(v["avg_ms"]), 6),
         "n_blocks": int(v["n_blocks"])}
        for k, v in summary.items()
    ]
    return pd.DataFrame(sorted(rows, key=lambda r: r["n_mentions"]),
                        columns=["n_mentions", "mean_ms", "n_blocks"])


def write_time_performance_json(summary: dict[int, dict], path: str) -> str:
    df = time_performance_table(summary)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(df.to_dict(orient="records"), f, sort_keys=True, indent=1)
    os.replace(tmp, path)
    return path
