"""Histogram / time-performance sidecars (qa/plots.py) — the engine analogue
of am_combiner/utils/plots.py: binned counts + JSON artifacts, no renderer."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import ray.data as rd

from entity_resolution_ray.qa.plots import (
    metric_histogram,
    time_performance_table,
    write_histogram_json,
    write_time_performance_json,
)
from entity_resolution_ray.state.timings import BlockTimingCollector


def test_metric_histogram_distributed_matches_numpy(tmp_path):
    rng = np.random.RandomState(7)
    vals = rng.uniform(0, 1, 5000)
    df = pd.DataFrame({"v": vals})
    ds = rd.from_pandas(df).repartition(8)  # partial per block, merged exact
    h = metric_histogram(ds, "v", 0.0, 1.0, bins=10)
    ref, edges = np.histogram(vals, bins=10, range=(0.0, 1.0))
    assert h["counts"] == ref.tolist()
    assert h["n"] == 5000
    assert len(h["edges"]) == 11

    # single-partition run must produce the identical artifact (determinism)
    h1 = metric_histogram(rd.from_pandas(df).repartition(1), "v", 0.0, 1.0, 10)
    assert h1 == h

    p = write_histogram_json(h, str(tmp_path / "v_hist.json"), title="V-score")
    payload = json.loads(open(p).read())
    assert payload["title"] == "V-score"
    assert payload["counts"] == h["counts"]


def test_metric_histogram_clamps_and_drops_nulls():
    df = pd.DataFrame({"v": [-5.0, 0.0, 0.5, 1.0, 99.0, np.nan]})
    h = metric_histogram(df, "v", 0.0, 1.0, bins=2)
    # -5 clamps into bin 0; 0.5/1.0/99 land in the last bin (right-open
    # bins, top clamp); nan dropped
    assert h["n"] == 5
    assert sum(h["counts"]) == 5
    assert h["counts"] == [2, 3]


def test_time_performance_sidecar(tmp_path):
    import ray

    col = BlockTimingCollector.remote()
    ray.get(col.add.remote({3: (0.006, 2), 10: (0.05, 1)}))
    ray.get(col.add.remote({3: (0.002, 2)}))
    summary = ray.get(col.summary.remote())
    df = time_performance_table(summary)
    assert df["n_mentions"].tolist() == [3, 10]
    assert df.loc[0, "n_blocks"] == 4
    assert abs(df.loc[0, "mean_ms"] - 2.0) < 1e-6  # 8ms over 4 blocks
    p = write_time_performance_json(summary, str(tmp_path / "t.json"))
    rows = json.loads(open(p).read())
    assert rows[0]["n_mentions"] == 3
