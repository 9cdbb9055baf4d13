"""Range-partitioned resumable Parquet sink (state/partitioned_sink.py):
exact-quantile bounds, atomic per-partition commit, rerun skips committed
partitions and rebuilds only missing ones, byte-identical content."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from entity_resolution_ray.state.partitioned_sink import (
    compute_range_bounds,
    read_partition_manifest,
    write_partitioned,
)


def _mk_ds(n=5000, seed=3):
    rng = np.random.RandomState(seed)
    df = pd.DataFrame({
        "k": rng.randint(0, 100000, n),
        "v": rng.uniform(size=n),
    })
    return df, rd.from_pandas(df).repartition(8)


def _read_all(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part_*", "*.parquet")))
    return pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)


def test_bounds_split_evenly():
    df, ds = _mk_ds()
    bounds = compute_range_bounds(ds, "k", 4)
    assert len(bounds) == 3 and bounds == sorted(bounds)
    pid = np.searchsorted(np.array(bounds), df["k"].to_numpy())
    counts = np.bincount(pid, minlength=4)
    assert counts.min() > len(df) / 8  # no empty / degenerate ranges

def test_write_resume_skips_committed(tmp_path):
    df, ds = _mk_ds()
    out = str(tmp_path / "out")
    m1 = write_partitioned(ds, out, "k", num_partitions=4)
    assert m1["skipped"] == 0 and len(m1["partitions"]) == 4
    total = sum(p["rows"] for p in m1["partitions"])
    assert total == len(df)

    got = _read_all(out).sort_values(["k", "v"]).reset_index(drop=True)
    want = df.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    # range invariant: every row in part p is within its key range
    manifest = read_partition_manifest(out)
    assert [m["rows"] for m in manifest] == [p["rows"] for p in m1["partitions"]]

    # delete one partition -> rerun rebuilds ONLY it, others untouched
    victim = os.path.join(out, "part_00002")
    kept = os.path.join(out, "part_00001")
    kept_mtime = max(os.path.getmtime(f) for f in glob.glob(kept + "/*"))
    shutil.rmtree(victim)
    m2 = write_partitioned(ds, out, "k", num_partitions=4)
    assert m2["skipped"] == 3
    assert [p["part"] for p in m2["partitions"]] == [2]
    assert max(os.path.getmtime(f) for f in glob.glob(kept + "/*")) == kept_mtime
    got2 = _read_all(out).sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want)

    # full rerun: everything skipped, no work
    m3 = write_partitioned(ds, out, "k", num_partitions=4)
    assert m3["skipped"] == 4 and m3["partitions"] == []

def test_bounds_mismatch_refuses(tmp_path):
    df, ds = _mk_ds()
    out = str(tmp_path / "out")
    write_partitioned(ds, out, "k", num_partitions=4)
    import pytest

    with pytest.raises(ValueError):
        write_partitioned(ds, out, "k", num_partitions=8)


def test_skewed_keys_empty_partition_commits(tmp_path):
    """ADVICE r4: degenerate key distribution (one hot key) makes
    compute_range_bounds yield duplicate bounds → some partitions route
    zero rows.  The sink must still commit those partitions (empty dir +
    _COMMITTED marker) so a rerun resumes instead of crashing."""
    df = pd.DataFrame({
        "k": np.array([1] * 100 + [2, 2, 3, 3], np.int64),
        "v": np.arange(104, dtype=np.float64),
    })
    ds = rd.from_pandas(df).repartition(4)
    out = str(tmp_path / "skewed")
    manifest = write_partitioned(ds, out, "k", num_partitions=4)
    assert len(manifest["partitions"]) == 4
    committed = read_partition_manifest(out)
    assert len(committed) == 4
    assert sum(p["rows"] for p in committed) == 104
    # at least one partition is empty under this skew
    assert any(p["rows"] == 0 for p in committed)
    # rerun skips everything
    again = write_partitioned(ds, out, "k", num_partitions=4)
    assert again["skipped"] == 4 and not again["partitions"]
    got = _read_all(out).sort_values(["k", "v"]).reset_index(drop=True)
    exp = df.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
