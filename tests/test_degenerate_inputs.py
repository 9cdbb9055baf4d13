"""Degenerate-input robustness: empty tables, single-row tables, all-equal
keys.  At 100 TB a partition-empty input shard is routine (a filter that
drops a whole file, a key range with no rows) — every core operator must pass
it through without crashing or emitting schema-drifted blocks."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from entity_resolution_ray.stages.aggregate import grouped_aggregate
from entity_resolution_ray.stages.joins import hash_join, key_filter_join


@pytest.fixture(scope="module")
def empty_events(tmp_path_factory):
    p = tmp_path_factory.mktemp("degen") / "events_empty.parquet"
    schema = pa.schema([
        ("user_id", pa.int64()), ("value", pa.float64()),
        ("event_type", pa.string()),
    ])
    pq.write_table(schema.empty_table(), p)
    return str(p)


@pytest.fixture(scope="module")
def one_row(tmp_path_factory):
    p = tmp_path_factory.mktemp("degen1") / "one.parquet"
    pq.write_table(
        pa.table({"user_id": [7], "value": [1.5], "event_type": ["x"]}), p)
    return str(p)


def test_grouped_aggregate_empty(empty_events):
    ds = rd.read_parquet(empty_events)
    out = grouped_aggregate(
        ds, "user_id", {"n": ("value", "count"), "s": ("value", "sum")})
    assert out.count() == 0


def test_grouped_aggregate_one_row(one_row):
    ds = rd.read_parquet(one_row)
    out = grouped_aggregate(
        ds, "user_id", {"n": ("value", "count"), "s": ("value", "sum")}
    ).to_pandas()
    assert len(out) == 1
    assert out["n"].iloc[0] == 1 and out["s"].iloc[0] == 1.5


def test_hash_join_empty_side(tmp_path, one_row):
    # an empty SOURCE shard keeps its schema via parquet metadata — joins
    # against it must work (routine at scale: a key range with no rows)
    p = os.path.join(tmp_path, "empty_right.parquet")
    pq.write_table(
        pa.schema([("user_id", pa.int64()), ("v2", pa.float64())])
        .empty_table(), p)
    left = rd.read_parquet(one_row)
    right = rd.read_parquet(p)
    inner = hash_join(left, right, on="user_id", num_buckets=4)
    assert inner.count() == 0
    # left join keeps the probe row with a null payload
    lj = hash_join(left, right, on="user_id", how="left",
                   num_buckets=4).to_pandas()
    assert len(lj) == 1 and pd.isna(lj["v2"].iloc[0])


def test_hash_join_schemaless_empty_raises(empty_events, one_row):
    """A transformed empty dataset carries NO schema in Ray (blocks are
    dropped) — the join must fail with a clear contract error, not an
    AttributeError deep in schema plumbing."""
    left = rd.read_parquet(one_row)
    right = rd.read_parquet(empty_events).map_batches(
        lambda t: t.rename_columns(["user_id", "v2", "et"]),
        batch_format="pyarrow")
    with pytest.raises(ValueError, match="no blocks"):
        hash_join(left, right, on="user_id", num_buckets=4)


def test_key_filter_join_empty_right(empty_events, one_row):
    left = rd.read_parquet(one_row)
    right = rd.read_parquet(empty_events)
    semi = key_filter_join(left, right, on="user_id", how="semi")
    anti = key_filter_join(left, right, on="user_id", how="anti")
    assert semi.count() == 0
    assert anti.count() == 1


def test_all_equal_keys_single_group(tmp_path):
    p = os.path.join(tmp_path, "same.parquet")
    pq.write_table(
        pa.table({"k": [1] * 1000, "v": list(range(1000))}), p)
    out = grouped_aggregate(
        rd.read_parquet(p), "k", {"s": ("v", "sum")}).to_pandas()
    assert len(out) == 1 and out["s"].iloc[0] == sum(range(1000))


def test_textstats_empty_and_whitespace(tmp_path):
    from entity_resolution_ray.stages.textstats import text_stats

    p = os.path.join(tmp_path, "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": [1, 2, 3], "text": ["", "   ", "one two"]}), p)
    out = text_stats(rd.read_parquet(p)).to_pandas().sort_values("doc_id")
    assert list(out["token_count"])[:2] == [0, 0]
    assert out["token_count"].iloc[2] == 2


def test_er_empty_documents(tmp_path):
    """An empty documents table must produce an empty clustered output, not
    crash in blocking/clustering."""
    from entity_resolution_ray.pipelines.er import cluster_documents
    from entity_resolution_ray.fixtures.generator import fixture_dir_for

    fx = fixture_dir_for(1000)
    docs = os.path.join(fx, "documents.parquet")
    if os.path.isdir(docs):  # sharded fixture layout
        docs = os.path.join(docs, sorted(os.listdir(docs))[0])
    schema = pq.read_schema(docs)
    p = os.path.join(tmp_path, "documents.parquet")
    pq.write_table(schema.empty_table(), p)
    clustered, edges = cluster_documents(p)
    assert clustered.count() == 0
    assert edges.count() == 0


def test_bloom_filtered_join_matches_hash_join():
    from entity_resolution_ray.stages.joins import (
        bloom_filtered_join, build_bloom_filter, hash_join, _key_hash64,
        _bloom_positions,
    )
    import numpy as np
    import pandas as pd
    import ray.data as rd

    left = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(20000) % 997, "v": np.arange(20000)})).repartition(8)
    right = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(13), "w": np.arange(13) * 3})).repartition(2)
    a = bloom_filtered_join(left, right, on="k", num_buckets=8).to_pandas()
    b = hash_join(left, right, on="k", num_buckets=8).to_pandas()
    a = a.sort_values(["k", "v"]).reset_index(drop=True)
    b = b.sort_values(["k", "v"]).reset_index(drop=True)
    assert a.equals(b[a.columns.tolist()])

    # pruning actually prunes: the bitset admits all right keys and only a
    # false-positive fraction of the rest
    bits = build_bloom_filter(right, "k")
    probe = pd.DataFrame({"k": np.arange(997)})
    pos = _bloom_positions(_key_hash64(probe, ["k"]), len(bits) * 8, 4)
    hit = ((bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
    assert hit[:13].all()            # no false negatives, ever
    assert hit.sum() <= 13 + 5       # ~2e-5 fp rate leaves ~no extras


def test_salted_join_matches_hash_join_under_skew():
    from entity_resolution_ray.stages.joins import hash_join, salted_join
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(7)
    # one key owns 80% of the left side
    k = np.where(rng.random(30000) < 0.8, 42, rng.integers(0, 200, 30000))
    left = rd.from_pandas(pd.DataFrame({"k": k, "v": np.arange(30000)})
                          ).repartition(8)
    right = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(200), "w": np.arange(200) * 2})).repartition(2)

    a = salted_join(left, right, on="k", num_buckets=8, num_salts=4,
                    hot_threshold=1000).to_pandas()
    b = hash_join(left, right, on="k", num_buckets=8).to_pandas()
    a = a.sort_values(["k", "v"]).reset_index(drop=True)
    b = b.sort_values(["k", "v"]).reset_index(drop=True)
    assert a.equals(b[a.columns.tolist()])

    # left join keeps unmatched hot rows too
    right_partial = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(10), "w": np.arange(10) * 2})).repartition(2)
    al = salted_join(left, right_partial, on="k", how="left", num_buckets=8,
                     num_salts=4, hot_threshold=1000).to_pandas()
    bl = hash_join(left, right_partial, on="k", how="left",
                   num_buckets=8).to_pandas()
    al = al.sort_values(["k", "v"]).reset_index(drop=True)
    bl = bl.sort_values(["k", "v"]).reset_index(drop=True)
    assert al[["k", "v"]].equals(bl[["k", "v"]])
    assert al["w"].fillna(-1).equals(bl["w"].fillna(-1))


def test_hot_key_census_finds_the_hot_key():
    from entity_resolution_ray.stages.joins import _hot_keys
    import numpy as np
    import pandas as pd
    import ray.data as rd

    k = np.concatenate([np.full(5000, 9), np.arange(1000)])
    ds = rd.from_pandas(pd.DataFrame({"k": k})).repartition(4)
    hot = _hot_keys(ds, ["k"], hot_threshold=2000)
    assert list(hot["k"]) == [9]


def test_merge_upsert_semantics():
    from entity_resolution_ray.stages.joins import merge_upsert
    import pandas as pd
    import ray.data as rd

    base = rd.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3], "v": ["a", "b", "c"]})).repartition(2)
    upd = rd.from_pandas(pd.DataFrame(
        {"k": [2, 4, 2], "v": ["B1", "D", "B2"],
         "ver": [1, 1, 2]})).repartition(2)
    base2 = base.map_batches(
        lambda df: df.assign(ver=0), batch_format="pandas")
    out = merge_upsert(base2, upd, on="k", version_col="ver").to_pandas(
        ).sort_values("k").reset_index(drop=True)
    # 2 replaced (max-version update wins), 4 inserted, 1/3 untouched
    assert list(out["k"]) == [1, 2, 3, 4]
    assert list(out["v"]) == ["a", "B2", "c", "D"]


def test_hash_join_null_keys_sql_semantics():
    """SQL NULL semantics: a null key matches nothing (pandas merge would
    pair NaN with NaN); left join keeps null-keyed left rows unmatched."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd
    from entity_resolution_ray.stages.joins import hash_join

    lt = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                   "v": pa.array(["a", "b", "c"])})
    rt = pa.table({"k": pa.array([None, 3], pa.int64()),
                   "w": pa.array(["X", "Y"])})
    left, right = rd.from_arrow(lt), rd.from_arrow(rt)

    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)

    inner = hash_join(left, right, on="k", num_buckets=2).to_pandas()
    oracle_i = con.execute("select * from l join r using (k)").df()
    assert len(inner) == len(oracle_i) == 1
    assert inner["v"].iloc[0] == "c" and inner["w"].iloc[0] == "Y"

    lj = hash_join(left, right, on="k", how="left",
                   num_buckets=2).to_pandas().sort_values("v")
    oracle_l = con.execute(
        "select * from l left join r using (k) order by v").df()
    assert list(lj["v"]) == list(oracle_l["v"]) == ["a", "b", "c"]
    assert lj["w"].fillna("-").tolist() == oracle_l["w"].fillna("-").tolist()


def test_grouped_aggregate_keeps_null_key_group():
    """SQL GROUP BY keeps NULL as a group; pandas groupby drops NaN keys by
    default — both the combinable and raw paths must pass dropna=False."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({"k": pa.array(["a", None, "a", None], pa.string()),
                  "v": pa.array([1.0, 2.0, 3.0, 4.0])})
    out = grouped_aggregate(
        rd.from_arrow(t), "k", {"s": ("v", "sum"), "n": ("v", "count")}
    ).to_pandas()
    assert len(out) == 2
    null_row = out[out["k"].isna()]
    assert float(null_row["s"].iloc[0]) == 6.0 and int(null_row["n"].iloc[0]) == 2
    # non-combinable path (nunique) too
    out2 = grouped_aggregate(
        rd.from_arrow(t), "k", {"m": ("v", "nunique")}).to_pandas()
    assert len(out2) == 2


def test_broadcast_and_filter_joins_null_key_semantics():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from entity_resolution_ray.stages.joins import broadcast_join, key_filter_join

    lt = pa.table({"k": pa.array([1.0, None, 3.0]), "v": pa.array(["a", "b", "c"])})
    left = rd.from_arrow(lt)
    small = pd.DataFrame({"k": [np.nan, 3.0], "w": ["X", "Y"]})

    inner = broadcast_join(left, small, on="k", how="inner").to_pandas()
    assert list(inner["v"]) == ["c"]          # NaN never matches NaN
    lj = broadcast_join(left, small, on="k", how="left").to_pandas()
    assert len(lj) == 3
    assert lj.loc[lj["v"] == "b", "w"].isna().all()

    rt = rd.from_arrow(pa.table({"k": pa.array([None, 3.0]),
                                 "w": pa.array(["X", "Y"])}))
    semi = key_filter_join(left, rt, on="k", how="semi").to_pandas()
    anti = key_filter_join(left, rt, on="k", how="anti").to_pandas()
    assert list(semi["v"]) == ["c"]           # EXISTS: null never matches
    assert sorted(anti["v"]) == ["a", "b"]    # NOT EXISTS keeps null-key row


def test_grouped_mean_skips_null_values():
    """SQL AVG divides by the NON-NULL count; the combinable partial must
    use g[col].count() (not g.size()) as the mean denominator."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({"k": pa.array(["a", "a", "a", "b"], pa.string()),
                  "v": pa.array([1.0, None, 3.0, 5.0])})
    out = grouped_aggregate(
        rd.from_arrow(t), "k", {"m": ("v", "mean")}
    ).to_pandas().set_index("k")
    assert float(out.loc["a", "m"]) == 2.0  # (1+3)/2, not (1+3)/3
    assert float(out.loc["b", "m"]) == 5.0

    # grouping-sets path shares the partial layout — same rule
    from entity_resolution_ray.stages.analytics import grouping_sets_aggregate
    gs = grouping_sets_aggregate(
        rd.from_arrow(t), ["k"], [(["k"], 0)], {"m": ("v", "mean")}
    ).to_pandas().set_index("k")
    assert float(gs.loc["a", "m"]) == 2.0


def test_hll_distinct_keeps_null_key_group():
    import pandas as pd
    import ray.data as rd
    from entity_resolution_ray.stages.sketches import hll_distinct

    df = pd.DataFrame({"g": ["x", None, "x", None, None],
                       "v": [1, 2, 3, 2, 9]})
    out = hll_distinct(rd.from_pandas(df), "g", "v").to_pandas()
    assert len(out) == 2
    null_row = out[out["g"].isna()]
    assert int(null_row["n_approx"].iloc[0]) == 2  # values {2, 9}
