"""Unit tests for the analytic aggregates (stages/analytics.py) and window
operators (stages/windows.py) against brute-force pandas/DuckDB truth."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from entity_resolution_ray.stages.analytics import (
    distinct_count,
    grouped_percentiles,
    pivot_counts,
    topk_per_group,
)
from entity_resolution_ray.stages.windows import (
    interval_neighbor_count,
    sliding_window,
)


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(7)
    n = 5000
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 40, n).astype(np.int64),
            "v": np.round(rng.normal(100, 25, n), 2),
            "cat": rng.choice(["a", "b", "c"], n),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 86_400 * 3, n), unit="s"),
        }
    )


def _sorted(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_topk_per_group(frame):
    out = topk_per_group(
        rd.from_pandas(frame, override_num_blocks=7),
        "k", "v", k=4, descending=True, tie_cols=["id"],
    ).to_pandas()
    truth = duckdb.sql(
        """select id, k, v, cat, ts, rn from (
             select *, row_number() over (partition by k
                        order by v desc, id) as rn from frame) t
           where rn <= 4"""
    ).df()
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(truth), check_dtype=False
    )


def test_grouped_percentiles(frame):
    out = grouped_percentiles(
        rd.from_pandas(frame, override_num_blocks=7),
        "cat", "v", {"p25": 0.25, "p50": 0.5, "p99": 0.99},
    ).to_pandas()
    for _, row in out.iterrows():
        vals = frame.loc[frame["cat"] == row["cat"], "v"].to_numpy()
        assert row["n"] == len(vals)
        for name, q in [("p25", 0.25), ("p50", 0.5), ("p99", 0.99)]:
            assert row[name] == pytest.approx(
                np.quantile(vals, q, method="linear"), abs=1e-4
            )


def test_grouped_percentiles_edge_single_value():
    df = pd.DataFrame({"g": ["x", "x", "y"], "v": [5.0, 5.0, 7.0]})
    out = grouped_percentiles(
        rd.from_pandas(df), "g", "v", {"p50": 0.5}
    ).to_pandas().set_index("g")
    assert out.loc["x", "p50"] == 5.0 and out.loc["y", "p50"] == 7.0


def test_pivot_counts(frame):
    out = pivot_counts(
        rd.from_pandas(frame, override_num_blocks=7),
        "k", "cat", ["a", "b", "c"],
    ).to_pandas()
    truth = frame.pivot_table(
        index="k", columns="cat", values="id", aggfunc="size", fill_value=0
    ).rename(columns=lambda c: f"n_{c}").reset_index()
    truth.columns.name = None
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(truth), check_dtype=False
    )


def test_distinct_count(frame):
    out = distinct_count(
        rd.from_pandas(frame, override_num_blocks=7), "cat", "k", "nk"
    ).to_pandas()
    truth = (
        frame.groupby("cat")["k"].nunique().rename("nk").reset_index()
    )
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(truth), check_dtype=False
    )


def test_sliding_window_matches_bruteforce(frame):
    out = sliding_window(
        rd.from_pandas(frame, override_num_blocks=7),
        "ts", "cat", "v", window_s=4 * 3600, slide_s=3600,
    ).to_pandas()
    rows = []
    for kk in range(4):
        w = frame.copy()
        w["window_start"] = w["ts"].dt.floor("h") - pd.to_timedelta(kk, unit="h")
        rows.append(w)
    truth = (
        pd.concat(rows)
        .groupby(["cat", "window_start"])
        .agg(n_events=("v", "size"), sum_value=("v", "sum"))
        .reset_index()
    )
    truth["sum_value"] = np.round(truth["sum_value"], 4)
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(truth), check_dtype=False
    )


def test_sliding_window_rejects_nondivisible(frame):
    with pytest.raises(ValueError):
        sliding_window(rd.from_pandas(frame), "ts", "cat", "v", 5000, 3600)


def test_interval_neighbor_count(frame):
    out = (
        interval_neighbor_count(
            rd.from_pandas(frame, override_num_blocks=7),
            "k", "ts", "id", radius_s=900,
        )
        .to_pandas()
        .set_index("id")["n_neighbors"]
        .sort_index()
    )
    # brute force
    truth = np.zeros(len(frame), np.int64)
    for _, g in frame.groupby("k"):
        t = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        d = np.abs(t[:, None] - t[None, :]) <= 900 * 1_000_000_000
        truth[g["id"].to_numpy()] = d.sum(1) - 1
    assert len(out) == len(frame)
    assert (out.to_numpy() == truth).all()


def test_interval_neighbor_boundary_inclusive():
    df = pd.DataFrame(
        {
            "id": np.arange(3, dtype=np.int64),
            "k": np.zeros(3, np.int64),
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:05:00",
                 "2024-01-01 00:10:01"]
            ),
        }
    )
    out = (
        interval_neighbor_count(rd.from_pandas(df), "k", "ts", "id", 300)
        .to_pandas().set_index("id")["n_neighbors"].sort_index()
    )
    # 0↔1 exactly 300s apart (inclusive); 1↔2 is 301s (excluded)
    assert out.tolist() == [1, 1, 0]


def test_hll_distinct_accuracy_and_determinism(frame):
    from entity_resolution_ray.stages.sketches import hll_distinct

    big = pd.concat([frame] * 4, ignore_index=True)
    big["val"] = np.arange(len(big)) % 3777  # ~3777 distinct per cat
    ds = rd.from_pandas(big, override_num_blocks=9)
    out1 = hll_distinct(ds, "cat", "val").to_pandas().set_index("cat")
    out2 = hll_distinct(ds, "cat", "val").to_pandas().set_index("cat")
    truth = big.groupby("cat")["val"].nunique()
    for c in truth.index:
        rel = abs(out1.loc[c, "n_approx"] - truth[c]) / truth[c]
        assert rel < 0.05, (c, out1.loc[c, "n_approx"], truth[c])
        assert out1.loc[c, "n_approx"] == out2.loc[c, "n_approx"]


def test_hll_small_range_linear_counting():
    from entity_resolution_ray.stages.sketches import hll_distinct

    df = pd.DataFrame({"g": ["z"] * 1000, "v": np.arange(1000) % 37})
    out = hll_distinct(rd.from_pandas(df), "g", "v").to_pandas()
    # linear-counting regime: tiny cardinalities are near-exact
    assert abs(int(out["n_approx"].iloc[0]) - 37) <= 1


def test_embedding_lsh_neardup_recall_vs_exact():
    from entity_resolution_ray.stages.dedup import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 32))
    rows, vid = [], 0
    for b in base:
        for _ in range(3):  # 3 jittered copies per base -> cosine ~0.97
            v = b + rng.standard_normal(32) * 0.12
            rows.append({"vec_id": vid, "embedding": (v / np.linalg.norm(v)).astype(np.float32).tolist()})
            vid += 1
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df, override_num_blocks=5)
    exact = embedding_neardup_pairs(ds, threshold=0.9).to_pandas()
    approx = embedding_neardup_lsh(ds, threshold=0.9).to_pandas()
    approx2 = embedding_neardup_lsh(ds, threshold=0.9).to_pandas()
    exact_set = set(zip(exact["src"], exact["dst"]))
    approx_set = set(zip(approx["src"], approx["dst"]))
    assert approx_set <= exact_set            # exact verify -> precision 1
    assert len(exact_set) > 100
    recall = len(approx_set & exact_set) / len(exact_set)
    assert recall >= 0.85, recall
    assert approx_set == set(zip(approx2["src"], approx2["dst"]))  # deterministic


def test_grouped_percentiles_unbounded_matches_exact(frame):
    from entity_resolution_ray.stages.analytics import (
        grouped_percentiles_unbounded,
    )

    big = frame.copy()
    big["cont"] = big["v"] * 1.0000001 + np.arange(len(big)) * 1e-9  # ~all distinct
    ds = rd.from_pandas(big, override_num_blocks=7)
    out = grouped_percentiles_unbounded(
        ds, "cat", "cont", {"p10": 0.1, "p50": 0.5, "p95": 0.95},
        bins=64, refine_iters=2, round_to=6,
    ).set_index("cat")
    for c in big["cat"].unique():
        vals = big.loc[big["cat"] == c, "cont"].to_numpy()
        assert out.loc[c, "n"] == len(vals)
        for name, q in [("p10", 0.1), ("p50", 0.5), ("p95", 0.95)]:
            assert out.loc[c, name] == pytest.approx(
                np.quantile(vals, q, method="linear"), abs=1e-5
            )


def test_grouped_percentiles_unbounded_ties_and_constant():
    from entity_resolution_ray.stages.analytics import (
        grouped_percentiles_unbounded,
    )

    df = pd.DataFrame(
        {
            "g": ["x"] * 1000 + ["y"] * 500,
            "v": np.concatenate(
                [np.repeat([1.0, 2.0, 3.0], [400, 300, 300]),  # heavy ties
                 np.full(500, 7.5)]                            # constant key
            ),
        }
    )
    out = grouped_percentiles_unbounded(
        rd.from_pandas(df, override_num_blocks=4), "g", "v",
        {"p50": 0.5, "p90": 0.9}, bins=16, refine_iters=2,
    ).set_index("g")
    for g in ("x", "y"):
        vals = df.loc[df["g"] == g, "v"].to_numpy()
        for name, q in [("p50", 0.5), ("p90", 0.9)]:
            assert out.loc[g, name] == pytest.approx(
                np.quantile(vals, q, method="linear"), abs=1e-4
            ), (g, name)


def test_key_filter_join_semi_anti(frame):
    from entity_resolution_ray.stages.joins import key_filter_join

    left = rd.from_pandas(frame, override_num_blocks=5)
    right = rd.from_pandas(
        pd.DataFrame({"k": np.array([0, 1, 2, 3, 4, 5, 6, 7], np.int64)}),
        override_num_blocks=2,
    )
    semi = key_filter_join(left, right, on="k", how="semi").to_pandas()
    anti = key_filter_join(left, right, on="k", how="anti").to_pandas()
    in_right = frame["k"] < 8
    assert len(semi) == int(in_right.sum())
    assert len(anti) == int((~in_right).sum())
    assert set(semi["k"]) <= set(range(8))
    assert set(anti["k"]).isdisjoint(set(range(8)))
    assert sorted(semi.columns) == sorted(frame.columns)
    with pytest.raises(ValueError):
        key_filter_join(left, right, on="k", how="outer")


def test_interval_neighbor_count_string_keys(frame):
    from entity_resolution_ray.stages.windows import interval_neighbor_count

    out = (
        interval_neighbor_count(
            rd.from_pandas(frame, override_num_blocks=5),
            "cat", "ts", "id", radius_s=600,
        ).to_pandas().set_index("id")["n_neighbors"].sort_index()
    )
    truth = np.zeros(len(frame), np.int64)
    for _, g in frame.groupby("cat"):
        t = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        d = np.abs(t[:, None] - t[None, :]) <= 600 * 1_000_000_000
        truth[g["id"].to_numpy()] = d.sum(1) - 1
    assert (out.to_numpy() == truth).all()


def test_key_filter_join_null_keys_sql_semantics():
    from entity_resolution_ray.stages.joins import key_filter_join

    left = pd.DataFrame(
        {"k": pd.array([1, 2, None, 4], dtype="float64"),
         "payload": ["a", "b", "c", "d"]}
    )
    right = pd.DataFrame({"k": pd.array([1.0, None], dtype="float64")})
    semi = key_filter_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", how="semi"
    ).to_pandas()
    anti = key_filter_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", how="anti"
    ).to_pandas()
    # SQL EXISTS: NULL never matches — the null-keyed left row is NOT in
    # semi, and IS in anti (NOT EXISTS over a null comparand is true)
    assert sorted(semi["payload"]) == ["a"]
    assert sorted(anti["payload"]) == ["b", "c", "d"]


def test_round_half_away_tie():
    from entity_resolution_ray.stages.analytics import _round_half_away

    assert _round_half_away(49438.36125, 4) == 49438.3613
    assert _round_half_away(-49438.36125, 4) == -49438.3613
    assert _round_half_away(1.23455, 4) == 1.2346


def test_partitioned_window_vs_duckdb(frame):
    from entity_resolution_ray.stages.windows import partitioned_window

    out = partitioned_window(
        rd.from_pandas(frame, override_num_blocks=7),
        "k",
        [("v", False)],
        {
            "rn": ("row_number",),
            "rnk": ("rank",),
            "drnk": ("dense_rank",),
            "prev_v": ("lag", "v", 1),
            "next_v": ("lead", "v", 1),
            "run_sum": ("cumsum", "v"),
            "run_max": ("cummax", "v"),
        },
        tie_cols=["id"],
        num_buckets=5,
    ).to_pandas()
    truth = duckdb.sql(
        """select *,
             row_number() over w as rn,
             rank() over (partition by k order by v desc) as rnk,
             dense_rank() over (partition by k order by v desc) as drnk,
             lag(v, 1) over w as prev_v,
             lead(v, 1) over w as next_v,
             sum(v) over w as run_sum,
             max(v) over w as run_max
           from frame
           window w as (partition by k order by v desc, id)"""
    ).df()
    a, b = _sorted(out), _sorted(truth)
    for c in ("run_sum",):
        a[c], b[c] = np.round(a[c], 6), np.round(b[c], 6)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_partitioned_window_rank_ties_exact():
    from entity_resolution_ray.stages.windows import partitioned_window

    df = pd.DataFrame(
        {"k": ["x"] * 6, "v": [5, 5, 3, 3, 3, 1],
         "id": np.arange(6, dtype=np.int64)}
    )
    out = (
        partitioned_window(
            rd.from_pandas(df), "k", [("v", False)],
            {"rnk": ("rank",), "drnk": ("dense_rank",),
             "rn": ("row_number",)},
            tie_cols=["id"], num_buckets=3,
        )
        .to_pandas().sort_values("id")
    )
    assert out["rnk"].tolist() == [1, 1, 3, 3, 3, 6]
    assert out["drnk"].tolist() == [1, 1, 2, 2, 2, 3]
    assert out["rn"].tolist() == [1, 2, 3, 4, 5, 6]


def test_rollup_aggregate_vs_duckdb(frame):
    from entity_resolution_ray.stages.analytics import rollup_aggregate

    out = rollup_aggregate(
        rd.from_pandas(frame, override_num_blocks=7),
        ["cat", "k"],
        {"sum_v": ("v", "sum"), "mean_v": ("v", "mean"),
         "min_v": ("v", "min"), "max_v": ("v", "max"),
         "cnt": ("v", "size")},
        num_buckets=5,
    ).to_pandas()
    truth = duckdb.sql(
        """select cat, k,
             cast(grouping(cat) + grouping(k) as bigint) as lvl,
             sum(v) as sum_v, avg(v) as mean_v,
             min(v) as min_v, max(v) as max_v, count(*) as cnt
           from frame group by rollup(cat, k)"""
    ).df()
    a, b = _sorted(out), _sorted(truth)
    for c in ("sum_v", "mean_v"):
        a[c], b[c] = np.round(a[c], 6), np.round(b[c], 6)
    # canonize nulls (None vs NaN) and rolled-up int keys (None vs NaN float)
    for c in ("cat", "k"):
        a[c] = a[c].astype("string")
        b[c] = b[c].astype("string")
    pd.testing.assert_frame_equal(
        a.sort_values(list(a.columns)).reset_index(drop=True),
        b.sort_values(list(b.columns)).reset_index(drop=True),
        check_dtype=False,
    )


def test_rollup_null_data_keys_stay_distinct():
    """A genuinely-null data key must not be conflated with subtotal rows:
    lvl keeps them apart, exactly like SQL GROUPING()."""
    from entity_resolution_ray.stages.analytics import rollup_aggregate

    df = pd.DataFrame({"g": ["a", "a", None, None], "v": [1.0, 2.0, 4.0, 8.0]})
    out = rollup_aggregate(
        rd.from_pandas(df), ["g"], {"s": ("v", "sum")}, num_buckets=3
    ).to_pandas()
    null_finest = out[(out["lvl"] == 0) & (out["g"].isna())]
    total = out[out["lvl"] == 1]
    assert len(out) == 3
    assert null_finest["s"].iloc[0] == 12.0
    assert total["s"].iloc[0] == 15.0 and total["g"].isna().all()


def test_partitioned_window_distribution_fns(frame):
    from entity_resolution_ray.stages.windows import partitioned_window

    out = partitioned_window(
        rd.from_pandas(frame, override_num_blocks=7),
        "k", [("cat", True)],
        {"tile": ("ntile", 3), "prank": ("percent_rank",),
         "cdist": ("cume_dist",)},
        tie_cols=["id"], num_buckets=5,
    ).to_pandas()
    truth = duckdb.sql(
        """select *,
             ntile(3) over (partition by k order by cat, id) as tile,
             percent_rank() over w as prank,
             cume_dist() over w as cdist
           from frame
           window w as (partition by k order by cat)"""
    ).df()
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(truth), check_dtype=False
    )


def test_cube_aggregate_vs_duckdb(frame):
    from entity_resolution_ray.stages.analytics import cube_aggregate

    out = cube_aggregate(
        rd.from_pandas(frame, override_num_blocks=7),
        ["cat", "k"],
        {"cnt": ("v", "size"), "sum_v": ("v", "sum")},
        num_buckets=5,
    ).to_pandas()
    truth = duckdb.sql(
        """select cat, k,
             cast(grouping(cat)*2 + grouping(k) as bigint) as grp,
             count(*) as cnt, sum(v) as sum_v
           from frame group by cube(cat, k)"""
    ).df()
    a, b = _sorted(out), _sorted(truth)
    a["sum_v"], b["sum_v"] = np.round(a["sum_v"], 6), np.round(b["sum_v"], 6)
    for c in ("cat", "k"):
        a[c], b[c] = a[c].astype("string"), b[c].astype("string")
    pd.testing.assert_frame_equal(
        a.sort_values(list(a.columns)).reset_index(drop=True),
        b.sort_values(list(b.columns)).reset_index(drop=True),
        check_dtype=False,
    )


def test_grouping_sets_subset_validation(frame):
    from entity_resolution_ray.stages.analytics import grouping_sets_aggregate

    with pytest.raises(ValueError):
        grouping_sets_aggregate(
            rd.from_pandas(frame), ["cat"], [(("nope",), 0)],
            {"cnt": ("v", "size")},
        )


def test_unpivot_vs_duckdb(frame):
    from entity_resolution_ray.stages.analytics import unpivot

    wide = frame.assign(v2=frame["v"] * 2)
    out = unpivot(
        rd.from_pandas(wide, override_num_blocks=7),
        id_cols=["id"], value_cols=["v", "v2"],
    ).to_pandas()
    truth = duckdb.sql(
        """select id, name, value
           from (unpivot (select id, v, v2 from wide) on v, v2
                 into name name value value)"""
    ).df()
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(truth), check_dtype=False
    )


def test_dd_quantiles_relative_error(frame):
    from entity_resolution_ray.stages.sketches import dd_quantiles

    big = pd.concat([frame] * 4, ignore_index=True)
    big["v"] = np.abs(big["v"]) + 0.5  # positive, spread over ~2 decades
    out = dd_quantiles(
        rd.from_pandas(big, override_num_blocks=9),
        "v", {"p50": 0.5, "p90": 0.9, "p99": 0.99},
        keys="cat", alpha=0.01,
    ).to_pandas().set_index("cat")
    for cat, g in big.groupby("cat"):
        for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            true = np.quantile(g["v"], q)
            est = out.loc[cat, name]
            assert abs(est / true - 1) <= 0.011, (cat, name, est, true)
    assert (out["n"].sort_index().to_numpy()
            == big.groupby("cat").size().sort_index().to_numpy()).all()


def test_dd_quantiles_global_signed():
    from entity_resolution_ray.stages.sketches import dd_quantiles

    rng = np.random.default_rng(11)
    v = np.concatenate([rng.normal(-50, 10, 4000), [0.0] * 100,
                        rng.normal(200, 40, 6000)])
    df = pd.DataFrame({"v": v})
    out = dd_quantiles(
        rd.from_pandas(df, override_num_blocks=6),
        "v", {"p10": 0.1, "p50": 0.5, "p95": 0.95}, alpha=0.01,
    ).to_pandas()
    assert len(out) == 1 and out["n"].iloc[0] == len(v)
    for name, q in (("p10", 0.1), ("p50", 0.5), ("p95", 0.95)):
        true = np.quantile(v, q)
        est = out[name].iloc[0]
        assert abs(est - true) <= max(abs(true) * 0.015, 1.0), (name, est, true)


def test_heavy_hitters_bounds():
    from entity_resolution_ray.stages.sketches import heavy_hitters

    rng = np.random.default_rng(3)
    # zipf-ish: a few very hot values over a long tail
    vals = np.concatenate([
        np.repeat([f"hot{i}" for i in range(5)], [4000, 3000, 2000, 1500, 1000]),
        rng.choice([f"cold{i}" for i in range(2000)], 8000),
    ])
    rng.shuffle(vals)
    df = pd.DataFrame({"token": vals})
    out = heavy_hitters(
        rd.from_pandas(df, override_num_blocks=8), "token", k=32
    ).to_pandas()
    true = df["token"].value_counts()
    reported = set(out["token"])
    for i in range(5):
        assert f"hot{i}" in reported
    m = out.set_index("token")
    for i in range(5):
        t = int(true[f"hot{i}"])
        assert m.loc[f"hot{i}", "count_min"] <= t <= m.loc[f"hot{i}", "count_max"]


def test_auto_bnl_buckets_sizing():
    from entity_resolution_ray.stages.dedup import auto_bnl_buckets

    assert auto_bnl_buckets(0, 64) == 1
    assert auto_bnl_buckets(1, 64) == 1
    # 10k x 64-dim: 2*1e8*64 / 2e9 = 6.4 -> ceil(sqrt)=3
    assert auto_bnl_buckets(10_000, 64) == 3
    # growth is ~linear in n (sqrt of n^2); cap at 64
    assert auto_bnl_buckets(100_000, 64) == 26
    assert auto_bnl_buckets(10_000_000, 64) == 64
    # replication never exceeds the cap
    assert auto_bnl_buckets(10**9, 1024) == 64


def test_jaccard_verify_vectorized_parity(frame):
    """The lexsort-based grouped intersect must match per-pair jaccard."""
    import ray.data as rd
    from entity_resolution_ray.stages.dedup import jaccard_neardup_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again!",
        "a completely different document about database systems",
        "a completely different document about database engines",
        "",
    ]
    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(texts))],
                       "text": texts})
    out = jaccard_neardup_pairs(
        rd.from_pandas(df), threshold=0.3, num_perm=64, num_bands=64
    ).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)

    # brute-force oracle
    from entity_resolution_ray.functions.minhash import shingle_set
    sets = {r.doc_id: set(shingle_set(r.text, 3)) for r in df.itertuples()}
    expect = []
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= 0.3:
                expect.append((ids[i], ids[j], round(jac, 6)))
    got = list(out.itertuples(index=False, name=None))
    assert got == sorted(expect)
