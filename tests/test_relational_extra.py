"""Round-3 relational additions: multi-way join, blocked fuzzy string join,
set ops, regex extraction, decorrelated subquery — each checked side-by-side
against its DuckDB oracle at sf0.001 (the driver's compare, in miniature),
plus property tests for the batched Levenshtein kernel."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_ray.functions.text import levenshtein_batch
from entity_resolution_ray.pipelines import relational as R
import __ray_entry__ as E

TABLES = ["part", "orders", "customer", "supplier", "nation", "region",
          "lineitem", "events", "documents", "embeddings"]


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


@pytest.mark.parametrize("fn,sql", [
    (R.q_region_revenue, R.Q_REGION_REVENUE_SQL),
    (R.q_fuzzy_part_pairs, R.Q_FUZZY_PART_PAIRS_SQL),
    (R.q_brand_set_ops, R.Q_BRAND_SET_OPS_SQL),
    (R.q_props_extract, R.Q_PROPS_EXTRACT_SQL),
    (R.q_orders_below_max, R.Q_ORDERS_BELOW_MAX_SQL),
    (R.q_type_brand_list, R.Q_TYPE_BRAND_LIST_SQL),
    (R.q_priority_share, R.Q_PRIORITY_SHARE_SQL),
    (R.q_orders_events_daily, R.Q_ORDERS_EVENTS_DAILY_SQL),
    (R.q_price_corr, R.Q_PRICE_CORR_SQL),
    (R.q_top_customer_orders, R.Q_TOP_CUSTOMER_ORDERS_SQL),
    (R.q_doc_sample_stats, R.Q_DOC_SAMPLE_STATS_SQL),
    (R.q_signup_conversion, R.Q_SIGNUP_CONVERSION_SQL),
    (R.q_customer_upsert, R.Q_CUSTOMER_UPSERT_SQL),
    (R.q_label_centroids, R.Q_LABEL_CENTROIDS_SQL),
    (R.q_stratified_docs, R.Q_STRATIFIED_DOCS_SQL),
    (R.q_winnow_fingerprints, R.Q_WINNOW_FINGERPRINTS_SQL),
    (R.q_winnow_neardup, R.Q_WINNOW_NEARDUP_SQL),
    (R.q_phonetic_codes, R.Q_PHONETIC_CODES_SQL),
    (R.q_doc_repetition, R.Q_DOC_REPETITION_SQL),
    (R.q_decontaminate, R.Q_DECONTAMINATE_SQL),
    (R.q_jw_part_pairs, R.Q_JW_PART_PAIRS_SQL),
    (R.q_minhash_dedup_canon, R.Q_MINHASH_DEDUP_CANON_SQL),
    (R.q_doc_unigram_nll, R.Q_DOC_UNIGRAM_NLL_SQL),
    (R.q_priority_sample, R.Q_PRIORITY_SAMPLE_SQL),
    (R.q_events_range_join, R.Q_EVENTS_RANGE_JOIN_SQL),
    (R.q_part_pagerank, R.Q_PART_PAGERANK_SQL),
    (R.q_part_triangles, R.Q_PART_TRIANGLES_SQL),
    (R.q_weighted_price_percentiles, R.Q_WEIGHTED_PRICE_PERCENTILES_SQL),
    (R.q_winnow_containment, R.Q_WINNOW_CONTAINMENT_SQL),
    (R.q_user_growth, R.Q_USER_GROWTH_SQL),
    (R.q_segment_profile, R.Q_SEGMENT_PROFILE_SQL),
    (R.q_price_zscores, R.Q_PRICE_ZSCORES_SQL),
    (E._er_scored_pairs_canon, E.ER_SCORED_PAIRS_CANON_SQL),
    (R.q_brand_price_regression, R.Q_BRAND_PRICE_REGRESSION_SQL),
    (R.q_event_transitions, R.Q_EVENT_TRANSITIONS_SQL),
    (R.q_orders_digest, R.Q_ORDERS_DIGEST_SQL),
    (R.q_orders_diff, R.Q_ORDERS_DIFF_SQL),
    (R.q_doc_tfidf_cosine_canon, R.Q_DOC_TFIDF_COSINE_CANON_SQL),
    (R.q_vocab_growth, R.Q_VOCAB_GROWTH_SQL),
], ids=["region_revenue", "fuzzy_part_pairs", "brand_set_ops",
        "props_extract", "orders_below_max", "type_brand_list",
        "priority_share", "orders_events_daily", "price_corr",
        "top_customer_orders", "doc_sample_stats", "signup_conversion",
        "customer_upsert", "label_centroids", "stratified_docs",
        "winnow_fingerprints", "winnow_neardup", "phonetic_codes",
        "doc_repetition", "decontaminate", "jw_part_pairs",
        "minhash_dedup_canon", "doc_unigram_nll", "priority_sample", "events_range_join", "part_pagerank", "part_triangles", "weighted_price_percentiles", "winnow_containment", "user_growth", "segment_profile", "price_zscores", "er_scored_pairs_canon", "brand_price_regression", "event_transitions", "orders_digest", "orders_diff", "doc_tfidf_cosine_canon", "vocab_growth"])
def test_query_matches_oracle(sf_dir, fn, sql):
    mine = fn(sf_dir)
    mine = mine.to_pandas() if hasattr(mine, "to_pandas") else mine
    oracle = _oracle(sf_dir, sql)
    assert sorted(mine.columns) == sorted(oracle.columns)
    assert len(mine) == len(oracle)
    a, b = _canon(mine), _canon(oracle)
    for c in a.columns:
        ok = a[c].eq(b[c]) | (a[c].isna() & b[c].isna())
        assert ok.all(), f"col {c}: {a[c][~ok].head()} vs {b[c][~ok].head()}"


# --- levenshtein kernel ------------------------------------------------------

name_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=24
)


def _scalar_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(name_st, name_st), min_size=1, max_size=32))
def test_lev_batch_matches_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    out = levenshtein_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert out[i] == _scalar_lev(x, y)


@settings(max_examples=100, deadline=None)
@given(name_st, name_st)
def test_lev_axioms(x, y):
    d = int(levenshtein_batch([x], [y])[0])
    assert d == int(levenshtein_batch([y], [x])[0])       # symmetric
    assert d >= abs(len(x) - len(y))                       # length bound
    assert d <= max(len(x), len(y))
    if x == y:
        assert d == 0


def test_lev_matches_duckdb_vocab():
    vocab = ["cold widget", "small widget", "large bolt", "blue rod",
             "kitten", "sitting", "", "a", "ab", "ba"]
    import itertools
    pairs = list(itertools.product(vocab, repeat=2))
    mine = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    con = duckdb.connect()
    for (x, y), m in zip(pairs, mine):
        assert m == con.execute(
            "select levenshtein(?, ?)", [x, y]).fetchone()[0]


def test_winnow_guarantee_and_edges():
    """Winnowing's detection guarantee: two documents sharing any run of
    shingle + window - 1 words share at least one fingerprint.  Short and
    empty docs degrade cleanly."""
    from entity_resolution_ray.stages.textstats import WinnowFingerprints

    w = WinnowFingerprints(shingle=3, window=4)
    shared = "quick brown foxes jump over lazy"  # 6 = 3 + 4 - 1 words
    a = w._doc_fingerprints(f"alpha bravo {shared} charlie delta")
    b = w._doc_fingerprints(f"echo {shared} foxtrot golf hotel india")
    assert len(np.intersect1d(a, b)) >= 1

    assert len(w._doc_fingerprints("")) == 0
    assert len(w._doc_fingerprints("one two")) == 0  # below shingle size
    # 3 tokens -> 1 gram -> single short-window fingerprint
    assert len(w._doc_fingerprints("one two three")) == 1
    # dissimilar docs don't collide
    c = w._doc_fingerprints("completely different words entirely here now")
    assert len(np.intersect1d(a, c)) == 0


def test_passage_exact_dedup(ray_session):
    """Hand-checkable passage dedup: k=2 chunks, a chunk repeated across and
    within docs survives only at its globally-first (doc_id, chunk_no);
    clean_md5 re-joins exactly the kept chunks; empty docs vanish."""
    import hashlib

    import ray

    from entity_resolution_ray.stages.dedup import passage_exact_dedup

    docs = [
        {"doc_id": 1, "text": "aa bb cc dd"},        # chunks: "aa bb", "cc dd"
        {"doc_id": 2, "text": "cc dd ee ff aa bb"},  # "cc dd" dup, "ee ff" new, "aa bb" dup
        {"doc_id": 3, "text": "ee ff ee ff gg"},     # "ee ff" dup, "ee ff" dup, "gg" new
        {"doc_id": 4, "text": ""},                   # no tokens -> absent
    ]
    out = passage_exact_dedup(
        ray.data.from_items(docs).repartition(2), k=2, num_buckets=2
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_chunks"].tolist() == [2, 3, 3]
    assert out["n_kept"].tolist() == [2, 1, 1]
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out["clean_md5"].tolist() == [
        md5("aa bb cc dd"), md5("ee ff"), md5("gg")]

    # all-duplicate doc: kept-nothing => md5 of empty string
    dup_only = passage_exact_dedup(
        ray.data.from_items([{"doc_id": 1, "text": "xx yy"},
                             {"doc_id": 2, "text": "xx yy"}]), k=2,
    ).to_pandas().sort_values("doc_id")
    assert dup_only["n_kept"].tolist() == [1, 0]
    assert dup_only["clean_md5"].tolist() == [md5("xx yy"), md5("")]


# --- k-core: distributed peel vs brute-force reference -----------------------

def test_kcore_matches_bruteforce_peel(sf_dir):
    mine = R.q_part_kcore(sf_dir).to_pandas()

    # brute-force peel on the same co-occurrence graph
    con = duckdb.connect()
    con.execute(
        f"create view lineitem as select * from '{sf_dir}/lineitem.parquet'")
    edges = con.execute("""
        with items as (select distinct l_orderkey, l_partkey from lineitem)
        select distinct a.l_partkey as src, b.l_partkey as dst
        from items a join items b
          on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey
    """).df()
    adj: dict[int, set] = {}
    for s, d in zip(edges["src"], edges["dst"]):
        adj.setdefault(int(s), set()).add(int(d))
        adj.setdefault(int(d), set()).add(int(s))
    changed = True
    while changed:
        low = [n for n, nb in adj.items() if len(nb) < R.KCORE_K]
        changed = bool(low)
        for n in low:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    want = pd.DataFrame(
        sorted((n, len(nb)) for n, nb in adj.items()),
        columns=["node", "core_deg"])
    got = mine.sort_values("node").reset_index(drop=True)
    want = want.astype({"node": got["node"].dtype if len(got) else "int64",
                        "core_deg": "int64"})
    assert len(got) == len(want)
    if len(got):
        assert got["node"].tolist() == want["node"].tolist()
        assert got["core_deg"].tolist() == want["core_deg"].tolist()


# --- HLL set-op estimates vs exact counts ------------------------------------

def test_hll_set_ops_error_bounds(sf_dir):
    est = R.q_approx_user_overlap(sf_dir).iloc[0]
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{sf_dir}/events.parquet'")
    exact = con.execute("""
        with a as (select distinct user_id from events where event_type='purchase'),
             b as (select distinct user_id from events where event_type='error')
        select (select count(*) from a) na,
               (select count(*) from b) nb,
               (select count(*) from (select * from a union select * from b)) nu,
               (select count(*) from (select * from a intersect select * from b)) ni
    """).df().iloc[0]
    # ±1.6% standard error at p=12 -> 5σ bound on each cardinality; the
    # intersection inherits all three absolute errors
    for col, key in (("n_a", "na"), ("n_b", "nb"), ("n_union", "nu")):
        assert abs(est[col] - exact[key]) <= max(0.08 * exact[key], 10), (
            col, est[col], exact[key])
    assert abs(est["n_intersect"] - exact["ni"]) <= max(
        0.08 * exact["nu"], 20)


def test_read_mentions_csv_contract(tmp_path):
    """4-column combiner-input contract (reference common.py:59-92):
    missing required column raises; null/empty content drops; duplicate
    (blocking_field, unique_id) keeps one deterministic row."""
    import pandas as pd
    import pytest

    from entity_resolution_ray.stages.normalize import read_mentions_csv

    bad = tmp_path / "bad.csv"
    pd.DataFrame({"blocking_field": ["a"], "content": ["x"],
                  "unique_id": ["u1"]}).to_csv(bad, index=False)
    with pytest.raises(ValueError, match="ground_truth"):
        read_mentions_csv(str(bad))
    # ignore_missing_cols skips the check (reference CSVDataProvider path)
    assert read_mentions_csv(str(bad), ignore_missing_cols=True).count() == 1

    good = tmp_path / "good.csv"
    pd.DataFrame({
        "blocking_field": ["a", "a", "a", "b", "b"],
        "content": ["keep", "zzdup keep", None, "", "solo"],
        "unique_id": ["u1", "u1", "u2", "u3", "u4"],
        "ground_truth": [0, 0, 1, 2, 3],
    }).to_csv(good, index=False)
    got = read_mentions_csv(str(good)).to_pandas() \
        .sort_values("unique_id").reset_index(drop=True)
    assert list(got["unique_id"]) == ["u1", "u4"]
    assert list(got["content"]) == ["keep", "solo"]
    assert list(got.columns) == ["blocking_field", "content", "unique_id",
                                 "ground_truth"]


def test_r5_oracles_parity_sf0001():
    """Round-5 oracled queries (VERDICT r4 task 9): the order-dependent
    incremental-combiner fold vs its recursive-CTE oracle, and LSH-ANN
    recall pinned against the exact top-k recomputed in SQL."""
    sf = "/root/testdata/sf0.001"
    for name in ("er_combiner_incremental_canon", "ann_lsh_recall",
                 "ann_ivf_recall", "embedding_lsh_recall",
                 "ddsketch_price_audit", "heavy_hitters_audit",
                 "er_clusters_split_canon", "er_cluster_sizes_canon",
                 "approx_price_quantiles", "er_clusters_canon",
                 "er_combiner_model_canon"):
        mine = E.queries()[name](sf)
        if hasattr(mine, "to_pandas"):
            mine = mine.to_pandas()
        oracle = _oracle(sf, E.oracle_sql()[name])
        assert sorted(mine.columns) == sorted(oracle.columns), name
        assert len(mine) == len(oracle), name
        pd.testing.assert_frame_equal(_canon(mine), _canon(oracle),
                                      check_dtype=False, obj=name)


def test_hll_sql_oracles_bit_exact_sf0001():
    """The WHOLE HyperLogLog sketch restated in SQL must be bit-exact:
    md5_number_lower value hash, exact-clz rho, HUGEINT register sum,
    same-literal-order float estimate (one division; ln on the
    linear-counting branch).  An estimate drift of ±1 breaks these."""
    sf = "/root/testdata/sf0.001"
    for name in ("approx_distinct_parts", "approx_user_overlap"):
        mine = E.queries()[name](sf)
        if hasattr(mine, "to_pandas"):
            mine = mine.to_pandas()
        oracle = _oracle(sf, E.oracle_sql()[name])
        assert sorted(mine.columns) == sorted(oracle.columns), name
        assert len(mine) == len(oracle), name
        pd.testing.assert_frame_equal(_canon(mine), _canon(oracle),
                                      check_dtype=False, obj=name)


def test_kcore_sql_oracle_multi_round_peel():
    """The unrolled-CTE k-core oracle must track a TRUE multi-round peel —
    the testdata's co-order graph is near-regular and converges in zero
    rounds, so this synthetic skewed graph (5-clique + pendant chain +
    attached triangle, k=3 peels the chain in waves) drives both the
    engine and the same SQL generator (`relational._kcore_sql`) through
    real peel iterations."""
    import duckdb
    import ray.data as rd

    from entity_resolution_ray.stages.clustering import k_core

    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(0, 5), (5, 6), (6, 7), (7, 8), (1, 9), (9, 10), (10, 11),
              (9, 11)]
    edf = pd.DataFrame(edges, columns=["src", "dst"])
    mine = k_core(rd.from_pandas(edf), k=3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    con = duckdb.connect()
    con.register("edge_t", edf)
    sql = R._kcore_sql(k=3, rounds=6,
                       edges_ctes="edges as (select src, dst from edge_t)")
    ref = con.sql(sql).df().sort_values("node").reset_index(drop=True)
    # the chain 5-8 and the pendant triangle peel away over several rounds;
    # only the 5-clique survives at k=3
    assert sorted(mine["node"]) == [0, 1, 2, 3, 4]
    pd.testing.assert_frame_equal(mine, ref.astype(mine.dtypes.to_dict()),
                                  obj="kcore_sql")


def test_kcore_sql_oracle_parity_sf0001():
    sf = "/root/testdata/sf0.001"
    mine = E.queries()["part_kcore"](sf)
    if hasattr(mine, "to_pandas"):
        mine = mine.to_pandas()
    oracle = _oracle(sf, E.oracle_sql()["part_kcore"])
    assert len(mine) == len(oracle)
    pd.testing.assert_frame_equal(_canon(mine), _canon(oracle),
                                  check_dtype=False, obj="part_kcore")


def test_hll_hash_series_canonical_rendering():
    """The HLL value hash must match DuckDB md5_number_lower(v::varchar)
    even when pandas promotes a nullable int column to float64 (str(2.0)
    = '2.0' but SQL renders '2'); nulls hash to 0."""
    import duckdb

    from entity_resolution_ray.stages.sketches import _hash_series

    con = duckdb.connect()
    s = pd.Series([1, None, 2, 2])  # nullable int -> float64 dtype
    ref = [r[0] or 0 for r in con.sql(
        "select md5_number_lower(v::varchar)"
        " from (values ('1'),(NULL),('2'),('2')) t(v)").fetchall()]
    assert [int(x) for x in _hash_series(s)] == [int(r) for r in ref]
    s2 = pd.Series(["x", "y", None])
    ref2 = [r[0] or 0 for r in con.sql(
        "select md5_number_lower(v)"
        " from (values ('x'),('y'),(NULL)) t(v)").fetchall()]
    assert [int(x) for x in _hash_series(s2)] == [int(r) for r in ref2]


def test_hll_estimate_sql_parity_synthetic_registers():
    """Branch coverage the testdata can't give (both sf tables sit in the
    linear-counting regime): bias-corrected branch, full-register vector,
    and the LC branch all match the SQL estimate expression exactly."""
    import duckdb
    import numpy as np

    from entity_resolution_ray.stages.sketches import _estimate

    con = duckdb.connect()
    rng = np.random.default_rng(0)
    cases = [
        rng.integers(0, 20, 4096).astype(np.uint8),      # bias-corrected
        rng.integers(1, 53, 4096).astype(np.uint8),      # no zero registers
    ]
    lc = np.zeros(4096, np.uint8)
    lc[:40] = 3
    cases.append(lc)                                     # linear counting
    for regs in cases:
        con.register("regs_t", pd.DataFrame({"reg": regs.astype(int)}))
        got = con.sql("""
with agg as (select sum((1::HUGEINT << (64 - reg)))::HUGEINT as ssum,
                    count(*) filter (reg = 0) as zeros from regs_t)
select floor(case when raw <= 2.5*4096 and zeros > 0
                  then 4096 * ln(4096.0 / zeros) else raw end + 0.5)::BIGINT
from (select 0.7213 / (1 + 1.079 / 4096) * 4096 * 4096
               * 18446744073709551616.0 / ssum::DOUBLE as raw, zeros
      from agg)
""").fetchone()[0]
        assert got == _estimate(regs)
