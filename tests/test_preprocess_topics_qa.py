"""Input preprocessing ops, QA report rollup + improvements, topic tier,
profession/graph-data visitors."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_url_normalize_and_dedup(ray_session):
    from entity_resolution_ray.stages.normalize import (
        dedup_keep_min,
        normalize_url_column,
    )

    docs = pd.DataFrame(
        {
            "doc_id": ["https://x.com/a", "http://x.com/a", "http://y.com/b"],
            "ord": [2, 1, 3],
        }
    )
    out = normalize_url_column(rd.from_pandas(docs)).to_pandas()
    assert sorted(out["doc_id"]) == ["http://x.com/a", "http://x.com/a", "http://y.com/b"]
    deduped = dedup_keep_min(
        normalize_url_column(rd.from_pandas(docs)), "doc_id", "ord"
    ).to_pandas()
    assert len(deduped) == 2
    assert deduped.set_index("doc_id").loc["http://x.com/a", "ord"] == 1


def test_name_filter_and_max_names(ray_session):
    from entity_resolution_ray.stages.normalize import (
        filter_name_in_content,
        max_names_filter,
    )

    docs = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c", "d"],
            "entity_name": ["Ann Lee", "Bob Ray", "Cal Poe", "Ann Lee"],
            "content": ["Ann Lee spoke", "nothing here", "Cal Poe ran", "Ann Lee again"],
        }
    )
    kept = filter_name_in_content(rd.from_pandas(docs)).to_pandas()
    assert sorted(kept["doc_id"]) == ["a", "c", "d"]
    top = max_names_filter(rd.from_pandas(docs), 2).to_pandas()
    # sorted name order: Ann Lee, Bob Ray → docs a, b, d
    assert sorted(top["doc_id"]) == ["a", "b", "d"]


def test_quality_report_and_improvements():
    from entity_resolution_ray.qa.metrics import (
        calculate_improvements,
        quality_report,
    )

    df = pd.DataFrame(
        {
            "oc_rate": [0.2, 0.4, np.nan],
            "uc_rate": [0.1, 0.3, 0.2],
            "n_mentions": [10, 30, 20],
            "name": ["a", "b", "c"],
        }
    )
    rep = quality_report(df)
    assert rep["oc_rate"] == 0.3  # nan-aware mean of 0.2, 0.4
    assert rep["uc_rate"] == 0.2
    rep_w = quality_report(df, weights_column="n_mentions")
    # weighted uc: (0.1*10 + 0.3*30 + 0.2*20)/60 = 0.2333 → 0.23
    assert rep_w["uc_rate"] == 0.23
    assert "n_mentions" not in rep_w

    frame = pd.DataFrame(
        {"score": [2.0, 1.0], "zero": [0.0, 0.0]},
        index=["base", "better"],
    )
    imps = calculate_improvements(["base"], frame, ["base", "better"])
    by = {(r["reference"], r["combiner"]): r for r in imps}
    assert by[("base", "better")]["score"] == 0.5
    assert math.isnan(by[("base", "better")]["zero"])


def test_topic_tier(ray_session):
    from entity_resolution_ray.stages.topics import (
        fit_topics,
        topic_distributions,
        topic_tfidf_concat,
    )

    rng = np.random.default_rng(3)
    vocab_a = ["nuclear", "reactor", "energy", "uranium", "plant"]
    vocab_b = ["football", "goal", "match", "league", "striker"]
    rows = []
    for i in range(120):
        v = vocab_a if i % 2 == 0 else vocab_b
        words = [v[int(x)] for x in rng.integers(0, len(v), 30)]
        rows.append({"doc_id": f"d{i}", "content": " ".join(words)})
    ds = rd.from_pandas(pd.DataFrame(rows))
    H = fit_topics(ds, n_topics=4, sample=120, iters=60)
    assert H.shape[0] == 4 and np.isfinite(H).all()
    out = topic_distributions(ds, H).to_pandas()
    assert len(out) == 120
    # the two vocabularies land on disjoint topic sets (n_topics > true
    # clusters, so one group may split across its own topics — fine)
    t_a = set(out[out["doc_id"].str.slice(1).astype(int) % 2 == 0]["topic_id"])
    t_b = set(out[out["doc_id"].str.slice(1).astype(int) % 2 == 1]["topic_id"])
    assert not (t_a & t_b)
    # determinism
    out2 = topic_distributions(ds, H).to_pandas()
    assert np.array_equal(out["topic_id"].to_numpy(), out2["topic_id"].to_numpy())

    with_tf = out.assign(
        tf_idx=[[1, 2]] * 120, tf_cnt=[[1.0, 1.0]] * 120
    )
    cat = topic_tfidf_concat(rd.from_pandas(with_tf), tf_dim=100).to_pandas()
    assert all(max(i) >= 100 for i in cat["topic_tf_idx"])
    assert all(len(i) == len(c) for i, c in zip(cat["topic_tf_idx"], cat["topic_tf_cnt"]))


def test_profession_and_graph_data(ray_session):
    from entity_resolution_ray.stages.terms import graph_data, profession_column

    docs = pd.DataFrame(
        {
            "doc_id": ["a", "b"],
            "entity_name": ["Ann Lee", "Bob Ray"],
            "content": [
                "Ann Lee the banker met a trader yesterday",
                "the doctor was unrelated " + "x " * 40 + "Bob Ray arrived",
            ],
            "org": [["Acme Corp"], []],
            "gpe": [["france", "france"], ["japan"]],
        }
    )
    prof = profession_column(rd.from_pandas(docs)).to_pandas().set_index("doc_id")
    assert list(prof.loc["a", "professions"]) == ["banker", "trader"]
    assert list(prof.loc["b", "professions"]) == []  # 'doctor' outside window

    g = graph_data(rd.from_pandas(docs), ["org", "gpe"]).to_pandas()
    assert len(g) == 3  # acme, france (deduped), japan
    assert set(g["feature"]) == {"org", "gpe"}


def test_content_length_filter_and_annotation_unpivot(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from entity_resolution_ray.stages.normalize import (
        filter_content_length,
        unpivot_annotation_pairs,
    )

    docs = pd.DataFrame(
        {"doc_id": ["a", "b", "c"], "content": ["x" * 5, "y" * 50, "z" * 500]}
    )
    out = filter_content_length(
        rd.from_pandas(docs), min_len=10, max_len=100
    ).to_pandas()
    assert list(out["doc_id"]) == ["b"]

    pairs = pd.DataFrame(
        {
            "entity_name": ["Ann Lee", "Ann Lee"],
            "first_url": ["u2", "u1"],
            "second_url": ["u1", "u3"],
            "first_text": ["t2", "t1"],
            "second_text": ["t1", "t3"],
            "answer": ["Yes", "No"],
        }
    )
    mentions, labeled = unpivot_annotation_pairs(rd.from_pandas(pairs))
    m = mentions.to_pandas()
    assert len(m) == 4  # 2 rows per pair (dedup is a downstream op)
    assert set(m["doc_id"]) == {"u1", "u2", "u3"}
    assert (m["entity_name"] == "Ann Lee").all()
    l = labeled.to_pandas().sort_values("doc_a").reset_index(drop=True)
    # pairs are direction-normalized (doc_a < doc_b)
    assert list(l["doc_a"]) == ["u1", "u1"]
    assert list(l["doc_b"]) == ["u2", "u3"]
    assert list(l["is_match"]) == [True, False]
