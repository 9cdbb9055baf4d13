"""Sanction nested-struct extractors, date/time kernels, span-window selector."""

import pandas as pd
import pyarrow as pa

from entity_resolution_ray.functions.dates import standardize_date, standardize_time
from entity_resolution_ray.stages.sanctions import (
    SANCTION_SCHEMA,
    extract_sanction_features,
    synth_sanctions,
)


def test_sanction_extractors_known_row():
    row = {
        "sanction_id": "s1",
        "type": "person",
        "names": [
            {"name": "Ahmed Ben Rahman", "is_primary": True},
            {"name": "A. Hassan", "is_primary": False},
        ],
        "births": [
            {"min_year": 1950, "max_year": 1953},
            {"min_year": 1960, "max_year": 1960},
        ],
        "locations": [
            {"country_code": "fr"},
            {"country_code": "International"},
        ],
        "passports": ["p-12 34/ab", ""],
        "display_fields": [],
    }
    t = pa.Table.from_pylist([row], schema=SANCTION_SCHEMA)
    out = extract_sanction_features(t).to_pylist()[0]
    assert out["alias_keywords"] == ["ahmed", "ben", "hassan", "rahman"]
    assert out["alias_keys"] == ["ahmed+ben+rahman", "hassan"]
    assert "ahmed+ben" in out["alias_bigrams"]
    assert out["primary_keys"] == ["ahmed+ben+rahman"]
    # patronymic "Ben Rahman" → soundex of rahman
    from entity_resolution_ray.functions.phonetic import soundex

    assert out["fathers_phonetic"] == [soundex("rahman")]
    assert out["yob_range"] == [1950, 1951, 1952, 1953, 1960]
    assert out["yob_known"] == [1960]
    assert out["country_codes"] == ["FR"]  # International dropped, uppercased
    assert out["passport_ids"] == ["P1234AB"]


def test_synth_sanctions_pipeline_runs():
    import ray.data as rd

    from entity_resolution_ray.stages.sanctions import sanction_features

    ds = rd.from_arrow(synth_sanctions(100))
    out = sanction_features(ds).to_pandas()
    assert len(out) == 100
    assert out["alias_keys"].map(len).min() >= 1


def test_standardize_date_formats():
    assert standardize_date("2001-05-07") == "2001-05-07"
    assert standardize_date("07/05/2001") == "2001-05-07"
    assert standardize_date("7 May 2001") == "2001-05-07"
    assert standardize_date("May 7, 2001") == "2001-05-07"
    assert standardize_date("1957") == "1957-01-01"
    assert standardize_date("not a date") is None
    assert standardize_date("9999-01-01") is None  # out of sanity window


def test_standardize_time_formats():
    assert standardize_time("13:05:09") == "13:05:09"
    assert standardize_time("1:05 pm") == "13:05:00"
    assert standardize_time("12:15 am") == "00:15:00"
    assert standardize_time("noonish") is None


def test_select_text_window(fixture_1k):
    import os

    from entity_resolution_ray.pipelines.er import read_documents
    from entity_resolution_ray.stages.features import select_text_window
    from entity_resolution_ray.stages.normalize import normalize

    ds = normalize(read_documents(os.path.join(fixture_1k, "documents.parquet")))
    out = select_text_window(ds).limit(50).to_pandas()
    # every selected_text is a subset of content and non-empty when the name
    # is mentioned in text spans (generator templates always mention it)
    for row in out.itertuples():
        assert row.selected_text
        for sent in row.selected_text.split(". "):
            assert sent.split(".")[0] in row.content


def test_add_domain_column(fixture_1k):
    import os

    from entity_resolution_ray.pipelines.er import read_documents
    from entity_resolution_ray.stages.features import add_domain_column

    ds = add_domain_column(
        read_documents(os.path.join(fixture_1k, "documents.parquet"))
    )
    out = ds.limit(5).to_pandas()
    assert (out["domain"] == "d").all()  # doc ids are http://d/...


def test_multimodal_decode_plumbing(fixture_1k):
    import os

    import pytest

    from entity_resolution_ray.stages.multimodal import DecodeMedia

    # real codec mode is the documented stub
    with pytest.raises(NotImplementedError):
        DecodeMedia(mode="real")

    import pyarrow as pa
    import ray.data as rd

    from entity_resolution_ray.stages.multimodal import (
        attach_fake_payloads,
        decode_media,
    )

    refs = rd.from_items([{"media_ref": f"media://p{i:06d}/0-0"} for i in range(32)])
    out = decode_media(attach_fake_payloads(refs)).to_pandas()
    assert len(out) == 32
    assert out["media_features"].map(len).eq(16).all()
    # deterministic: same ref → same features
    out2 = decode_media(attach_fake_payloads(refs)).to_pandas()
    assert list(out.iloc[0]["media_features"]) == list(out2.iloc[0]["media_features"])


def test_lsh_topk_recall_vs_brute_force(sf_dir):
    import numpy as np
    import ray.data as rd

    from entity_resolution_ray.stages.ann import brute_force_topk, lsh_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", override_num_blocks=4)
    qdf = ds.to_pandas().sort_values("vec_id").head(4)
    qids = qdf["vec_id"].to_numpy()
    qmat = np.stack(qdf["embedding"].to_list())
    exact = brute_force_topk(ds, qids, qmat, k=5).to_pandas()
    approx = lsh_topk(ds, qids, qmat, k=5, num_planes=4, num_tables=8).to_pandas()
    # recall of the approximate tier against exact top-5
    hits = 0
    for q in qids:
        e = set(exact[exact.query_id == q].neighbor_id)
        a = set(approx[approx.query_id == q].neighbor_id)
        hits += len(e & a)
    # the testdata embeddings are near-random (max pairwise cos ~0.5), the
    # hardest case for hyperplane LSH; bound is accordingly loose
    assert hits / (len(qids) * 5) >= 0.25


def test_resize_and_frame_sample(ray_session):
    import pandas as pd
    import ray.data as rd

    from entity_resolution_ray.stages.multimodal import (
        attach_fake_payloads,
        decode_media,
        resize_media,
        sample_frames,
    )

    refs = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(20)],
         "media_ref": [f"media://m{i}" for i in range(20)]}
    )
    with_payload = attach_fake_payloads(rd.from_pandas(refs)).materialize()

    resized = resize_media(with_payload, target_w=4, target_h=4).to_pandas()
    assert all(len(px) == 16 for px in resized["pixels"])
    assert all(m["width"] == 4 and m["height"] == 4 for m in resized["media_meta"])
    # determinism
    resized2 = resize_media(with_payload, target_w=4, target_h=4).to_pandas()
    assert [list(p) for p in resized["pixels"]] == [list(p) for p in resized2["pixels"]]

    frames = sample_frames(with_payload, every_k=2).to_pandas()
    meta = with_payload.to_pandas().set_index("media_ref")["media_meta"]
    # every-k policy: ceil(n_frames / 2) rows per media
    import math
    want = sum(math.ceil(max(1, m["n_frames"]) / 2) for m in meta)
    assert len(frames) == want
    assert (frames["frame_index"] % 2 == 0).all()
    # a multi-frame video exists in the fixture and its frame payloads differ
    vids = frames[frames["media_meta"].map(lambda m: m["n_frames"] > 2)]
    if len(vids) >= 2:
        g = vids.groupby("media_ref")["payload"].nunique()
        assert (g[g.index.isin(vids["media_ref"])] >= 1).all()

    # decode still runs downstream of frame sampling (per-frame features)
    feats = decode_media(rd.from_pandas(frames)).to_pandas()
    assert all(len(f) == 16 for f in feats["media_features"])


def test_resize_real_mode_is_honest_seam():
    import pytest

    from entity_resolution_ray.stages.multimodal import ResizeMedia

    with pytest.raises(NotImplementedError):
        ResizeMedia(mode="real")


def test_manual_overlay_ground_truth(ray_session):
    """ManualOverlay assembly: profile mapping, dense sorted codes,
    unmatched -1, per-profile split determinism (sanction_data.py:22-184)."""
    import ray.data as rd

    from entity_resolution_ray.stages.sanctions import (
        manual_overlay_ground_truth,
        synth_overlay_profiles,
        synth_sanctions,
    )

    sanctions = synth_sanctions(60)
    profiles = synth_overlay_profiles(sanctions, group_size=3, coverage=0.7)
    out = manual_overlay_ground_truth(
        rd.from_arrow(sanctions), profiles.to_pandas()
    ).to_pandas().sort_values("sanction_id").reset_index(drop=True)

    assert len(out) == 60
    # mapped mentions carry their profile; unmapped get -1 / train
    prof_rows = out[out["profile_id"].notna()]
    unmapped = out[out["profile_id"].isna()]
    assert len(prof_rows) and len(unmapped)
    assert (unmapped["ground_truth"] == -1).all()
    assert (unmapped["split"] == "train").all()
    # ground_truth = dense code of sorted profile ids
    m = prof_rows.groupby("profile_id")["ground_truth"].nunique()
    assert (m == 1).all()
    order = prof_rows.drop_duplicates("profile_id").sort_values("profile_id")
    assert list(order["ground_truth"]) == sorted(order["ground_truth"])
    # split is a pure function of the profile
    per_prof = prof_rows.groupby("profile_id")["split"].nunique()
    assert (per_prof == 1).all()
    # blocking field mirrors the entity type
    assert (out["blocking_field"] == out["type"]).all()
    # rerun → identical
    out2 = manual_overlay_ground_truth(
        rd.from_arrow(sanctions), profiles.to_pandas()
    ).to_pandas().sort_values("sanction_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_manual_overlay_entity_type_filter(ray_session):
    import ray.data as rd

    from entity_resolution_ray.stages.sanctions import (
        manual_overlay_ground_truth,
        synth_overlay_profiles,
        synth_sanctions,
    )

    sanctions = synth_sanctions(60)
    profiles = synth_overlay_profiles(sanctions)
    out = manual_overlay_ground_truth(
        rd.from_arrow(sanctions), profiles.to_pandas(),
        entity_types=["person"],
    ).to_pandas()
    assert (out["type"] == "person").all()
    assert 0 < len(out) < 60


def test_ivf_topk_recall_and_pruning(sf_dir, tmp_path):
    import glob

    import numpy as np
    import ray.data as rd

    from entity_resolution_ray.stages.ann import (
        brute_force_topk,
        build_ivf_index,
        fit_ivf_centroids,
        ivf_topk,
    )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", override_num_blocks=4)
    centroids = fit_ivf_centroids(ds, nlist=8, iters=5)
    assert centroids.shape[1] == len(ds.take(1)[0]["embedding"])
    # centroid fit is deterministic (hash sample + id-ordered init, no RNG)
    again = fit_ivf_centroids(ds, nlist=8, iters=5)
    assert np.allclose(centroids, again)

    index_dir = str(tmp_path / "ivf")
    build_ivf_index(ds, index_dir, centroids)
    # every vector landed in exactly one hive partition
    n_indexed = sum(
        rd.read_parquet(p).count()
        for p in glob.glob(f"{index_dir}/ivf_list=*")
    )
    assert n_indexed == ds.count()

    qdf = ds.sort("vec_id").limit(4).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    qmat = np.stack(qdf["embedding"].to_list())
    exact = brute_force_topk(ds, qids, qmat, k=5).to_pandas()

    # full probe (nprobe = nlist) must recover the exact answer
    full = ivf_topk(index_dir, centroids, qids, qmat, k=5, nprobe=8).to_pandas()
    for q in qids:
        assert set(exact[exact.query_id == q].neighbor_id) == set(
            full[full.query_id == q].neighbor_id)

    # partial probe trades recall for pruning but stays useful
    part = ivf_topk(index_dir, centroids, qids, qmat, k=5, nprobe=3).to_pandas()
    hits = sum(
        len(set(exact[exact.query_id == q].neighbor_id)
            & set(part[part.query_id == q].neighbor_id))
        for q in qids)
    assert hits / (len(qids) * 5) >= 0.5


def test_events_sessions_window(sf_dir):
    from entity_resolution_ray.pipelines.relational import q_events_sessions

    out = q_events_sessions(sf_dir).to_pandas()
    assert {"user_id", "sess_no", "n_events", "duration_sec",
            "sum_value"} <= set(out.columns)
    # session numbering starts at 0 and is dense per user
    g = out.groupby("user_id")["sess_no"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()
    # event conservation: every input event lands in exactly one session
    import ray.data as rd

    n_events = rd.read_parquet(f"{sf_dir}/events.parquet").count()
    assert out["n_events"].sum() == n_events


def test_ivf_cache_tag_stable_across_processes(sf_dir):
    """The on-disk IVF index cache key must be process-independent (Python's
    salted hash() rebuilt the index every driver run) and the second in-
    process run must reuse the built index (centroids mtime unchanged)."""
    import os
    import shutil
    import subprocess
    import sys

    import __ray_entry__ as entry

    src = f"{sf_dir}/embeddings.parquet"
    here = entry._ivf_cache_dir(src)
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '/root/repo'); "
         "import __ray_entry__ as e; "
         f"print(e._ivf_cache_dir({src!r}))"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert out == here  # same tag from a fresh interpreter

    shutil.rmtree(here, ignore_errors=True)
    entry._ann_ivf(sf_dir)
    cpath = os.path.join(here, "centroids.npy")
    first_mtime = os.path.getmtime(cpath)
    entry._ann_ivf(sf_dir)  # must hit the cache, not rebuild
    assert os.path.getmtime(cpath) == first_mtime


def test_sanctions_struct_fields_matches_sql_oracle(sf_dir):
    """The SQL-expressible extractor subset must match its DuckDB oracle
    bit-for-bit at test scale (the driver's compare, in miniature)."""
    import duckdb
    import numpy as np

    import __ray_entry__ as entry

    mine = entry._sanctions_struct_fields(sf_dir).to_pandas()
    sql = entry._sanctions_struct_fields_sql().replace(
        "raw_sf0.01.parquet",
        f"raw_{sf_dir.rstrip('/').rsplit('/', 1)[-1]}.parquet",
    )
    oracle = duckdb.connect().execute(sql).df()

    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
            elif np.issubdtype(df[c].dtype, np.floating):
                df[c] = np.round(df[c].astype(np.float64), 6)
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True)

    a, b = canon(mine), canon(oracle)
    assert len(a) == len(b) and list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b)


def test_er_blocks_phonetic_canon_matches_closure_oracle(sf_dir):
    """Phonetic blocking (CC over shared phonetic/metaphone keys) relabeled
    to canonical min-doc_id must equal a recursive-CTE transitive closure
    over the written key table — the blocker's whole shuffle/CC path under
    a hash-exact oracle at test scale."""
    import duckdb

    import __ray_entry__ as entry

    mine = entry._er_blocks_phonetic_canon(sf_dir).to_pandas()
    oracle = duckdb.connect().execute(entry.ER_BLOCKS_PHONETIC_SQL).df()
    a = mine.sort_values(["doc_id"]).reset_index(drop=True)
    b = oracle.sort_values(["doc_id"]).reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(
        a[["doc_id", "block_rep"]], b[["doc_id", "block_rep"]])


def test_er_pair_weights_matches_sql_oracle(sf_dir):
    """The flagship pair generator's adjacency weights + DOB negative
    evidence vs the SQL recomputation (driver check in miniature; the
    oracle SQL pins the sf0.01 path, so rewrite it to this fixture's)."""
    import duckdb

    import __ray_entry__ as entry

    mine = entry._er_pair_weights(sf_dir).to_pandas()
    base = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    sql = entry.ER_PAIR_WEIGHTS_SQL.replace("featured_sf0.01", f"featured_{base}")
    oracle = duckdb.connect().execute(sql).df()
    key = ["block_key", "src", "dst"]
    a = mine.sort_values(key).reset_index(drop=True)
    b = oracle.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(
        a[key + ["weight", "neg_dob"]].astype({"weight": float}),
        b[key + ["weight", "neg_dob"]].astype({"weight": float}),
    )


def test_er_blocks_cutoff_canon_matches_closure_oracle(sf_dir):
    """Gradual cutoff blocking (pass-1 freeze at cluster_cutoff, pass-2
    sweep) vs two chained recursive-CTE closures, canonical labels."""
    import duckdb

    import __ray_entry__ as entry

    mine = entry._er_blocks_cutoff_canon(sf_dir).to_pandas()
    oracle = duckdb.connect().execute(entry.ER_BLOCKS_CUTOFF_SQL).df()
    a = mine.sort_values(["doc_id"]).reset_index(drop=True)
    b = oracle.sort_values(["doc_id"]).reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(
        a[["doc_id", "block_rep", "derived_by"]],
        b[["doc_id", "block_rep", "derived_by"]])
