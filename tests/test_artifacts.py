"""Artifact fetch + node-local cache (the reference's
ensure_s3_resource_exists contract) and the TFIDF-S3 vectorizer variant."""

from __future__ import annotations

import os
import shutil
import threading

import numpy as np
import pytest
import ray.data as rd

from entity_resolution_ray.state.artifacts import (
    ArtifactTfidfVectorizer,
    artifact_tfidf,
    ensure_artifact,
    save_idf_artifact,
)


@pytest.fixture()
def store(tmp_path):
    """A 'blob store' directory with one IDF artifact in it."""
    idf = np.linspace(0.5, 2.0, 1 << 10)
    uri = str(tmp_path / "store" / "idf_v1.npz")
    save_idf_artifact(idf, uri)
    cache = str(tmp_path / "cache")
    return uri, cache, idf


def test_ensure_artifact_fetches_once(store):
    uri, cache, _ = store
    p1 = ensure_artifact(uri, cache)
    assert os.path.exists(p1)
    m1 = os.path.getmtime(p1)
    p2 = ensure_artifact(uri, cache)  # cache hit: no re-fetch
    assert p2 == p1 and os.path.getmtime(p2) == m1
    assert not os.path.exists(p1 + ".lock")


def test_ensure_artifact_concurrent_single_fetch(store):
    """An actor pool spinning up on one node must not stampede the store:
    N concurrent ensure_artifact calls produce one fetch, all callers get
    the same complete file."""
    uri, cache, idf = store
    paths: list[str] = []
    errs: list[Exception] = []

    def go():
        try:
            paths.append(ensure_artifact(uri, cache))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=go) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs and len(set(paths)) == 1
    with np.load(paths[0]) as z:
        np.testing.assert_array_equal(z["idf"], idf)
    # no tmp or lock litter
    left = set(os.listdir(cache))
    assert left == {os.path.basename(paths[0])}


def test_ensure_artifact_file_uri_and_failed_s3(store, tmp_path):
    uri, cache, _ = store
    shutil.rmtree(cache, ignore_errors=True)
    p = ensure_artifact("file://" + uri, cache)
    assert os.path.exists(p)
    # no network/credentials in this sandbox: the s3 backend must fail
    # cleanly (NotImplementedError without boto3, a botocore error with it)
    # and must NOT leave a partial file or a stuck lock in the cache
    c2 = str(tmp_path / "c2")
    with pytest.raises(Exception):
        ensure_artifact("s3://bucket/idf_v2.npz", c2)
    assert os.listdir(c2) == []
    # the failed fetch didn't wedge the lock: a local fetch still works
    p2 = ensure_artifact(uri, c2)
    assert os.path.exists(p2)


def test_artifact_tfidf_stage(ray_session, store):
    """The vectorizer loads the artifact once per actor and its output
    matches an in-process reference computation."""
    uri, cache, idf = store
    texts = ["alpha beta beta", "gamma alpha", "", "delta delta delta"]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    out = artifact_tfidf(ds, uri, concurrency=(1, 2), batch_size=2).to_pandas()
    assert {"tfidf_idx", "tfidf_val"} <= set(out.columns)

    ref = ArtifactTfidfVectorizer(uri, cache_dir=cache)
    import pyarrow as pa

    expect = ref(pa.table({"doc_id": list(range(len(texts))),
                           "text": texts})).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    for got, want in zip(out["tfidf_val"], expect["tfidf_val"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    for got, want in zip(out["tfidf_idx"], expect["tfidf_idx"]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ensure_artifact_refetches_on_source_update(store):
    """An artifact updated at the source (new mtime/size) must be re-fetched
    under a new cache name, never served stale."""
    import time

    uri, cache, _ = store
    p1 = ensure_artifact(uri, cache)
    time.sleep(0.02)
    with open(uri, "ab") as f:
        f.write(b"v2")
    p2 = ensure_artifact(uri, cache)
    assert p1 != p2
    assert open(p2, "rb").read().endswith(b"v2")
    assert not open(p1, "rb").read().endswith(b"v2")
