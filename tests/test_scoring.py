"""Scorer semantics: boost clip formula, strict threshold, DOB negative rule."""

import numpy as np
import pandas as pd

from entity_resolution_ray.stages.scoring import PairScorer, ScoreConfig, dob_negative


def _pair_batch(**over):
    row = {
        "block_key": "k",
        "src": "a",
        "dst": "b",
        "weight": 0.0,
        "cosine": 0.0,
        "src_name": "John Smith",
        "dst_name": "John Smith",
        "src_media": [],
        "dst_media": [],
        "src_dob": [],
        "dst_dob": [],
    }
    row.update(over)
    return pd.DataFrame([row])


def test_boost_clip_formula():
    # reference: sim += clip(Σ intersections, 0, max_energy)/max_energy
    # (am_combiner/combiners/tfidf.py:336-353)
    cfg = ScoreConfig(max_energy=3.0, w_cosine=1.0, w_feature=1.0, w_jw=0.0, w_media=0.0)
    scorer = PairScorer(cfg)
    out = scorer(_pair_batch(weight=2.0, cosine=0.1))
    assert np.isclose(out["score"][0], 0.1 + 2.0 / 3.0)
    out = scorer(_pair_batch(weight=50.0, cosine=0.1))  # clipped at max_energy
    assert np.isclose(out["score"][0], 0.1 + 1.0)


def test_strict_threshold():
    cfg = ScoreConfig(th=0.5, w_cosine=1.0, w_feature=0.0, w_jw=0.0, w_media=0.0)
    scorer = PairScorer(cfg)
    assert not scorer(_pair_batch(cosine=0.5))["accepted"][0]  # sim > th is strict
    assert scorer(_pair_batch(cosine=0.500001))["accepted"][0]


def test_dob_negative_reference_rule():
    # negative iff min(later set) - max(earlier set) > distance
    # (am_combiner/utils/adjacency.py:117-172)
    assert dob_negative([1950], [1960], 5)
    assert not dob_negative([1950], [1955], 5)
    assert not dob_negative([], [1960], 5)
    assert not dob_negative([1950, 1961], [1960], 5)  # ranges overlap-ish
    assert dob_negative([1960], [1950], 5)  # symmetric


def test_negative_edge_blocks_acceptance():
    cfg = ScoreConfig(th=0.1, w_cosine=1.0, w_feature=0.0, w_jw=0.0, w_media=0.0)
    scorer = PairScorer(cfg)
    out = scorer(_pair_batch(cosine=0.9, src_dob=[1950], dst_dob=[1990]))
    assert bool(out["neg_dob"][0]) and not bool(out["accepted"][0])


def test_media_cosine_same_prefix_high():
    cfg = ScoreConfig(w_cosine=0.0, w_feature=0.0, w_jw=0.0, w_media=1.0, th=0.5)
    scorer = PairScorer(cfg)
    out = scorer(
        _pair_batch(
            src_media=["media://p000001/00000-0"],
            dst_media=["media://p000001/00003-1"],
        )
    )
    assert out["media_cos"][0] > 0.9
    out2 = scorer(
        _pair_batch(
            src_media=["media://p000001/00000-0"],
            dst_media=["media://p000099/00003-1"],
        )
    )
    assert abs(out2["media_cos"][0]) < 0.6


def test_jaro_winkler_batch_matches_scalar():
    """Bit-parallel batched JW pins exactly to the scalar kernel, including
    the classic reference pairs and degenerate inputs."""
    import random
    import string

    import numpy as np

    from entity_resolution_ray.functions.text import (
        jaro_winkler,
        jaro_winkler_batch,
    )

    rng = random.Random(17)
    pairs = [
        ("", ""), ("a", ""), ("", "b"), ("abc", "abc"),
        ("martha", "marhta"), ("dixon", "dicksonx"), ("dwayne", "duane"),
        ("jellyfish", "smellyfish"),
    ]
    for _ in range(2000):
        pairs.append((
            "".join(rng.choice(string.ascii_lowercase + " ")
                    for _ in range(rng.randint(0, 30))),
            "".join(rng.choice(string.ascii_lowercase + " ")
                    for _ in range(rng.randint(0, 30))),
        ))
    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    got = jaro_winkler_batch(a, b)
    exp = np.array([jaro_winkler(x, y) for x, y in pairs])
    np.testing.assert_allclose(got, exp, atol=1e-12)
