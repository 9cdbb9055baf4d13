"""Pin the reference's adjacency-weight semantics on its own micro-fixture.

Reference test (``test/combiners/test_common_combiners.py:16-100``): three
articles with PERSON sets {john,peter,flow}, {peter,flow,kl}, {flow} must get
pairwise weights [[0,2,1],[2,0,1],[1,1,0]] (count of shared values), and the
inverse-degree variant weights 1/len(posting).
"""

import numpy as np

from entity_resolution_ray.stages.blocking import _block_postings, _posting_pairs


FEATURES = [["john", "peter", "flow"], ["peter", "flow", "kl"], ["flow"]]


def _dense(n, i, j, w):
    m = np.zeros((n, n))
    m[i, j] = w
    m[j, i] = w
    return m


def test_shared_value_counts_match_reference_matrix():
    postings = _block_postings(FEATURES, cap=100)
    i, j, w = _posting_pairs(3, postings)
    m = _dense(3, i, j, w)
    expected = np.array([[0, 2, 1], [2, 0, 1], [1, 1, 0]], dtype=float)
    assert np.array_equal(m, expected)


def test_inverse_degree_weights():
    postings = _block_postings(FEATURES, cap=100)
    i, j, w = _posting_pairs(3, postings, inverse_degree=True)
    m = _dense(3, i, j, w)
    # peter posting len 2 → 1/2; flow posting len 3 → 1/3; john/kl singletons
    expected = np.array(
        [[0, 1 / 2 + 1 / 3, 1 / 3], [1 / 2 + 1 / 3, 0, 1 / 3], [1 / 3, 1 / 3, 0]]
    )
    assert np.allclose(m, expected)


def test_posting_cap_truncates_hot_values():
    feats = [["x"] for _ in range(10)]
    postings = _block_postings([f for f in feats], cap=4)
    assert all(len(p) <= 4 for p in postings)
