"""Pure-numpy guards for the round-5 oracle-canon helpers: the
order-pinned NMF inference fold and the logistic decision-boundary cut.
Neither needs a Ray session."""

import numpy as np


def test_nmf_infer_matches_blas_fold():
    """`_nmf_infer`'s explicit left-to-right accumulation must stay
    numerically equivalent (allclose) to the straightforward BLAS fold it
    replaced — the order pinning exists for SQL restatability, not to
    change results."""
    from entity_resolution_ray.stages.topics import _nmf_infer

    rng = np.random.default_rng(3)
    A = np.abs(rng.standard_normal((40, 8)))
    H = np.abs(rng.standard_normal((8, 32))) + 1e-3
    HHt = H @ H.T

    W = np.full((40, 8), 1.0 / 8)
    for _ in range(30):
        W = W * (A / np.maximum(W @ HHt, 1e-10))
    s = np.maximum(W.sum(axis=1, keepdims=True), 1e-10)
    ref = W / s

    out = _nmf_infer(A, HHt, 30)
    assert out.shape == ref.shape
    assert np.allclose(out, ref, rtol=1e-9, atol=1e-12)
    # rows normalize to 1 (or all-zero rows stay zero)
    sums = out.sum(axis=1)
    assert np.all((np.abs(sums - 1.0) < 1e-9) | (sums == 0.0))


def test_nmf_infer_deterministic():
    from entity_resolution_ray.stages.topics import _nmf_infer

    rng = np.random.default_rng(7)
    A = np.abs(rng.standard_normal((10, 4)))
    HHt = np.abs(rng.standard_normal((4, 4)))
    a = _nmf_infer(A, HHt, 15)
    b = _nmf_infer(A.copy(), HHt.copy(), 15)
    assert np.array_equal(a, b)


def test_nmf_infer_zero_row():
    """A doc with no terms (A row of zeros) folds to the all-zero
    distribution instead of NaN."""
    from entity_resolution_ray.stages.topics import _nmf_infer

    A = np.zeros((1, 4))
    HHt = np.eye(4)
    out = _nmf_infer(A, HHt, 30)
    assert np.all(out == 0.0)


def test_logit_cut_is_exact_boundary():
    """The cut is the LARGEST double z with numpy-sigmoid(z) <= th: one ULP
    either side flips the decision, so `p > th` and `z > cut` agree on
    every representable input."""
    import __ray_entry__ as e

    for th in (np.float64(0.6), np.float64(0.6) + np.float64(0.02)):
        cut = np.float64(e._logit_cut(th))
        sig = lambda z: 1.0 / (1.0 + np.exp(-z))
        assert sig(cut) <= th
        assert sig(np.nextafter(cut, np.inf)) > th
        # spot agreement on random z values
        rng = np.random.default_rng(int(th * 1000))
        z = rng.uniform(-2, 2, 50_000)
        assert np.array_equal(sig(z) > th, z > cut)
