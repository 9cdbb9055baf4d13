"""Property-based checks for pure kernels (no Ray session needed)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_ray.functions.text import jaro_winkler, jaro_winkler_batch

name_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=24
)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(name_st, name_st), min_size=1, max_size=32))
def test_jw_batch_matches_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    batch = jaro_winkler_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert abs(batch[i] - jaro_winkler(x, y)) < 1e-9


@settings(max_examples=200, deadline=None)
@given(name_st, name_st)
def test_jw_axioms(x, y):
    v = jaro_winkler(x, y)
    assert 0.0 <= v <= 1.0
    assert jaro_winkler(y, x) == v          # symmetric
    if x == y and x:
        assert v == 1.0                      # identity


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=50),
       st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=50))
def test_dob_negative_symmetric(a, b):
    from entity_resolution_ray.stages.scoring import dob_negative

    assert dob_negative(a, b, 5) == dob_negative(b, a, 5)
    if a and b and set(a) & set(b):
        assert not dob_negative(a, b, 5)     # overlap can never be negative
