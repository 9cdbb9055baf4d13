"""Unit tests for scalar/vector kernels (reference-semantics pins)."""

import numpy as np

from entity_resolution_ray.functions.minhash import (
    estimate_jaccard,
    exact_jaccard,
    minhash_signatures_batch,
    simhash_batch,
    hamming_distance64,
)
from entity_resolution_ray.functions.phonetic import metaphone, phonetic_keys, soundex
from entity_resolution_ray.functions.text import (
    ascii_fold,
    jaro_winkler,
    name_block_key,
    name_keyword_tokens,
    remove_tokens_word_boundary,
    strip_html,
    tokenize_words,
    url_domain,
)


def test_name_keyword_tokens_reference_semantics():
    # unidecode → lower → split on punct → len>2 → sorted
    # (am_combiner/features/common.py:282-292)
    assert name_keyword_tokens("Pátricia  O'Neill-Smith") == [
        "neill", "patricia", "smith",
    ]
    assert name_block_key("Smith, John") == "john+smith"
    assert name_block_key("JOHN SMITH") == "john+smith"
    assert name_block_key("John-Smith") == "john+smith"


def test_ascii_fold_and_tokenize():
    assert ascii_fold("Pátricia") == "Patricia"
    assert tokenize_words("Pátricia Allen met...") == ["patricia", "allen", "met"]


def test_strip_html():
    assert strip_html("a<b>bold</b>c") == "aboldc"


def test_soundex_known_values():
    # classic published Soundex pairs
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Smith") == soundex("Smyth")
    assert soundex("Ashcraft") == soundex("Ashcroft")
    assert phonetic_keys(["john", "smith"]) == sorted({soundex("john"), soundex("smith")})


def test_metaphone_variants_collide():
    assert metaphone("philip") == metaphone("filip")
    assert metaphone("smith") == metaphone("smyth")


def test_jaro_winkler_reference_points():
    assert jaro_winkler("martha", "marhta") > 0.95
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0


def test_remove_tokens_word_boundary():
    out = remove_tokens_word_boundary("John Smith met John Smithson", ["john", "smith"])
    assert out == "met Smithson"


def test_url_domain():
    assert url_domain("http://d/a/b") == "d"


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog again and again ok"
    b = "the quick brown fox jumps over the lazy cat again and again ok"
    sigs = minhash_signatures_batch([a, b], num_perm=256)
    est = estimate_jaccard(sigs[0], sigs[1])
    true = exact_jaccard(a, b)
    assert abs(est - true) < 0.15
    assert minhash_signatures_batch([a], num_perm=256)[0].tolist() == sigs[0].tolist()


def test_simhash_similar_texts_close():
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "alpha beta gamma delta epsilon zeta eta iota"
    c = "totally different words entirely unrelated content here now"
    h = simhash_batch([a, b, c])
    d_ab = hamming_distance64(h[:1], h[1:2])[0]
    d_ac = hamming_distance64(h[:1], h[2:3])[0]
    assert d_ab < d_ac


def test_minhash_md5_variant_matches_manual_and_duckdb_hash():
    """The base_hash="md5" signature must be exactly min over shingles of
    (md5_lower64(sh) * a + b) mod 2^64 with the seeded constants — that
    identity is what the minhash_band_pairs SQL oracle relies on."""
    import duckdb

    from entity_resolution_ray.functions.minhash import (
        minhash_signatures_batch,
        shingle_set,
    )
    from entity_resolution_ray.utils.hashing import (
        md5_hash64_array,
        universal_hash_constants,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    sig = minhash_signatures_batch([text], num_perm=16, ngram=3,
                                   base_hash="md5")[0]
    sh = shingle_set(text, 3)
    a, b = universal_hash_constants(16, 7)
    base = md5_hash64_array(sh).reshape(-1, 1)
    manual = (base * a[None, :] + b[None, :]).min(axis=0)
    np.testing.assert_array_equal(sig, manual)
    # and the base hash itself is DuckDB's md5_number_lower
    got = duckdb.sql(
        "select md5_number_lower(?)", params=[sh[0]]
    ).fetchone()[0]
    assert int(got) == int(base[0, 0])
