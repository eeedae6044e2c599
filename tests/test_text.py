import numpy as np

from deduplicator_ray.functions import text as tf


def test_shingles_deterministic_and_set_semantics():
    a = tf.char_shingle_hashes("hello world", 5)
    b = tf.char_shingle_hashes("hello world", 5)
    assert (a == b).all()
    # repeated text adds few new shingles (set semantics)
    c = tf.char_shingle_hashes("hello world hello world", 5)
    assert len(np.setdiff1d(a, c)) == 0


def test_minhash_jaccard_estimate():
    t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    t2 = "the quick brown fox jumps over the lazy cat near the river bank today"
    s1 = tf.minhash_signature(t1, 5, 128)
    s2 = tf.minhash_signature(t2, 5, 128)
    est = tf.est_jaccard(s1, s2)
    exact = tf.exact_jaccard_char_shingles(t1, t2, 5)
    assert abs(est - exact) < 0.15
    assert tf.est_jaccard(s1, s1) == 1.0


def test_identical_text_identical_signature():
    s1 = tf.minhash_signature("abc def ghi", 5, 64)
    s2 = tf.minhash_signature("abc def ghi", 5, 64)
    assert (s1 == s2).all()


def test_band_keys_collide_iff_band_equal():
    sigs = np.arange(256, dtype=np.uint64).reshape(2, 128)
    sigs[1] = sigs[0]  # identical
    bk = tf.band_keys(sigs, 16, 8)
    assert (bk[0] == bk[1]).all()
    sigs2 = sigs.copy()
    sigs2[1, 0] += 1  # first band differs
    bk2 = tf.band_keys(sigs2, 16, 8)
    assert bk2[0, 0] != bk2[1, 0]
    assert (bk2[0, 1:] == bk2[1, 1:]).all()


def test_simhash_properties():
    h = tf.simhash_batch(["a b c d e f", "a b c d e f", "x y z w q r"])
    assert h[0] == h[1]
    assert h[0] != h[2]
    # token swap keeps simhash identical (bag of tokens)
    h2 = tf.simhash_batch(["b a c d e f"])
    assert h2[0] == h[0]


def test_token_counts():
    assert tf.token_count_ws("a  b\tc\nd") == 4
    assert tf.token_count_bpe("hello, world! x2") == 6  # hello , world ! x 2


def test_lang_id_deterministic():
    assert tf.lang_id("the thing and the other thing") == "en"
    assert tf.lang_id("der und der sch sch und") == "de"
    # no markers at all → first in priority order
    assert tf.lang_id("xxxx yyyy") == "en"


def test_quality_features():
    q = tf.quality_features("the cat, and a dog!")
    assert q["n_tokens"] == 5.0
    assert q["stopword_ratio"] == 3 / 5  # 'the', 'and', 'a' ('cat,'/'dog!' don't match)
    assert q["punct_ratio"] == 2 / 19


def test_quality_stopword_exact():
    q = tf.quality_features("the and of a to")
    assert q["stopword_ratio"] == 1.0


def test_rolling_fingerprint_deterministic():
    f1 = tf.rolling_fingerprint("some document text body")
    f2 = tf.rolling_fingerprint("some document text body")
    f3 = tf.rolling_fingerprint("some document text body!")
    assert f1 == f2
    assert isinstance(f1, int)
    assert f1 != f3


def test_hash_tokens_matches_per_row_reference():
    """hash_tokens (the batched kernel) vs _poly_hash_one (the per-row
    reference) — pinned so the two polynomial implementations can never
    silently diverge (round-3 review)."""
    import numpy as np

    toks = ["", "a", "hello", "日本語テキスト", "x" * 257, "mixed 1 2 3"]
    got = tf.hash_tokens(toks)
    want = np.array([tf._poly_hash_one(t.encode("utf-8")) for t in toks],
                    np.uint64)
    assert (got == want).all()


def test_powers_slice_consistency():
    """_powers(n) must stay exact as the backing array grows."""
    import numpy as np

    small = tf._powers(3).copy()
    big = tf._powers(500)
    assert (tf._powers(3) == small).all()
    assert big[-1] == 1 and big[-2] == tf._B
    # suffix property: powers(3) is the tail of powers(500)
    assert (big[-3:] == small).all()
