"""Property-based tests (hypothesis) over the pure kernels — SURVEY.md §5.3.

These run without Ray where possible: hash/codec roundtrips, owner-band
exclusivity, union-find vs the oracle closure, signature estimates.  One
fuzz drives the real distributed CC (small graphs, forced star rounds).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deduplicator_ray import codecs, hashing, oracle
from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions import text as textfn

CFG = PipelineConfig()

_img = st.integers(2, 24).flatmap(
    lambda w: st.integers(2, 24).map(lambda h: (w, h))
).flatmap(
    lambda wh: st.integers(0, 2**32 - 1).map(
        lambda seed: np.random.default_rng(seed).integers(
            0, 256, (wh[1], wh[0], 3), np.uint8))
)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(img=_img, fmt=st.sampled_from(["raw", "ppm", "bmp", "png"]))
def test_codec_roundtrip_lossless_and_hash_invariant(img, fmt):
    data = codecs.encode_image(img, fmt)
    out = codecs.decode_image(data, fmt, img.shape[1], img.shape[0])
    assert np.array_equal(out, img)  # all in-sandbox codecs are lossless
    assert hashing.dhash_u64(out, 8) == hashing.dhash_u64(img, 8)


@settings(max_examples=100, deadline=None)
@given(h=st.integers(0, 2**64 - 1),
       flips=st.lists(st.integers(0, 63), min_size=0, max_size=4, unique=True))
def test_owner_band_exclusivity(h, flips):
    """Any pair within Hamming ≤ 4 agrees on ≥1 of the 5 dHash slices
    (pigeonhole), and exactly one band owns it (the first agreeing slice)."""
    from deduplicator_ray.stages.candidates import _img_slice_keys

    h2 = h
    for b in flips:
        h2 ^= 1 << b
    pair = np.array([h, h2], np.uint64).view(np.int64)
    keys = _img_slice_keys(pair)
    agree = keys[0] == keys[1]
    assert agree.any()  # pigeonhole: ≤4 flips, 5 slices
    owner = int(np.argmax(agree))
    # the owner is unique by definition (first agreeing slice); every slice
    # before it disagrees
    assert not agree[:owner].any()


@settings(max_examples=50, deadline=None)
@given(edges=st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=60))
def test_driver_union_find_matches_oracle_closure(edges):
    from deduplicator_ray.stages.components import _driver_union_find

    named = [(f"n{a:02d}", f"n{b:02d}") for a, b in edges]
    parent = _driver_union_find([a for a, _ in named], [b for _, b in named])
    want = oracle.connected_components(
        {(min(a, b), max(a, b)) for a, b in named if a != b})
    got = {}
    for a, b in named:
        if a != b:
            got[a] = parent.get(a, a)
            got[b] = parent.get(b, b)
    # roots must match the oracle's lexicographic-min component labels
    for n, root in got.items():
        assert want[n] == root


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       texts=st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=8))
def test_minhash_band_keys_deterministic_and_jaccard_monotone(seed, texts):
    for t in texts:
        s1 = textfn.minhash_signature(t, CFG.shingle_k, CFG.num_perm)
        s2 = textfn.minhash_signature(t, CFG.shingle_k, CFG.num_perm)
        assert np.array_equal(s1, s2)
        b1 = textfn.band_keys(s1[None, :], CFG.bands, CFG.rows_per_band)
        b2 = textfn.band_keys(s2[None, :], CFG.bands, CFG.rows_per_band)
        assert np.array_equal(b1, b2)
    # identical text → identical signature → estimated jaccard 1
    s = textfn.minhash_signature(texts[0], CFG.shingle_k, CFG.num_perm)
    assert textfn.est_jaccard(s, s) == 1.0


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 3), st.text("ab", min_size=1, max_size=4)),
    min_size=1, max_size=30))
def test_keep_first_is_permutation_invariant(rows):
    """Exact dedup must not depend on input row order (distributed blocks
    arrive in arbitrary order)."""
    import pandas as pd

    df = pd.DataFrame(rows, columns=["k", "o", "v"])

    def ref(d):
        return (d.sort_values(["o", "v"], kind="mergesort")
                 .drop_duplicates(["k"])
                 .sort_values(["k", "o", "v"])
                 .reset_index(drop=True))

    a = ref(df)
    b = ref(df.sample(frac=1, random_state=7))
    pd.testing.assert_frame_equal(a, b)


def test_distributed_cc_fuzz_vs_oracle(ray_session):
    """Random small graphs through the REAL star-contraction path
    (cc_driver_edge_cap=0) must match the oracle closure."""
    import dataclasses

    import ray.data as rd

    from deduplicator_ray.stages.components import connected_components

    cfg = dataclasses.replace(CFG, cc_driver_edge_cap=0)
    rng = np.random.default_rng(123)
    for trial in range(3):
        n = int(rng.integers(5, 25))
        m = int(rng.integers(1, 40))
        edges = [(f"v{int(rng.integers(0, n)):02d}",
                  f"v{int(rng.integers(0, n)):02d}") for _ in range(m)]
        ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
        got = connected_components(ds, cfg, num_partitions=3).to_pandas()
        want = oracle.connected_components(
            {(min(a, b), max(a, b)) for a, b in edges if a != b})
        gm = ({} if len(got) == 0
              else dict(zip(got["image_id"], got["cluster_id"])))
        assert gm == want, trial


def test_partitioned_merge_str(ray_session):
    """The hash-partitioned all-string merge (the broadcast-free big⋈big
    path for D4/J4-shaped self-joins): inner and left joins match pandas."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.partitioned import partitioned_merge_str

    l = rd.from_items([{"a": f"k{i:03d}", "x": str(i)} for i in range(200)])
    r = rd.from_items([{"b": f"k{i:03d}", "y": str(i * 2)}
                       for i in range(0, 200, 2)])
    got = partitioned_merge_str(l, r, ["a", "x"], ["b", "y"], "a", "b",
                                how="inner", num_parts=4).to_pandas()
    ldf = pd.DataFrame({"a": [f"k{i:03d}" for i in range(200)],
                        "x": [str(i) for i in range(200)]})
    rdf = pd.DataFrame({"b": [f"k{i:03d}" for i in range(0, 200, 2)],
                        "y": [str(i * 2) for i in range(0, 200, 2)]})
    want = ldf.merge(rdf, how="inner", left_on="a", right_on="b")[["a", "x", "y"]]
    key = ["a", "x", "y"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True))

    left = partitioned_merge_str(l, r, ["a", "x"], ["b", "y"], "a", "b",
                                 how="left", num_parts=4).to_pandas()
    assert len(left) == 200
    matched = left[left["y"].notna() & (left["y"] != "")]
    assert len(matched) == 100


@given(st.lists(st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=600),
    max_size=12))
@settings(max_examples=40, deadline=None)
def test_cdc_spans_tile_and_are_content_defined(texts):
    """cdc_chunk_spans properties on arbitrary unicode batches: chunks
    tile each doc's utf-8 bytes exactly; the multiset of chunk hashes per
    doc is independent of batch composition (content-defined, not
    batch-defined); max chunk bound holds."""
    d, s, ln, h = textfn.cdc_chunk_spans(texts)
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        sel = d == i
        if len(b) == 0:
            assert sel.sum() == 0
            continue
        ss, ll = s[sel], ln[sel]
        assert ss[0] == 0
        assert (ss[1:] == (ss + ll)[:-1]).all()
        assert (ss + ll)[-1] == len(b)
        # batch-composition independence: alone == in batch
        d1, s1, l1, h1 = textfn.cdc_chunk_spans([t])
        assert sorted(h1.tolist()) == sorted(h[sel].tolist())
    assert (ln <= 4096).all()


@given(st.integers(0, 2**31 - 1), st.integers(1, 6))
@settings(max_examples=30, deadline=None)
def test_srp_keys_scale_and_batch_invariant(seed, n):
    """srp_band_keys properties: positive scaling never changes a key
    (sign hash); per-vector keys are independent of batch composition;
    keys are within the rbits range."""
    from deduplicator_ray.functions.vector import srp_band_keys

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, 64)).astype(np.float32)
    k = srp_band_keys(x)
    assert k.shape == (n, 16)
    assert (k >= 0).all() and (k < 256).all()
    assert (srp_band_keys(x * np.float32(7.25)) == k).all()
    for i in range(n):
        assert (srp_band_keys(x[i:i + 1]) == k[i]).all()


@settings(max_examples=60, deadline=None)
@given(texts=st.lists(
    st.lists(st.sampled_from(["a", "bb", "ccc", "d", "", "ee"]),
             min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=20))
def test_rarity_batch_matches_per_row_reference(texts):
    """The vectorized corpus-frequency kernel (prefix-sum segment
    reductions over the concatenated kept-token stream) must equal the
    obvious per-row Python computation on any corpus, including texts
    that are empty or all-separator."""
    import pyarrow as pa

    from collections import Counter

    freq = Counter(t for s in texts for t in s.split(" ") if t)
    vocab = pa.array(list(freq.keys()), pa.string())
    counts = np.asarray(list(freq.values()), np.int64)
    n_tok, sum_f, min_f = textfn.rarity_batch(
        pa.array(texts, pa.string()), vocab, counts)
    for i, s in enumerate(texts):
        toks = [t for t in s.split(" ") if t]
        assert n_tok[i] == len(toks)
        assert sum_f[i] == sum(freq[t] for t in toks)
        assert min_f[i] == (min(freq[t] for t in toks) if toks else 0)


@settings(max_examples=80, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["alpha", "bravo", "charl", "delta",
                                  "echo!", "fox"]),
                 min_size=1, max_size=40).map(" ".join),
        min_size=2, max_size=12),
    t=st.sampled_from([0.7, 0.8, 0.9]))
def test_containment_prefix_selection_recall(texts, t):
    """The pigeonhole bound behind docs_containment_pairs_prefix, as a pure
    kernel property: for ANY pair with shingle containment C(a→b) ≥ t and
    ANY global shingle order (df-ascending used in production, plain hash
    order here — the bound must not depend on the order), the
    ⌊(1-t)·n_windows(a)⌋+1 first shingle hashes of a intersect b's hash
    set.  This is the exact-recall guarantee the candidate stage rides on;
    if it breaks, verified pairs are silently lost."""
    import numpy as np

    from deduplicator_ray.functions.text import char_shingle_hashes
    from deduplicator_ray.pipelines.queries import CONT_K, _shingle_set

    hs = [char_shingle_hashes(x, k=CONT_K).view(np.int64) for x in texts]
    ss = [_shingle_set(x, k=CONT_K) for x in texts]
    for i, (ha, sa) in enumerate(zip(hs, ss)):
        n_windows = max(len(texts[i]) - (CONT_K - 1), 1)
        p = min(int(np.floor((1.0 - t) * n_windows)) + 1, len(ha))
        prefix = set(np.sort(ha)[:p].tolist())  # any global order; sorted = hash order
        for j, (hb, sb) in enumerate(zip(hs, ss)):
            if i == j:
                continue
            if len(sa & sb) / len(sa) >= t:
                assert prefix & set(hb.tolist()), (
                    f"recall hole: pair ({i},{j}) C="
                    f"{len(sa & sb) / len(sa):.3f} missed by prefix")


# --- Gopher repetition kernel vs a per-doc pure-Python reference ----------

_doc_text = st.lists(
    st.lists(st.sampled_from(["a", "bb", "ccc", "Dd", "e", "\ta", "b\r"]),
             min_size=0, max_size=30).map(" ".join),
    min_size=0, max_size=6,
).flatmap(lambda segs: st.sampled_from(["\n", "\n\n"]).map(
    lambda sep: sep.join(segs)))


def _gopher_ref_one(text: str) -> dict:
    """Slow per-doc reference of the documented formulas."""
    import re
    from collections import Counter

    from deduplicator_ray.pipelines.queries import GOPHER_SEG_STRIP

    words = [w for w in re.split(r"\s+", text.lower()) if w]
    W = len(" ".join(words))
    out = {"n_words": len(words)}

    def grams(n):
        return [" ".join(words[i:i + n])
                for i in range(len(words) - n + 1)]

    for n in (2, 3, 4):
        gs = grams(n)
        if not gs or W == 0:
            out[f"top{n}gram_char_frac_e6"] = 0
            continue
        cnt = Counter(gs)
        g = min(sorted(cnt), key=lambda x: (-cnt[x], x))
        out[f"top{n}gram_char_frac_e6"] = cnt[g] * len(g) * 1_000_000 // W
    for n in (5, 6, 7, 8, 9, 10):
        cnt = Counter(grams(n))
        dup = sum(c * len(g) for g, c in cnt.items() if c > 1)
        out[f"dup{n}gram_char_frac_e6"] = dup * 1_000_000 // W if W else 0

    def segs(sep, tag):
        parts = [s for s in (x.strip(GOPHER_SEG_STRIP)
                             for x in text.split(sep)) if s]
        lc = Counter(parts)
        tot = sum(len(x) for x in parts)
        out[f"n_{tag}s"] = len(parts)
        out[f"dup_{tag}_frac_e6"] = ((len(parts) - len(lc)) * 1_000_000
                                     // len(parts) if parts else 0)
        out[f"dup_{tag}_char_frac_e6"] = (
            sum(c * len(x) for x, c in lc.items() if c > 1) * 1_000_000
            // tot if tot else 0)

    segs("\n", "line")
    segs("\n\n", "para")
    return out


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc_text, min_size=1, max_size=8))
def test_gopher_kernel_matches_per_doc_reference(texts):
    import pyarrow as pa

    from deduplicator_ray.pipelines.queries import gopher_repetition_batch

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = gopher_repetition_batch(t).to_pandas().set_index("doc_id")
    for i, text in enumerate(texts):
        want = _gopher_ref_one(text)
        for k, v in want.items():
            assert got.loc[i, k] == v, (k, text)


@settings(max_examples=80, deadline=None)
@given(st.integers(1, 40), st.integers(0, 2**32 - 1))
def test_topk_boundary_equals_full_lexsort(n, seed):
    """Deterministic boundary selection: the near-linear argpartition +
    tie-widening path must equal a full (score DESC, id ASC) lexsort for
    every kk — including heavy integer-score ties at the cutoff."""
    from deduplicator_ray.functions.vector import topk_boundary

    rng = np.random.default_rng(seed)
    scores = rng.integers(0, 5, n)       # small range → ties are routine
    ids = rng.permutation(n).astype(np.int64)
    for kk in (1, n // 2 + 1, n):
        got = topk_boundary(scores, ids, kk)
        want = np.lexsort((ids, -scores))[:kk]
        assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.data_too_large])
@given(data=st.data())
def test_jpeg_decoder_total_on_mutations(data):
    """Web-corpus robustness: ANY truncation or byte corruption of a
    valid jpeg either decodes to an image or raises CodecError — never a
    stray struct/index/value error that would escape the dead-letter
    taxonomy and kill a map_batches task."""
    import numpy as np

    from deduplicator_ray import codecs, jpeg
    from deduplicator_ray.fixtures import _base_image

    img = _base_image(np.random.default_rng([44, 1]))
    blob = bytearray(jpeg.encode_jpeg(img, 80))
    mode = data.draw(st.sampled_from(["truncate", "flip", "splice"]))
    if mode == "truncate":
        cut = data.draw(st.integers(0, len(blob)))
        payload = bytes(blob[:cut])
    elif mode == "flip":
        n = data.draw(st.integers(1, 8))
        for _ in range(n):
            i = data.draw(st.integers(0, len(blob) - 1))
            blob[i] ^= data.draw(st.integers(1, 255))
        payload = bytes(blob)
    else:
        i = data.draw(st.integers(0, len(blob) - 1))
        j = data.draw(st.integers(0, len(blob) - 1))
        payload = bytes(blob[:i] + blob[j:])
    try:
        out = jpeg.decode_jpeg(payload)
        assert out.dtype == np.uint8 and out.ndim == 3
    except codecs.CodecError:
        pass  # the only legal failure


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.data_too_large])
@given(data=st.data())
def test_gif_decoder_total_on_mutations(data):
    """Same totality contract for the gif LZW decoder."""
    import numpy as np

    from deduplicator_ray import codecs
    from deduplicator_ray.fixtures import _indexed_art

    art = _indexed_art(np.random.default_rng([44, 2]))
    frames = [art, art[:, ::-1]]
    blob = bytearray(codecs.encode_gif(frames))
    mode = data.draw(st.sampled_from(["truncate", "flip"]))
    if mode == "truncate":
        payload = bytes(blob[: data.draw(st.integers(0, len(blob)))])
    else:
        for _ in range(data.draw(st.integers(1, 8))):
            i = data.draw(st.integers(0, len(blob) - 1))
            blob[i] ^= data.draw(st.integers(1, 255))
        payload = bytes(blob)
    try:
        out, nf = codecs.decode_gif_first(payload)
        assert out.dtype == np.uint8 and out.ndim == 3 and nf >= 1
    except codecs.CodecError:
        pass


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.data_too_large])
@given(data=st.data())
def test_wav_decoder_total_on_mutations(data):
    """Same totality contract for the wav/audio dispatch."""
    import numpy as np

    from deduplicator_ray import codecs

    s = np.clip(np.random.default_rng(44).standard_normal(2048) * 8000,
                -32000, 32000).astype(np.int16)
    blob = bytearray(codecs.encode_wav(s, 16000))
    mode = data.draw(st.sampled_from(["truncate", "flip"]))
    if mode == "truncate":
        payload = bytes(blob[: data.draw(st.integers(0, len(blob)))])
    else:
        for _ in range(data.draw(st.integers(1, 8))):
            i = data.draw(st.integers(0, len(blob) - 1))
            blob[i] ^= data.draw(st.integers(1, 255))
        payload = bytes(blob)
    try:
        rate, pcm = codecs.decode_audio(payload)
        assert pcm.dtype == np.int16 and rate > 0
    except codecs.CodecError:
        pass
