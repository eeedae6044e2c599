"""Text kernels: shingles, MinHash, SimHash, and text-analysis features.

The reference has no caption/text analog (its similarity is image-hash
equality, /root/reference/dupedb.py:85-86); these kernels implement the
graft's axis-B extensions — MinHash over character k-shingles with LSH
banding, SimHash over whitespace tokens, n-gram Jaccard — plus the
training-data-pipeline text analysis ops (language-ID heuristic, quality
scoring, token counting, rolling-hash fingerprinting).

All kernels are batch-vectorized numpy over uint64 mod-2^64 arithmetic
(multiply-shift universal hashing — public-domain technique) so they run
inside ``map_batches`` without per-row Python in the hot loop beyond the
unavoidable per-string byte view.
"""

from __future__ import annotations

import re

import numpy as np

_B = np.uint64(1099511628211)  # FNV-64 prime as polynomial base
_SEED_A = 0x9E3779B97F4A7C15


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)  # odd
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    return _PERM_CACHE[key]


def _poly_hash_windows(codes: np.ndarray, k: int) -> np.ndarray:
    """uint64 polynomial hashes of all length-k windows of a byte-code array."""
    if len(codes) < k:
        codes = np.pad(codes, (0, k - len(codes)), constant_values=0)
    win = np.lib.stride_tricks.sliding_window_view(codes, k).astype(np.uint64)
    powers = np.empty(k, np.uint64)
    p = 1  # Python int: wraparound applied explicitly (no numpy overflow warning)
    for i in range(k - 1, -1, -1):
        powers[i] = np.uint64(p)
        p = (p * int(_B)) & 0xFFFFFFFFFFFFFFFF
    with np.errstate(over="ignore"):
        return (win * powers[None, :]).sum(axis=1, dtype=np.uint64)


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct uint64 hashes of the character k-shingles of ``text``."""
    codes = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return np.unique(_poly_hash_windows(codes, k))


_POW_CACHE: dict[int, np.ndarray] = {}


def _powers(n: int) -> np.ndarray:
    """[B^(n-1), ..., B, 1] mod 2^64."""
    if n not in _POW_CACHE:
        p = np.empty(n, np.uint64)
        acc = np.uint64(1)
        with np.errstate(over="ignore"):
            for i in range(n - 1, -1, -1):
                p[i] = acc
                acc = acc * _B
        _POW_CACHE[n] = p
    return _POW_CACHE[n]


def _poly_hash_one(data: bytes) -> np.uint64:
    """seed*B^n + Σ byte_i * B^(n-1-i), fully vectorized over the bytes."""
    n = len(data)
    if n == 0:
        return np.uint64(_SEED_A)
    codes = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    pw = _powers(n)
    with np.errstate(over="ignore"):
        seed_term = np.uint64(_SEED_A) * (pw[0] * _B)
        return seed_term + np.dot(codes, pw).astype(np.uint64)


def hash_tokens(tokens: list[str]) -> np.ndarray:
    """uint64 hash per token (polynomial over utf-8 bytes; numpy-vectorized
    per string — no per-byte Python)."""
    out = np.empty(len(tokens), np.uint64)
    for i, t in enumerate(tokens):
        out[i] = _poly_hash_one(t.encode("utf-8"))
    return out


def hash_strings_u64(strs: list[str]) -> np.ndarray:
    """Vectorized-ish uint64 hash per string (used for id→node keys)."""
    return hash_tokens(strs)


# ---------------------------------------------------------------------------
# MinHash


def minhash_signature(text: str, k: int = 5, num_perm: int = 128, seed: int = 7) -> np.ndarray:
    sh = char_shingle_hashes(text, k)
    if len(sh) == 0:
        return np.zeros(num_perm, np.uint64)
    a, b = perm_params(num_perm, seed)
    with np.errstate(over="ignore"):
        m = (sh[None, :] * a[:, None] + b[:, None]).min(axis=1)
    return m


def minhash_batch(texts, k: int = 5, num_perm: int = 128, seed: int = 7) -> np.ndarray:
    out = np.empty((len(texts), num_perm), np.uint64)
    for i, t in enumerate(texts):
        out[i] = minhash_signature(str(t), k, num_perm, seed)
    return out


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def est_jaccard_rows(sigs_a: np.ndarray, sigs_b: np.ndarray) -> np.ndarray:
    """Row-wise Jaccard estimate between two (n, num_perm) signature blocks."""
    return (sigs_a == sigs_b).mean(axis=1)


def exact_jaccard_char_shingles(a: str, b: str, k: int = 5) -> float:
    """Exact n-gram (character k-shingle) Jaccard — the verify-stage ground
    metric the MinHash estimates."""
    sa, sb = char_shingle_hashes(a, k), char_shingle_hashes(b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True)
    return len(inter) / (len(sa) + len(sb) - len(inter))


def band_keys(sigs: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n, bands) int64 LSH band keys: polynomial combine of each band's rows.

    Key space is 64-bit so band-key collisions are negligible; the groupby
    key downstream is (band_idx, band_key).
    """
    n, num_perm = sigs.shape
    assert bands * rows_per_band == num_perm
    r = sigs.reshape(n, bands, rows_per_band)
    out = np.full((n, bands), _SEED_A, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(rows_per_band):
            out = out * _B + r[:, :, j]
    return out.view(np.int64)


# ---------------------------------------------------------------------------
# SimHash


def simhash_batch(texts, seed: int = 7) -> np.ndarray:
    """64-bit SimHash over whitespace tokens; returned as int64 (Arrow-friendly)."""
    bit_idx = np.arange(64, dtype=np.uint64)
    out = np.empty(len(texts), np.uint64)
    for i, t in enumerate(texts):
        toks = str(t).split()
        if not toks:
            out[i] = 0
            continue
        th = hash_tokens(toks)
        bits = ((th[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int32)
        v = (bits * 2 - 1).sum(axis=0)
        bitvec = (v > 0).astype(np.uint64)
        with np.errstate(over="ignore"):
            out[i] = (bitvec << bit_idx).sum(dtype=np.uint64)
    return out.view(np.int64)


# ---------------------------------------------------------------------------
# Text analysis (training-data pipeline ops; SQL-mirrorable on purpose so the
# DuckDB oracle can check them value-for-value)

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "on", "for", "with")

# language marker substrings — a deterministic n-gram-count heuristic; scored
# langs in fixed priority order for tie-breaking (mirrors the CASE chain in
# the SQL oracle).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing"),
    "de": ("der", "und", "sch"),
    "fr": ("les", "que", "eur"),
    "es": ("los", "que", "cion"),
    "zh": ("de", "shi", "zhong"),
}
LANG_ORDER = ("en", "de", "fr", "es", "zh")

_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_NON_ALNUM_SPACE = re.compile(r"[^a-zA-Z0-9 ]")


def token_count_ws(text: str) -> int:
    """Whitespace token count (SQL mirror: length(regexp_split_to_array(trim(text), '\\s+')))."""
    return len(text.split())


def token_count_bpe(text: str) -> int:
    """BPE-ish token count: alpha runs + digit runs + single punctuation."""
    return len(_BPE_RE.findall(text))


def punct_count(text: str) -> int:
    return len(_NON_ALNUM_SPACE.findall(text))


def lang_scores(text: str) -> dict[str, int]:
    return {lang: sum(text.count(m) for m in markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(text: str) -> str:
    scores = lang_scores(text)
    best = LANG_ORDER[0]
    for lang in LANG_ORDER:
        if scores[lang] > scores[best]:
            best = lang
    return best


def quality_features(text: str) -> dict[str, float]:
    toks = text.split()
    n_tok = len(toks)
    n = len(text)
    stop = sum(1 for t in toks if t in STOPWORDS)
    return {
        "n_chars": float(n),
        "n_tokens": float(n_tok),
        "mean_token_len": (sum(len(t) for t in toks) / n_tok) if n_tok else 0.0,
        "punct_ratio": (punct_count(text) / n) if n else 0.0,
        "stopword_ratio": (stop / n_tok) if n_tok else 0.0,
    }


def rolling_fingerprint(text: str, k: int = 8, keep: int = 4) -> int:
    """Document fingerprint: winnowing-style — the min ``keep`` rolling-hash
    values of character k-grams combined into one int64 (public winnowing
    scheme, Schleimer et al. 2003)."""
    codes = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    h = _poly_hash_windows(codes, k)
    sel = np.sort(h)[:keep]
    acc = np.uint64(_SEED_A)
    with np.errstate(over="ignore"):
        for v in sel:
            acc = acc * _B + v
    u = int(acc)
    return u - (1 << 64) if u >= (1 << 63) else u
