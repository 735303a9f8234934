"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

One actor-pool stage computes all signals in a single pass (regexes
compiled once per actor in ``__init__``, vectorized pandas string ops
per batch).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# tiny per-language stopword lists (deterministic heuristic language ID)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las"},
    "fr": {"le", "la", "de", "et", "un", "une", "les", "des", "que", "pour"},
    "de": {"der", "die", "das", "und", "ein", "eine", "zu", "von", "mit", "ist"},
}


class TextAnalyzer:
    """Batch -> batch + analysis columns (n_tokens, n_chars_calc,
    alpha_ratio, stopword_ratio, quality, lang_pred, fingerprint)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.token_re = re.compile(r"\S+")
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.alpha_re = re.compile(r"[a-zA-Z]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        n_tokens = np.zeros(n, dtype=np.int64)
        n_chars = np.zeros(n, dtype=np.int64)
        alpha_ratio = np.zeros(n, dtype=np.float64)
        stop_ratio = np.zeros(n, dtype=np.float64)
        langs = []
        fingerprints = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            t = t or ""
            toks = self.token_re.findall(t)
            n_tokens[i] = len(toks)
            n_chars[i] = len(t)
            # ASCII-letter ratio ([a-zA-Z], matching the SQL oracle's
            # regexp_replace semantics)
            alpha_ratio[i] = len(self.alpha_re.findall(t)) / len(t) if t else 0.0
            words = [w.lower() for w in toks]
            lang, sr = self._lang_of(words)
            langs.append(lang)
            stop_ratio[i] = sr
            fingerprints[i] = self._fingerprint(words)
        quality = np.clip(
            0.4 * alpha_ratio
            + 0.3 * np.minimum(n_tokens / 64.0, 1.0)
            + 0.3 * stop_ratio * 4.0,
            0.0,
            1.0,
        )
        out = batch
        for name, arr in [
            ("n_tokens", pa.array(n_tokens)),
            ("n_chars_calc", pa.array(n_chars)),
            ("alpha_ratio", pa.array(alpha_ratio)),
            ("stopword_ratio", pa.array(stop_ratio)),
            ("quality", pa.array(quality)),
            ("lang_pred", pa.array(langs, pa.string())),
            ("fingerprint", pa.array(fingerprints)),
        ]:
            out = out.append_column(name, arr)
        return out

    def _lang_of(self, words):
        if not words:
            return "und", 0.0
        best, best_hits = "und", 0
        for lang, stops in _STOPWORDS.items():
            hits = sum(1 for w in words if w in stops)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best, best_hits / len(words)

    def _fingerprint(self, words, gram: int = 3) -> int:
        """Rolling min-hash over word n-grams (documents sharing phrasing
        collide) — int64."""
        if len(words) < gram:
            basis = " ".join(words)
            return _hash63(basis)
        best = None
        for i in range(len(words) - gram + 1):
            h = _hash63(" ".join(words[i : i + gram]))
            if best is None or h < best:
                best = h
        return best


def _hash63(s: str) -> int:
    """Deterministic 63-bit FNV-1a (stable across processes, unlike
    builtin hash)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


def analyze_documents(docs, *, text_col: str = "text", concurrency: int = 2,
                      batch_size=None):
    return docs.map_batches(
        TextAnalyzer,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
