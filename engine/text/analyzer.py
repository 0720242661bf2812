"""The analyzer: normalise + tokenize turn text (SURVEY.md §2.2-M1/M2).

RANK-IDENTITY PRECONDITION: the engine, the pure-Python oracle
(engine/oracle/bm25.py) and the DuckDB SQL oracle (__ray_entry__.oracle_sql)
must tokenize IDENTICALLY, or BM25 scores cannot be rank-identical
(BASELINE.json:14). The shared definition is:

    tokens(text) = [t for t in split(lower(text), NON_ALNUM) if t != ""]

i.e. casefold via simple lowercasing, then maximal runs of ``[a-z0-9]`` —
exactly ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` minus empty
strings in DuckDB. Unicode NFKC normalisation is deliberately NOT applied:
DuckDB's lower() and Python's str.lower() agree on the ASCII range, and
(after the single-codepoint U+0130 fix below — see _SIMPLE_LOWER_FIX) no
other codepoint lowercases into the token alphabet differently across the
three implementations, so they agree byte-for-byte on arbitrary UTF-8
input (full-scan evidence at _SIMPLE_LOWER_FIX; property test in
tests/test_core.py).

Analyzers are pluggable (SURVEY.md §2.10): register a named Analyzer class;
expensive analyzers run as actor pools via map_batches(cls, concurrency=N).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")
# Python str.lower() implements FULL Unicode lowercasing: U+0130 ('İ') →
# 'i' + U+0307 (combining dot above), whose combining mark SPLITS the token
# ('İstanbul' → ['i', 'stanbul']). Arrow's utf8_lower and DuckDB's lower()
# both use utf8proc SIMPLE lowercasing ('İ' → 'i', one codepoint,
# 'İstanbul' → ['istanbul']). A full scan of every printable codepoint
# (U+0020..U+2FFFF, embedded mid-token) found U+0130 to be the ONLY
# codepoint where the three tokenizations diverge — pre-mapping it restores
# byte-for-byte agreement between the build path (tokenize_arrow), the
# query/oracle path (tokens) and the SQL oracle.
_SIMPLE_LOWER_FIX = {0x130: "i"}
# SQL fragment producing the identical token list for a text column `t`:
SQL_TOKENS = "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"


class Analyzer:
    """Default analyzer. Stateless; regex precompiled at import.

    Plugin contract (SURVEY.md §2.10): subclass and override ``tokens``;
    register with ``register_analyzer(name, cls, expensive=False)``.
    """

    name = "default"

    def tokens(self, text: str) -> list[str]:
        return TOKEN_RE.findall(text.translate(_SIMPLE_LOWER_FIX).lower())

    # -- vectorised batch paths ----------------------------------------------
    def tokenize_arrow(self, texts: pa.ChunkedArray | pa.Array | list[str]):
        """texts → (flat_tokens: pa.Array[large_string], dl: np.ndarray[int32]).

        The build hot path: lowercase + regex-split + flatten run entirely in
        Arrow C++ kernels (GIL-free, no per-token Python objects — measured
        ~11x faster per core than the findall loop and it scales across
        cores, which the object-allocating loop does not). Produces the
        IDENTICAL token stream to ``tokens()``: split on non-[a-z0-9] runs,
        empties dropped.

        Subclasses that override ``tokens`` automatically fall back to the
        per-row path so plugin analyzers stay correct without implementing a
        vectorised variant.
        """
        import pyarrow.compute as pc

        if type(self).tokens is not Analyzer.tokens:
            flat_obj, dl = self._tokenize_rows(texts)
            return pa.array(flat_obj, type=pa.large_string()), dl
        if isinstance(texts, list):
            texts = pa.array(texts, type=pa.large_string())
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        low = pc.utf8_lower(pc.coalesce(texts, ""))
        toks = pc.split_pattern_regex(low, "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        n = len(texts)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not nonempty.all():
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)[nonempty]
            flat = flat.filter(pa.array(nonempty))
            dl = np.bincount(doc_idx, minlength=n).astype(np.int32)
        else:
            dl = lens.astype(np.int32)
        return flat, dl

    def _tokenize_rows(self, texts):
        """Per-row fallback honouring a subclass's ``tokens`` override."""
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        tokens = self.tokens
        per_doc = [tokens(t) if t is not None else [] for t in texts]
        dl = np.fromiter((len(p) for p in per_doc), dtype=np.int32, count=len(per_doc))
        total = int(dl.sum())
        flat = np.empty(total, dtype=object)
        pos = 0
        for p in per_doc:
            k = len(p)
            flat[pos : pos + k] = p
            pos += k
        return flat, dl

    def tokenize_batch(self, texts: pa.ChunkedArray | pa.Array | list[str]):
        """texts → (flat_tokens: np.ndarray[object], doc_lengths: np.ndarray[int32]).

        Object-array variant kept for callers that index tokens with NumPy
        fancy indexing (sketch, textstats); the build path uses
        ``tokenize_arrow``.
        """
        flat, dl = self.tokenize_arrow(texts)
        if isinstance(flat, pa.Array):
            flat = np.asarray(flat.to_pandas(), dtype=object)
        return flat, dl


class NFKCAnalyzer(Analyzer):
    """Opt-in Unicode analyzer (SURVEY.md §2.3-F1): NFKC-normalize +
    casefold before the token grammar, so full-width/compatibility forms
    ('ｈａｓｈ', 'ﬁle', 'Ⅻ') tokenize like their ASCII equivalents and
    non-ASCII letters casefold correctly. NOT the default: DuckDB has no
    NFKC, so an index built with this analyzer trades the SQL-oracle parity
    contract for Unicode robustness (the pure-Python oracle still applies —
    pass the same analyzer to it)."""

    name = "nfkc"

    # token grammar widens to any alnum run AFTER NFKC+casefold
    _RE = re.compile(r"[^\W_]+", re.UNICODE)

    def tokens(self, text: str) -> list[str]:
        import unicodedata

        return self._RE.findall(unicodedata.normalize("NFKC", text).casefold())


class EdgeNGramAnalyzer(Analyzer):
    """Edge-n-gram analyzer (ES `edge_ngram` token filter): every base
    token (default grammar) additionally emits its prefixes of length
    MIN_GRAM..min(len, MAX_GRAM) — the index-native autocomplete path,
    where a prefix lookup is an exact term match instead of a dictionary
    scan. Base tokens shorter than MIN_GRAM emit nothing (ES default).

    The vectorized path reorders grams doc-grouped (g-major within a doc),
    NOT text-order — tf/df/dl are order-invariant, which is all this
    index family serves; positional artifacts should not be built with
    this analyzer."""

    name = "edge_ngram"
    MIN_GRAM = 2
    MAX_GRAM = 8

    def __init__(self):
        self._base = Analyzer()

    def tokens(self, text: str) -> list[str]:
        out: list[str] = []
        for t in self._base.tokens(text):
            for g in range(self.MIN_GRAM, min(len(t), self.MAX_GRAM) + 1):
                out.append(t[:g])
        return out

    def tokenize_arrow(self, texts):
        import pyarrow.compute as pc

        base, dl = self._base.tokenize_arrow(texts)
        n = int(dl.size)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), dl.astype(np.int64))
        # token grammar is [a-z0-9]+ → 1 byte per codeunit, length is cheap
        lens = pc.utf8_length(base).to_numpy(zero_copy_only=False)
        gram_parts, doc_parts = [], []
        for g in range(self.MIN_GRAM, self.MAX_GRAM + 1):
            mask = lens >= g
            if not mask.any():
                break
            sel = pa.array(mask)
            gram_parts.append(pc.utf8_slice_codeunits(base.filter(sel), 0, g))
            doc_parts.append(doc_of[mask])
        if not gram_parts:
            return pa.array([], type=pa.large_string()), np.zeros(n, dtype=np.int32)
        docs_all = np.concatenate(doc_parts)
        grams_all = pa.concat_arrays([a.cast(pa.large_string()) for a in gram_parts])
        order = np.argsort(docs_all, kind="stable")  # doc-grouped stream
        flat = grams_all.take(pa.array(order))
        out_dl = np.bincount(docs_all, minlength=n).astype(np.int32)
        return flat, out_dl


class SStemAnalyzer(Analyzer):
    """S-stemmer analyzer (Harman 1991, "How effective is suffixing?"):
    after the default grammar, each token passes ONE ladder — the first
    suffix form that applies decides, exceptions leave the token unchanged:

      ends 'ies' (len > 3, not 'eies'/'aies')  → strip 'ies', add 'y'
      else ends 'es' (len > 3, not 'aes'/'ees'/'oes') → strip final 's'
      else ends 's' (len > 2, not 'us'/'ss')   → strip final 's'

    The mildest published English stemmer — conflates regular plurals
    ('queries'→'query', 'joins'→'join', 'values'→'value') without
    Porter's aggressive derivational folding. The ladder is a pure
    suffix-form CASE, so DuckDB replays it exactly (the SQL-parity rule
    NFKC deliberately trades away)."""

    name = "sstem"

    @staticmethod
    def _stem_one(t: str) -> str:
        if t.endswith("ies"):
            if len(t) <= 3 or t.endswith(("eies", "aies")):
                return t
            return t[:-3] + "y"
        if t.endswith("es"):
            if len(t) <= 3 or t.endswith(("aes", "ees", "oes")):
                return t
            return t[:-1]
        if t.endswith("s"):
            if len(t) <= 2 or t.endswith(("us", "ss")):
                return t
            return t[:-1]
        return t

    def tokens(self, text: str) -> list[str]:
        return [self._stem_one(t) for t in super().tokens(text)]

    def tokenize_arrow(self, texts):
        import pandas as pd

        flat, dl = super().tokenize_arrow(texts)
        if len(flat) == 0:
            return flat, dl
        s = pd.Series(np.asarray(flat.to_pandas(), dtype=object), dtype=object).astype(str)
        ln = s.str.len()
        c1 = s.str.endswith("ies")
        m1 = c1 & (ln > 3) & ~(s.str.endswith("eies") | s.str.endswith("aies"))
        c2 = ~c1 & s.str.endswith("es")
        m2 = c2 & (ln > 3) & ~(s.str.endswith(("aes", "ees", "oes")))
        c3 = ~c1 & ~c2 & s.str.endswith("s")
        m3 = c3 & (ln > 2) & ~(s.str.endswith(("us", "ss")))
        out = s.copy()
        out[m1] = s[m1].str[:-3] + "y"
        out[m2] = s[m2].str[:-1]
        out[m3] = s[m3].str[:-1]
        return pa.array(out.to_numpy(dtype=object), type=pa.large_string()), dl


#: Lucene's classic 33-word English stopword set (StandardAnalyzer /
#: EnglishAnalyzer default) — the day-one stopword list, mirrored verbatim
#: in the ft_bm25_stopword SQL oracle.
ENGLISH_STOPWORDS = frozenset((
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
))


class StopwordAnalyzer(Analyzer):
    """Stopword-filtering analyzer (Lucene StandardAnalyzer's English stop
    set): the default grammar, then drop every stopword. Stopwords vanish
    from BOTH documents and queries (analyzer symmetry), so dl/avgdl/df
    are computed over content terms only — exactly the Lucene field
    behavior. SQL-replayable: the oracle filters the same list from its
    token CTE."""

    name = "stopword"

    def tokens(self, text: str) -> list[str]:
        return [t for t in super().tokens(text) if t not in ENGLISH_STOPWORDS]

    def tokenize_arrow(self, texts):
        import pyarrow.compute as pc

        flat, dl = super().tokenize_arrow(texts)
        if len(flat) == 0:
            return flat, dl
        stop = pa.array(sorted(ENGLISH_STOPWORDS), type=flat.type)
        keep = pc.invert(pc.is_in(flat, value_set=stop))
        doc_of = np.repeat(np.arange(dl.size, dtype=np.int64),
                           dl.astype(np.int64))
        kept_docs = doc_of[keep.to_numpy(zero_copy_only=False)]
        out_dl = np.bincount(kept_docs, minlength=dl.size).astype(np.int32)
        return flat.filter(keep), out_dl


class PorterAnalyzer(Analyzer):
    """Porter stemmer analyzer (Porter 1980, "An algorithm for suffix
    stripping" — the classic 5-step rule cascade; public algorithm).
    Derivational English folding beyond the S-stemmer: 'connection' /
    'connected' / 'connecting' all index as 'connect'. DuckDB cannot
    replay Porter, so like NFKC this plugin trades the SQL-oracle parity
    contract for recall; correctness is proven by the published test
    vectors plus a build/query rank-identity test against the pure-Python
    oracle under the same analyzer (the NFKC pattern). Distinct tokens
    stem once per batch via a per-instance cache — the stemmer is
    per-DISTINCT-term work, not per-occurrence."""

    name = "porter"
    _VOWELS = "aeiou"

    def __init__(self):
        self._cache: dict[str, str] = {}

    # --- classic helpers ------------------------------------------------
    @classmethod
    def _cons(cls, w: str, i: int) -> bool:
        c = w[i]
        if c in cls._VOWELS:
            return False
        if c == "y":
            return i == 0 or not cls._cons(w, i - 1)
        return True

    @classmethod
    def _m(cls, w: str) -> int:
        """Number of VC sequences in w."""
        forms = []
        for i in range(len(w)):
            forms.append("c" if cls._cons(w, i) else "v")
        return "".join(forms).count("vc")

    @classmethod
    def _has_vowel(cls, w: str) -> bool:
        return any(not cls._cons(w, i) for i in range(len(w)))

    @classmethod
    def _double_cons(cls, w: str) -> bool:
        return len(w) >= 2 and w[-1] == w[-2] and cls._cons(w, len(w) - 1)

    @classmethod
    def _cvc(cls, w: str) -> bool:
        if len(w) < 3:
            return False
        return (cls._cons(w, len(w) - 3) and not cls._cons(w, len(w) - 2)
                and cls._cons(w, len(w) - 1) and w[-1] not in "wxy")

    @classmethod
    def _stem_one(cls, w: str) -> str:
        if len(w) <= 2:
            return w
        # step 1a
        if w.endswith("sses"):
            w = w[:-2]
        elif w.endswith("ies"):
            w = w[:-2]
        elif w.endswith("ss"):
            pass
        elif w.endswith("s"):
            w = w[:-1]
        # step 1b
        flag = False
        if w.endswith("eed"):
            if cls._m(w[:-3]) > 0:
                w = w[:-1]
        elif w.endswith("ed"):
            if cls._has_vowel(w[:-2]):
                w = w[:-2]
                flag = True
        elif w.endswith("ing"):
            if cls._has_vowel(w[:-3]):
                w = w[:-3]
                flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif cls._double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif cls._m(w) == 1 and cls._cvc(w):
                w += "e"
        # step 1c
        if w.endswith("y") and cls._has_vowel(w[:-1]):
            w = w[:-1] + "i"
        # step 2
        for suf, rep in (("ational", "ate"), ("tional", "tion"),
                         ("enci", "ence"), ("anci", "ance"), ("izer", "ize"),
                         ("abli", "able"), ("alli", "al"), ("entli", "ent"),
                         ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
                         ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
                         ("iveness", "ive"), ("fulness", "ful"),
                         ("ousness", "ous"), ("aliti", "al"),
                         ("iviti", "ive"), ("biliti", "ble")):
            if w.endswith(suf):
                if cls._m(w[: -len(suf)]) > 0:
                    w = w[: -len(suf)] + rep
                break
        # step 3
        for suf, rep in (("icate", "ic"), ("ative", ""), ("alize", "al"),
                         ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
                         ("ness", "")):
            if w.endswith(suf):
                if cls._m(w[: -len(suf)]) > 0:
                    w = w[: -len(suf)] + rep
                break
        # step 4
        for suf in ("al", "ance", "ence", "er", "ic", "able", "ible",
                    "ant", "ement", "ment", "ent", "ion", "ou", "ism",
                    "ate", "iti", "ous", "ive", "ize"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if cls._m(stem) > 1:
                    if suf == "ion" and (not stem or stem[-1] not in "st"):
                        break
                    w = stem
                break
        # step 5a
        if w.endswith("e"):
            m = cls._m(w[:-1])
            if m > 1 or (m == 1 and not cls._cvc(w[:-1])):
                w = w[:-1]
        # step 5b
        if cls._m(w) > 1 and cls._double_cons(w) and w.endswith("l"):
            w = w[:-1]
        return w

    def _stem(self, t: str) -> str:
        s = self._cache.get(t)
        if s is None:
            s = self._stem_one(t)
            self._cache[t] = s
        return s

    def tokens(self, text: str) -> list[str]:
        return [self._stem(t) for t in super().tokens(text)]

    def tokenize_arrow(self, texts):
        import pandas as pd

        flat, dl = super().tokenize_arrow(texts)
        if len(flat) == 0:
            return flat, dl
        s = pd.Series(np.asarray(flat.to_pandas(), dtype=object))
        # stem each DISTINCT token once, then broadcast back
        uniq = pd.unique(s)
        lut = {t: self._stem(str(t)) for t in uniq}
        out = s.map(lut)
        return pa.array(out.to_numpy(dtype=object), type=pa.large_string()), dl


_REGISTRY: dict[str, tuple[type, bool]] = {
    "default": (Analyzer, False),
    "nfkc": (NFKCAnalyzer, False),
    "edge_ngram": (EdgeNGramAnalyzer, False),
    "sstem": (SStemAnalyzer, False),
    "stopword": (StopwordAnalyzer, False),
    "porter": (PorterAnalyzer, False),
}


def register_analyzer(name: str, cls: type, *, expensive: bool = False) -> None:
    _REGISTRY[name] = (cls, expensive)


def get_analyzer(name: str = "default") -> Analyzer:
    cls, _ = _REGISTRY[name]
    return cls()


def resolve_analyzer(spec) -> Analyzer:
    """name (registry, driver-side) | Analyzer subclass | instance →
    instance. Build/query stages resolve in the DRIVER and ship the class or
    instance to workers via constructor kwargs — the registry is
    process-local and does not exist inside Ray workers."""
    if isinstance(spec, str):
        return get_analyzer(spec)
    if isinstance(spec, type):
        return spec()
    return spec


def analyzer_class(name: str) -> type:
    return _REGISTRY[name][0]


def analyzer_is_expensive(name: str) -> bool:
    return _REGISTRY[name][1]
