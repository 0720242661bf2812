"""Text-analysis operators over document corpora (large-scale training-data
pipeline ops): token stats, quality signals, fingerprinting, language-ID.
All are single map_batches passes sharing the engine analyzer — no shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.text.analyzer import Analyzer

STOPWORDS = ("a", "the", "of", "and", "to", "in")


class DocStats:
    """Per-doc token statistics + canonical fingerprint.

    fingerprint = md5 of the normalised token stream joined by single
    spaces — the canonical text identity used by exact dedup; matches
    DuckDB's ``md5(array_to_string(tokens, ' '))`` byte-for-byte.
    """

    def __init__(self) -> None:
        self.an = Analyzer()
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        n_tokens = np.zeros(n, dtype=np.int64)
        n_uniq = np.zeros(n, dtype=np.int64)
        stop_count = np.zeros(n, dtype=np.int64)
        sum_token_len = np.zeros(n, dtype=np.int64)
        fingerprints = []
        for i, t in enumerate(texts):
            toks = self.an.tokens(t or "")
            n_tokens[i] = len(toks)
            n_uniq[i] = len(set(toks))
            stop_count[i] = sum(1 for x in toks if x in self.stop)
            sum_token_len[i] = sum(len(x) for x in toks)
            fingerprints.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens),
                "n_uniq_tokens": pa.array(n_uniq),
                "stop_count": pa.array(stop_count),
                "sum_token_len": pa.array(sum_token_len),
                "fingerprint": pa.array(fingerprints, type=pa.string()),
            }
        )


def doc_stats(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(DocStats, batch_format="pyarrow", zero_copy_batch=True,
                         concurrency=(1, 4)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


class LangId:
    """Character-trigram language-ID heuristic (actor-pool stage: profiles
    built once per actor in __init__). The fixture corpus shares one
    vocabulary across lang labels, so this demonstrates the op (profile
    build, cosine over trigram counts) rather than real discrimination; no
    SQL oracle (rows-only check)."""

    def __init__(self, profiles: dict[str, dict[str, float]]):
        self.profiles = {
            lang: (list(p.keys()), np.array(list(p.values())))
            for lang, p in profiles.items()
        }

    @staticmethod
    def trigrams(text: str) -> dict[str, int]:
        s = " " + "".join(c if c.isalnum() else " " for c in text.lower()) + " "
        out: dict[str, int] = {}
        for i in range(len(s) - 2):
            g = s[i : i + 3]
            out[g] = out.get(g, 0) + 1
        return out

    @classmethod
    def build_profiles(cls, texts_by_lang: dict[str, list[str]], top: int = 300):
        profiles = {}
        for lang, texts in texts_by_lang.items():
            counts: dict[str, int] = {}
            for t in texts:
                for g, c in cls.trigrams(t).items():
                    counts[g] = counts.get(g, 0) + c
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
            tot = sum(c for _, c in best) or 1
            profiles[lang] = {g: c / tot for g, c in best}
        return profiles

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, confs = [], []
        for text in batch["text"].to_pylist():
            tg = self.trigrams(text or "")
            norm = np.sqrt(sum(v * v for v in tg.values())) or 1.0
            best_lang, best_sim = "und", -1.0
            for lang, (grams, weights) in self.profiles.items():
                dot = sum(tg.get(g, 0) * w for g, w in zip(grams, weights))
                pnorm = np.sqrt((weights**2).sum()) or 1.0
                sim = dot / (norm * pnorm)
                if sim > best_sim:
                    best_lang, best_sim = lang, sim
            preds.append(best_lang)
            confs.append(round(float(best_sim), 6))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(preds, type=pa.string()),
                "confidence": pa.array(confs, type=pa.float64()),
            }
        )


def lang_id(sf_dir: str, sample_per_lang: int = 20):
    """Two-phase: small driver-side sample builds profiles (broadcast via
    fn_constructor_kwargs), actor pool classifies the stream."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    sample = ds.limit(sample_per_lang * 10).to_pandas()
    by_lang: dict[str, list[str]] = {}
    for lang, text in zip(sample["lang"], sample["text"]):
        by_lang.setdefault(lang, [])
        if len(by_lang[lang]) < sample_per_lang:
            by_lang[lang].append(text)
    profiles = LangId.build_profiles(by_lang)
    out = ds.map_batches(
        LangId,
        fn_constructor_kwargs={"profiles": profiles},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def quality(sf_dir: str):
    """Per-doc quality signals (the ratios a training-data filter thresholds
    on): stopword ratio, unique-token ratio, mean token length — micro-fixed
    ints so the SQL oracle reproduces them bit-exactly. Derived from the
    same single DocStats pass as doc_stats (no second tokenize)."""
    import numpy as np
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(DocStats, batch_format="pyarrow", zero_copy_batch=True,
                         concurrency=(1, 4)).to_pandas()
    n = out["n_tokens"].to_numpy().astype(np.float64)
    safe = np.maximum(n, 1.0)
    out["stop_ratio_micro"] = np.floor(out["stop_count"].to_numpy() / safe * 1e6 + 0.5).astype(np.int64)
    out["uniq_ratio_micro"] = np.floor(out["n_uniq_tokens"].to_numpy() / safe * 1e6 + 0.5).astype(np.int64)
    out["mean_token_len_micro"] = np.floor(out["sum_token_len"].to_numpy() / safe * 1e6 + 0.5).astype(np.int64)
    cols = ["doc_id", "n_tokens", "stop_ratio_micro", "uniq_ratio_micro", "mean_token_len_micro"]
    return out[cols].sort_values("doc_id").reset_index(drop=True)


# BPE-ish pre-tokenizer: letter runs / digit runs / punctuation runs, each
# with an optional leading space (the GPT-2 pattern family minus the
# lookahead RE2 can't express — DuckDB's regexp_extract_all must count the
# SAME tokens, verified exact at sf0.01). Whitespace is the EXPLICIT ASCII
# class, never \s: Python re's \s is Unicode-wide (NBSP, U+2028, ...) while
# DuckDB RE2's \s is ASCII-only, so \s would silently break parity on any
# document containing non-ASCII whitespace.
_WS = r" \t\n\r\f\v"
BPE_PATTERN = rf" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9{_WS}]+|[{_WS}]+"
WS_PATTERN = rf"[{_WS}]+"


class TokenCounter:
    """Per-doc token counts under two tokenizers a data pipeline budgets
    with: whitespace words and the BPE-ish regex above. Patterns compile
    once per actor (__init__), count per batch (__call__)."""

    def __init__(self) -> None:
        import re

        self.bpe = re.compile(BPE_PATTERN)
        self.ws = re.compile(WS_PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        n_ws = np.zeros(n, dtype=np.int64)
        n_bpe = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            t = t or ""
            n_ws[i] = sum(1 for x in self.ws.split(t) if x)
            n_bpe[i] = len(self.bpe.findall(t))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": pa.array(n_ws),
                "n_bpe_tokens": pa.array(n_bpe),
            }
        )


def token_count(sf_dir: str):
    """doc_id, n_ws_tokens, n_bpe_tokens for every document."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(
        TokenCounter, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4)
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "n_ws_tokens": "int64", "n_bpe_tokens": "int64"}
    )


class _CorpusPartial:
    """Per-batch pre-aggregation for corpus_stats: tokenize (Arrow kernels)
    then collapse the batch to one row per (lang, source) — only tiny
    partials reach the groupby shuffle."""

    def __init__(self) -> None:
        self.an = Analyzer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        _flat, dl = self.an.tokenize_arrow(batch["text"])
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pandas(),
                "source": batch["source"].to_pandas(),
                "n_tokens": dl.astype(np.int64),
                "n_chars": batch["n_chars"].to_numpy(),
            }
        )
        g = df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_tokens", "size"),
            sum_tokens=("n_tokens", "sum"),
            sum_chars=("n_chars", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)


def corpus_stats(sf_dir: str) -> pd.DataFrame:
    """Corpus accounting per (lang, source): doc count, analyzer-token sum,
    char sum — the numbers a training-data curation budget is written in.
    Partial-aggregate inside map_batches, then a small groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from engine.core.context import ensure_hash_shuffle

    ensure_hash_shuffle()
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "lang", "source", "n_chars"]
    )
    out = (
        ds.map_batches(_CorpusPartial, batch_format="pyarrow", zero_copy_batch=True,
                       concurrency=(1, 4))
        .groupby(["lang", "source"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_tokens", alias_name="sum_tokens"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
        .to_pandas()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    return out.astype({"n_docs": "int64", "sum_tokens": "int64", "sum_chars": "int64"})
