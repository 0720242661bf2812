"""HTML → text extraction (the crawler parse stage, SURVEY §0: the
reference is a crawl pipeline whose sources are fetched pages — this op is
that stage's graft-cell re-targeting to a batch corpus).

The extraction CONTRACT is a fixed, SQL-replayable rule chain (documented
here, mirrored verbatim in the oracle — DuckDB RE2 and Python ``re`` agree
on this regex subset):

1. drop ``(?s)<script...</script>`` and ``(?s)<style...</style>`` blocks
   (non-greedy, dot-matches-newline)
2. ``n_links`` = occurrences of ``<a `` BEFORE tag stripping (the
   boilerplate-detection signal: link-heavy pages are navigation chrome)
3. strip every remaining tag ``<[^>]*>`` → one space
4. decode the fixed entity set, ``&amp;`` LAST (the classic double-decode
   pitfall): ``&lt; &gt; &quot; &#39; &nbsp; &amp;``
5. collapse whitespace runs to single spaces and trim

Outputs per doc: extracted-text length, link count, the link-density
micro ratio (links·1e6 // max(n_chars_text, 1)) and md5(text) — the
value-hash contract, so the oracle proves the EXTRACTED BYTES, not just
counts.

The HTML fixture corpus is materialized deterministically from the
documents table (tags, per-doc link wrapping of every 7th token, a
script/style block and entities injected) — parquet on disk, read by BOTH
the engine and the SQL oracle (the tr_bm25_oracle materialization
pattern). Scale shape: extraction is ONE shuffle-free vectorized
map_batches pass (compiled-regex pandas str ops); at 100 TB it is the
canonical "parse" stage between fetch and index, streaming block by
block with nothing on the driver.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

HTML_ROOT = "/tmp/engine_html"

#: (pattern, replacement) applied in order — step 4's entity chain;
#: &amp; deliberately last
ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def html_corpus_path(sf_dir: str) -> str:
    """Materialize (idempotent, atomic) the HTML-wrapped documents corpus:
    every 7th token becomes a link, plus title/heading chrome, a script
    and style block, and encoded entities in a trailing footer. Pure
    pyarrow — callable from oracle_sql() without a Ray session."""
    import pyarrow.parquet as pq

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    key = hashlib.md5(
        f"html|{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}|v2".encode()
    ).hexdigest()[:10]
    path = os.path.join(HTML_ROOT, f"docs-{key}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(HTML_ROOT, exist_ok=True)
    t = pq.read_table(src, columns=["doc_id", "text"])
    htmls = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = (text or "").split()
        body = " ".join(
            f'<a href="http://host{(int(doc_id) + i) % 5}.example.com/'
            f'{doc_id}/{i}">{w}</a>'
            if i % 7 == 3 else w
            for i, w in enumerate(toks)
        )
        htmls.append(
            f"<html><head><title>doc {doc_id}</title>"
            f"<style>body {{ margin: 0; }}</style>"
            f"<script>var doc = {doc_id};</script></head>"
            f"<body><h1>Doc {doc_id}</h1><p>{body}</p>"
            f"<footer>copy &amp; paste &lt;ok&gt; &quot;quoted&quot;"
            f" it&#39;s&nbsp;fine</footer></body></html>"
        )
    out = pa.table({"doc_id": t["doc_id"], "html": pa.array(htmls, pa.string())})
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    return path


_SCRIPT_RE = re.compile(r"(?s)<script.*?</script>")
_STYLE_RE = re.compile(r"(?s)<style.*?</style>")
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_batch(html: pd.Series) -> pd.DataFrame:
    """Vectorized extraction of one batch (the shared kernel: engine stage
    and tests both call it)."""
    s = html.astype(str)
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_STYLE_RE, " ", regex=True)
    n_links = s.str.count("<a ").astype("int64")
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for ent, rep in ENTITIES:
        s = s.str.replace(ent, rep, regex=False)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    n_chars = s.str.len().astype("int64")
    return pd.DataFrame({
        "text": s,
        "n_chars_text": n_chars,
        "n_links": n_links,
        "link_density_micro": n_links * 1_000_000 // np.maximum(n_chars, 1),
    })


_HREF_RE = re.compile(r'href="([^"]+)"')
_HOST_RE = re.compile(r"^https?://([^/]+)/")


def link_hosts(sf_dir: str) -> pd.DataFrame:
    """Out-link host rollup — the crawl-FRONTIER primitive (per-host link
    and referencing-document counts drive politeness budgets and frontier
    prioritization in the fetch stage this corpus descends from): extract
    every href, parse its host, aggregate per host.

    Scale shape: one shuffle-free extract pass reduces each block to
    distinct (host, doc) partials + per-host link counts; two tiny
    host-keyed groupbys finish (hosts ≪ links — the web's in-degree
    skew). Columns: host, n_links, n_docs."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    path = html_corpus_path(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows_host, rows_doc, rows_n = [], [], []
        for doc_id, h in zip(df["doc_id"].astype("int64"), df["html"]):
            hosts: dict[str, int] = {}
            for url in _HREF_RE.findall(str(h)):
                m = _HOST_RE.match(url)
                if m:
                    hosts[m.group(1)] = hosts.get(m.group(1), 0) + 1
            for host, n in hosts.items():
                rows_host.append(host)
                rows_doc.append(doc_id)
                rows_n.append(n)
        return pd.DataFrame({"host": pd.Series(rows_host, dtype=object),
                             "doc_id": pd.Series(rows_doc, dtype="int64"),
                             "n": pd.Series(rows_n, dtype="int64")})

    per_doc = (
        rd.read_parquet(path)
        .map_batches(partial, batch_format="pandas")
        .groupby(["host", "doc_id"])
        .aggregate(Sum("n", alias_name="n"))
    )
    out = (
        per_doc.groupby("host")
        .aggregate(Sum("n", alias_name="n_links"),
                   Count(alias_name="n_docs"))
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    out["host"] = out["host"].astype(str)
    return out.astype({"n_links": "int64", "n_docs": "int64"})


def html_extract(sf_dir: str, out_dir: str | None = None):
    """Per-doc extraction results over the materialized HTML corpus.
    Columns: doc_id, n_chars_text, n_links, link_density_micro, text_md5.
    out_dir= streams per-doc rows (with the full extracted text) through
    the shared sink instead of returning a frame."""
    import ray.data as rd

    from engine.ops.sink import sink_or_frame

    path = html_corpus_path(sf_dir)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ex = extract_batch(df["html"])
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
        out["n_chars_text"] = ex["n_chars_text"]
        out["n_links"] = ex["n_links"]
        out["link_density_micro"] = ex["link_density_micro"]
        out["text_md5"] = [hashlib.md5(t.encode()).hexdigest()
                           for t in ex["text"]]
        return out

    res = rd.read_parquet(path).map_batches(fn, batch_format="pandas")
    return sink_or_frame(
        res, out_dir, sort_by="doc_id",
        astype={"doc_id": "int64", "n_chars_text": "int64",
                "n_links": "int64", "link_density_micro": "int64"},
    )
