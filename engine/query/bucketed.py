"""Doc-bucketed query path — the per-shard-heap scale architecture
(SURVEY.md §2.7-P3/P4; BASELINE.json:6 "merging per-shard heaps").

Layout precondition: the index was built with ``doc_buckets=D`` — partition
id = base_shard + S_total * (doc_key % D), so bucket b holds a full
term-sharded index over ITS docs only. Each bucket's SegmentServer pool
computes a complete per-query top-k heap over its (disjoint) doc slice, and
``groupby(qid).map_groups`` merges the D heaps — exact, because a doc's
whole score lives in exactly one bucket (unlike term-partitioned heap
merging, which is not rank-safe — engine/query/engine.py docstring).

Global df: per-term df must count ALL buckets; it is read from the
term_stats artifact (engine/index/build.py:build_term_stats) restricted to
the query set's terms and broadcast via ray.put — a corpus-independent,
query-set-sized lookup. Scores are therefore identical (bit-identical: each
doc's contributions accumulate inside one server in sorted-term order) to
the unbucketed path and the oracle.

Why both paths exist: the full-view path (query_index) is simplest when one
node can mmap the whole index; bucketed is the fixed-cluster scale path —
per-server memory is 1/D of the index and query fan-out/heap-merge is the
documented partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from engine.io.manifest import Manifest
from engine.query.engine import SegmentServer
from engine.text.analyzer import get_analyzer


def _query_term_dfs(index_dir: str, query_texts: list[str], analyzer: str) -> dict[str, int]:
    from engine.index.build import ensure_term_stats

    an = get_analyzer(analyzer)
    terms = sorted({t for q in query_texts for t in an.tokens(q)})
    if not terms:
        return {}
    # ensure_term_stats, never the raw directory: a crash between manifest
    # commit and the stats refresh (or a never-built artifact) would
    # otherwise broadcast stale/absent global df into every score
    dset = pads.dataset(ensure_term_stats(index_dir), format="parquet")
    tbl = dset.to_table(columns=["term", "df"], filter=pc.field("term").isin(terms))
    return dict(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()))


def query_bucketed(
    index_dir: str,
    queries,
    *,
    k: int = 10,
    mode: str = "exhaustive",
    concurrency_per_bucket=1,
    batch_size: int = 64,
):
    """queries: list[(qid, text)] or Dataset(qid, text) → Dataset
    (qid, rank, doc_key, score) — exact top-k via per-bucket heaps."""
    import ray
    import ray.data as rd

    from engine.core.context import ensure_hash_shuffle

    ensure_hash_shuffle()
    manifest = Manifest(index_dir)
    d_buckets = int(manifest.data.get("doc_buckets", 1))
    analyzer = manifest.data["analyzer"]

    if hasattr(queries, "map_batches"):
        qlist = [(r["qid"], r["text"]) for r in queries.take_all()]
    else:
        qlist = [(int(q), t) for q, t in queries]
    dfs = _query_term_dfs(index_dir, [t for _, t in qlist], analyzer)
    dfs_ref = ray.put(dfs)

    qds = rd.from_items([{"qid": int(q), "text": t} for q, t in qlist])
    per_bucket = []
    for b in range(d_buckets):
        per_bucket.append(
            qds.map_batches(
                SegmentServer,
                fn_constructor_kwargs={
                    "index_dir": index_dir,
                    "k": k,
                    "mode": mode,
                    "bucket": b,
                    "df_overrides_ref": dfs_ref,
                    "analyzer_obj": None if analyzer == "default" else get_analyzer(analyzer),
                },
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=batch_size,
                concurrency=concurrency_per_bucket,
            )
        )
    partials = per_bucket[0].union(*per_bucket[1:]) if len(per_bucket) > 1 else per_bucket[0]

    def merge_heaps(group: pd.DataFrame) -> pd.DataFrame:
        # docs are disjoint across buckets → global top-k of the D heaps
        g = group.sort_values(["score", "doc_key"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "rank", "doc_key", "score"]]

    return partials.groupby("qid").map_groups(merge_heaps, batch_format="pandas")
