"""Head-term skew sketch → salting plan (SURVEY.md §2.4-A4;
BASELINE.json:6 "sharded by hash(term) with explicit salting of head-term
skew").

Zipfian term distributions put a constant fraction of ALL postings into the
few head terms, so hash(term) alone leaves one reduce shard with ~max-term
rows regardless of shard count — the classic skewed-shuffle straggler. The
sketch estimates per-term posting counts from a bounded sample (partial
counts per batch, merged on the driver — the counts are term-level, far
smaller than the data) and gives every projected-oversized term a DEDICATED
shard range with fanout proportional to its estimated share
(engine/core/partitioning.py SaltMap.allocate). Build-side routing scatters
a salted term's postings across its range by doc_key; query-side de-salting
unions the range's segments before scoring (engine/query/engine.py
_term_hits), so results are IDENTICAL to an unsalted build (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.core.partitioning import SaltMap
from engine.core.pool import default_pool
from engine.text.analyzer import get_analyzer


class _TermCounts:
    def __init__(self, analyzer: str = "default"):
        self.an = get_analyzer(analyzer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, dl = self.an.tokenize_batch(batch["text"])
        # term "" is never a real token — it carries the batch's doc count so
        # the driver needs no second pass over the sample to size the scale
        if flat.size == 0:
            return pa.table({"term": pa.array([""], type=pa.string()),
                             "n": pa.array([batch.num_rows], type=pa.int64())})
        uniq, counts = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "term": pa.array(np.concatenate([[""], uniq]), type=pa.string()),
                "n": pa.array(np.concatenate([[batch.num_rows], counts]).astype(np.int64)),
            }
        )


def sketch_salt_map(
    source,
    num_shards: int,
    *,
    analyzer: str = "default",
    sample_docs: int = 50_000,
    total_docs: int | None = None,
    skew_factor: float = 1.0,
) -> SaltMap:
    """Estimate head terms from a sample; salt terms whose projected posting
    count exceeds ``skew_factor`` × the average shard load.

    fanout(term) = ceil(projected_postings / target_shard_rows), capped at
    num_shards — a head term then occupies its own range of that many shards.
    """
    import ray.data as rd

    if isinstance(source, (str, list)):
        ds = rd.read_parquet(source, columns=["text"])
    else:
        ds = source.select_columns(["text"])
    sample = ds.limit(sample_docs)
    parts = sample.map_batches(
        _TermCounts,
        fn_constructor_kwargs={"analyzer": analyzer},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_pool(),
    ).to_pandas()
    if len(parts) == 0:
        return SaltMap(num_shards)
    counts = parts.groupby("term")["n"].sum()
    n_sample_docs = int(counts.pop("")) if "" in counts.index else 0
    scale = 1.0
    if total_docs and n_sample_docs:
        scale = max(1.0, total_docs / n_sample_docs)
    total_postings_est = float(counts.sum()) * scale
    target = max(1.0, total_postings_est / num_shards)
    head = {}
    for term, n in counts.items():
        est = n * scale
        if est > skew_factor * target:
            head[term] = int(min(num_shards, -(-est // target)))
    return SaltMap.allocate(num_shards, head)
