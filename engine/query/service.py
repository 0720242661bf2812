"""Persistent query service — the interactive serving surface.

``query_index`` (engine/query/engine.py) is the BATCH path: it spins an
actor pool per call, which is right for one-shot bulk query sets but pays
cold posting-LRU decode on every call. A long-lived deployment keeps its
servers resident — the reference's essence includes a persistent query
service over the indexed result (SURVEY.md §0.1) — so ``QueryService``
holds a pinned pool of ``SegmentServer`` actors across calls: repeated
(Zipf-head) terms stay decoded in each actor's LRU and queries route
round-robin.

Scale story: one service per index view; ``n_servers`` sized to the node
(or spread across nodes — Ray schedules the actors wherever resources
are). For indexes too large for a full view per actor, construct with
``doc_bucket_mode=True`` to give each actor one doc bucket of a bucketed
index (engine/query/bucketed.py layout) and merge per-bucket heaps here —
exact because buckets partition the doc space.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class QueryService:
    def __init__(
        self,
        index_dir: str,
        *,
        n_servers: int = 8,
        k: int = 10,
        mode: str = "wand",
        doc_bucket_mode: bool = False,
        num_cpus: float = 1.0,
        cache_postings: int | None = None,
    ):
        """``cache_postings`` caps each actor's decoded-posting LRU (entries,
        ~16 B each decoded). Default 24M (~400 MB/actor). At 10M+ turn
        corpora the Zipf-head working set of a broad query workload can
        exceed it — decode thrash then dominates query time (measured: the
        200-query bench working set at 9.7M turns is ~25M postings, just
        over the default; see BASELINE.md scale-frontier note). Size it to
        node_mem / n_servers when the corpus is large."""
        import ray

        from engine.query.engine import SegmentServer, _driver_analyzer

        self.k = k
        self._rr = 0
        # scoring is read-only and idempotent → transparent actor restart
        # (mmaps/LRUs rebuild in __init__) + task retry are safe
        Actor = ray.remote(num_cpus=num_cpus, max_restarts=2, max_task_retries=2)(SegmentServer)
        analyzer_obj = _driver_analyzer(index_dir)
        if doc_bucket_mode:
            import os

            import pyarrow.dataset as pads

            from engine.io.manifest import Manifest

            d_buckets = int(Manifest(index_dir).data.get("doc_buckets", 1))
            if d_buckets <= 1:
                raise ValueError("doc_bucket_mode needs an index built/compacted with doc_buckets > 1")
            # resident service: broadcast the WHOLE term→global-df map once
            # (per-bucket local df would undercount idf; the batch path
            # restricts this per query set, a long-lived service amortizes
            # the full map — ~16 bytes/term). ensure_term_stats guards
            # freshness: a term_stats artifact predating the latest build
            # would silently score with stale idf (df=0 for new terms).
            from engine.index.build import ensure_term_stats

            tbl = pads.dataset(
                ensure_term_stats(index_dir), format="parquet"
            ).to_table(columns=["term", "df"])
            ref = ray.put(dict(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist())))
            bucket_mode = mode if mode == "dense" else "exhaustive"
            self._actors = [
                Actor.remote(index_dir, k=k, mode=bucket_mode, bucket=b,
                             df_overrides_ref=ref, analyzer_obj=analyzer_obj,
                             **({"cache_postings": cache_postings} if cache_postings is not None else {}))
                for b in range(d_buckets)
            ]
            self._bucketed = True
        else:
            self._actors = [
                Actor.remote(index_dir, k=k, mode=mode, analyzer_obj=analyzer_obj,
                             **({"cache_postings": cache_postings} if cache_postings is not None else {}))
                for _ in range(n_servers)
            ]
            self._bucketed = False

    # ------------------------------------------------------------------
    def topk_batch(self, queries) -> pa.Table:
        """queries: list[(qid, text)] → Table(qid, rank, doc_key, score).

        Full-view mode: queries split round-robin across resident actors
        (one actor scores a query completely — rank-exact). Bucketed mode:
        every actor scores every query over ITS doc bucket; per-bucket
        heaps merge here (doc-disjoint ⇒ exact)."""
        import ray

        table = pa.table(
            {
                "qid": pa.array([int(q) for q, _ in queries], type=pa.int64()),
                "text": pa.array([t for _, t in queries], type=pa.string()),
            }
        )
        if table.num_rows == 0:
            return pa.table(
                {
                    "qid": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "doc_key": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        if self._bucketed:
            parts = ray.get([a.__call__.remote(table) for a in self._actors])
            merged = pa.concat_tables(parts)
            return self._merge_heaps(merged)
        n = len(self._actors)
        futs = []
        for i in range(n):
            rows = [j for j in range(table.num_rows) if (j + self._rr) % n == i]
            if rows:
                futs.append(self._actors[i].__call__.remote(table.take(pa.array(rows))))
        self._rr = (self._rr + table.num_rows) % n
        out = pa.concat_tables(ray.get(futs))
        return out.sort_by([("qid", "ascending"), ("rank", "ascending")])

    def _merge_heaps(self, partials: pa.Table) -> pa.Table:
        """Exact top-k from doc-disjoint per-bucket partials (F9 tie-break)."""
        qid = partials["qid"].to_numpy()
        dk = partials["doc_key"].to_numpy()
        sc = partials["score"].to_numpy()
        # sort by (qid asc, score desc, doc_key asc), then keep first k/qid
        order = np.lexsort((dk, -sc, qid))
        qid, dk, sc = qid[order], dk[order], sc[order]
        if len(qid):
            first = np.concatenate(([0], np.nonzero(qid[1:] != qid[:-1])[0] + 1))
            starts = np.repeat(first, np.diff(np.concatenate((first, [len(qid)]))))
            rank = (np.arange(len(qid)) - starts + 1).astype(np.int32)
        else:
            rank = np.empty(0, dtype=np.int32)
        keep = rank <= self.k
        return pa.table(
            {
                "qid": pa.array(qid[keep], type=pa.int64()),
                "rank": pa.array(rank[keep], type=pa.int32()),
                "doc_key": pa.array(dk[keep], type=pa.int64()),
                "score": pa.array(sc[keep], type=pa.float64()),
            }
        )

    def close(self):
        import ray

        for a in self._actors:
            ray.kill(a)
        self._actors = []
