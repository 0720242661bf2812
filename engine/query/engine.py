"""Query execution — entry point E2 (SURVEY.md §3-E2).

``SegmentServer`` is the stateful actor-pool stage (BASELINE.json:6
"stateful actor-pool segment servers"): segments are opened lazily and
mmapped ONCE per actor; the QUERY SET is partitioned across the pool, so one
actor scores a query completely (all its term shards) and exactly.

Why queries — not term shards — partition across the pool: BM25 scores sum
per-doc contributions across query terms, and terms of one query hash to
different shards. Per-shard *top-k* heaps therefore cannot be merged
rank-exactly for multi-shard queries (a doc ranked k+1 in two shards can be
global top-1). Scoring each query doc-completely inside one actor keeps
rank-identity to the oracle unconditional (BASELINE.json:14); heap merging
across partial results remains exact for the doc-disjoint case and is used
by the doc-bucketed scale path (engine/query/bucketed.py).

Determinism: contributions accumulate in sorted-term order with the oracle's
exact float op sequence (see score_query), so scores are bit-identical to the
oracle (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.core.partitioning import SaltMap
from engine.index.segment import Segment
from engine.io.manifest import Manifest
from engine.oracle.bm25 import idf as bm25_idf
from engine.query.topk import topk_postings
from engine.text.analyzer import get_analyzer

PARTIAL_SCHEMA = pa.schema(
    [
        ("qid", pa.int64()),
        ("rank", pa.int32()),
        ("doc_key", pa.int64()),
        ("score", pa.float64()),
    ]
)


class SegmentServer:
    """map_batches callable-class over a queries Dataset (qid, text)."""

    def __init__(self, index_dir: str, k: int = 10, shards: list[int] | None = None,
                 mode: str = "exhaustive", score_micro: bool = False,
                 bucket: int | None = None, df_overrides_ref=None,
                 analyzer_obj=None, cache_postings: int = 24_000_000,
                 conjunctive: bool = False, boolean: bool = False,
                 msm: int = 0, boosts: bool = False):
        import os

        from engine.index.segment import PostingLRU

        # per-actor decoded-posting + weight caches (see PostingLRU)
        self._plru = PostingLRU(cache_postings) if cache_postings else None
        self._wlru = PostingLRU(cache_postings) if cache_postings else None

        self.manifest = Manifest(index_dir)
        self.k = k
        self.mode = mode
        # score_micro: rank and report scores as floor(score*1e6+0.5) int64 —
        # the SQL-oracle-reproducible ordering (identical IEEE op in DuckDB),
        # decoupling driver value-hash checks from last-ulp float order.
        self.score_micro = score_micro
        # conjunctive (AND) retrieval: only docs matching EVERY query term
        # are candidates; scores stay plain BM25 sums over all terms
        self.conjunctive = conjunctive
        self.boolean = boolean
        # minimum_should_match: candidates must match >= msm distinct query
        # terms (0/1 = plain OR; n_terms = conjunctive). Exhaustive modes
        # only — WAND upper bounds are not msm-aware.
        self.msm = int(msm)
        # query-time term boosting: parse Lucene ``term^boost`` syntax and
        # scale each boosted term's contributions. Exhaustive mode only
        # (WAND bounds and dense sidecars bake unboosted weights). Boosts
        # should be powers of two so the scaling is IEEE-lossless and the
        # SQL oracle reproduces it bit-exactly regardless of op order.
        self.boosts = boosts
        # bucketed layout (engine/query/bucketed.py): this server owns doc
        # bucket ``bucket``; its shard ids are base_shard + S_total*bucket and
        # per-term GLOBAL df comes from the broadcast term_stats overrides
        # (local df would only count this bucket's docs).
        self.bucket = bucket
        self.df_overrides = None
        if df_overrides_ref is not None:
            import ray

            # map_batches fn_constructor_kwargs pass ObjectRefs through
            # verbatim; DIRECT ray.remote actor construction auto-resolves
            # them to the value — accept both
            self.df_overrides = (
                ray.get(df_overrides_ref)
                if isinstance(df_overrides_ref, ray.ObjectRef)
                else df_overrides_ref
            )
        st = self.manifest.stats
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"])
        # committed doc-level delete set (engine/index/deletes.py): every
        # scoring mode excludes these keys; stats stay the committed ones
        # until run_purge folds the log into the segments (Lucene model)
        from engine.index.deletes import load_deletes

        _del = load_deletes(index_dir, manifest=self.manifest)
        self.deleted: np.ndarray | None = _del if _del.size else None
        # custom analyzers are resolved in the DRIVER and shipped in (the
        # plugin registry is process-local — engine/text/analyzer.py)
        self.analyzer = analyzer_obj or get_analyzer(self.manifest.data["analyzer"])
        sm = self.manifest.data.get("salt_map")
        self.salt = SaltMap.from_json(sm) if sm else SaltMap(self.manifest.data["num_base_shards"])
        d_buckets = int(self.manifest.data.get("doc_buckets", 1))
        if self.bucket is not None:
            # bucketed pool member: serve exactly one bucket's shard range
            self._offsets = [self.salt.num_total_shards * self.bucket]
        else:
            # full view: on a bucketed index a term's postings live under
            # EVERY bucket's offset of its shard (a plain 0-offset view would
            # silently score only bucket 0's docs)
            self._offsets = [self.salt.num_total_shards * b for b in range(d_buckets)]
        self._shard_offset = self._offsets[0]
        self._by_shard: dict[int, list[str]] = {}
        seg_root = os.path.join(index_dir, "segments")
        shard_filter = set(shards) if shards is not None else None
        if self.bucket is not None:
            own = set(range(self._shard_offset, self._shard_offset + self.salt.num_total_shards))
            shard_filter = own if shard_filter is None else (shard_filter & own)
        elif len(self._offsets) > 1 and shard_filter is not None:
            shard_filter = {s + off for s in shard_filter for off in self._offsets}
        self._shard_of_path: dict[str, int] = {}
        for s in self.manifest.live_segments():
            if shard_filter is not None and s["shard"] not in shard_filter:
                continue
            p = os.path.join(seg_root, s["name"])
            self._by_shard.setdefault(s["shard"], []).append(p)
            self._shard_of_path[p] = int(s["shard"])
        for paths in self._by_shard.values():
            paths.sort()  # deterministic contribution order within a term
        self._open: dict[str, Segment] = {}

    def _segment(self, path: str) -> Segment:
        seg = self._open.get(path)
        if seg is None:
            seg = Segment(path)
            seg.pcache = self._plru
            seg.wcache = self._wlru
            self._open[path] = seg
        return seg

    def _term_hits(self, term: str):
        """All (segment, dict_idx) holding ``term``, and the GLOBAL df
        (summed across tiers/segments — SURVEY.md §2.6-G2)."""
        hits = []
        df = 0
        for shard in self.salt.shards_for_term(term):
            for off in self._offsets:
                for path in self._by_shard.get(shard + off, ()):
                    seg = self._segment(path)
                    idx = seg.lookup(term)
                    if idx >= 0:
                        hits.append((seg, idx))
                        df += int(seg.df[idx])
        if self.df_overrides is not None:
            df = int(self.df_overrides.get(term, 0))
        return hits, df

    # ------------------------------------------------------------------
    def score_query(self, text: str):
        """Exhaustive scoring → (doc_keys, scores) for every matching doc.

        Accumulation replicates the oracle's op sequence exactly — per term
        (sorted), ``scores[pos] += w`` over a sorted candidate array — so
        engine and oracle sums are BIT-identical, not merely close
        (SURVEY.md §7 hard part 1; np.add.reduceat would differ in the last
        ulp because its SIMD accumulation order differs from sequential +=).
        """
        from engine.query.topk import accumulate_sorted_lists

        bm: dict[str, float] = {}
        if self.boosts:
            text, bm = self._parse_boosts(text)
        terms = sorted(set(self.analyzer.tokens(text)))
        parts = []  # (doc_keys, weights) per (term, segment), ORACLE order
        for t in terms:
            hits, df = self._term_hits(t)
            if not hits:
                continue
            w_idf = float(bm25_idf(self.n_docs, df))
            boost = bm.get(t, 1.0)
            for seg, idx in hits:
                dk = seg.read_postings(idx)[0]
                w = seg.weights(idx, w_idf, self.avgdl)
                if boost != 1.0:
                    # scale AFTER the cached unboosted weights (the cache is
                    # per (segment, term) — a boost is per query)
                    w = w * boost
                parts.append((dk, w))
        return accumulate_sorted_lists(parts)

    def _parse_boosts(self, text: str) -> tuple[str, dict[str, float]]:
        """Lucene ``term^boost`` query syntax → (plain query text,
        {analyzed_term: boost}). Tokens without a parseable boost pass
        through unchanged."""
        bm: dict[str, float] = {}
        plain = []
        for tok in text.split():
            if "^" in tok:
                t, _, b = tok.rpartition("^")
                try:
                    bv = float(b)
                except ValueError:
                    plain.append(tok)
                    continue
                for at in self.analyzer.tokens(t):
                    bm[at] = bv
                plain.append(t)
            else:
                plain.append(tok)
        return " ".join(plain), bm

    def _match_counts(self, text: str):
        """Per-candidate matched-DISTINCT-term counts over the same
        (term, segment) parts score_query accumulates — docs live in exactly
        one segment, so summing 1 per part counts distinct terms. Returns
        (doc_keys, counts) on the identical candidate union."""
        from engine.query.topk import accumulate_sorted_lists

        if self.boosts:
            text, _ = self._parse_boosts(text)
        parts = []
        for t in sorted(set(self.analyzer.tokens(text))):
            hits, _df = self._term_hits(t)
            for seg, idx in hits:
                dk = seg.read_postings(idx)[0]
                parts.append((dk, np.ones(dk.size, dtype=np.float64)))
        return accumulate_sorted_lists(parts)

    # ------------------------------------------------------------------
    def _ensure_dense(self):
        """Dense-mode state, built once per actor: a sorted doc_key array +
        reusable float64 score buffer PER DOC BUCKET this server serves
        (one buffer covering everything when the index is unbucketed).

        Term-at-a-time accumulation is then ``scores[pos] += w`` — the
        ORACLE's own op sequence (engine/oracle/bm25.py) distributed, exact
        because buckets partition the doc space — with no candidate-union
        np.unique/merge at all. Positions/weights come from the mmap'd
        ``densify_index`` sidecars when present (engine/query/densify.py:
        page-cache-resident, reclaim-friendly) and are computed + LRU-cached
        otherwise. Memory: 16 B × n_docs_served per actor."""
        if getattr(self, "_dense", None) is not None:
            return
        # the SAME key arrays densify_index scattered pos against — one
        # implementation (committed-builds-only walk) or sidecar positions
        # silently misalign
        from engine.query.densify import _bucket_keys

        d_buckets = int(self.manifest.data.get("doc_buckets", 1))
        per_bucket = _bucket_keys(self.manifest.index_dir, d_buckets, manifest=self.manifest)
        self._dense: dict[int, list] = {}
        if d_buckets <= 1:
            buckets = [0]
        elif self.bucket is not None:
            buckets = [self.bucket]
        else:
            buckets = list(range(d_buckets))
        self._dense_del: dict[int, np.ndarray] = {}
        for b in buckets:
            bk = per_bucket[b]
            self._dense[b] = [bk, np.zeros(bk.size, dtype=np.float64)]
            if self.deleted is not None and bk.size:
                # positions of committed-deleted keys in this bucket's key
                # array, computed once per actor: dense scoring zeroes them
                # after accumulation so deleted docs can never rank
                pos = np.searchsorted(bk, self.deleted)
                valid = pos < bk.size
                pos = pos[valid]
                self._dense_del[b] = pos[bk[pos] == self.deleted[valid]]
        self._d_buckets = d_buckets
        self._sidecars: dict[str, tuple | None] = {}

    def _seg_bucket(self, seg) -> int:
        if self._d_buckets <= 1:
            return 0
        return self._shard_of_path[seg.path] // self.salt.num_total_shards

    def _sidecar(self, seg):
        """(pos_mmap, w_mmap, cum_df) for a densified segment, else None."""
        hit = self._sidecars.get(seg.path)
        if hit is not None or seg.path in self._sidecars:
            return hit
        import os

        name = os.path.basename(seg.path)
        d = os.path.join(self.manifest.index_dir, "dense", name)
        out = None
        if os.path.isdir(d) and self._sidecar_fresh(d):
            pos = np.load(os.path.join(d, "pos.npy"), mmap_mode="r")
            w = np.load(os.path.join(d, "w.npy"), mmap_mode="r")
            cum = np.concatenate(([0], np.cumsum(seg.df.astype(np.int64))))
            if pos.size == cum[-1] and w.size == cum[-1]:
                out = (pos, w, cum)
        self._sidecars[seg.path] = out
        return out

    def _sidecar_fresh(self, d: str) -> bool:
        """Weights/positions bake in the GLOBAL stats at densify time; an
        incremental build changes them (engine/query/densify.py header) —
        reject fingerprint mismatches and fall back to live computation."""
        import json
        import os

        try:
            with open(os.path.join(d, "meta.json")) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            return False
        st = self.manifest.stats
        return meta == {"n_docs": int(st["n_docs"]), "sum_dl": int(st["sum_dl"])}

    def _dense_positions(self, seg, idx: int, keys: np.ndarray) -> np.ndarray:
        key = (seg.path, idx, "dpos")
        if self._plru is not None:
            hit = self._plru.get(key)
            if hit is not None:
                return hit
        dk = seg.read_postings(idx)[0]
        pos = np.searchsorted(keys, dk)
        if dk.size and not (
            pos.size
            and (pos < keys.size).all()
            and (keys[pos] == dk).all()
        ):
            raise RuntimeError("segment doc_keys missing from docmap (stale index?)")
        if self._plru is not None:
            self._plru.put(key, pos, pos.size)
        return pos

    def score_query_dense(self, text: str):
        """Exhaustive scoring via dense accumulation — bit-identical to
        score_query (same per-term sorted op sequence, same IEEE adds),
        O(postings) with no union merge. Returns per-bucket
        (keys, scores, touched) triples."""
        self._ensure_dense()
        touched: dict[int, list] = {b: [] for b in self._dense}
        try:
            for t in sorted(set(self.analyzer.tokens(text))):
                hits, df = self._term_hits(t)
                if not hits:
                    continue
                w_idf = float(bm25_idf(self.n_docs, df))
                for seg, idx in hits:
                    b = self._seg_bucket(seg)
                    keys, scores = self._dense[b]
                    sc = self._sidecar(seg)
                    if sc is not None:
                        pos_mm, w_mm, cum = sc
                        lo, hi = int(cum[idx]), int(cum[idx + 1])
                        pos, w = pos_mm[lo:hi], w_mm[lo:hi]
                    else:
                        pos = self._dense_positions(seg, idx, keys)
                        w = seg.weights(idx, w_idf, self.avgdl)
                    scores[pos] += w
                    touched[b].append(pos)
            return [(self._dense[b][0], self._dense[b][1], touched[b]) for b in self._dense]
        except Exception:
            for b, plist in touched.items():
                for pos in plist:
                    self._dense[b][1][pos] = 0.0
            raise

    def _filter_deleted(self, dk: np.ndarray, sc: np.ndarray):
        """Drop committed-deleted doc_keys from a candidate set (live-delete
        semantics — engine/index/deletes.py)."""
        if self.deleted is None or dk.size == 0:
            return dk, sc
        from engine.index.deletes import live_mask

        m = live_mask(dk, self.deleted)
        return (dk, sc) if m.all() else (dk[m], sc[m])

    def _exclusion_keys(self, exclude_text: str) -> np.ndarray:
        """Sorted doc_keys matching any exclusion term (D4 NOT semantics)."""
        parts = []
        for t in sorted(set(self.analyzer.tokens(exclude_text))):
            hits, _ = self._term_hits(t)
            for seg, idx in hits:
                parts.append(seg.read_postings(idx)[0])
        return np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)

    def _conjunctive_topk(self, text: str, k: int, exclude: str | None):
        """D2 AND semantics: only docs matching EVERY query term rank;
        scores are the full BM25 sums in the oracle's float op order.
        Postings are read ONCE per (term, segment) — the same arrays feed
        both the score accumulation and the intersection. Composes with
        NOT (``exclude``) like the exhaustive path."""
        from engine.query.topk import accumulate_sorted_lists

        def empty():
            e = np.empty(0, dtype=np.int64)
            return e, (e if self.score_micro else e.astype(np.float64))

        terms = sorted(set(self.analyzer.tokens(text)))
        if not terms:
            return empty()
        parts = []          # (doc_keys, weights) in ORACLE order
        per_term_keys = []  # union of each term's doc_keys, for the AND
        for t in terms:
            hits, df = self._term_hits(t)
            if not hits:
                return empty()  # a missing term can match nothing
            w_idf = float(bm25_idf(self.n_docs, df))
            t_keys = []
            for seg, idx in hits:
                dk_arr = seg.read_postings(idx)[0]
                parts.append((dk_arr, seg.weights(idx, w_idf, self.avgdl)))
                t_keys.append(dk_arr)
            per_term_keys.append(
                np.unique(np.concatenate(t_keys)) if len(t_keys) > 1 else t_keys[0]
            )
        dk, sc = accumulate_sorted_lists(parts)
        # intersect smallest-first so the running set shrinks fastest
        per_term_keys.sort(key=len)
        inter = per_term_keys[0]
        for keys in per_term_keys[1:]:
            inter = np.intersect1d(inter, keys, assume_unique=True)
            if inter.size == 0:
                break
        keep = np.isin(dk, inter, assume_unique=True)
        dk, sc = dk[keep], sc[keep]
        dk, sc = self._filter_deleted(dk, sc)
        if exclude:
            ex = self._exclusion_keys(exclude)
            if ex.size and dk.size:
                pos = np.searchsorted(ex, dk)
                pos[pos >= ex.size] = 0
                m = ex[pos] != dk
                dk, sc = dk[m], sc[m]
        if self.score_micro:
            sc = np.floor(sc * 1e6 + 0.5).astype(np.int64)
            return topk_postings(dk, sc, k, keep_zero=True)
        return topk_postings(dk, sc, k)

    def topk(self, text: str, k: int | None = None, exclude: str | None = None,
             after: tuple[int, int] | None = None):
        """``after``: search-after pagination cursor — (score_micro, doc_key)
        of the LAST hit of the previous page; only hits strictly after it in
        the total order (score desc, doc_key asc) are candidates, so page N+1
        costs one top-k pass, not a k·(N+1) over-fetch. Micro-score
        exhaustive mode only (the cursor is defined on the integer order)."""
        if after is not None:
            assert self.score_micro and not (self.boolean or self.conjunctive), \
                "search_after requires score_micro exhaustive mode"
        if self.msm > 1:
            assert self.mode == "exhaustive" and not (self.boolean or self.conjunctive), \
                "minimum_should_match requires plain exhaustive mode"
        if self.boosts:
            assert self.mode == "exhaustive" and not (self.boolean or self.conjunctive), \
                "term boosting requires plain exhaustive mode"
        if self.boolean:
            # Lucene-style +must / -not / should clauses (engine/query/boolean.py)
            from engine.query.boolean import boolean_topk, parse_boolean

            must, should, must_not = parse_boolean(text)
            if exclude:  # the exclude column composes as extra -clauses
                must_not = f"{must_not} {exclude}".strip()
            return boolean_topk(self, must, should, must_not, k or self.k)
        if self.conjunctive:
            return self._conjunctive_topk(text, k or self.k, exclude)
        if self.mode == "wand" and not exclude:
            from engine.query.wand import wand_topk

            assert not self.score_micro, "score_micro requires exhaustive mode"
            return wand_topk(self, text, k or self.k)
        if self.mode == "dense" and not exclude:
            # dense buffers make "matched with micro-floored score 0" and
            # "never matched" indistinguishable — keep_zero semantics need
            # the sparse path
            assert not self.score_micro, "score_micro requires exhaustive mode"
            kk = k or self.k
            parts = self.score_query_dense(text)
            try:
                if self.deleted is not None:
                    # zero deleted positions post-accumulation: topk drops
                    # score<=0, and the restore loop re-zeroes touched
                    # positions anyway, so the buffer invariant holds
                    for b, (_keys, scores, _t) in zip(self._dense, parts):
                        dp = self._dense_del.get(b)
                        if dp is not None and dp.size:
                            scores[dp] = 0.0
                cand_k = [topk_postings(keys, scores, kk) for keys, scores, _ in parts]
                dk = np.concatenate([c[0] for c in cand_k])
                sc = np.concatenate([c[1] for c in cand_k])
                # exact global top-k from per-bucket top-ks (doc-disjoint)
                order = np.lexsort((dk, -sc))[:kk]
                return dk[order], sc[order]
            finally:
                for _keys, scores, touched in parts:
                    for pos in touched:
                        scores[pos] = 0.0
        dk, sc = self.score_query(text)
        if self.msm > 1:
            # counts accumulate over the SAME (term, segment) parts as the
            # scores, so the candidate unions are positionally identical
            _ck, cnt = self._match_counts(text)
            keep = cnt >= float(self.msm)
            dk, sc = dk[keep], sc[keep]
        dk, sc = self._filter_deleted(dk, sc)
        if exclude:
            # NOT queries: sorted-set difference before top-k (block-max
            # bounds are not exclusion-aware, so this path is exhaustive)
            ex = self._exclusion_keys(exclude)
            if ex.size:
                pos = np.searchsorted(ex, dk)
                pos[pos >= ex.size] = 0
                keep = ex[pos] != dk
                dk, sc = dk[keep], sc[keep]
        if self.score_micro:
            # floor BEFORE top-k so selection order == the micro order;
            # keep micro==0 rows — they matched a term and the SQL oracle
            # ranks them (engine/query/topk.py keep_zero)
            sc = np.floor(sc * 1e6 + 0.5).astype(np.int64)
            if after is not None:
                a_s, a_k = after
                keep = (sc < a_s) | ((sc == a_s) & (dk > a_k))
                dk, sc = dk[keep], sc[keep]
            return topk_postings(dk, sc, k or self.k, keep_zero=True)
        return topk_postings(dk, sc, k or self.k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["qid"].to_numpy()
        texts = batch["text"].to_pylist()
        excludes = (
            batch["exclude"].to_pylist()
            if "exclude" in batch.column_names
            else [None] * len(texts)
        )
        if "after_score" in batch.column_names:
            afters = [
                None if s is None else (s, dk)
                for s, dk in zip(batch["after_score"].to_pylist(),
                                 batch["after_key"].to_pylist())
            ]
        else:
            afters = [None] * len(texts)
        out_qid, out_rank, out_key, out_score = [], [], [], []
        for qid, text, excl, after in zip(qids, texts, excludes, afters):
            dk, sc = self.topk(text, exclude=excl or None, after=after)
            n = len(dk)
            out_qid.append(np.full(n, qid, dtype=np.int64))
            out_rank.append(np.arange(1, n + 1, dtype=np.int32))
            out_key.append(dk)
            out_score.append(sc)
        schema = PARTIAL_SCHEMA
        if self.score_micro:
            schema = pa.schema(
                [("qid", pa.int64()), ("rank", pa.int32()), ("doc_key", pa.int64()), ("score", pa.int64())]
            )
        if not out_qid:
            return schema.empty_table()
        return pa.table(
            {
                "qid": np.concatenate(out_qid),
                "rank": np.concatenate(out_rank).astype(np.int32),
                "doc_key": np.concatenate(out_key),
                "score": np.concatenate(out_score),
            },
            schema=schema,
        )


class BoostingServer(SegmentServer):
    """ES `boosting` query: the positive clause ranks as plain BM25; docs
    matching the NEGATIVE clause are DEMOTED (not excluded) by exact
    integer halving of the micro score (negative_boost = 0.5 with no
    float). Demotion runs entirely inside the server — both clauses'
    postings are local, the same reason the NOT path (D4) needs no
    exchange — so a boosting query costs one extra local union lookup at
    any corpus scale. Query batches carry a `neg` column (negative clause
    text). Requires score_micro construction (the halving contract is
    integer)."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("score_micro", True)
        super().__init__(*args, **kwargs)
        if not self.score_micro:
            raise ValueError("BoostingServer requires score_micro=True")

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["qid"].to_numpy()
        texts = batch["text"].to_pylist()
        negs = batch["neg"].to_pylist()
        out_qid, out_rank, out_key, out_score = [], [], [], []
        for qid, text, neg in zip(qids, texts, negs):
            dk, sc = self.score_query(text)
            dk, sc = self._filter_deleted(dk, sc)
            micro = np.floor(sc * 1e6 + 0.5).astype(np.int64)
            if neg:
                nset = np.sort(self.score_query(neg)[0])
                if nset.size and dk.size:
                    pos = np.searchsorted(nset, dk)
                    pos[pos >= nset.size] = 0
                    micro = np.where(nset[pos] == dk, micro // 2, micro)
            order = np.lexsort((dk, -micro))[: self.k]
            n = order.size
            out_qid.append(np.full(n, qid, dtype=np.int64))
            out_rank.append(np.arange(1, n + 1, dtype=np.int32))
            out_key.append(dk[order])
            out_score.append(micro[order])
        schema = pa.schema(
            [("qid", pa.int64()), ("rank", pa.int32()),
             ("doc_key", pa.int64()), ("score", pa.int64())]
        )
        if not out_qid:
            return schema.empty_table()
        return pa.table(
            {"qid": np.concatenate(out_qid),
             "rank": np.concatenate(out_rank).astype(np.int32),
             "doc_key": np.concatenate(out_key),
             "score": np.concatenate(out_score)},
            schema=schema,
        )


def _driver_analyzer(index_dir: str):
    """Resolve a non-default analyzer in the driver (registry lives here)."""
    name = Manifest(index_dir).data.get("analyzer", "default")
    return None if name == "default" else get_analyzer(name)


class MatchServer(SegmentServer):
    """Emits each query's FULL match set as (qid, doc_key) rows instead of a
    scored top-k — the candidate stage for facet counting and other
    match-set analytics (engine/pipelines.py::ft_bm25_facets). Honors the
    committed delete set and the conjunctive/boolean constructor flags; for
    boolean queries the match set is the gated candidate set (must
    intersection minus must_not), for conjunctive the AND set, otherwise the
    union of all term postings. Output is streamed per block — the match set
    of a head term can be a large fraction of the corpus, so it is never
    collected; downstream joins/groupbys consume it as a Dataset."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["qid"].to_numpy()
        texts = batch["text"].to_pylist()
        out_qid, out_key = [], []
        for qid, text in zip(qids, texts):
            if self.boolean or self.conjunctive:
                # top-k with k = everything: these paths gate candidates
                dk, _sc = self.topk(text, k=2**62)
            else:
                dk, sc = self.score_query(text)
                dk, _sc = self._filter_deleted(dk, sc)
            out_qid.append(np.full(dk.size, qid, dtype=np.int64))
            out_key.append(dk)
        if not out_qid:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "doc_key": pa.array([], pa.int64())})
        return pa.table({"qid": np.concatenate(out_qid),
                         "doc_key": np.concatenate(out_key)})


class ScoredMatchServer(SegmentServer):
    """MatchServer with scores: streams (qid, doc_key, score) for EVERY
    matching doc — the scored-candidate stage for query-time post-filtered
    retrieval (top-k among docs passing an attribute predicate), where the
    filter selectivity is unknown so no over-fetch factor is safe. Scores
    are micro-ints when constructed with score_micro (exhaustive oracle op
    order, same as the top-k paths). Honors deletes."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["qid"].to_numpy()
        texts = batch["text"].to_pylist()
        out_qid, out_key, out_sc = [], [], []
        for qid, text in zip(qids, texts):
            dk, sc = self.score_query(text)
            dk, sc = self._filter_deleted(dk, sc)
            if self.score_micro:
                sc = np.floor(sc * 1e6 + 0.5).astype(np.int64)
            out_qid.append(np.full(dk.size, qid, dtype=np.int64))
            out_key.append(dk)
            out_sc.append(sc)
        stype = pa.int64() if self.score_micro else pa.float64()
        if not out_qid:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "doc_key": pa.array([], pa.int64()),
                             "score": pa.array([], stype)})
        return pa.table({"qid": np.concatenate(out_qid),
                         "doc_key": np.concatenate(out_key),
                         "score": np.concatenate(out_sc)})


class TermScoredMatchServer(SegmentServer):
    """Per-TERM scored match stream: (qid, term, doc_key, score) for every
    (query term, matching doc) — the building block for cross-field
    blended-statistics retrieval (ES ``multi_match type: cross_fields`` /
    BM25F-style scoring), where a term's idf must come from BLENDED
    per-field document frequencies rather than this index's own df.

    ``idf_override`` maps term → idf value to use in place of
    idf(n_docs, local df); terms absent from the map fall back to local
    stats, so the server doubles as a plain per-term explain stream.
    Per-row score is micro-rounded BEFORE any cross-field combination
    (when score_micro), making the downstream max/sum integer-exact and
    SQL-replayable. Honors deletes. Scale shape: rows ∝ per-term match
    sets (streamed per block, never collected); the override map is
    query-vocabulary-sized."""

    def __init__(self, *args, idf_override: dict[str, float] | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.idf_override = idf_override or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine.oracle.bm25 import idf as bm25_idf
        from engine.oracle.bm25 import tf_sat

        qids = batch["qid"].to_numpy()
        texts = batch["text"].to_pylist()
        out_qid, out_term, out_key, out_sc = [], [], [], []
        for qid, text in zip(qids, texts):
            for t in sorted(set(self.analyzer.tokens(text))):
                hits, df = self._term_hits(t)
                if not hits:
                    continue
                w_idf = self.idf_override.get(t)
                if w_idf is None:
                    w_idf = float(bm25_idf(self.n_docs, df))
                for seg, idx in hits:
                    dk, tf, dl = seg.read_postings(idx)
                    w = w_idf * tf_sat(tf, dl, self.avgdl)
                    dk, w = self._filter_deleted(dk, w)
                    if self.score_micro:
                        w = np.floor(w * 1e6 + 0.5).astype(np.int64)
                    out_qid.append(np.full(dk.size, qid, dtype=np.int64))
                    out_term.append(np.full(dk.size, t, dtype=object))
                    out_key.append(dk)
                    out_sc.append(w)
        stype = pa.int64() if self.score_micro else pa.float64()
        if not out_qid:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "term": pa.array([], pa.large_string()),
                             "doc_key": pa.array([], pa.int64()),
                             "score": pa.array([], stype)})
        return pa.table({"qid": np.concatenate(out_qid),
                         "term": pa.array(np.concatenate(out_term).tolist(),
                                          type=pa.large_string()),
                         "doc_key": np.concatenate(out_key),
                         "score": np.concatenate(out_sc)})


def query_index(
    index_dir: str,
    queries,
    *,
    k: int = 10,
    mode: str = "exhaustive",
    concurrency=None,
    batch_size: int = 256,
    hydrate: bool = True,
    sort_output: bool = True,
    conjunctive: bool = False,
    boolean: bool = False,
    score_micro: bool = False,
):
    """queries: Dataset(qid, text) or list[(qid, text)] → results Dataset
    (qid, rank, doc_id?, doc_key, score), sorted by (qid, rank) unless
    ``sort_output=False`` (top-k output is tiny — callers consuming to
    pandas should sort driver-side instead of paying an all-to-all)."""
    import ray.data as rd

    from engine.core.pool import default_pool

    if concurrency is None:
        concurrency = default_pool()
    if not hasattr(queries, "map_batches"):
        queries = rd.from_items([{"qid": int(q), "text": t} for q, t in queries])
    partials = queries.map_batches(
        SegmentServer,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k, "mode": mode,
                               "conjunctive": conjunctive, "boolean": boolean,
                               "score_micro": score_micro,
                               "analyzer_obj": _driver_analyzer(index_dir)},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if hydrate:
        from engine.query.hydrate import hydrate_results

        partials = hydrate_results(index_dir, partials)
    return partials.sort(["qid", "rank"]) if sort_output else partials
