"""Corpus cleaning — the end-to-end training-data prep decision pipeline.

``clean_corpus`` composes the repo's dedup + quality + language operators
into ONE decision per document: keep it, or drop it with a reason. This is
the operator a 100-TB crawl actually runs; the component ops exist
standalone for analysis, this is the production composition.

Reason precedence (first match wins, mirrored exactly by the SQL oracle's
CASE in __ray_entry__):

1. ``exact_dup``    — not the smallest doc_id of its canonical-text group
                      (md5 of the analyzer token stream — engine/ops/
                      textstats.DocStats' fingerprint).
2. ``near_dup``     — dropped by connected-component dedup over the
                      VERIFIED MinHash-LSH pair graph (dedup.dedup_clusters
                      keep=0: not its cluster's minimum doc_id).
3. ``low_quality``  — fewer than ``min_tokens`` tokens OR unique-token
                      ratio below ``min_uniq_ratio_micro``.
4. ``lang_other``   — scored lang-ID (textstats.LangIdScorer, pinned
                      profile artifact) predicts a language other than
                      ``keep_lang``.
5. ``kept``.

Execution shape (designed for the 100-TB case):
- ONE fused scan of the corpus (DocStats + LangIdScorer inside a single
  actor-pool ``map_batches`` — stats, fingerprint and language per batch,
  no second tokenize pass),
- ONE fingerprint-keyed exchange (groupby) in which the whole decision is
  made: the exact-dup representative is the group min, and the near-dup
  drop set (near-dup population ≪ corpus) rides along as a broadcast
  sorted array,
- the LSH cluster pass itself (dedup_clusters) is the only other corpus
  scan, by necessity.
The decision table streams out of the groupby; ``.to_pandas()`` at the end
is the driver-compare sink — production would ``write_parquet``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.core.pool import default_pool

REASONS = ("exact_dup", "near_dup", "low_quality", "lang_other", "kept")


_DROP_BROADCAST_MAX = 2_000_000  # near-drop ids broadcast above this use the keyed join


def clean_corpus(
    sf_dir: str,
    *,
    min_tokens: int = 20,
    min_uniq_ratio_micro: int = 330_000,
    keep_lang: str = "en",
    threshold_micro: int = 900_000,
    distributed: bool | None = None,
    drop_via_join: bool | None = None,
) -> pd.DataFrame:
    """(doc_id, keep, reason) for every document — see module docstring.

    ``distributed=True`` forces the near-dup pair graph through the
    Dataset-native LSH→verify→label-propagation chain (no driver pair
    frame); the drop set that reaches the scan is cluster-table-sized
    (duplicate population), not pair-sized.

    ``drop_via_join`` picks how the near-dup drop set reaches the scan:
    False/auto-small → one sorted-array broadcast (ray.put once, O(log)
    lookup per batch — right while drops ≪ corpus); True/auto-large (>
    ``_DROP_BROADCAST_MAX``) → a keyed LEFT join of the scan stream
    against the drop table (the 50%-duplicate-crawl shape, where a
    corpus-fraction drop set must never broadcast). Both feed the same
    ``decide`` reducer and are result-identical (tested)."""
    import ray
    import ray.data as rd

    from engine.core.context import join_args
    from engine.ops.dedup import dedup_clusters
    from engine.ops.textstats import DocStats, LangIdScorer, build_langid_profiles

    clusters = dedup_clusters(sf_dir, threshold_micro=threshold_micro,
                              distributed=distributed)
    drop = np.sort(clusters.loc[clusters["keep"] == 0, "doc_id"].to_numpy().astype(np.int64))
    if drop_via_join is None:
        drop_via_join = drop.size > _DROP_BROADCAST_MAX
    near_ref = ray.put(drop if not drop_via_join else drop[:0])
    profiles = build_langid_profiles()

    class _Scan:
        """Fused per-doc scan: token stats + fingerprint + language in one
        pass (stats/lang models load once per actor)."""

        def __init__(self) -> None:
            self.stats = DocStats()
            self.lang = LangIdScorer(profiles=profiles)

        def __call__(self, batch: pa.Table) -> pa.Table:
            s = self.stats(batch)
            lg = self.lang(batch)
            n = s["n_tokens"].to_numpy()
            safe = np.maximum(n, 1).astype(np.float64)
            uniq = np.floor(s["n_uniq_tokens"].to_numpy() / safe * 1e6 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "fingerprint": s["fingerprint"],
                    "n_tokens": pa.array(n.astype(np.int64)),
                    "uniq_ratio_micro": pa.array(uniq),
                    "lang_pred": lg["lang_pred"],
                }
            )

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        # one fingerprint group per call: group min is the exact-dup rep.
        # precedence applied by overwriting in REVERSE order.
        ids = g["doc_id"].to_numpy()
        reason = np.full(ids.size, "kept", dtype=object)
        reason[(g["lang_pred"] != keep_lang).to_numpy()] = "lang_other"
        reason[
            (g["n_tokens"].to_numpy() < min_tokens)
            | (g["uniq_ratio_micro"].to_numpy() < min_uniq_ratio_micro)
        ] = "low_quality"
        if "near_flag" in g.columns:  # keyed-join path attached the flag
            reason[g["near_flag"].to_numpy() > 0] = "near_dup"
        else:
            near = ray.get(near_ref)
            if near.size:
                pos = np.searchsorted(near, ids)
                pos[pos >= near.size] = 0
                reason[near[pos] == ids] = "near_dup"
        reason[ids != ids.min()] = "exact_dup"
        return pd.DataFrame(
            {
                "doc_id": ids,
                "keep": (reason == "kept").astype("int64"),
                "reason": reason,
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    scan = ds.map_batches(_Scan, batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=default_pool())
    if drop_via_join and drop.size:
        # NOTE at true 100-TB scale the drop table arrives as a Dataset
        # from the clusters stage; the frame→Dataset hop here is the
        # fixture/demo contract (dedup_clusters returns a frame)
        drop_ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(drop, type=pa.int64()),
            "near_flag": pa.array(np.ones(drop.size, dtype=np.int64)),
        }))
        jargs = join_args(n_joins=1)
        scan = scan.join(drop_ds, "left_outer", jargs.pop("num_partitions"),
                         on=("doc_id",), **jargs).map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("near_flag"), "near_flag",
                t["near_flag"].combine_chunks().fill_null(0)
                if isinstance(t["near_flag"], pa.ChunkedArray)
                else t["near_flag"].fill_null(0)),
            batch_format="pyarrow", zero_copy_batch=True)
    out = (
        scan
        .groupby("fingerprint")
        .map_groups(decide, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["keep"] = out["keep"].astype("int64")
    out["reason"] = out["reason"].astype(str)
    return out
