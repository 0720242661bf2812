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


def clean_corpus(
    sf_dir: str,
    *,
    min_tokens: int = 20,
    min_uniq_ratio_micro: int = 330_000,
    keep_lang: str = "en",
    threshold_micro: int = 900_000,
    distributed: bool | None = None,
) -> pd.DataFrame:
    """(doc_id, keep, reason) for every document — see module docstring.

    ``distributed=True`` forces the near-dup pair graph through the
    Dataset-native LSH→verify→label-propagation chain (no driver pair
    frame); the drop set that reaches the scan is cluster-table-sized
    (duplicate population), not pair-sized."""
    import ray
    import ray.data as rd

    from engine.ops.dedup import dedup_clusters
    from engine.ops.textstats import DocStats, LangIdScorer, build_langid_profiles

    clusters = dedup_clusters(sf_dir, threshold_micro=threshold_micro,
                              distributed=distributed)
    drop = clusters.loc[clusters["keep"] == 0, "doc_id"].to_numpy()
    near_ref = ray.put(np.sort(drop.astype(np.int64)))
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
        near = ray.get(near_ref)
        ids = g["doc_id"].to_numpy()
        reason = np.full(ids.size, "kept", dtype=object)
        reason[(g["lang_pred"] != keep_lang).to_numpy()] = "lang_other"
        reason[
            (g["n_tokens"].to_numpy() < min_tokens)
            | (g["uniq_ratio_micro"].to_numpy() < min_uniq_ratio_micro)
        ] = "low_quality"
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
    out = (
        ds.map_batches(_Scan, batch_format="pyarrow", zero_copy_batch=True, concurrency=default_pool())
        .groupby("fingerprint")
        .map_groups(decide, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["keep"] = out["keep"].astype("int64")
    out["reason"] = out["reason"].astype(str)
    return out
