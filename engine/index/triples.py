"""Tokenize + emit (term, doc, tf, dl) triples — THE build hot path
(SURVEY.md §2.2-M3, BASELINE.json:6 "emit (term, docID=conv_id:turn_idx, tf)
triples").

One ``map_batches`` stage does normalise+tokenize+count in a single pass over
the text column (tokenisation is the dominant compute; it must happen exactly
once). The per-batch combine means each (term, doc) pair leaves the task
already counted — a flat per-token ``flat_map`` would emit ~40× more rows
into the shuffle.

Rows carry ``dl`` (document length) so BM25 scoring is fully segment-local:
no doc-length lookup against a shuffled docmap at query time (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.core.dockey import doc_key_batch
from engine.core.partitioning import SaltMap, TermHasher, assign_shards
from engine.text.analyzer import get_analyzer

TRIPLES_SCHEMA = pa.schema(
    [
        ("term", pa.large_string()),
        ("term_shard", pa.int32()),
        ("doc_key", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
    ]
)


class EmitTriples:
    """Actor-pool stage: analyzer + term-hash cache held per actor
    (setup once in __init__, per SURVEY.md §2.4)."""

    def __init__(self, num_shards: int, analyzer: str = "default", salt_map: dict | None = None,
                 doc_buckets: int = 1):
        self.analyzer = get_analyzer(analyzer)
        self.hasher = TermHasher()
        self.salt = SaltMap.from_json(salt_map) if salt_map else SaltMap(num_shards)
        # doc-bucketed layout (scale path for per-shard heap-merge queries):
        # partition id = term_shard + num_total_shards * (doc_key % D)
        self.doc_buckets = doc_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if "doc_key" in batch.column_names:
            # caller supplied external int64 keys (e.g. documents.doc_id) —
            # keeps engine tie-break (doc_key asc) == oracle tie-break
            doc_keys = batch["doc_key"].to_numpy()
        else:
            doc_keys = doc_key_batch(batch["conv_id"], batch["turn_idx"].to_numpy())
        flat, dl = self.analyzer.tokenize_batch(batch["text"])
        if flat.size == 0:
            return TRIPLES_SCHEMA.empty_table()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), dl)
        uniq_terms, term_inv = np.unique(flat, return_inverse=True)
        # count (doc, term) pairs without Python loops: composite key → unique
        key = doc_idx * len(uniq_terms) + term_inv
        uk, tf = np.unique(key, return_counts=True)
        out_doc = (uk // len(uniq_terms)).astype(np.int64)
        out_term = (uk % len(uniq_terms)).astype(np.int64)
        shards = assign_shards(uniq_terms, out_term, doc_keys[out_doc], self.hasher, self.salt)
        if self.doc_buckets > 1:
            shards = (
                shards.astype(np.int64)
                + self.salt.num_total_shards * (doc_keys[out_doc] % self.doc_buckets)
            ).astype(np.int32)
        return pa.table(
            {
                "term": pa.array(uniq_terms[out_term], type=pa.large_string()),
                "term_shard": pa.array(shards, type=pa.int32()),
                "doc_key": pa.array(doc_keys[out_doc], type=pa.int64()),
                "tf": pa.array(tf.astype(np.int32), type=pa.int32()),
                "dl": pa.array(dl[out_doc].astype(np.int32), type=pa.int32()),
            }
        )


# Worker-process-global emitter cache: the default tokenize stage runs as
# STATELESS TASKS (not an actor pool) so finished tasks release their CPUs
# to the downstream shuffle — an actor pool pinned to most of the cluster
# starves pipelined all-to-all stages. The analyzer/hash-cache state is
# amortised per worker process here instead of per actor; actor pools remain
# for analyzers registered expensive=True (SURVEY.md §2.4-A2).
_EMITTERS: dict[tuple, EmitTriples] = {}


def emit_triples_fn(batch: pa.Table, *, num_shards: int, analyzer: str = "default",
                    salt_map: dict | None = None, doc_buckets: int = 1) -> pa.Table:
    import json

    key = (num_shards, analyzer,
           json.dumps(salt_map, sort_keys=True) if salt_map else None, doc_buckets)
    em = _EMITTERS.get(key)
    if em is None:
        em = EmitTriples(num_shards, analyzer, salt_map, doc_buckets)
        _EMITTERS[key] = em
    return em(batch)


def docmap_rows(batch: pa.Table) -> pa.Table:
    """Cheap stateless pass (NO tokenisation — column-pruned to
    conv_id/turn_idx): docmap rows (doc_key, conv_id, turn_idx)."""
    import pyarrow.compute as pc

    if "doc_key" in batch.column_names:
        doc_keys = pa.array(batch["doc_key"].to_numpy(), type=pa.int64())
    else:
        doc_keys = pa.array(
            doc_key_batch(batch["conv_id"], batch["turn_idx"].to_numpy()), type=pa.int64()
        )
    if "conv_id" in batch.column_names:
        conv = batch["conv_id"].cast(pa.string())
        turn = batch["turn_idx"].cast(pa.int32())
    else:  # plain keyed corpus (e.g. documents.doc_id): docID == str(doc_key)
        conv = pc.cast(doc_keys, pa.string())
        turn = pa.array(np.zeros(batch.num_rows, dtype=np.int32), type=pa.int32())
    return pa.table({"doc_key": doc_keys, "conv_id": conv, "turn_idx": turn})
