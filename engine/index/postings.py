"""Posting-list assembly — the reduce side of THE wide shuffle
(SURVEY.md §2.7-P1, BASELINE.json:6 "groupby-aggregate-sort shuffles build
delta-encoded, varint/PForDelta-compressed posting lists with per-block skip
pointers and block-max metadata, sharded by hash(term)").

``AssembleSegments`` consumes whole shuffled blocks (map_batches with
batch_size=None after ``repartition(keys=["term_shard"])``): sorts the block
by (term, doc_key) with Arrow kernels, walks term runs, encodes each posting
list (codecs.py), and writes ONE SEGMENT PER SHARD atomically. It returns
only small metrics rows — posting bytes go straight to storage, never back
through the object store.

Correctness under block splitting: if Ray splits an oversized shuffle block,
a shard (even a term) may land in two assemble calls → two segments for the
same shard. That is exactly the multi-segment/tiered state the query path
already handles (df summed across segments before scoring), so splitting is
harmless; the tiered merge (engine/index/merge.py) folds them together.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.core.schemas import SEGMENT_DICT
from engine.index import codecs
from engine.io.segment_sink import segment_name, write_segment

METRICS_SCHEMA = pa.schema(
    [
        ("segment", pa.string()),
        ("shard", pa.int32()),
        ("n_terms", pa.int64()),
        ("n_postings", pa.int64()),
        ("sum_cf", pa.int64()),
        ("bytes_compressed", pa.int64()),
        ("encode_sec", pa.float64()),
    ]
)

SKIPS_SCHEMA = pa.schema(
    [
        ("term_idx", pa.int32()),
        ("block_idx", pa.int32()),
        ("last_doc_key", pa.int64()),
        ("n_docs", pa.int32()),
        ("block_max_tf", pa.int32()),
        ("block_min_dl", pa.int32()),
    ]
)


def assemble_shard_tables(
    terms: np.ndarray,
    doc_keys: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
):
    """Rows of ONE shard, sorted by (term, doc_key) → (dict_table,
    skips_table, postings_bytes). Pure function — shared by build and merge."""
    boundaries = np.nonzero(terms[1:] != terms[:-1])[0] + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [len(terms)]))
    blobs: list[bytes] = []
    d_term, d_df, d_cf, d_nblocks, d_off, d_nbytes, d_maxtf = [], [], [], [], [], [], []
    sk_rows: list[tuple] = []
    offset = 0
    for ti, (s, e) in enumerate(zip(starts, ends)):
        dk = doc_keys[s:e]
        tf = tfs[s:e]
        dl = dls[s:e]
        blob, skips = codecs.encode_term_postings(dk, tf, dl)
        d_term.append(terms[s])
        d_df.append(e - s)
        d_cf.append(int(tf.sum()))
        d_nblocks.append(len(skips))
        d_off.append(offset)
        d_nbytes.append(len(blob))
        d_maxtf.append(int(tf.max()))
        for blk_idx, last_doc, ndocs, max_tf, min_dl in skips:
            sk_rows.append((ti, blk_idx, last_doc, ndocs, max_tf, min_dl))
        blobs.append(blob)
        offset += len(blob)
    dict_table = pa.table(
        {
            "term": pa.array(d_term, type=pa.string()),
            "df": pa.array(d_df, type=pa.int64()),
            "cf": pa.array(d_cf, type=pa.int64()),
            "n_blocks": pa.array(d_nblocks, type=pa.int32()),
            "offset": pa.array(d_off, type=pa.int64()),
            "nbytes": pa.array(d_nbytes, type=pa.int64()),
            "max_tf": pa.array(d_maxtf, type=pa.int32()),
        },
        schema=SEGMENT_DICT,
    )
    skips_table = pa.Table.from_pylist(
        [dict(zip(SKIPS_SCHEMA.names, r)) for r in sk_rows], schema=SKIPS_SCHEMA
    ) if sk_rows else SKIPS_SCHEMA.empty_table()
    return dict_table, skips_table, b"".join(blobs)


def assemble_batch(batch: pa.Table, *, segments_dir: str, build_id: str,
                   lineage: dict | None = None) -> pa.Table:
    """Stateless map_batches fn over shuffled triple blocks → metrics rows.
    (A plain function, not an actor pool: there is no per-worker state to
    amortise, and elastic tasks avoid pool ramp-up on the reduce side.)"""
    self = _Assemble(segments_dir, build_id, lineage)
    return self(batch)


class _Assemble:
    def __init__(self, segments_dir: str, build_id: str, lineage: dict | None = None):
        self.segments_dir = segments_dir
        self.build_id = build_id
        self.lineage = lineage or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return METRICS_SCHEMA.empty_table()
        order = pc.sort_indices(
            batch,
            sort_keys=[("term_shard", "ascending"), ("term", "ascending"), ("doc_key", "ascending")],
        )
        batch = batch.take(order)
        shards = batch["term_shard"].to_numpy()
        terms = np.asarray(batch["term"].to_pandas(), dtype=object)
        doc_keys = batch["doc_key"].to_numpy()
        tfs = batch["tf"].to_numpy()
        dls = batch["dl"].to_numpy()
        out_rows = []
        sb = np.nonzero(shards[1:] != shards[:-1])[0] + 1
        sstarts = np.concatenate(([0], sb))
        sends = np.concatenate((sb, [len(shards)]))
        for s, e in zip(sstarts, sends):
            t0 = time.monotonic()
            shard = int(shards[s])
            dict_table, skips_table, blob = assemble_shard_tables(
                terms[s:e], doc_keys[s:e], tfs[s:e], dls[s:e]
            )
            n_postings = e - s
            sum_cf = int(tfs[s:e].sum())
            name = segment_name(self.build_id, shard, dict_table, n_postings)
            meta = {
                "build_id": self.build_id,
                "shard": shard,
                "n_terms": dict_table.num_rows,
                "n_postings": int(n_postings),
                "sum_cf": sum_cf,
                "bytes_compressed": len(blob),
                "lineage": self.lineage,
                "tier": 0,
                "format_version": 1,
            }
            write_segment(self.segments_dir, name, dict_table, skips_table, blob, meta)
            out_rows.append(
                {
                    "segment": name,
                    "shard": shard,
                    "n_terms": dict_table.num_rows,
                    "n_postings": int(n_postings),
                    "sum_cf": sum_cf,
                    "bytes_compressed": len(blob),
                    "encode_sec": time.monotonic() - t0,
                }
            )
        return pa.Table.from_pylist(out_rows, schema=METRICS_SCHEMA)
