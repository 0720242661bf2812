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
    vocab: np.ndarray | None = None,
):
    """Rows of ONE shard, sorted by (term, doc_key) → (dict_table,
    skips_table, postings_bytes). Pure function — shared by build and merge.

    ``terms`` is either an object ndarray of term strings, or (when
    ``vocab`` is given) an int64 ndarray of indices into the SORTED vocab —
    the fast path: run detection and dict building then never touch Python
    strings per posting."""
    boundaries = np.nonzero(terms[1:] != terms[:-1])[0] + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [len(terms)]))
    blobs: list[bytes] = []
    d_term, d_df, d_cf, d_nblocks, d_off, d_nbytes, d_maxtf = [], [], [], [], [], [], []
    sk_parts: list[np.ndarray] = []
    sk_terms: list[int] = []  # term_idx per skip part (np.repeat at the end)
    offset = 0
    for ti, (s, e) in enumerate(zip(starts, ends)):
        dk = doc_keys[s:e]
        tf = tfs[s:e]
        dl = dls[s:e]
        blob, skips = codecs.encode_term_postings(dk, tf, dl)
        d_term.append(vocab[terms[s]] if vocab is not None else terms[s])
        d_df.append(e - s)
        d_cf.append(int(tf.sum()))
        d_nblocks.append(len(skips))
        d_off.append(offset)
        d_nbytes.append(len(blob))
        d_maxtf.append(int(tf.max()))
        sk_parts.append(skips)
        sk_terms.append(ti)
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
    if sk_parts:
        allsk = np.concatenate(sk_parts)
        term_idx = np.repeat(
            np.asarray(sk_terms, dtype=np.int32),
            np.asarray([p.size for p in sk_parts], dtype=np.int64),
        )
        skips_table = pa.table(
            {
                "term_idx": pa.array(term_idx, type=pa.int32()),
                "block_idx": pa.array(allsk["block_idx"], type=pa.int32()),
                "last_doc_key": pa.array(allsk["last_doc_key"], type=pa.int64()),
                "n_docs": pa.array(allsk["n_docs"], type=pa.int32()),
                "block_max_tf": pa.array(allsk["block_max_tf"], type=pa.int32()),
                "block_min_dl": pa.array(allsk["block_min_dl"], type=pa.int32()),
            },
            schema=SKIPS_SCHEMA,
        )
    else:
        skips_table = SKIPS_SCHEMA.empty_table()
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
        # integer lexsort instead of an Arrow (shard, term-string, doc_key)
        # sort: dictionary-encode terms once, rank the (small) vocab with one
        # string argsort, then all per-posting work is int64 — measured ~6x
        # faster than pc.sort_indices on the string column at 6M rows
        term_col = batch["term"]
        if isinstance(term_col, pa.ChunkedArray):
            term_col = term_col.combine_chunks()
        enc = term_col.dictionary_encode()
        vocab_np = np.asarray(enc.dictionary.to_pandas(), dtype=object)
        vorder = np.argsort(vocab_np)
        rank = np.empty(vocab_np.size, dtype=np.int64)
        rank[vorder] = np.arange(vocab_np.size)
        vocab_sorted = vocab_np[vorder]
        term_ids = rank[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        shards0 = batch["term_shard"].to_numpy()
        doc_keys0 = batch["doc_key"].to_numpy()
        order = np.lexsort((doc_keys0, term_ids, shards0))
        shards = shards0[order]
        terms = term_ids[order]
        doc_keys = doc_keys0[order]
        tfs = batch["tf"].to_numpy()[order]
        dls = batch["dl"].to_numpy()[order]
        out_rows = []
        sb = np.nonzero(shards[1:] != shards[:-1])[0] + 1
        sstarts = np.concatenate(([0], sb))
        sends = np.concatenate((sb, [len(shards)]))
        for s, e in zip(sstarts, sends):
            t0 = time.monotonic()
            shard = int(shards[s])
            dict_table, skips_table, blob = assemble_shard_tables(
                terms[s:e], doc_keys[s:e], tfs[s:e], dls[s:e], vocab=vocab_sorted
            )
            n_postings = e - s
            sum_cf = int(tfs[s:e].sum())
            dk_s = doc_keys[s:e]
            name = segment_name(
                self.build_id, shard, dict_table, n_postings,
                doc_lo=int(dk_s.min()), doc_hi=int(dk_s.max()), sum_cf=sum_cf,
            )
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
