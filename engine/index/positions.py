"""Positional postings sidecar: a persisted, term-hash-partitioned
occurrence table (term, doc_key, pos) that makes phrase / proximity
verification INDEX-NATIVE — no raw-text read-back at query time.

Why it exists: the text-verify phrase path (engine/pipelines.py::
ft_bm25_phrase) re-reads the candidates' source rows via a column-pruned
corpus scan. Correct, and cheap when candidates are few — but the scan
itself touches every text block once per query batch, which at 10^12 turns
is the single most expensive thing a phrase query can do. Real fulltext
engines (Lucene's .prx/.pos files) store token positions IN the index so a
phrase query touches only the posting data of its own terms. This module is
that artifact for this engine, shaped for Ray Data:

- **Build** (once per corpus content, caller holds the cache lock): one
  ``map_batches`` pass over the corpus emits exploded occurrence rows via
  the SAME vectorised analyzer stream the BM25 index is built from
  (engine/text/analyzer.py::tokenize_arrow — byte-identical token order,
  so positions agree with the phrase SQL oracle's token stream by
  construction), then ``write_parquet(partition_cols=["part"])`` lays the
  rows out as ``part=<hash(term) % parts>/`` hive dirs. Parquet delta+RLE
  encodes the sorted-ish int32 positions about as tightly as a hand-rolled
  varint stream, and keeps the artifact DuckDB-readable for oracles.

- **Query**: a phrase touches ONLY the ≤ |phrase terms| partitions its
  terms hash into (``positions_paths`` — the explicit pruning seam, same
  contract as engine/ops/ann.py::probe_paths), filtered further to the
  candidate doc set. Verification is ASSOCIATIVE: slot s of a phrase
  (term t_s at offset s) turns each occurrence (doc, pos) of t_s into a
  vote (qid, doc, base = pos - s, slot = s); votes are globally unique (one
  per occurrence × slot), so a single ``groupby(qid, doc, base).count()``
  equal to the phrase's slot count IS an exact adjacency proof — no
  per-doc group functions, no driver-side set logic, no text.

Scale notes: the artifact is corpus-token-sized (one row per token) — the
same order as the BM25 postings themselves — and builds in one shuffle-free
pass (the partitioned write is the only exchange). Phrase cost is
candidate-bounded: partitions of the query's terms → candidate filter →
votes ≤ Σ tf(term, cand_docs) × phrase length.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

DEFAULT_PARTS = 32


def term_part(term: str, parts: int = DEFAULT_PARTS) -> int:
    """Partition of a term — blake2b-64 like every other term route in the
    engine (engine/core/partitioning.py::term_hash64), mod parts."""
    from engine.core.partitioning import term_hash64

    return term_hash64(term) % parts


def build_positions(corpus_parquet: str, out_dir: str, parts: int = DEFAULT_PARTS) -> dict:
    """One-pass positional-postings build. Caller holds the cache lock and
    has removed any prior generation (write_parquet appends, never
    truncates — the IVF-rebuild hazard, engine/ops/ann.py:322)."""
    import json
    import shutil

    import pyarrow.compute as pc
    import ray.data as rd

    from engine.core.partitioning import TermHasher
    from engine.text.analyzer import Analyzer

    an = Analyzer()

    def emit(b: pa.Table) -> pa.Table:
        flat, dl = an.tokenize_arrow(b["text"])
        dl64 = dl.astype(np.int64)
        doc = np.repeat(b["doc_id"].to_numpy().astype(np.int64), dl64)
        starts = np.concatenate(([0], np.cumsum(dl64)))[:-1]
        pos = (np.arange(doc.size, dtype=np.int64) - np.repeat(starts, dl64)).astype(np.int32)
        # hash once per distinct term in the batch, not per occurrence
        enc = pc.dictionary_encode(flat)
        uniq = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        hashes = TermHasher().hash_unique(uniq) % parts
        part = hashes[enc.indices.to_numpy(zero_copy_only=False)].astype(np.int32)
        return pa.table({
            "part": pa.array(part, type=pa.int32()),
            "term": pa.array(flat, type=pa.string()),
            "doc_key": pa.array(doc, type=pa.int64()),
            "pos": pa.array(pos, type=pa.int32()),
        })

    data_dir = os.path.join(out_dir, "data")
    if os.path.isdir(data_dir):
        shutil.rmtree(data_dir)
    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(corpus_parquet, columns=["doc_id", "text"])
    ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        data_dir, partition_cols=["part"]
    )
    meta = {"parts": int(parts)}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def positions_paths(pos_dir: str, terms: set[str]) -> list[str]:
    """Hive partition dirs holding the given terms' occurrence rows — the
    explicit partition-pruning seam (tests assert a phrase query never
    hands read_parquet anything outside its own terms' partitions)."""
    import json

    with open(os.path.join(pos_dir, "meta.json")) as f:
        parts = int(json.load(f)["parts"])
    wanted = sorted({term_part(t, parts) for t in terms})
    out = []
    for p in wanted:
        d = os.path.join(pos_dir, "data", f"part={p}")
        if os.path.isdir(d):
            # expand to files: ray.data.read_parquet treats list entries as
            # file paths, and the hive `part` column lives in the dir name
            # (we never read it back — pruning already applied it)
            out.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    return out


def phrase_votes_fn(slot_rows: list[tuple[int, str, int]], cand_qid: np.ndarray,
                    cand_doc: np.ndarray, sides: bool = False):
    """Batch fn factory: occurrence rows → unique (qid, doc_key, base[, side])
    votes for the given slot table, restricted to the candidate (qid, doc)
    pairs (sorted packed arrays, searchsorted membership — the broadcast is
    candidates-sized, never corpus-sized).

    ``slot_rows``: (qid, term, offset) — one row per phrase slot; a term
    recurring in a phrase contributes one row per position it occupies.
    With ``sides=True`` rows are (qid, term, offset, side) and the vote
    carries the side label — the proximity window-vote formulation
    (ft_bm25_proximity_pos) groups on (qid, doc, base) and keeps groups
    voted by BOTH sides instead of counting slots.
    """
    import pandas as pd

    cols = ["qid", "term", "offset"] + (["side"] if sides else [])
    slot_df = pd.DataFrame(slot_rows, columns=cols)
    packed_cand = np.sort(cand_qid.astype(np.int64) * (1 << 43) + cand_doc.astype(np.int64))

    def votes(b: pa.Table) -> pa.Table:
        df = b.select(["term", "doc_key", "pos"]).to_pandas()
        m = df.merge(slot_df, on="term", how="inner")
        out_schema = {"qid": pa.int64(), "doc_key": pa.int64(), "base": pa.int64()}
        if sides:
            out_schema["side"] = pa.int64()
        if len(m) == 0:
            return pa.table({c: pa.array([], t) for c, t in out_schema.items()})
        base = m["pos"].to_numpy().astype(np.int64) - m["offset"].to_numpy()
        ok = base >= 0
        key = m["qid"].to_numpy().astype(np.int64) * (1 << 43) + m["doc_key"].to_numpy()
        j = np.searchsorted(packed_cand, key)
        ok &= (j < packed_cand.size) & (packed_cand[np.minimum(j, packed_cand.size - 1)] == key)
        # slot ids are NOT carried in phrase mode: votes are already unique
        # per (occurrence × slot), so the downstream row count per
        # (qid, doc, base) equals the number of satisfied slots
        out = {
            "qid": pa.array(m["qid"].to_numpy()[ok].astype(np.int64)),
            "doc_key": pa.array(m["doc_key"].to_numpy()[ok].astype(np.int64)),
            "base": pa.array(base[ok]),
        }
        if sides:
            out["side"] = pa.array(m["side"].to_numpy()[ok].astype(np.int64))
        return pa.table(out)

    return votes


def ordered_chain_match(sides: list[np.ndarray], bound: int) -> bool:
    """∃ strictly increasing positions p1 < … < pn (p_i drawn from the
    SORTED array sides[i]) with extent pn − p1 ≤ bound. Greedy successor
    chains evaluated for ALL side-0 starts at once via per-side
    searchsorted — greedy minimizes pn for each start, so the existence
    answer is exact (tests/test_positional_property.py brute-forces the
    equivalence). The ft_span_near_ordered verification kernel."""
    if any(s.size == 0 for s in sides):
        return False
    p = sides[0]
    start = p
    ok = np.ones(p.size, dtype=bool)
    for arr in sides[1:]:
        j = np.searchsorted(arr, p, side="right")
        ok &= j < arr.size
        p = arr[np.minimum(j, arr.size - 1)]
    return bool(np.any(ok & (p - start <= bound)))
