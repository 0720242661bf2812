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
from engine.text.analyzer import resolve_analyzer

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
        self.analyzer = resolve_analyzer(analyzer)
        self.hasher = TermHasher()
        self.salt = SaltMap.from_json(salt_map) if salt_map else SaltMap(num_shards)
        # doc-bucketed layout (scale path for per-shard heap-merge queries):
        # partition id = term_shard + num_total_shards * (doc_key % D)
        self.doc_buckets = doc_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        if "doc_key" in batch.column_names:
            # caller supplied external int64 keys (e.g. documents.doc_id) —
            # keeps engine tie-break (doc_key asc) == oracle tie-break
            doc_keys = batch["doc_key"].to_numpy()
        else:
            doc_keys = doc_key_batch(batch["conv_id"], batch["turn_idx"].to_numpy())
        # Arrow-native tokenize: no per-token Python objects anywhere in this
        # stage (the flat stream stays a large_string Array; the vocabulary is
        # the only thing that ever becomes Python strings, for hashing)
        flat, dl = self.analyzer.tokenize_arrow(batch["text"])
        if len(flat) == 0:
            return TRIPLES_SCHEMA.empty_table()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), dl)
        enc = pc.dictionary_encode(flat)
        vocab = enc.dictionary
        term_inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = len(vocab)
        # count (doc, term) pairs without Python loops: composite key → unique
        key = doc_idx * nv + term_inv
        uk, tf = np.unique(key, return_counts=True)
        out_doc = (uk // nv).astype(np.int64)
        out_term = (uk % nv).astype(np.int64)
        uniq_np = np.asarray(vocab.to_pandas(), dtype=object)  # vocab-sized
        shards = assign_shards(uniq_np, out_term, doc_keys[out_doc], self.hasher, self.salt)
        if self.doc_buckets > 1:
            shards = (
                shards.astype(np.int64)
                + self.salt.num_total_shards * (doc_keys[out_doc] % self.doc_buckets)
            ).astype(np.int32)
        return pa.table(
            {
                "term": vocab.take(pa.array(out_term)).cast(pa.large_string()),
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


class EmitAssemble:
    """Fused tokenize→assemble stage for the "runs" exchange
    (engine/index/build.py): one task takes a RUN of input turns, emits its
    triples in-memory and writes one segment per term_shard directly —
    triples never enter the object store and there is NO all-to-all.
    Deliberately ONE map_batches stage (two chained stages would be fused by
    Ray anyway, but with per-input-block flushes — thousands of tiny
    segments; here batch_size counts INPUT rows, so run size is explicit)."""

    def __init__(self, num_shards: int, analyzer: str, salt_map: dict | None,
                 doc_buckets: int, segments_dir: str, build_id: str,
                 lineage: dict | None = None):
        from engine.index.postings import _Assemble

        self.emit = EmitTriples(num_shards, analyzer, salt_map, doc_buckets)
        self.assemble = _Assemble(segments_dir, build_id, lineage)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.assemble(self.emit(batch))


_FUSED: dict[tuple, EmitAssemble] = {}


def emit_assemble_fn(batch: pa.Table, **kw) -> pa.Table:
    """Stateless-task wrapper with per-worker state cache (same pattern as
    emit_triples_fn): tasks release CPUs on completion, no pool ramp-up."""
    import json

    key = (kw["num_shards"], kw["analyzer"],
           json.dumps(kw.get("salt_map"), sort_keys=True), kw.get("doc_buckets", 1),
           kw["segments_dir"], kw["build_id"])
    em = _FUSED.get(key)
    if em is None:
        em = EmitAssemble(
            kw["num_shards"], kw["analyzer"], kw.get("salt_map"),
            kw.get("doc_buckets", 1), kw["segments_dir"], kw["build_id"],
            kw.get("lineage"),
        )
        _FUSED[key] = em
    return em(batch)


def run_unit_fn(batch: pa.Table, *, columns: list[str], run_rows: int,
                roles=None, ts_min=None, ts_max=None, **fused_kw) -> pa.Table:
    """Planned-unit variant of the runs exchange: each input row is ONE
    task's work unit — a JSON list of (file, rg_lo, rg_hi) row-group spans,
    row-balanced by the driver (engine/index/build.py plan_read_units). The
    task reads its own row groups (page cache, column-pruned), applies the
    input predicates table-level, slices into ≈run_rows runs and emits
    segments via the fused EmitAssemble.

    Why not read_parquet + map_batches: Ray's block bundling coalesces read
    blocks that fall just under batch_size, which produced 11 ragged tasks
    (6.5–16.5s remote wall) from 16 even blocks on the 8-CPU scaling leg —
    ~30% of the exchange lost to wave imbalance. Explicit units pin one
    task per run bundle with ±1-row-group balance, and the text column
    never transits the object store at all."""
    import json

    import pyarrow.parquet as pq

    from engine.text.filters import filter_roles, filter_time

    out = []
    for unit_json in batch["unit"].to_pylist():
        spans = json.loads(unit_json)
        parts = []
        cols = None
        for f, rg_lo, rg_hi in spans:
            pf = pq.ParquetFile(f)
            if cols is None:
                names = set(pf.schema_arrow.names)
                cols = [c for c in columns if c in names]
                if "doc_key" in names and "doc_key" not in cols:
                    cols.append("doc_key")
            # use_threads=False: the task owns ONE cpu; snappy+arrow decode
            # is fast enough single-threaded and oversubscription would
            # steal cycles from sibling tasks' tokenize/sort
            parts.append(
                pf.read_row_groups(list(range(rg_lo, rg_hi)), columns=cols,
                                   use_threads=False)
            )
        t = pa.concat_tables(parts) if parts else None
        if t is None or t.num_rows == 0:
            continue
        if roles is not None:
            t = filter_roles(t, roles)
        if ts_min is not None or ts_max is not None:
            t = filter_time(t, ts_min, ts_max)
        if t.num_rows == 0:
            continue
        # EVEN slicing (round, not fixed-size+tail): a unit a hair over
        # run_rows must stay ONE run, not a full run plus a 64-segment dust
        # remainder
        n_runs = max(1, round(t.num_rows / max(1, run_rows)))
        bounds = [t.num_rows * i // n_runs for i in range(n_runs + 1)]
        for lo, hi in zip(bounds, bounds[1:]):
            if hi > lo:
                out.append(emit_assemble_fn(t.slice(lo, hi - lo), **fused_kw))
    if not out:
        from engine.index.postings import METRICS_SCHEMA

        return METRICS_SCHEMA.empty_table()
    return pa.concat_tables(out)


def docmap_rows(batch: pa.Table, num_parts: int = 0) -> pa.Table:
    """Cheap stateless pass (NO tokenisation — column-pruned to
    conv_id/turn_idx): docmap rows (doc_key, conv_id, turn_idx[, part]).
    ``part = doc_key % num_parts`` is the hive partition column hydration
    prunes on (engine/query/hydrate.py)."""
    import pyarrow.compute as pc

    if "doc_key" in batch.column_names:
        keys_np = batch["doc_key"].to_numpy()
    else:
        keys_np = doc_key_batch(batch["conv_id"], batch["turn_idx"].to_numpy())
    doc_keys = pa.array(keys_np, type=pa.int64())
    if "conv_id" in batch.column_names:
        conv = batch["conv_id"].cast(pa.string())
        turn = batch["turn_idx"].cast(pa.int32())
    else:  # plain keyed corpus (e.g. documents.doc_id): docID == str(doc_key)
        conv = pc.cast(doc_keys, pa.string())
        turn = pa.array(np.zeros(batch.num_rows, dtype=np.int32), type=pa.int32())
    cols = {"doc_key": doc_keys, "conv_id": conv, "turn_idx": turn}
    if num_parts:
        cols["part"] = pa.array((keys_np % num_parts).astype(np.int32), type=pa.int32())
    return pa.table(cols)
