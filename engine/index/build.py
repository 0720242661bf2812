"""Index build orchestration — entry point E1 (SURVEY.md §3-E1).

    build_index(source, index_dir)
        source: ray.data.Dataset of T1 transcripts, OR a list/str of parquet
                paths (path sources get fragment-level lineage → resume).

Pipeline (all streaming, no full materialisation):

  pass A (cheap, column-pruned to conv_id/turn_idx — never touches text):
      read → DocMapRows → write_parquet(docmap/build-<id>/)
      n_docs comes from the written parquet footers.
  pass B (the tokenise pass, runs exactly once over text):
      read → EmitTriples (actor pool; analyzer + hash cache per actor)
           → repartition(keys=["term_shard"])            ← THE all-to-all
           → AssembleSegments (whole blocks; writes segments, returns metrics)
  commit: manifest.add_build(segments, n_docs, sum_dl=Σcf) atomically.

avgdl = Σcf / n_docs — exact, with no doc-length shuffle and no second
tokenise pass (Σcf over segment dicts ≡ total token count).
"""

from __future__ import annotations

import os
import uuid

import pyarrow.parquet as pq

from engine.core.partitioning import DEFAULT_NUM_SHARDS, SaltMap
from engine.index.triples import EmitTriples, docmap_rows, emit_triples_fn
from engine.index.postings import assemble_batch
from engine.io.manifest import Manifest


def _default_concurrency():
    """Autoscaling actor-pool bounds from the current cluster size."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(2, cpus))


def _as_dataset(source, columns: list[str] | None = None):
    """Column-pruned Dataset view of the source; keeps an externally supplied
    doc_key column when present (see triples.py)."""
    import ray.data as rd

    if isinstance(source, (str, list)):
        frags = _fragment_list(source)
        if columns is not None:
            names = pq.read_schema(frags[0]).names
            if "doc_key" in names and "doc_key" not in columns:
                columns = columns + ["doc_key"]
            columns = [c for c in columns if c in names]
        return rd.read_parquet(source, columns=columns), frags
    if columns:
        names = source.schema().names
        if "doc_key" in names and "doc_key" not in columns:
            columns = columns + ["doc_key"]
        return source.select_columns([c for c in columns if c in names]), None
    return source, None


def _fragment_list(source) -> list[str]:
    paths = [source] if isinstance(source, str) else list(source)
    frags: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            frags.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            )
        else:
            frags.append(p)
    return frags


def build_index(
    source,
    index_dir: str,
    *,
    num_shards: int = DEFAULT_NUM_SHARDS,
    analyzer: str = "default",
    salt_map: SaltMap | str | None = None,
    build_id: str | None = None,
    concurrency=None,
    triple_batch_size: int = 8192,
    resume: bool = True,
    doc_buckets: int = 1,
    roles: list[str] | None = None,
    ts_min=None,
    ts_max=None,
    dedup_input: bool = False,
) -> Manifest:
    if salt_map == "auto":
        # A4 head-term sketch over a bounded sample → dedicated salt ranges
        from engine.index.skew import sketch_salt_map

        salt_map = sketch_salt_map(source, num_shards, analyzer=analyzer)
    manifest = Manifest(index_dir)
    if manifest.data["num_base_shards"] is None:
        manifest.data["num_base_shards"] = num_shards
        manifest.data["analyzer"] = analyzer
        manifest.data["salt_map"] = (salt_map or SaltMap(num_shards)).to_json()
        manifest.data["doc_buckets"] = doc_buckets
    else:
        num_shards = manifest.data["num_base_shards"]
        analyzer = manifest.data["analyzer"]
        doc_buckets = int(manifest.data.get("doc_buckets", 1))
    salt = SaltMap.from_json(manifest.data["salt_map"]) if manifest.data["salt_map"] else SaltMap(num_shards)
    if salt_map is not None:
        salt = salt_map
        manifest.data["salt_map"] = salt.to_json()

    build_id = build_id or uuid.uuid4().hex[:8]
    lineage: dict = {}
    if isinstance(source, (str, list)):
        frags = _fragment_list(source)
        if resume:
            frags = manifest.pending_fragments(frags)
        if not frags:
            return manifest  # everything already indexed
        lineage = {"fragments": frags}
        source = frags

    segments_dir = os.path.join(index_dir, "segments")
    docmap_dir = os.path.join(index_dir, "docmap", f"build-{build_id}")
    os.makedirs(segments_dir, exist_ok=True)

    from engine.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(None if isinstance(source, (str, list)) else source)
    if concurrency is None:
        concurrency = _default_concurrency()

    # input-side predicates / input dedup (M6/D1) need extra columns; both
    # passes must see the IDENTICAL filtered view so stats stay consistent
    extra_cols: list[str] = []
    if roles is not None:
        extra_cols.append("role")
    if ts_min is not None or ts_max is not None or dedup_input:
        extra_cols.append("ts")

    def _prepare(ds):
        from engine.text.filters import apply_input_filters

        ds = apply_input_filters(ds, roles=roles, ts_min=ts_min, ts_max=ts_max)
        if dedup_input:
            from engine.core.dedup import dedup_turns

            ds = dedup_turns(ds)
        return ds

    # -- pass A: docmap (no text column read) -------------------------------
    ds_a, _ = _as_dataset(source, columns=["conv_id", "turn_idx"] + extra_cols)
    _prepare(ds_a).map_batches(docmap_rows, batch_format="pyarrow", zero_copy_batch=True
                               ).write_parquet(docmap_dir)
    n_docs = sum(
        pq.read_metadata(os.path.join(docmap_dir, f)).num_rows
        for f in os.listdir(docmap_dir)
        if f.endswith(".parquet")
    )

    # -- pass B: triples → shuffle → segments -------------------------------
    from engine.text.analyzer import analyzer_is_expensive

    ds_b, _ = _as_dataset(source, columns=["conv_id", "turn_idx", "text"] + extra_cols)
    ds_b = _prepare(ds_b)
    import functools

    if analyzer_is_expensive(analyzer):
        # heavy analyzer state → actor pool, capped to leave shuffle CPUs
        triples = ds_b.map_batches(
            EmitTriples,
            fn_constructor_kwargs={
                "num_shards": num_shards,
                "analyzer": analyzer,
                "salt_map": salt.to_json(),
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=triple_batch_size,
            concurrency=concurrency,
        )
    else:
        # stateless tasks: release CPUs to the pipelined shuffle as they
        # finish (a pool pinned to the cluster starves the all-to-all)
        triples = ds_b.map_batches(
            functools.partial(
                emit_triples_fn,
                num_shards=num_shards,
                analyzer=analyzer,
                salt_map=salt.to_json(),
                doc_buckets=doc_buckets,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=triple_batch_size,
        )
    import functools

    # THE all-to-all: a range-partitioning SORT on term_shard, not a hash
    # repartition. Measured on this Ray version the sort shuffle moves the
    # same triples ~9x faster than the hash-shuffle operator, its output
    # blocks are ROW-balanced (a hot shard spans several blocks, so the
    # assemble stage has no straggler by construction), and shards remain
    # the logical partitioning: a shard (or term) split across blocks just
    # yields multiple segments, which the query path already treats as
    # tiers (df summed across segments; merge compacts later).
    metrics_ds = triples.sort("term_shard").map_batches(
        functools.partial(
            assemble_batch,
            segments_dir=segments_dir,
            build_id=build_id,
            lineage=lineage,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    metrics = metrics_ds.to_pandas()  # one row per segment — small

    segments = [
        {
            "name": r.segment,
            "shard": int(r.shard),
            "tier": 0,
            "n_terms": int(r.n_terms),
            "n_postings": int(r.n_postings),
            "sum_cf": int(r.sum_cf),
            "bytes_compressed": int(r.bytes_compressed),
        }
        for r in metrics.itertuples()
    ]
    sum_dl = int(metrics["sum_cf"].sum()) if len(metrics) else 0
    manifest.add_build(build_id, segments, n_docs=n_docs, sum_dl=sum_dl, lineage=lineage)
    manifest.commit()
    if doc_buckets > 1:
        # bucketed layout: per-term GLOBAL df/cf live across buckets → roll
        # up the segment dictionaries into the term_stats artifact that
        # bucketed query servers broadcast (engine/query/bucketed.py)
        build_term_stats(index_dir)
    return manifest


def build_term_stats(index_dir: str) -> str:
    """Aggregate (term, df, cf) across ALL live segments → parquet artifact.
    A small shuffle over dictionary rows (vocab-sized, not corpus-sized)."""
    import glob

    import ray.data as rd
    from ray.data.aggregate import Sum

    from engine.core.context import ensure_hash_shuffle

    ensure_hash_shuffle()
    out_dir = os.path.join(index_dir, "term_stats")
    files = sorted(glob.glob(os.path.join(index_dir, "segments", "*", "dict.parquet")))
    stats = (
        rd.read_parquet(files, columns=["term", "df", "cf"])
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
    )
    import shutil

    tmp = out_dir + f".tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    stats.write_parquet(tmp)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return out_dir
