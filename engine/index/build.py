"""Index build orchestration — entry point E1 (SURVEY.md §3-E1).

    build_index(source, index_dir)
        source: ray.data.Dataset of T1 transcripts, OR a list/str of parquet
                paths (path sources get fragment-level lineage → resume).

Pipeline (all streaming, no full materialisation):

  pass A (cheap, column-pruned to conv_id/turn_idx — never touches text):
      read → DocMapRows → write_parquet(docmap/build-<id>/)
      n_docs comes from the written parquet footers.
  pass B (the tokenise pass, runs exactly once over text):
      default exchange="runs" (log-structured, scale path):
          read → EmitAssemble (fused tokenize+sort+encode per run of
          ``run_rows`` turns; writes one segment per shard per run) —
          NO object-store all-to-all; the tiered merge compacts per shard.
      exchange="hash"/"sort": read → EmitTriples → hash repartition or
          range sort on term_shard → AssembleSegments.
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

DOCMAP_PARTS = 64  # hydration prunes docmap partitions by doc_key % this


def _default_concurrency():
    """Autoscaling actor-pool bounds from the current cluster size
    (delegates to the engine-wide helper — see engine/core/pool.py)."""
    from engine.core.pool import default_pool

    return default_pool()


def plan_read_units(files: list[str], n_units: int) -> list[list[list]]:
    """Row-balanced CONTIGUOUS partition of the fragments' row groups into
    ``n_units`` work units (each a list of [file, rg_lo, rg_hi] spans).
    Units are cut at prefix-sum boundaries, so imbalance is at most one row
    group — this is what makes the runs-exchange waves even (see
    triples.run_unit_fn). Driver cost: one footer read per fragment."""
    spans: list[tuple[str, int, int]] = []  # (file, rg, rows)
    for f in files:
        md = pq.read_metadata(f)
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            if n:
                spans.append((f, rg, n))
    total = sum(s[2] for s in spans)
    if not spans or total == 0:
        return []
    n_units = max(1, min(n_units, len(spans)))
    cuts = [total * k // n_units for k in range(1, n_units)]
    units: list[list[list]] = []
    cur: list[list] = []
    acc = 0
    ci = 0
    for f, rg, n in spans:
        if cur and cur[-1][0] == f and cur[-1][2] == rg:
            cur[-1][2] = rg + 1
        else:
            cur.append([f, rg, rg + 1])
        acc += n
        while ci < len(cuts) and acc >= cuts[ci]:
            # while, not if: one coarse row group can straddle several cut
            # points (empty units are dropped below)
            units.append(cur)
            cur = []
            ci += 1
    if cur:
        units.append(cur)
    return [u for u in units if u]


def _as_dataset(source, columns: list[str] | None = None, override_num_blocks: int | None = None):
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
        return rd.read_parquet(source, columns=columns, override_num_blocks=override_num_blocks), frags
    if columns:
        names = source.schema().names
        if "doc_key" in names and "doc_key" not in columns:
            columns = columns + ["doc_key"]
        return source.select_columns([c for c in columns if c in names]), None
    return source, None


def _fragment_list(source) -> list[str]:
    # abspath so lineage comparisons (pending_fragments, replaced-corpus
    # guard) can never be defeated by a relative respelling of the same path
    paths = [source] if isinstance(source, str) else list(source)
    frags: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            frags.extend(
                os.path.abspath(os.path.join(p, f))
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
        else:
            frags.append(os.path.abspath(p))
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
    exchange: str = "runs",
    run_rows: int = 262_144,
    resume: bool = True,
    doc_buckets: int = 1,
    roles: list[str] | None = None,
    ts_min=None,
    ts_max=None,
    dedup_input: bool = False,
    docmap_parts: int | None = None,
) -> Manifest:
    import time as _time

    _phase_t = [_time.monotonic()]

    def _phase(name: str) -> None:
        # opt-in phase telemetry (GRAFT_TIMING=1): serial driver sections are
        # invisible in stage wall-times but set the scaling ceiling (Amdahl) —
        # this is how they get found and kept small
        now = _time.monotonic()
        if os.environ.get("GRAFT_TIMING"):
            import sys as _sys

            print(f'{{"build_phase": "{name}", "sec": {now - _phase_t[0]:.3f}}}',
                  file=_sys.stderr, flush=True)
        _phase_t[0] = now

    if salt_map == "auto":
        # A4 head-term sketch over a bounded sample → dedicated salt ranges
        from engine.index.skew import sketch_salt_map

        salt_map = sketch_salt_map(source, num_shards, analyzer=analyzer)
        _phase("salt_sketch")
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
        # The committed salt map IS the term-routing contract for every
        # segment already on disk: adopting a freshly sketched map on an
        # incremental build would re-route head terms and make prior
        # builds' postings unreachable at query time. Ignore the passed
        # map; the first build's map governs the index's lifetime.
        salt_map = None
    salt = SaltMap.from_json(manifest.data["salt_map"]) if manifest.data["salt_map"] else SaltMap(num_shards)

    build_id = build_id or uuid.uuid4().hex[:8]
    lineage: dict = {}
    if isinstance(source, (str, list)):
        frags = _fragment_list(source)
        if resume:
            # Replaced-corpus guard. Two ways an input directory can be
            # regenerated under a committed index, both of which must refuse
            # instead of silently corrupting results:
            #   (a) new fragment names, old files deleted (e.g. a synth
            #       re-run) — resuming would index the replacement as NEW
            #       rows on top of the committed ones: every doc_key twice,
            #       n_docs/df double-counted, duplicate-key postings that
            #       break the MaxScore admission bound (wand.py);
            #   (b) SAME fragment names, different bytes (deterministic
            #       names like part-00000.parquet) — pending_fragments would
            #       see nothing new and the build would silently no-op,
            #       serving the OLD corpus while the caller believes the new
            #       one is indexed. Caught by the size+mtime recorded in
            #       lineage at commit (same keying as pipelines._src_fp).
            # Committed fragments that merely live elsewhere or were
            # archived after indexing stay legal; resume=False is the
            # explicit I-know-what-I-am-doing override.
            cur_dirs = {os.path.dirname(f) for f in frags}
            cur_set = set(frags)
            committed_stats = manifest.fragment_stats()
            replaced, changed = [], []
            for f in manifest.indexed_fragments():
                if f not in cur_set:
                    if os.path.dirname(f) in cur_dirs and not os.path.exists(f):
                        replaced.append(f)
                    continue
                rec = committed_stats.get(f)
                if rec is not None:
                    st = os.stat(f)
                    if [st.st_size, st.st_mtime_ns] != list(rec):
                        changed.append(f)
            if replaced or changed:
                from engine.core.errors import InputRefusedError

                raise InputRefusedError(
                    f"input corpus was replaced since a previous build: "
                    f"{len(replaced)} committed fragment(s) no longer exist and "
                    f"{len(changed)} changed size/mtime under "
                    f"{sorted({os.path.dirname(f) for f in replaced + changed})}; "
                    "resuming would serve or index stale/duplicate documents. "
                    "Build into a fresh --index directory (or pass "
                    "resume=False to force)."
                )
            frags = manifest.pending_fragments(frags)
        if not frags:
            return manifest  # everything already indexed
        lineage = {
            "fragments": frags,
            # size+mtime at read time: lets a later resume detect an
            # in-place regeneration that reused the same fragment names
            "fragment_stats": {
                f: [(st := os.stat(f)).st_size, st.st_mtime_ns] for f in frags
            },
        }
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

    had_prior_builds = bool(manifest.data["builds"])

    def _prepare(ds):
        from engine.text.filters import apply_input_filters

        ds = apply_input_filters(ds, roles=roles, ts_min=ts_min, ts_max=ts_max)
        if dedup_input:
            from engine.core.dedup import anti_join_committed, dedup_turns

            if had_prior_builds:
                # resumed build: keys already committed by earlier builds
                # must not be re-indexed (engine/core/dedup.py SCOPE note)
                ds = anti_join_committed(ds, index_dir)
            ds = dedup_turns(ds)
        return ds

    # -- pass A: docmap (no text column read) -------------------------------
    # hive-partitioned by part = doc_key % DOCMAP_PARTS so hydration reads
    # only the partitions holding candidate keys (engine/query/hydrate.py)
    # a resumed build must keep the committed partitioning; otherwise the
    # caller may size parts to the corpus (64 hive dirs of tiny files cost
    # ~2s of serialized file creation on a 50k-doc corpus)
    docmap_parts = int(
        manifest.data.get("docmap_parts") or docmap_parts or DOCMAP_PARTS
    )
    manifest.data["docmap_parts"] = docmap_parts
    import functools as _ft

    _phase("plan_inputs")
    ds_a, _ = _as_dataset(source, columns=["conv_id", "turn_idx"] + extra_cols)
    _prepare(ds_a).map_batches(
        _ft.partial(docmap_rows, num_parts=docmap_parts),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_parquet(docmap_dir, partition_cols=["part"])
    _phase("docmap_write")
    n_docs = 0
    for root, _dirs, files in os.walk(docmap_dir):
        n_docs += sum(
            pq.read_metadata(os.path.join(root, f)).num_rows
            for f in files
            if f.endswith(".parquet")
        )
    _phase("docmap_footer_scan")

    # -- pass B: triples → exchange → segments ------------------------------
    from contextlib import nullcontext

    from engine.text.analyzer import analyzer_is_expensive

    if exchange == "hash":
        # Datasets snapshot DataContext at creation: the HASH_SHUFFLE
        # strategy must be active while the pass-B plan is constructed
        from engine.core.context import hash_strategy

        _exchange_ctx = hash_strategy()
    else:
        _exchange_ctx = nullcontext()
    _exchange_ctx.__enter__()
    # "runs": RUN SIZE controls both task parallelism (want ≈2 tasks/core)
    # and segment count (one segment per shard PER RUN — merge cost scales
    # with runs, so runs must not be tiny). batch_size must be EXPLICIT:
    # with batch_size=None each parquet row-group-sized read block becomes
    # its own run (measured: 640 runs → 58k segment dirs → 4x slower e2e).
    # Each map task handles one ≥run-sized bundle of blocks, emitting a full
    # run plus a small remainder run; remainder segments are exactly what
    # the tiered merge compacts (engine/index/merge.py).
    run_eff = run_rows
    onb = None
    cpus = _default_concurrency()[1]
    if exchange == "runs" and isinstance(source, list):
        total_rows = sum(pq.read_metadata(f).num_rows for f in source)
        run_eff = int(min(run_rows, max(32_768, total_rows // max(1, 2 * cpus))))
        onb = max(1, total_rows // run_eff)
    # planned-unit fast path (see triples.run_unit_fn): reads its own row
    # groups, so it must NOT be used when _prepare needs a Dataset-level
    # pass (input dedup) or when the analyzer wants an actor pool
    from engine.text.analyzer import analyzer_is_expensive as _is_exp

    unit_path = (
        exchange == "runs"
        and isinstance(source, list)
        and not dedup_input
        and not _is_exp(analyzer)
    )
    if unit_path:
        ds_b = None
    else:
        ds_b, _ = _as_dataset(
            source, columns=["conv_id", "turn_idx", "text"] + extra_cols, override_num_blocks=onb
        )
        ds_b = _prepare(ds_b)
    import functools

    # ship the analyzer CLASS (not its registry name) to workers: the
    # plugin registry is driver-process-local (engine/text/analyzer.py)
    from engine.text.analyzer import analyzer_class

    emit_kwargs = {
        "num_shards": num_shards,
        "analyzer": analyzer if analyzer == "default" else analyzer_class(analyzer),
        "salt_map": salt.to_json(),
        "doc_buckets": doc_buckets,
    }
    # The exchange that co-locates a term's postings. Three strategies:
    #
    # "runs" (default — the log-structured scale path): NO object-store
    #   all-to-all at all. ONE fused map stage (EmitAssemble) takes a RUN of
    #   ``run_rows`` input turns, tokenizes, sorts the run's triples locally
    #   by (term_shard, term, doc_key) and writes one SEGMENT PER SHARD PER
    #   RUN; the tiered merge (engine/index/merge.py) then compacts each
    #   shard's runs in an embarrassingly-parallel per-shard pass whose data
    #   moves through storage, not the object store. Both passes scale
    #   linearly with cores/nodes (measured: the sort/hash all-to-alls were
    #   the scaling bottleneck — 32-CPU build was SLOWER than 8-CPU at 3M
    #   turns). Correctness needs no merge: multi-segment shards are the
    #   normal tiered state (df summed across segments at query time).
    #
    # "hash": hash-partition by term_shard (one segment per shard per
    #   output block) — the classic groupby-shuffle realization.
    #
    # "sort": range-partitioning sort on term_shard — row-balanced output
    #   blocks (best straggler behavior) but materializes the full triple
    #   set through the object store; fastest at small scale only.
    if exchange == "runs":
        from engine.index.triples import EmitAssemble, emit_assemble_fn, run_unit_fn

        fused_kwargs = dict(
            emit_kwargs, segments_dir=segments_dir, build_id=build_id, lineage=lineage
        )
        if unit_path:
            import json as _json

            import ray.data as rd

            # cap units by the min-run floor: a tiny corpus must not shatter
            # into 2×cpus dust runs (and their segments); large corpora get
            # exactly 2 tasks/core (the A/B-measured optimum)
            units = plan_read_units(
                source, min(2 * cpus, max(1, total_rows // 32_768))
            )
            metrics_ds = rd.from_items(
                [{"unit": _json.dumps(u)} for u in units],
                override_num_blocks=max(1, len(units)),
            ).map_batches(
                functools.partial(
                    run_unit_fn,
                    columns=["conv_id", "turn_idx", "text"] + extra_cols,
                    run_rows=run_eff,
                    roles=roles,
                    ts_min=ts_min,
                    ts_max=ts_max,
                    **fused_kwargs,
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=1,
            )
        elif analyzer_is_expensive(analyzer):
            metrics_ds = ds_b.map_batches(
                EmitAssemble,
                fn_constructor_kwargs=fused_kwargs,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=run_eff,
                concurrency=concurrency,
            )
        else:
            metrics_ds = ds_b.map_batches(
                functools.partial(emit_assemble_fn, **fused_kwargs),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=run_eff,
            )
    else:
        if analyzer_is_expensive(analyzer):
            # heavy analyzer state → actor pool, capped to leave shuffle CPUs
            triples = ds_b.map_batches(
                EmitTriples,
                fn_constructor_kwargs=emit_kwargs,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=triple_batch_size,
                concurrency=concurrency,
            )
        else:
            # stateless tasks: release CPUs to the pipelined shuffle as they
            # finish (a pool pinned to the cluster starves the all-to-all)
            triples = ds_b.map_batches(
                functools.partial(emit_triples_fn, **emit_kwargs),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=triple_batch_size,
            )
        assemble = functools.partial(
            assemble_batch,
            segments_dir=segments_dir,
            build_id=build_id,
            lineage=lineage,
        )
        if exchange == "hash":
            exchanged = triples.repartition(
                num_blocks=salt.num_total_shards * max(1, doc_buckets),
                keys=["term_shard"],
            )
            metrics_ds = exchanged.map_batches(
                assemble, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            )
        elif exchange == "sort":
            metrics_ds = triples.sort("term_shard").map_batches(
                assemble, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            )
        else:
            raise ValueError(f"unknown exchange strategy: {exchange!r}")
    try:
        metrics = metrics_ds.to_pandas()  # one row per segment — small
    finally:
        _exchange_ctx.__exit__(None, None, None)
    _phase("exchange")
    if os.environ.get("GRAFT_TIMING_STATS"):
        import sys as _sys

        print(metrics_ds.stats(), file=_sys.stderr, flush=True)

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
    _phase("manifest_commit")
    if doc_buckets > 1:
        # bucketed layout: per-term GLOBAL df/cf live across buckets → roll
        # up the segment dictionaries into the term_stats artifact that
        # bucketed query servers broadcast (engine/query/bucketed.py)
        build_term_stats(index_dir)
    return manifest


def audit_doc_keys(index_dir: str) -> dict:
    """doc_key collision audit: n_distinct(doc_key) must equal n_docs.

    43-bit conv-hash keys WILL collide at large corpus scale (birthday bound:
    ~3M conversations ⇒ ~40% chance of one collision), which silently merges
    two turns' postings — so the audit is mandatory before trusting a large
    build. Shuffle-free: the docmap is hive-partitioned by doc_key %
    docmap_parts, and the parts partition the key space, so per-part distinct
    counts (one Ray task per part, np.unique inside) sum to the global
    distinct count.
    """
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from engine.query.hydrate import committed_docmap_dirs

    manifest = Manifest(index_dir)
    num_parts = int(manifest.data.get("docmap_parts") or 0)
    by_part: dict[int, list[str]] = {}
    legacy: list[str] = []
    # manifest-committed builds ONLY: a crashed/in-flight build's docmap
    # duplicates committed keys and would report false collisions
    for build_dir in committed_docmap_dirs(index_dir):
        part_dirs = [e for e in sorted(os.listdir(build_dir)) if e.startswith("part=")]
        if num_parts and part_dirs:
            for e in part_dirs:
                by_part.setdefault(int(e.split("=", 1)[1]), []).append(
                    os.path.join(build_dir, e)
                )
        else:
            legacy.append(build_dir)
    if legacy and by_part:
        # mixed legacy + partitioned layouts: per-part counting is no longer
        # a partition of the key space — count everything in one task
        all_dirs = legacy + [d for dirs in by_part.values() for d in dirs]
        items = [{"dirs": _json.dumps(all_dirs)}]
    else:
        items = [{"dirs": _json.dumps(dirs)} for dirs in by_part.values()]
        if legacy:
            items.append({"dirs": _json.dumps(legacy)})

    def count_part(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.parquet as _pq

        rows = 0
        keys = []
        for dirs_json in batch["dirs"].to_pylist():
            for d in _json.loads(dirs_json):
                t = _pq.read_table(d, columns=["doc_key"])
                rows += t.num_rows
                keys.append(t["doc_key"].to_numpy())
        distinct = int(np.unique(np.concatenate(keys)).size) if keys else 0
        return pa.table({"rows": pa.array([rows], type=pa.int64()),
                         "distinct": pa.array([distinct], type=pa.int64())})

    if not items:
        return {"n_docs": 0, "n_distinct": 0, "collisions": 0}
    res = (
        rd.from_items(items, override_num_blocks=len(items))
        .map_batches(count_part, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    n_docs = int(res["rows"].sum())
    n_distinct = int(res["distinct"].sum())
    out = {"n_docs": n_docs, "n_distinct": n_distinct, "collisions": n_docs - n_distinct}
    manifest.data["doc_key_audit"] = out
    manifest.commit()
    return out


def build_term_stats(index_dir: str) -> str:
    """Aggregate (term, df, cf) across ALL live segments → parquet artifact.
    A small shuffle over dictionary rows (vocab-sized, not corpus-sized)."""
    import glob

    import ray.data as rd
    from ray.data.aggregate import Sum

    from engine.core.context import ensure_hash_shuffle

    ensure_hash_shuffle()
    out_dir = os.path.join(index_dir, "term_stats")
    # ONE Manifest snapshot for both the segment list and the fingerprint:
    # re-reading at stamp time would let a build committing mid-aggregation
    # mark OLD df values with the NEW corpus fingerprint (permanently
    # "fresh" stale stats)
    manifest = Manifest(index_dir)
    # MANIFEST-listed segments only: a disk glob would also sum the dicts of
    # uncommitted (crashed/in-flight) builds and not-yet-GCed tombstoned
    # inputs, silently inflating global df (and every idf derived from it)
    files = sorted(
        os.path.join(index_dir, "segments", s["name"], "dict.parquet")
        for s in manifest.live_segments()
    )
    stats = (
        rd.read_parquet(files, columns=["term", "df", "cf"])
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
    )
    import shutil

    tmp = out_dir + f".tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    stats.write_parquet(tmp)
    # fingerprint of the corpus state these global df/cf were computed under
    # (any build that adds documents changes n_docs/sum_dl) — consumers that
    # bake term_stats into derived artifacts (engine/query/densify.py) use it
    # to detect staleness
    import json

    st = manifest.stats
    with open(os.path.join(tmp, "_STATS.json"), "w") as f:
        json.dump({"n_docs": int(st["n_docs"]), "sum_dl": int(st["sum_dl"])}, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return out_dir


def ensure_term_stats(index_dir: str) -> str:
    """term_stats dir, guaranteed FRESH against the current manifest: the
    _STATS.json fingerprint (n_docs, sum_dl) must match the committed stats,
    else the artifact predates a build and its global df would bake stale
    idf into every consumer (densify sidecars, bucketed QueryService).
    Rebuilds when missing or stale; every reader of term_stats must come
    through here, never open the directory directly.

    Cross-process safe: the check-then-rebuild holds an exclusive file lock
    (two drivers racing the rebuild would interleave rmtree/os.replace into
    ENOTEMPTY crashes or hand a reader a vanished directory), and freshness
    is re-checked after acquiring it."""
    import fcntl
    import json

    stats_dir = os.path.join(index_dir, "term_stats")

    def _fresh() -> bool:
        st = Manifest(index_dir).stats
        fingerprint = {"n_docs": int(st["n_docs"]), "sum_dl": int(st["sum_dl"])}
        try:
            with open(os.path.join(stats_dir, "_STATS.json")) as f:
                return json.load(f) == fingerprint
        except (OSError, ValueError):
            return False

    if _fresh():
        return stats_dir
    with open(f"{stats_dir}.lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            if not _fresh():  # another process may have rebuilt while we waited
                build_term_stats(index_dir)
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)
    return stats_dir
