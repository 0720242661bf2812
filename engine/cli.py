"""CLI entry points (SURVEY.md §3): the verbs a cluster operator runs via
``ray job submit -- python -m engine.cli <verb> ...`` (BASELINE.json:6).

This is the ONLY module (besides bench.py and the test fixture) that owns a
Ray session; the library itself never calls ray.init (__ray_entry__.py
contract).

Verbs:
  build  --input DIR_OR_PARQUET --index DIR [--shards N] [--salt auto] [--analyzer nfkc]
  query  --index DIR [--queries PARQUET | --text "..."] [--k 10] [--mode wand]
         [--and] [--boolean]  (boolean: Lucene-style "+must -not should")
  merge  --index DIR [--fanin 4] [--densify]
  delete --index DIR (--keys K1,K2,... | --conv CONV_ID) [--id ID]
  purge  --index DIR — fold the delete log: rewrite segments+docmap+stats
  synth  --out DIR --convs N [--seed 42]
  serve  --index DIR [--servers N] — interactive: one query per stdin line,
         one JSON result line per rank on stdout (resident actor pool, warm
         across queries; engine/query/service.py)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

from engine.core.errors import InputRefusedError


def _init_ray(num_cpus: int | None):
    import ray

    owned = not ray.is_initialized()
    if owned:
        kwargs = dict(address="local", include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray, owned


def main(argv=None):
    p = argparse.ArgumentParser(prog="engine.cli")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="verb", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--shards", type=int, default=32)
    b.add_argument("--salt", default=None, choices=[None, "auto"])
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--analyzer", default="default",
                   help="registered analyzer name (e.g. nfkc)")

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", default=None, help="parquet with (qid, text)")
    q.add_argument("--text", default=None, help="single ad-hoc query")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="wand", choices=["wand", "exhaustive", "dense"])
    q.add_argument("--and", dest="conjunctive", action="store_true",
                   help="conjunctive retrieval: docs must match every term")
    q.add_argument("--dsl", action="store_true",
                   help="treat --text as a composable DSL query "
                        "(+must -not should term^2 term~ msm=N; "
                        "engine/query/dsl.py). Term-level gates only from "
                        "the CLI — phrase/range need the positions / "
                        "docvalues artifacts the pipeline entries build")
    q.add_argument("--boolean", action="store_true",
                   help="Lucene-style clauses: +must -not should")
    q.add_argument("--after", default=None, metavar="SCORE_MICRO,DOC_KEY",
                   help="search_after cursor (last hit of the previous page); "
                        "forces exhaustive micro-score mode")
    q.add_argument("--out", default=None, help="write results parquet here")

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--fanin", type=int, default=4)
    m.add_argument("--densify", action="store_true",
                   help="refresh dense query sidecars for the new segments")

    g = sub.add_parser("gc")
    g.add_argument("--index", required=True)

    dl = sub.add_parser("delete", help="commit a doc-level delete set (takes "
                        "effect at query time immediately; fold with purge)")
    dl.add_argument("--index", required=True)
    dl.add_argument("--keys", default=None,
                    help="comma-separated int64 doc_keys")
    dl.add_argument("--conv", default=None,
                    help="delete every turn of this conv_id (doc keys are "
                    "resolved from the docmap)")
    dl.add_argument("--id", default=None, help="idempotency id for this delete set")

    pg = sub.add_parser("purge", help="fold the delete log into the index: "
                        "rewrite segments+docmap, recompute stats, clear log")
    pg.add_argument("--index", required=True)

    a = sub.add_parser("audit")
    a.add_argument("--index", required=True)

    dn = sub.add_parser("densify")
    dn.add_argument("--index", required=True)

    sn = sub.add_parser("snapshot", help="point-in-time hardlinked queryable "
                        "copy of an index (segments+docmap+deletes+manifest)")
    sn.add_argument("--index", required=True)
    sn.add_argument("--out", required=True)

    ing = sub.add_parser("ingest", help="convert a .jsonl corpus to parquet "
                         "(the lineage-capable build format)")
    ing.add_argument("--input", required=True)
    ing.add_argument("--out", required=True)

    s = sub.add_parser("synth")
    s.add_argument("--out", required=True)
    s.add_argument("--convs", type=int, required=True)
    s.add_argument("--seed", type=int, default=42)

    c = sub.add_parser("clean")
    c.add_argument("--input", required=True,
                   help="directory containing documents.parquet")
    c.add_argument("--out", default=None,
                   help="write the (doc_id, keep, reason) decisions parquet here")
    c.add_argument("--min-tokens", type=int, default=20)
    c.add_argument("--min-uniq-micro", type=int, default=330_000,
                   help="minimum unique-token ratio, micro units")
    c.add_argument("--lang", default="en", help="language to keep")
    c.add_argument("--threshold-micro", type=int, default=900_000,
                   help="near-dup Jaccard threshold, micro units")

    sv = sub.add_parser("serve")
    sv.add_argument("--index", required=True)
    sv.add_argument("--servers", type=int, default=4)
    sv.add_argument("--k", type=int, default=10)
    sv.add_argument("--mode", default="wand", choices=["wand", "exhaustive", "dense"])

    args = p.parse_args(argv)
    ray, owned = _init_ray(args.num_cpus)
    try:
        if args.verb == "ingest":
            from engine.io.readers import ingest_jsonl

            print(json.dumps(ingest_jsonl(args.input, args.out)))
        elif args.verb == "build":
            from engine.index.build import build_index
            from engine.io.readers import is_jsonl_source, read_jsonl_corpus

            src = args.input
            if is_jsonl_source(src):
                # jsonl builds take the Dataset branch: one-shot (no
                # fragment lineage/resume — parquet-path features). For
                # incremental builds, `ingest` to parquet first.
                src = read_jsonl_corpus(src)
            manifest = build_index(
                src, args.index, num_shards=args.shards,
                salt_map=args.salt, resume=not args.no_resume,
                analyzer=args.analyzer,
            )
            print(json.dumps({"n_docs": manifest.stats["n_docs"],
                              "avgdl": manifest.stats["avgdl"],
                              "segments": len(manifest.live_segments())}))
        elif args.verb == "query":
            import ray.data as rd

            from engine.query.engine import query_index

            if args.dsl:
                import numpy as np

                from engine.io.manifest import Manifest
                from engine.query.dsl import DslServer, resolve_specs
                from engine.query.topk import topk_postings
                from engine.text.analyzer import get_analyzer

                if args.text is None:
                    p.error("--dsl needs --text")
                an = get_analyzer(Manifest(args.index).data["analyzer"])
                specs = resolve_specs([(0, args.text)], args.index, an,
                                      max_expand=5)
                s0 = specs[0]
                if s0["phrases"] or s0["range"]:
                    p.error("--dsl via CLI supports term-level gates only; "
                            "phrase/range need the positions/docvalues "
                            "artifacts the pipeline entries build")
                srv = DslServer(args.index, score_micro=True, specs=specs)
                dk, sc = srv._matches(s0)
                sc = np.floor(np.asarray(sc, dtype=np.float64) * 1e6 + 0.5
                              ).astype(np.int64)
                dk, sc = topk_postings(dk, sc, args.k, keep_zero=True)
                for r, (key, score) in enumerate(zip(dk.tolist(), sc.tolist()), 1):
                    print(json.dumps({"qid": 0, "rank": r, "doc_key": key,
                                      "score_micro": score}))
                return
            if args.text is not None:
                queries = [(0, args.text)]
            elif args.queries:
                queries = rd.read_parquet(args.queries)
            else:
                p.error("need --queries or --text")
            qkw = dict(k=args.k, mode=args.mode,
                       conjunctive=args.conjunctive, boolean=args.boolean)
            if args.after is not None:
                if args.text is None:
                    p.error("--after needs --text (single-query paging)")
                if args.conjunctive or args.boolean or args.mode != "exhaustive":
                    p.error("--after requires --mode exhaustive without --and/--boolean")
                try:
                    a_s, a_k = (int(x) for x in args.after.split(","))
                except ValueError:
                    p.error("--after expects SCORE_MICRO,DOC_KEY integers")
                queries = rd.from_items([{"qid": 0, "text": args.text,
                                          "after_score": a_s, "after_key": a_k}])
                qkw["score_micro"] = True
            res = query_index(args.index, queries, **qkw)
            if args.out:
                # write_parquet APPENDS into an existing dir — a re-run with
                # different --k or queries would mix both result sets, so
                # replace prior results (refuse if the dir holds anything
                # that isn't parquet output; same rule as the synth verb)
                if os.path.isdir(args.out):
                    if any(not e.endswith(".parquet") for e in os.listdir(args.out)):
                        p.error(
                            f"--out {args.out} exists and contains non-parquet "
                            "entries; refusing to replace it"
                        )
                    shutil.rmtree(args.out)
                res.write_parquet(args.out)
                print(json.dumps({"written": args.out}))
            else:
                for row in res.take_all():
                    print(json.dumps({k: (v.item() if hasattr(v, "item") else v) for k, v in row.items()}))
        elif args.verb == "merge":
            from engine.index.merge import run_merge

            n = run_merge(args.index, fanin=args.fanin)
            out = {"merges": n}
            if args.densify:
                from engine.query.densify import densify_index

                out["densify"] = densify_index(args.index)
            print(json.dumps(out))
        elif args.verb == "delete":
            import numpy as np

            from engine.index.deletes import delete_doc_keys

            if args.keys:
                keys = np.array([int(x) for x in args.keys.split(",")], dtype=np.int64)
            elif args.conv:
                import pyarrow.compute as pc
                import pyarrow.parquet as pq_

                from engine.query.hydrate import committed_docmap_files

                parts = []
                for f in committed_docmap_files(args.index):
                    t = pq_.read_table(f, columns=["doc_key", "conv_id"])
                    parts.append(
                        t.filter(pc.equal(t["conv_id"], args.conv))["doc_key"].to_numpy()
                    )
                keys = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
                if keys.size == 0:
                    p.error(f"conv_id {args.conv!r} not found in the docmap")
            else:
                p.error("need --keys or --conv")
            n = delete_doc_keys(args.index, keys, delete_id=args.id)
            print(json.dumps({"deleted": n}))
        elif args.verb == "purge":
            from engine.index.merge import run_purge

            print(json.dumps(run_purge(args.index)))
        elif args.verb == "gc":
            from engine.index.merge import gc_orphans, gc_tombstoned

            n = gc_tombstoned(args.index) + gc_orphans(args.index)
            print(json.dumps({"removed": n}))
        elif args.verb == "audit":
            from engine.index.build import audit_doc_keys

            res = audit_doc_keys(args.index)
            print(json.dumps(res))
            if res["collisions"]:
                sys.exit(2)
        elif args.verb == "densify":
            from engine.query.densify import densify_index

            print(json.dumps(densify_index(args.index)))
        elif args.verb == "snapshot":
            from engine.index.snapshot import create_snapshot

            print(json.dumps(create_snapshot(args.index, args.out)))
        elif args.verb == "clean":
            import pyarrow as pa
            import pyarrow.parquet as pq

            from engine.ops.clean import clean_corpus

            res = clean_corpus(
                args.input,
                min_tokens=args.min_tokens,
                min_uniq_ratio_micro=args.min_uniq_micro,
                keep_lang=args.lang,
                threshold_micro=args.threshold_micro,
            )
            summary = {
                "n_docs": int(len(res)),
                "kept": int(res["keep"].sum()),
                "reasons": {k: int(v) for k, v in res["reason"].value_counts().items()},
            }
            if args.out:
                pq.write_table(pa.Table.from_pandas(res, preserve_index=False), args.out)
                summary["written"] = args.out
            print(json.dumps(summary))
        elif args.verb == "serve":
            from engine.query.hydrate import hydrate_table
            from engine.query.service import QueryService

            svc = QueryService(args.index, n_servers=args.servers, k=args.k, mode=args.mode)
            try:
                qid = 0
                for line in sys.stdin:
                    text = line.strip()
                    if not text:
                        continue
                    res = hydrate_table(args.index, svc.topk_batch([(qid, text)]))
                    for row in res.to_pylist():
                        print(json.dumps({k: (v.item() if hasattr(v, "item") else v)
                                          for k, v in row.items()}), flush=True)
                    qid += 1
            finally:
                svc.close()
        elif args.verb == "synth":
            from engine.io.synth import synth_transcripts

            # write_parquet APPENDS new files to an existing directory; a
            # re-run into the same --out would silently double the corpus
            # (duplicate (conv_id, turn_idx) rows), so replace it instead —
            # but only if everything in it looks like prior synth output;
            # refuse to rmtree a directory holding anything else.
            if os.path.isdir(args.out):
                entries = os.listdir(args.out)
                if any(not e.endswith(".parquet") for e in entries):
                    p.error(
                        f"--out {args.out} exists and contains non-parquet "
                        "entries; refusing to replace it"
                    )
                shutil.rmtree(args.out)
            synth_transcripts(args.convs, seed=args.seed).write_parquet(args.out)
            print(json.dumps({"written": args.out}))
    except InputRefusedError as e:
        # deliberate user-input refusals (engine/core/errors.py) print ONE
        # clean JSON error line; exit 3 is distinct from argparse's usage
        # errors (2). Internal errors stay loud tracebacks.
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        raise SystemExit(3)
    finally:
        if owned:  # never tear down a session someone else initialised
            ray.shutdown()


if __name__ == "__main__":
    main()
