"""Atomic segment writes (SURVEY.md §2.1-S4).

A segment is the immutable persisted index unit: one term-shard's posting
lists from one build (or one tiered merge). Layout per segment directory:

    dict.parquet   — term, df, cf, n_blocks, offset, nbytes, max_tf
    skips.parquet  — per 128-doc block: last_doc_key, offset, nbytes, n_docs,
                     block_max_tf, block_min_dl  (Block-Max WAND metadata)
    postings.bin   — concatenated PForDelta-compressed blocks (codecs.py)
    meta.json      — lineage + build metrics (terms/sec, postings/sec,
                     bytes compressed — BASELINE.json:6)

Write protocol (idempotent under Ray task retries, SURVEY.md §7 hard part 3):
write into ``<name>.tmp-<pid>``, fsync files, atomic ``os.replace`` to the
final name. Names are content-derived, so a retried task re-creates the same
name with the same bytes — the replace is a harmless overwrite; two tasks
never produce the same name with different content.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


def segment_name(build_id: str, shard: int, dict_table: pa.Table, n_postings: int,
                 doc_lo: int = 0, doc_hi: int = 0, sum_cf: int = 0) -> str:
    """Deterministic content-derived name. MUST differ for different content:
    two runs of the same build can share (shard, n_terms, first/last term,
    n_postings) on uniform corpora, so the doc-key range and Σcf go into the
    hash — distinct runs index disjoint doc sets, a retried task reproduces
    the identical name."""
    h = hashlib.blake2b(digest_size=6)
    h.update(build_id.encode())
    h.update(shard.to_bytes(4, "little"))
    h.update(dict_table.num_rows.to_bytes(8, "little"))
    h.update(int(n_postings).to_bytes(8, "little"))
    h.update(int(doc_lo).to_bytes(8, "little", signed=True))
    h.update(int(doc_hi).to_bytes(8, "little", signed=True))
    h.update(int(sum_cf).to_bytes(8, "little"))
    if dict_table.num_rows:
        h.update(str(dict_table["term"][0].as_py()).encode())
        h.update(str(dict_table["term"][-1].as_py()).encode())
    return f"seg-{build_id}-s{shard:05d}-{h.hexdigest()}"


def write_segment(
    segments_dir: str,
    name: str,
    dict_table: pa.Table,
    skips_table: pa.Table,
    postings: bytes,
    meta: dict,
) -> str:
    final = os.path.join(segments_dir, name)
    tmp = f"{final}.tmp-{os.getpid()}"
    meta = {**meta, "pad_bytes": 8}  # see the postings.bin tail pad below
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(dict_table, os.path.join(tmp, "dict.parquet"))
    pq.write_table(skips_table, os.path.join(tmp, "skips.parquet"))
    with open(os.path.join(tmp, "postings.bin"), "wb") as f:
        f.write(postings)
        # 8-byte tail pad: lets the bulk decoder gather directly over the
        # mmap (its bit-unpack reads up to 8 bytes past the last frame)
        # instead of copying the whole blob to append this pad at read time
        f.write(b"\x00" * 8)
        f.flush()
        os.fsync(f.fileno())
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    if os.path.exists(final):
        # Names are content-derived, so the existing dir holds identical
        # bytes — adopt it and discard tmp. Never delete-then-rename: a
        # re-executed task (Ray lineage reconstruction) killed between the
        # rmtree and the replace would vanish a manifest-committed segment.
        shutil.rmtree(tmp, ignore_errors=True)
        return final
    try:
        os.replace(tmp, final)
    except OSError:
        # lost a race against a concurrent writer of the SAME name — names
        # are content-derived, so the winner wrote identical bytes; adopt it
        if os.path.isdir(final):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return final
