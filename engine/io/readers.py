"""JSONL corpus ingestion (SURVEY §2.1-S1/S2 — the non-parquet source
format a web-crawl pipeline actually hands you).

Two surfaces, matching how the formats are used in production:

- :func:`read_jsonl_corpus` — a column-pruned, schema-checked
  ``ray.data.read_json`` Dataset over a ``.jsonl`` file or directory.
  Feeding this straight to ``build_index`` works (the Dataset branch every
  pipeline uses) but is a ONE-SHOT build: fragment-level lineage / resume
  / the replaced-corpus guard are parquet-path features.
- :func:`ingest_jsonl` — jsonl → parquet conversion (distributed
  ``write_parquet``), after which the ordinary parquet build path applies
  with full incremental lineage. This is the recommended production shape:
  ingest once, build/resume forever. CLI: ``engine.cli ingest``.

Validation is loud: a corpus missing a required column fails at plan time
with the column name, not deep inside a worker tokenizer.
"""

from __future__ import annotations

import os

REQUIRED = ("conv_id", "turn_idx", "text")
OPTIONAL = ("role", "ts", "tool")


def _jsonl_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        out = [os.path.join(path, f) for f in sorted(os.listdir(path))
               if f.endswith(".jsonl") or f.endswith(".json")]
        if not out:
            raise ValueError(f"no .jsonl files under {path}")
        return out
    return [path]


def is_jsonl_source(path: str) -> bool:
    """True when ``path`` is a .jsonl file or a directory containing any."""
    if os.path.isdir(path):
        return any(f.endswith((".jsonl", ".json")) for f in os.listdir(path))
    return path.endswith((".jsonl", ".json"))


def read_jsonl_corpus(path: str):
    """Schema-checked, column-pruned Dataset over a jsonl transcript
    corpus. Required columns: conv_id (str), turn_idx (int), text (str);
    role/ts/tool pass through when present, everything else is dropped at
    the read."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_json(_jsonl_paths(path))
    schema = ds.schema()
    names = set(schema.names)
    missing = [c for c in REQUIRED if c not in names]
    if missing:
        raise ValueError(
            f"jsonl corpus at {path} is missing required column(s) "
            f"{missing}; have {sorted(names)}"
        )
    keep = [c for c in (*REQUIRED, *OPTIONAL) if c in names]
    ds = ds.select_columns(keep)

    def coerce(b: pa.Table) -> pa.Table:
        # read_json infers int64/strings loosely; pin the build contract
        cols = {}
        for name in b.column_names:
            col = b[name]
            if name == "turn_idx":
                col = col.cast(pa.int32())
            elif name in ("conv_id", "text", "role", "tool"):
                col = col.cast(pa.string())
            elif name == "ts" and not pa.types.is_timestamp(col.type):
                # ISO strings or integer epoch-µs both cast losslessly
                col = col.cast(pa.timestamp("us"))
            cols[name] = col
        return pa.table(cols)

    return ds.map_batches(coerce, batch_format="pyarrow", zero_copy_batch=True)


def ingest_jsonl(path: str, out_dir: str) -> dict:
    """Convert a jsonl corpus to parquet (the lineage-capable format).
    Refuses a non-empty ``out_dir`` holding non-parquet entries; replaces
    prior parquet output (write_parquet appends — a stale mix would
    double-index). Returns {"out_dir", "rows"}."""
    import shutil

    import pyarrow.dataset as pads

    if os.path.isdir(out_dir):
        if any(not e.endswith(".parquet") for e in os.listdir(out_dir)):
            raise ValueError(
                f"{out_dir} exists and contains non-parquet entries; "
                "refusing to replace it"
            )
        shutil.rmtree(out_dir)
    ds = read_jsonl_corpus(path)
    ds.write_parquet(out_dir)
    rows = sum(f.metadata.num_rows for f in
               pads.dataset(out_dir, format="parquet").get_fragments())
    return {"out_dir": out_dir, "rows": int(rows)}
