"""Declared Arrow schemas for every logical table (SURVEY.md §1.1-§1.2).

The type system is FIXED: each artifact has one declared ``pyarrow.Schema``;
inputs are validated against it on read (``validate_table``), and no dynamic
typing appears in the hot path. Spec anchor: BASELINE.json:15 (input schema),
SURVEY.md §1.2.
"""

from __future__ import annotations

import pyarrow as pa

# T1 — input corpus of multi-turn transcripts (BASELINE.json:15).
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# T2 — intermediate (term, doc, tf) triples (BASELINE.json:6).
POSTINGS_RAW = pa.schema(
    [
        ("term", pa.string()),
        ("term_shard", pa.int32()),
        ("doc_key", pa.int64()),
        ("tf", pa.int32()),
    ]
)

# T3 — per-document token counts (BM25 length normalisation + doc map).
DOCLENS = pa.schema(
    [
        ("doc_key", pa.int64()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("dl", pa.int32()),
    ]
)

# T5a — per-segment term dictionary (sorted by term).
SEGMENT_DICT = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("n_blocks", pa.int32()),
        ("offset", pa.int64()),
        ("nbytes", pa.int64()),
        ("max_tf", pa.int32()),
    ]
)

# T5b — per-block skip pointers + block-max metadata (Block-Max WAND).
SEGMENT_SKIPS = pa.schema(
    [
        ("term", pa.string()),
        ("block_idx", pa.int32()),
        ("last_doc_key", pa.int64()),
        ("offset", pa.int64()),
        ("nbytes", pa.int64()),
        ("n_docs", pa.int32()),
        ("block_max_tf", pa.int32()),
    ]
)

# T6 — query set; T7 — ranked results.
QUERIES = pa.schema([("qid", pa.int64()), ("text", pa.string())])
RESULTS = pa.schema(
    [
        ("qid", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.string()),
        ("score", pa.float64()),
    ]
)


class SchemaError(ValueError):
    pass


def validate_table(table: pa.Table, schema: pa.Schema, *, name: str = "table") -> pa.Table:
    """Fail fast with a readable diff when ``table`` doesn't match ``schema``.

    Column order is not significant; extra columns are rejected, missing
    columns and type mismatches are reported together (SURVEY.md §2.2-M9).
    """
    problems: list[str] = []
    have = {f.name: f.type for f in table.schema}
    for field in schema:
        if field.name not in have:
            problems.append(f"missing column {field.name}:{field.type}")
        elif have[field.name] != field.type:
            problems.append(
                f"column {field.name}: expected {field.type}, got {have[field.name]}"
            )
    extra = [c for c in have if c not in schema.names]
    if extra:
        problems.append(f"unexpected columns: {extra}")
    if problems:
        raise SchemaError(f"{name} schema mismatch: " + "; ".join(problems))
    return table
