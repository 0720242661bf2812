"""PII detection + redaction (training-data pipeline op).

A 100-TB crawl must be scrubbed of emails / phone numbers / IPs / SSNs /
card-like digit runs before training. The scan is ONE shuffle-free
``map_batches`` pass; every pattern is an RE2 regex executed by Arrow C++
kernels (``count_substring_regex`` / ``replace_substring_regex``) — no
per-row Python. DuckDB's regexp engine is RE2 too, so the SQL oracle counts
and rewrites the *same* byte spans, making redaction hash-checkable.

The sandbox corpus is digit-free word salad, so the harness PLANTS
deterministic PII as a pure function of doc_id (modular arms below) in both
the engine and the SQL oracle — the op under test is the redaction kernel
chain, the planting is just the fixture. ``plant=False`` runs the same scan
over raw text (the production entry point).

Patterns deliberately use explicit ASCII classes, never ``\\s``/``\\d``
shorthand differences — both engines are RE2 so shorthand agrees, but
explicit classes keep the SQL string byte-identical to the Python constant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.core.pool import default_pool

# (name, pattern, replacement) — applied IN ORDER; counts are taken over
# the text state each pattern actually sees (i.e. after prior redactions),
# so order is part of the contract and the SQL oracle applies the same one.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("card", r"\b[0-9]{13,19}\b", "<CARD>"),
)


def planted_text(batch: pa.Table) -> pa.Array:
    """text + deterministic PII arms keyed on doc_id (the fixture).

    Mirrored exactly by :func:`plant_sql`. Arms fire on disjoint residues so
    most docs carry 1-2 PII kinds and some carry none.
    """
    import pyarrow.compute as pc

    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = pc.cast(pa.array(did), pa.string())
    empty = pa.array([""] * len(batch), type=pa.string())

    def arm(mask: np.ndarray, pieces: list) -> pa.Array:
        joined = pc.binary_join_element_wise(*pieces, "")
        return pc.if_else(pa.array(mask), joined, empty)

    email = arm(did % 3 == 0, [" contact user", ids, "@example.com"])
    ssn = arm(
        did % 7 == 1,
        [
            " ssn ",
            pc.cast(pa.array(100 + did % 900), pa.string()),
            "-",
            pc.cast(pa.array(10 + did % 90), pa.string()),
            "-",
            pc.cast(pa.array(1000 + did % 9000), pa.string()),
        ],
    )
    phone = arm(
        did % 4 == 2,
        [
            " call ",
            pc.cast(pa.array(200 + did % 800), pa.string()),
            "-555-",
            pc.cast(pa.array(1000 + did % 9000), pa.string()),
        ],
    )
    ip = arm(
        did % 5 == 3,
        [
            " from 10.",
            pc.cast(pa.array(did % 256), pa.string()),
            ".",
            pc.cast(pa.array((did * 7) % 256), pa.string()),
            ".",
            pc.cast(pa.array(1 + did % 254), pa.string()),
        ],
    )
    card = arm(
        did % 11 == 4,
        [" card 4", pc.cast(pa.array(10**14 + did), pa.string())],
    )
    return pc.binary_join_element_wise(text, email, ssn, phone, ip, card, "")


def plant_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """DuckDB expression producing byte-identical planted text."""
    return f"""{text_expr}
  || CASE WHEN {id_expr} % 3 = 0 THEN ' contact user' || {id_expr} || '@example.com' ELSE '' END
  || CASE WHEN {id_expr} % 7 = 1 THEN ' ssn ' || (100 + {id_expr} % 900) || '-' || (10 + {id_expr} % 90) || '-' || (1000 + {id_expr} % 9000) ELSE '' END
  || CASE WHEN {id_expr} % 4 = 2 THEN ' call ' || (200 + {id_expr} % 800) || '-555-' || (1000 + {id_expr} % 9000) ELSE '' END
  || CASE WHEN {id_expr} % 5 = 3 THEN ' from 10.' || ({id_expr} % 256) || '.' || (({id_expr} * 7) % 256) || '.' || (1 + {id_expr} % 254) ELSE '' END
  || CASE WHEN {id_expr} % 11 = 4 THEN ' card 4' || (100000000000000 + {id_expr}) ELSE '' END"""


class PiiScan:
    """Actor-pool stage: count + redact every rule in order. Patterns are
    RE2 literals (module constants); nothing to compile — Arrow compiles
    per kernel call against its internal cache."""

    def __init__(self, plant: bool = True):
        self.plant = plant

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = planted_text(batch) if self.plant else batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.coalesce(text, "")
        cols: dict = {"doc_id": batch["doc_id"]}
        for name, pat, repl in PII_RULES:
            cols[f"n_{name}"] = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
            text = pc.replace_substring_regex(text, pat, repl)
        cols["text_redacted"] = text
        return pa.table(cols)


def pii_redact(sf_dir: str, plant: bool = True, out_dir: str | None = None):
    """doc_id, n_<rule> counts, fully-redacted text for every document.
    ``out_dir`` streams to sharded parquet (engine/ops/sink.py) — for this
    op the sink path matters most of all: the output carries the FULL
    redacted text, i.e. it is corpus-sized, and a driver frame of it is
    exactly what a 100-TB redaction run must never build."""
    import ray.data as rd

    from engine.ops.sink import sink_or_frame

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    res = ds.map_batches(
        PiiScan,
        fn_constructor_kwargs={"plant": plant},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_pool(),
    )
    return sink_or_frame(res, out_dir, sort_by="doc_id")
