"""Input-side predicates and the tool-column parser (SURVEY.md §2.2-M6/M7).

All are vectorised Arrow-kernel map_batches bodies; ``apply_input_filters``
composes them in front of the build passes (both docmap and triples see the
same filtered view, so stats stay consistent).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def filter_roles(batch: pa.Table, roles: set[str] | list[str]) -> pa.Table:
    return batch.filter(pc.is_in(batch["role"], value_set=pa.array(sorted(set(roles)))))


def filter_time(batch: pa.Table, ts_min=None, ts_max=None) -> pa.Table:
    mask = None
    if ts_min is not None:
        mask = pc.greater_equal(batch["ts"], pa.scalar(np.datetime64(ts_min, "us")))
    if ts_max is not None:
        m2 = pc.less(batch["ts"], pa.scalar(np.datetime64(ts_max, "us")))
        mask = m2 if mask is None else pc.and_(mask, m2)
    return batch if mask is None else batch.filter(mask)


def apply_input_filters(ds, *, roles=None, ts_min=None, ts_max=None):
    """Compose the configured predicates as ONE vectorised map_batches stage
    (filter-pushdown happens at the parquet read via column pruning; row
    predicates run here on zero-copy Arrow batches)."""
    if roles is None and ts_min is None and ts_max is None:
        return ds

    def fn(batch: pa.Table) -> pa.Table:
        if roles is not None:
            batch = filter_roles(batch, roles)
        if ts_min is not None or ts_max is not None:
            batch = filter_time(batch, ts_min, ts_max)
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def parse_tool(batch: pa.Table) -> pa.Table:
    """Tolerant parser for the ``tool`` column → struct-ish facet columns
    (tool_name, tool_args_json). Accepts plain names, empty strings, or JSON
    objects {'name': ..., 'args': {...}}; garbage degrades to the raw string
    as the name (never raises — SURVEY.md M7 'tolerant parser')."""
    names, args = [], []
    for v in batch["tool"].to_pylist():
        if not v:
            names.append("")
            args.append("")
            continue
        s = v.strip()
        if s.startswith("{"):
            try:
                obj = json.loads(s)
                names.append(str(obj.get("name", "")))
                args.append(json.dumps(obj.get("args", {}), sort_keys=True))
                continue
            except (ValueError, AttributeError):
                pass
        names.append(s)
        args.append("")
    return batch.append_column("tool_name", pa.array(names, type=pa.string())).append_column(
        "tool_args_json", pa.array(args, type=pa.string())
    )


def tool_facets(ds):
    """Facet counting over parsed tool names: groupby aggregate."""
    from ray.data.aggregate import Count

    from engine.core.context import ensure_hash_shuffle

    ensure_hash_shuffle()
    return (
        ds.map_batches(parse_tool, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tool_name")
        .aggregate(Count(alias_name="n_turns"))
    )
