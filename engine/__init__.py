"""Ray-Data-native inverted-index builder + BM25 query engine.

Blueprint: SURVEY.md; authoritative spec: BASELINE.json (north_rule).
The library NEVER calls ray.init()/ray.shutdown() — the driver owns the
session (__ray_entry__.py contract).
"""

try:  # configure hash shuffle before any Dataset is created by our callers
    from engine.core.context import tune_shuffle as _ehs

    _ehs()
except Exception:  # pragma: no cover - ray not importable yet
    pass
