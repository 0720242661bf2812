"""Deterministic synthetic transcript corpus (SURVEY.md §2.1-S3).

The sandbox stand-in for the 10^12-turn transcripts Parquet corpus
(BASELINE.json:15 input_hint): a seeded generator producing the exact T1
schema at any scale. Determinism contract: content of row (conv_id, turn_idx)
depends ONLY on (seed, conv index, turn index) — never on wall clock, block
boundaries, or parallelism — so two builds of the same (seed, n_convs) are
byte-identical regardless of Ray parallelism.

Ray-Data mapping: ``ray.data.range(n_convs).map_batches(gen)`` — each task
generates whole conversations from its id range; scales to any corpus size
without driver-side materialisation.

Term distribution is Zipfian (s≈1.07) over a derived vocabulary so head-term
skew is real (exercises salting, SURVEY.md §2.4-A4 / BASELINE.json:6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

VOCAB_SIZE = 4000
ZIPF_S = 1.07
# generated mix is user/assistant (+5% tool overwrite); "system" is listed
# as a valid schema value but never synthesized — changing the draw would
# silently invalidate every seed-keyed cached corpus (bench, oracle parquet)
_ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
_TOOLS = np.array(["", "search", "browser", "python", "calculator"], dtype=object)
BASE_TS_US = 1_700_000_000_000_000  # fixed epoch offset (no wall clock)


def _vocab(size: int = VOCAB_SIZE) -> np.ndarray:
    """Deterministic word list: syllabic words 'w' is avoided; rank-ordered."""
    rng = np.random.default_rng(1234)
    syll = np.array(
        ["ka", "ro", "mi", "ten", "sol", "ar", "ve", "lun", "dex", "or",
         "pi", "sa", "tu", "gli", "nor", "hem", "ba", "cy", "dro", "fen"],
        dtype=object,
    )
    n_syll = rng.integers(2, 5, size=size)
    words = []
    seen = set()
    for ns in n_syll:
        w = "".join(rng.choice(syll, size=ns))
        while w in seen:
            w = w + rng.choice(syll)
        seen.add(w)
        words.append(w)
    return np.array(words, dtype=object)


_VOCAB = _vocab()
_ZIPF_W = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_S
_ZIPF_CDF = np.cumsum(_ZIPF_W) / _ZIPF_W.sum()


def _gen_convs(conv_ids: np.ndarray, seed: int) -> pa.Table:
    """Generate all turns for the given conversation indices."""
    out_conv: list[str] = []
    out_turn: list[np.ndarray] = []
    out_role: list[np.ndarray] = []
    out_text: list[str] = []
    out_tool: list[np.ndarray] = []
    out_ts: list[np.ndarray] = []
    for c in conv_ids:
        c = int(c)
        rng = np.random.default_rng((seed << 32) ^ c)
        n_turns = int(rng.integers(2, 12))
        conv_id = f"conv{c:08d}"
        n_words = rng.integers(3, 60, size=n_turns)
        roles = _ROLES[rng.integers(0, 2, size=n_turns)]  # mostly user/assistant
        roles[rng.random(n_turns) < 0.05] = "tool"
        tools = np.where(
            roles == "tool", _TOOLS[rng.integers(1, len(_TOOLS), size=n_turns)], ""
        )
        ts = BASE_TS_US + c * 3_600_000_000 + np.cumsum(
            rng.integers(1_000_000, 30_000_000, size=n_turns)
        )
        total = int(n_words.sum())
        # clamp: cumsum/np.sum can disagree in the last ulp, leaving
        # _ZIPF_CDF[-1] < 1.0 — a draw landing in that sliver would index
        # one past the vocabulary (same guard as bm25.seeded_query_set)
        word_idx = np.minimum(
            np.searchsorted(_ZIPF_CDF, rng.random(total)), len(_VOCAB) - 1
        )
        words = _VOCAB[word_idx]
        off = 0
        for t in range(n_turns):
            k = int(n_words[t])
            out_text.append(" ".join(words[off : off + k]))
            off += k
        out_conv.extend([conv_id] * n_turns)
        out_turn.append(np.arange(n_turns, dtype=np.int32))
        out_role.append(roles)
        out_tool.append(tools)
        out_ts.append(ts)
    return pa.table(
        {
            "conv_id": pa.array(out_conv, type=pa.string()),
            "turn_idx": pa.array(np.concatenate(out_turn) if out_turn else [], type=pa.int32()),
            "role": pa.array(np.concatenate(out_role) if out_role else [], type=pa.string()),
            "text": pa.array(out_text, type=pa.string()),
            "tool": pa.array(np.concatenate(out_tool) if out_tool else [], type=pa.string()),
            "ts": pa.array(
                (np.concatenate(out_ts) if out_ts else np.array([], dtype=np.int64)).astype("datetime64[us]")
            ),
        }
    )


def synth_transcripts_table(n_convs: int, seed: int = 42) -> pa.Table:
    """Driver-side generation (small scales, tests)."""
    return _gen_convs(np.arange(n_convs), seed)


def synth_transcripts(n_convs: int, seed: int = 42, *, parallelism: int = -1):
    """Distributed generation: Dataset of T1 blocks, streamed."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return _gen_convs(batch["id"].to_numpy(), seed)

    ds = rd.range(n_convs, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=256)
