"""Index lifecycle management (engine/index/ilm.py): rollover at the doc
threshold, retention dropping old slices, incremental append into the
write slice, and query fan-out seeing exactly the live docs."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _corpus_part(tmp, part: int, n: int, word: str):
    """One corpus fragment: n turns, each containing a part-unique word."""
    d = tmp / f"part{part}"
    d.mkdir()
    t = pa.table({
        "conv_id": pa.array([f"p{part}c{i:04d}" for i in range(n)]),
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "text": pa.array([f"{word} common filler row {i}" for i in range(n)]),
    })
    pq.write_table(t, str(d / "part.parquet"))
    return str(d)


class TestLifecycle:
    @pytest.fixture()
    def fam(self, tmp_path):
        from engine.index.ilm import IndexLifecycle

        return IndexLifecycle(str(tmp_path / "family"), max_docs_per_slice=100)

    def test_rollover_and_retention(self, fam, tmp_path, ray_session):
        # two appends fit in slice 0; the second crosses the threshold
        r1 = fam.append(_corpus_part(tmp_path, 1, 60, "alpha"))
        assert r1 == {"slice": 0, "n_docs": 60, "rolled_over": False}
        r2 = fam.append(_corpus_part(tmp_path, 2, 60, "bravo"))
        assert r2["slice"] == 0 and r2["n_docs"] == 120 and r2["rolled_over"]
        # the next append opens slice 1; slice 0 stays queryable
        r3 = fam.append(_corpus_part(tmp_path, 3, 30, "charlie"))
        assert r3 == {"slice": 1, "n_docs": 30, "rolled_over": False}
        assert [os.path.basename(d) for d in fam.live_slices()] == [
            "slice-000000", "slice-000001"]
        assert fam.total_docs() == 150

        # query fan-out sees docs from every live slice
        from engine.query.engine import SegmentServer

        def hits(term):
            out = set()
            for d in fam.live_slices():
                dk, _sc = SegmentServer(d, k=1000).topk(term)
                out.update(int(x) for x in dk)
            return out

        assert len(hits("alpha")) == 60
        assert len(hits("charlie")) == 30
        assert len(hits("common")) == 150

        # retention: keep only the newest slice; old period = one rmtree
        dropped = fam.retain(keep_last=1)
        assert [os.path.basename(d) for d in dropped] == ["slice-000000"]
        assert [os.path.basename(d) for d in fam.live_slices()] == ["slice-000001"]
        assert fam.total_docs() == 30
        assert hits("alpha") == set()
        assert len(hits("common")) == 30
        # the drop is recorded for readers
        assert fam._load()["dropped"] == ["slice-000000"]

    def test_retain_never_drops_write_slice(self, fam, tmp_path, ray_session):
        fam.append(_corpus_part(tmp_path, 1, 120, "alpha"))  # fills slice 0
        # write slice is now 1 but has no manifest yet; retain(1) keeps the
        # only live slice (slice 0) because it IS the newest keep_last=1
        assert fam.retain(keep_last=1) == []
        assert len(fam.live_slices()) == 1

    def test_append_is_incremental_not_rebuild(self, fam, tmp_path,
                                               ray_session, monkeypatch):
        """A second append over a GROWN corpus dir indexes only the new
        fragment (the X20 lineage-diff path): doc count doubles without a
        wipe of the first build's segments."""
        d = tmp_path / "grow"
        d.mkdir()
        t1 = pa.table({
            "conv_id": pa.array([f"a{i}" for i in range(40)]),
            "turn_idx": pa.array([0] * 40, type=pa.int32()),
            "text": pa.array(["alpha row"] * 40),
        })
        pq.write_table(t1, str(d / "one.parquet"))
        assert fam.append(str(d))["n_docs"] == 40
        t2 = pa.table({
            "conv_id": pa.array([f"b{i}" for i in range(40)]),
            "turn_idx": pa.array([0] * 40, type=pa.int32()),
            "text": pa.array(["bravo row"] * 40),
        })
        pq.write_table(t2, str(d / "two.parquet"))
        out = fam.append(str(d))
        assert out["n_docs"] == 80 and out["slice"] == 0
