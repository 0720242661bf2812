"""M6 role/time filters, M7 tool parser, D1 input dedup (SURVEY.md §2.2/2.8)."""

import numpy as np
import pyarrow as pa
import pytest

from engine.core.dockey import doc_key_batch
from engine.index.build import build_index
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import BM25Oracle, seeded_query_set
from engine.query.engine import SegmentServer
from engine.text.filters import parse_tool


class TestBuildFilters:
    def test_role_filter_build(self, tmp_path, ray_session):
        import ray.data as rd

        t = synth_transcripts_table(30, seed=8)
        keep = t.filter(pa.compute.is_in(t["role"], value_set=pa.array(["user"])))
        oracle = BM25Oracle(
            list(doc_key_batch(keep["conv_id"], keep["turn_idx"].to_numpy())),
            keep["text"].to_pylist(),
        )
        idx = str(tmp_path / "rf")
        build_index(rd.from_arrow(t), idx, num_shards=4, roles=["user"], build_id="rf")
        srv = SegmentServer(idx, k=10)
        assert srv.n_docs == keep.num_rows
        for qid, q in seeded_query_set(8, seed=3):
            wk, ws = oracle.topk(q, 10)
            gk, gs = srv.topk(q, 10)
            np.testing.assert_array_equal(gk, wk)
            np.testing.assert_array_equal(gs, ws)

    def test_time_filter_build(self, tmp_path, ray_session):
        import ray.data as rd

        t = synth_transcripts_table(30, seed=8)
        cutoff = np.datetime64(int(np.median(t["ts"].cast(pa.int64()).to_numpy())), "us")
        keep = t.filter(pa.compute.less(t["ts"], pa.scalar(cutoff)))
        idx = str(tmp_path / "tf")
        build_index(rd.from_arrow(t), idx, num_shards=4, ts_max=cutoff, build_id="tf")
        assert SegmentServer(idx, k=5).n_docs == keep.num_rows

    def test_dedup_input_build(self, tmp_path, ray_session):
        import ray.data as rd

        t = synth_transcripts_table(20, seed=8)
        # duplicate every row with a LATER ts and junk text: dedup must keep
        # the original (min ts) rows only
        dup = t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            pa.array(t["ts"].cast(pa.int64()).to_numpy() + 10**9).cast(pa.timestamp("us")),
        )
        dup = dup.set_column(
            dup.schema.get_field_index("text"), "text",
            pa.array(["junkjunk"] * dup.num_rows, type=pa.string()),
        )
        both = pa.concat_tables([dup, t])  # junk first in input order
        oracle = BM25Oracle(
            list(doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())), t["text"].to_pylist()
        )
        idx = str(tmp_path / "dd")
        build_index(rd.from_arrow(both), idx, num_shards=4, dedup_input=True, build_id="dd")
        srv = SegmentServer(idx, k=10)
        assert srv.n_docs == t.num_rows
        hits, df = srv._term_hits("junkjunk")
        assert df == 0, "later-ts duplicates must be dropped"
        for qid, q in seeded_query_set(6, seed=1):
            wk, ws = oracle.topk(q, 10)
            gk, gs = srv.topk(q, 10)
            np.testing.assert_array_equal(gk, wk)


class TestParseTool:
    def test_tolerant_parse(self):
        batch = pa.table(
            {
                "tool": [
                    "",
                    "search",
                    '{"name": "browser", "args": {"url": "x"}}',
                    "{broken json",
                    None,
                ]
            }
        )
        out = parse_tool(batch)
        assert out["tool_name"].to_pylist() == ["", "search", "browser", "{broken json", ""]
        assert out["tool_args_json"].to_pylist()[2] == '{"url": "x"}'

    def test_tool_facets(self, ray_session):
        import ray.data as rd

        from engine.text.filters import tool_facets

        t = synth_transcripts_table(30, seed=8)
        out = tool_facets(rd.from_arrow(t)).to_pandas()
        want = t.to_pandas().groupby("tool").size()
        got = dict(zip(out["tool_name"], out["n_turns"]))
        for name, n in want.items():
            assert got[name] == n
