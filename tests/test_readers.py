"""JSONL corpus ingestion (engine/io/readers.py + CLI ingest/build):
format parity — the same rows through jsonl and parquet produce
identical indexes — plus schema validation and the converter."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_both(tmp_path, n=300):
    from engine.io.synth import synth_transcripts_table

    t = synth_transcripts_table(40, seed=17)
    pdir = tmp_path / "pq"
    pdir.mkdir()
    pq.write_table(t, str(pdir / "part0.parquet"))
    jdir = tmp_path / "jl"
    jdir.mkdir()
    cols = t.column_names
    with open(jdir / "part0.jsonl", "w") as f:
        for row in t.to_pylist():
            rec = {c: (row[c].isoformat() if c == "ts" else row[c])
                   for c in cols}
            f.write(json.dumps(rec) + "\n")
    return t, str(pdir), str(jdir)


class TestJsonlParity:
    def test_jsonl_build_matches_parquet_build(self, tmp_path, ray_session):
        from engine.index.build import build_index
        from engine.io.manifest import Manifest
        from engine.io.readers import read_jsonl_corpus
        from engine.oracle.bm25 import seeded_query_set
        from engine.query.engine import SegmentServer

        t, pdir, jdir = _write_both(tmp_path)
        pidx, jidx = str(tmp_path / "pidx"), str(tmp_path / "jidx")
        build_index(pdir, pidx, num_shards=4, build_id="p")
        build_index(read_jsonl_corpus(jdir), jidx, num_shards=4, build_id="j")
        ms, mj = Manifest(pidx).stats, Manifest(jidx).stats
        assert ms["n_docs"] == mj["n_docs"] and ms["sum_dl"] == mj["sum_dl"]
        sp, sj = SegmentServer(pidx, k=10), SegmentServer(jidx, k=10)
        for _qid, q in seeded_query_set(8, seed=5):
            dkp, scp = sp.topk(q)
            dkj, scj = sj.topk(q)
            np.testing.assert_array_equal(dkp, dkj, err_msg=q)
            np.testing.assert_allclose(scp, scj, rtol=0, atol=0)

    def test_ingest_cli_roundtrip(self, tmp_path, ray_session, capsys):
        from engine.cli import main

        t, pdir, jdir = _write_both(tmp_path)
        out = str(tmp_path / "converted")
        main(["ingest", "--input", jdir, "--out", out])
        summ = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summ["rows"] == t.num_rows
        # the converted parquet builds through the ordinary lineage path
        idx = str(tmp_path / "cidx")
        main(["build", "--input", out, "--index", idx, "--shards", "4"])
        built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert built["n_docs"] == t.num_rows

    def test_jsonl_build_via_cli(self, tmp_path, ray_session, capsys):
        from engine.cli import main

        t, pdir, jdir = _write_both(tmp_path)
        idx = str(tmp_path / "jlidx")
        main(["build", "--input", jdir, "--index", idx, "--shards", "4"])
        built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert built["n_docs"] == t.num_rows

    def test_missing_column_fails_loud(self, tmp_path, ray_session):
        from engine.io.readers import read_jsonl_corpus

        bad = tmp_path / "bad"
        bad.mkdir()
        with open(bad / "x.jsonl", "w") as f:
            f.write(json.dumps({"conv_id": "c0", "turn_idx": 0}) + "\n")
        with pytest.raises(ValueError, match="text"):
            read_jsonl_corpus(str(bad))

    def test_html_extraction_recovers_document_text(self, ray_session):
        """ta_html_extract (X139): the extraction chain recovers every
        original token in order (tag stripping undoes the link wrapping),
        counts exactly the injected links, and decodes the footer
        entities — checked directly against the rule the fixture
        injects."""
        import pyarrow.parquet as pq_mod

        from engine.ops.html import extract_batch, html_corpus_path

        sf = "/root/testdata/sf0.001"
        path = html_corpus_path(sf)
        hdf = pq_mod.read_table(path).to_pandas().head(25)
        docs = pq_mod.read_table(f"{sf}/documents.parquet",
                                 columns=["doc_id", "text"]).to_pandas()
        text_of = dict(zip(docs["doc_id"].astype(int), docs["text"]))
        ex = extract_batch(hdf["html"])
        for (_, row), (_, e) in zip(hdf.iterrows(), ex.iterrows()):
            toks = str(text_of[int(row["doc_id"])]).split()
            words = e["text"].split()
            # h1 chrome, then every original token in order, then footer
            assert words[:2] == ["doc", str(int(row["doc_id"]))]
            i = 0
            for w in words:
                if i < len(toks) and w == toks[i]:
                    i += 1
            assert i == len(toks), (row["doc_id"], i, len(toks))
            assert e["n_links"] == sum(1 for i2 in range(len(toks))
                                       if i2 % 7 == 3)
            assert e["text"].endswith('copy & paste <ok> "quoted" it\'s fine')

    def test_extra_columns_dropped_and_optional_kept(self, tmp_path, ray_session):
        from engine.io.readers import read_jsonl_corpus

        d = tmp_path / "extra"
        d.mkdir()
        with open(d / "x.jsonl", "w") as f:
            f.write(json.dumps({"conv_id": "c0", "turn_idx": 0,
                                "text": "hello row", "role": "user",
                                "junk": 42}) + "\n")
        ds = read_jsonl_corpus(str(d))
        got = ds.to_pandas()
        assert set(got.columns) == {"conv_id", "turn_idx", "text", "role"}
        assert got["turn_idx"].dtype == np.int32