"""Ops-layer tests: dedup recall on injected duplicates, ANN recall,
multimodal plumbing, CLI verbs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


class TestDedupRecall:
    """The LSH paths must actually FIND near-duplicates (not just run)."""

    @pytest.fixture(scope="class")
    def dup_dir(self, tmp_path_factory):
        """documents-like table with injected exact + near duplicates."""
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(200)]
        texts, ids = [], []
        base_texts = []
        for i in range(60):
            words = list(rng.choice(vocab, size=50))
            base_texts.append(" ".join(words))
        did = 0
        for i, t in enumerate(base_texts):
            texts.append(t)
            ids.append(did)
            did += 1
            if i < 10:  # exact dup
                texts.append(t)
                ids.append(did)
                did += 1
            if 10 <= i < 20:  # near dup: one word changed
                words = t.split()
                words[7] = "CHANGED"
                texts.append(" ".join(words).lower())
                ids.append(did)
                did += 1
        d = tmp_path_factory.mktemp("dup")
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts}),
            str(d / "documents.parquet"),
        )
        return str(d)

    def test_exact_dedup_collapses_exact_dups(self, dup_dir, ray_session):
        from engine.ops.dedup import dedup_exact

        out = dedup_exact(dup_dir)
        assert out["dup_count"].sum() == 80  # 60 base + 10 exact + 10 near
        assert (out["dup_count"] == 2).sum() == 10
        assert len(out) == 70  # near dups NOT collapsed by exact dedup

    def test_minhash_finds_near_dups(self, dup_dir, ray_session):
        from engine.ops.dedup import minhash_candidates

        out = minhash_candidates(dup_dir, num_perm=64, bands=16, shingle_width=3)
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        # every exact-dup pair must be found; near-dup pairs (1/50 words
        # changed → shingle jaccard ~0.84) should mostly be found
        found_near = 0
        import duckdb

        con = duckdb.connect()
        df = con.execute(f"select doc_id, text from read_parquet('{dup_dir}/documents.parquet')").fetchdf()
        by_text = {}
        exact_pairs = []
        for r in df.itertuples():
            if r.text in by_text:
                exact_pairs.append((by_text[r.text], r.doc_id))
            by_text.setdefault(r.text, r.doc_id)
        assert exact_pairs and all(p in pairs for p in exact_pairs)

    def test_simhash_finds_near_dups(self, dup_dir, ray_session):
        from engine.ops.dedup import simhash_pairs

        out = simhash_pairs(dup_dir, max_hamming=3)
        assert len(out) >= 10  # exact dups have hamming 0


class TestANNRecall:
    def test_ivf_recall_vs_bruteforce(self, ray_session):
        from engine.ops.ann import cosine_topk, ivf_topk

        sf = "/root/testdata/sf0.001"
        exact = cosine_topk(sf, n_queries=5, k=10)
        approx = ivf_topk(sf, n_queries=5, k=10, n_lists=8, nprobe=4)
        recalls = []
        for qid in exact["qid"].unique():
            e = set(exact[exact.qid == qid]["vec_id"])
            a = set(approx[approx.qid == qid]["vec_id"])
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.5, f"IVF recall too low: {recalls}"


class TestMultimodal:
    def test_fake_decoder_pipeline(self, ray_session):
        from engine.ops.multimodal import media_pipeline, synth_media_table

        out = media_pipeline(64, seed=3).to_pandas()
        assert len(out) == 64
        assert set(out.columns) == {"id", "width", "height", "channels", "features"}
        assert all(len(f) == 16 for f in out["features"])
        # determinism
        t1 = synth_media_table(10, seed=1)
        t2 = synth_media_table(10, seed=1)
        assert t1.equals(t2)

    def test_real_decoder_raises(self):
        from engine.ops.multimodal import DecodeFeatures, synth_media_table

        dec = DecodeFeatures(decoder="real")
        with pytest.raises(NotImplementedError):
            dec(synth_media_table(1))


class TestCLI:
    def test_build_query_merge_verbs(self, tmp_path, ray_session, capsys):
        import json

        from engine.cli import main
        from engine.io.synth import synth_transcripts_table

        frag = str(tmp_path / "in")
        import os

        os.makedirs(frag)
        t = synth_transcripts_table(20, seed=3)
        pq.write_table(t, f"{frag}/part0.parquet")
        idx = str(tmp_path / "idx")
        main(["build", "--input", frag, "--index", idx, "--shards", "4"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["n_docs"] == t.num_rows
        qterm = t["text"][0].as_py().split()[0]
        main(["query", "--index", idx, "--text", qterm, "--k", "5"])
        lines = capsys.readouterr().out.strip().splitlines()
        rows = [json.loads(l) for l in lines]
        assert rows and all(r["rank"] >= 1 for r in rows)
        main(["merge", "--index", idx])
        assert "merges" in capsys.readouterr().out
