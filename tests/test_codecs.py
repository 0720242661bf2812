"""Unit + property tests for the posting codecs (SURVEY.md §5.1-5.2)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.index import codecs


class TestVarint:
    def test_roundtrip_edges(self):
        vals = np.array([0, 1, 127, 128, 255, 16383, 16384, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
        buf = codecs.varint_encode(vals)
        out, off = codecs.varint_decode(buf, len(vals))
        assert off == len(buf)
        np.testing.assert_array_equal(out, vals)

    def test_empty(self):
        assert codecs.varint_encode(np.array([], dtype=np.uint64)) == b""

    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_roundtrip_property(self, xs):
        vals = np.array(xs, dtype=np.uint64)
        out, _ = codecs.varint_decode(codecs.varint_encode(vals), len(vals))
        np.testing.assert_array_equal(out, vals)


class TestPackBits:
    @given(
        st.integers(min_value=0, max_value=64),
        st.integers(min_value=0, max_value=200),
        st.integers(min_value=0, max_value=2**32),
    )
    @settings(max_examples=50, deadline=None)
    def test_roundtrip(self, width, n, seed):
        rng = np.random.default_rng(seed)
        hi = (1 << width) - 1 if width else 0
        vals = rng.integers(0, hi + 1, size=n, dtype=np.uint64) if hi else np.zeros(n, dtype=np.uint64)
        buf = codecs.pack_bits(vals, width)
        out, _ = codecs.unpack_bits(buf, n, width)
        np.testing.assert_array_equal(out, vals)


class TestPFor:
    def test_all_equal_packs_tiny(self):
        vals = np.ones(128, dtype=np.uint64)
        buf = codecs.pfor_encode(vals)
        assert len(buf) <= 3 + 16 + 4  # header + 1-bit frame
        out, _ = codecs.pfor_decode(buf, 128)
        np.testing.assert_array_equal(out, vals)

    def test_exceptions_patched(self):
        vals = np.ones(128, dtype=np.uint64)
        vals[7] = 2**40
        vals[100] = 2**33
        buf = codecs.pfor_encode(vals)
        out, _ = codecs.pfor_decode(buf, 128)
        np.testing.assert_array_equal(out, vals)
        # frame width should stay tiny despite outliers
        assert buf[0] <= 2

    @given(st.lists(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=256), st.data())
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_property(self, xs, data):
        vals = np.array(xs, dtype=np.uint64)
        buf = codecs.pfor_encode(vals)
        out, off = codecs.pfor_decode(buf, len(vals))
        assert off == len(buf)
        np.testing.assert_array_equal(out, vals)


class TestStreamCodec:
    @given(st.lists(st.integers(min_value=0, max_value=2**50), min_size=0, max_size=1000), st.data())
    @settings(max_examples=50, deadline=None)
    def test_roundtrip(self, xs, data):
        vals = np.array(xs, dtype=np.uint64)
        buf = codecs.pfor_stream_encode(vals)
        r = codecs.StreamReader(buf, len(vals), 0)
        np.testing.assert_array_equal(r.decode_all(), vals)
        assert r.end == len(buf)

    def test_decode_range(self):
        rng = np.random.default_rng(3)
        vals = rng.integers(0, 2**20, size=1000, dtype=np.uint64)
        vals[::97] = 2**45  # force exceptions
        buf = codecs.pfor_stream_encode(vals)
        r = codecs.StreamReader(buf, 1000, 0)
        for s, e in [(0, 128), (128, 256), (500, 700), (896, 1000), (990, 2000)]:
            np.testing.assert_array_equal(r.decode_range(s, e), vals[s : min(e, 1000)])


class TestTermPostings:
    @given(st.integers(min_value=1, max_value=2000), st.integers(min_value=0, max_value=2**31))
    @settings(max_examples=30, deadline=None)
    def test_roundtrip(self, n, seed):
        rng = np.random.default_rng(seed)
        doc_keys = np.cumsum(rng.integers(1, 10_000, size=n)).astype(np.int64)
        tfs = rng.integers(1, 50, size=n).astype(np.int32)
        dls = rng.integers(1, 3000, size=n).astype(np.int32)
        buf, skips = codecs.encode_term_postings(doc_keys, tfs, dls)
        k, t, d = codecs.decode_term_postings(buf, n)
        np.testing.assert_array_equal(k, doc_keys)
        np.testing.assert_array_equal(t, tfs)
        np.testing.assert_array_equal(d, dls)
        assert len(skips) == (n + codecs.BLOCK_SIZE - 1) // codecs.BLOCK_SIZE
        assert skips[-1][1] == doc_keys[-1]

    def test_block_access_matches_full(self):
        rng = np.random.default_rng(7)
        n = 1000
        doc_keys = np.cumsum(rng.integers(1, 500, size=n)).astype(np.int64)
        tfs = rng.integers(1, 9, size=n).astype(np.int32)
        dls = rng.integers(5, 400, size=n).astype(np.int32)
        buf, skips = codecs.encode_term_postings(doc_keys, tfs, dls)
        tp = codecs.TermPostings(buf, n)
        for blk_idx, last_doc, ndocs, max_tf, min_dl in skips:
            base = -1 if blk_idx == 0 else skips[blk_idx - 1][1]
            k, t, d = tp.decode_block(blk_idx, base)
            s = blk_idx * codecs.BLOCK_SIZE
            np.testing.assert_array_equal(k, doc_keys[s : s + ndocs])
            np.testing.assert_array_equal(t, tfs[s : s + ndocs])
            np.testing.assert_array_equal(d, dls[s : s + ndocs])
            assert k[-1] == last_doc and t.max() == max_tf and d.min() == min_dl


class TestPostingList:
    @given(st.integers(min_value=1, max_value=1000), st.integers(min_value=0, max_value=2**31))
    @settings(max_examples=40, deadline=None)
    def test_roundtrip(self, n, seed):
        rng = np.random.default_rng(seed)
        doc_keys = np.cumsum(rng.integers(1, 10_000, size=n)).astype(np.int64)
        tfs = rng.integers(1, 50, size=n).astype(np.int32)
        dls = rng.integers(1, 3000, size=n).astype(np.int32)
        buf, skips = codecs.encode_posting_list(doc_keys, tfs, dls)
        k, t, d = codecs.decode_posting_list(buf, n)
        np.testing.assert_array_equal(k, doc_keys)
        np.testing.assert_array_equal(t, tfs)
        np.testing.assert_array_equal(d, dls)
        # skip metadata is sound
        assert len(skips) == (n + codecs.BLOCK_SIZE - 1) // codecs.BLOCK_SIZE
        assert skips[-1][1] == doc_keys[-1]
        assert sum(s[4] for s in skips) == n
        assert sum(s[3] for s in skips) == len(buf)

    def test_block_level_decode_with_skips(self):
        n = 500
        rng = np.random.default_rng(0)
        doc_keys = np.cumsum(rng.integers(1, 100, size=n)).astype(np.int64)
        tfs = np.ones(n, dtype=np.int32)
        dls = np.full(n, 7, dtype=np.int32)
        buf, skips = codecs.encode_posting_list(doc_keys, tfs, dls)
        # decode only block 2 using its skip entry
        blk = 2
        _, last_doc, off, nbytes, ndocs, max_tf, min_dl = skips[blk]
        prev_last = skips[blk - 1][1]
        k, t, d, _ = codecs.decode_block(buf, prev_last, off)
        np.testing.assert_array_equal(k, doc_keys[blk * 128 : blk * 128 + ndocs])
        assert k[-1] == last_doc
        assert max_tf == 1 and min_dl == 7


class TestSegmentBulkDecode:
    @given(st.integers(min_value=1, max_value=60), st.integers(min_value=0, max_value=2**31))
    @settings(max_examples=25, deadline=None)
    def test_bulk_matches_per_term(self, n_terms, seed):
        """decode_segment_postings ≡ per-term decode_term_postings, for a
        concatenated blob of many terms with mixed widths/exceptions."""
        rng = np.random.default_rng(seed)
        blobs, offsets, dfs, expected = [], [], [], []
        off = 0
        for _ in range(n_terms):
            n = int(rng.integers(1, 400))
            doc_keys = np.cumsum(rng.integers(1, 1 << int(rng.integers(1, 40)), size=n)).astype(np.int64)
            tfs = rng.integers(1, 50, size=n).astype(np.int32)
            dls = rng.integers(1, 3000, size=n).astype(np.int32)
            if rng.random() < 0.3:
                tfs[:: max(1, n // 5)] = 2**20  # force tf exceptions
            blob, _ = codecs.encode_term_postings(doc_keys, tfs, dls)
            blobs.append(blob)
            offsets.append(off)
            dfs.append(n)
            expected.append((doc_keys, tfs, dls))
            off += len(blob)
        buf = b"".join(blobs)
        dk, tf, dl = codecs.decode_segment_postings(buf, np.array(offsets), np.array(dfs))
        e_dk = np.concatenate([e[0] for e in expected])
        e_tf = np.concatenate([e[1] for e in expected])
        e_dl = np.concatenate([e[2] for e in expected])
        np.testing.assert_array_equal(dk, e_dk)
        np.testing.assert_array_equal(tf, e_tf)
        np.testing.assert_array_equal(dl, e_dl)
        # padded=True (zero-copy mmap path over segments written with the
        # 8-byte tail pad) must be bit-identical to the copy path
        dk2, tf2, dl2 = codecs.decode_segment_postings(
            buf + b"\x00" * 8, np.array(offsets), np.array(dfs), padded=True
        )
        np.testing.assert_array_equal(dk2, e_dk)
        np.testing.assert_array_equal(tf2, e_tf)
        np.testing.assert_array_equal(dl2, e_dl)

    def test_zero_df_terms_skipped(self):
        dk, tf, dl = codecs.decode_segment_postings(b"", np.array([], dtype=np.int64), np.array([], dtype=np.int64))
        assert dk.size == tf.size == dl.size == 0
