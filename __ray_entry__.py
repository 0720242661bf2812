"""Driver contract for the graft builder (Ray Data target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2) over the
sf_dir parquet tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL for
every SQL-expressible entry (same column names, integer cent/micro units for
order-sensitive float aggregates — see engine/pipelines.py docstring).
Entries without SQL (LSH/SimHash/IVF/lang-id/transcript pipelines) get the
driver's rows-only check and are oracle-tested in pytest instead.

Ray is initialised by the driver BEFORE this module is imported: nothing
below calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# ---------------------------------------------------------------------------
# shared SQL fragments (must mirror engine/text/analyzer.py exactly)
# ---------------------------------------------------------------------------

_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

_TOK_CTE = f"""
tok AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1)
"""


def _doc_queries_values() -> str:
    from engine.pipelines import DOC_QUERIES

    rows = ", ".join(f"({qid}, '{text}')" for qid, text in DOC_QUERIES)
    return f"(VALUES {rows})"


def _not_queries_values() -> str:
    from engine.pipelines import NOT_QUERIES

    rows = ", ".join(f"({qid}, '{t}', '{ex}')" for qid, t, ex in NOT_QUERIES)
    return f"(VALUES {rows})"


def _bm25_not_sql(k: int) -> str:
    return f"""
WITH {_TOK_CTE},
q(qid, qtext, extext) AS {_not_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
exterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(extext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
excluded AS (
  SELECT DISTINCT e.qid, tf.doc_id FROM exterm e JOIN tf ON tf.term = e.term
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c
  WHERE NOT EXISTS (SELECT 1 FROM excluded x WHERE x.qid = c.qid AND x.doc_id = c.doc_id)
  GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_filtered_sql(k: int) -> str:
    """Oracle for ft_bm25_filtered: the engine builds over a documents-derived
    transcripts corpus (engine/pipelines.py::documents_as_transcripts) with
    roles=['user'] (⇔ doc_id%2==0) and a ts window (⇔ 100 <= doc_id < 4000);
    docID hydrates to 'd<doc_id>:<doc_id%4>'; tie-break = external doc_key
    (= doc_id) asc."""
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % 2 = 0 AND doc_id >= 100 AND doc_id < 4000
),
tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM docs),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM docs)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM docs) avgdl
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank,
       'd' || doc_id::VARCHAR || ':' || (doc_id % 4)::VARCHAR AS doc_id,
       score_micro
FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_snippets_sql(k: int, window: int = 5) -> str:
    """Top-k + snippet: the token window (±window) around the first
    occurrence of any query term, recomputed from the same tokenization."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
topk AS (
  SELECT qid, rank, doc_id, score_micro FROM (
    SELECT qid, doc_id, score_micro,
           row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
    FROM scored
  ) WHERE rank <= {k}
),
dtok AS (SELECT doc_id, {_TOKS} toks FROM documents),
hitpos AS (
  SELECT t.qid, t.rank, t.doc_id, t.score_micro, d.toks,
         (SELECT min(list_position(d.toks, qt.term))
          FROM qterm qt
          WHERE qt.qid = t.qid AND list_position(d.toks, qt.term) > 0) p
  FROM topk t JOIN dtok d ON d.doc_id = t.doc_id
)
SELECT qid, rank, doc_id, score_micro,
       array_to_string(toks[greatest(1, p - {window}) : p + {window}], ' ') snippet
FROM hitpos ORDER BY qid, rank
"""


def _tr_bm25_boosted_sql(k: int) -> str:
    """Role-boosted oracle: standard BM25 sum per (query, turn), scaled by
    the turn's role boost (exact binary fractions — lossless float scaling)
    before micro-rounding and ranking."""
    from engine.oracle.bm25 import seeded_query_set
    from engine.pipelines import ROLE_BOOSTS, tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in seeded_query_set(20, seed=7))
    case = " ".join(f"WHEN '{r}' THEN {w}" for r, w in ROLE_BOOSTS.items())
    return f"""
WITH src AS (SELECT doc_key, role, text FROM read_parquet('{path}')),
tok AS (SELECT doc_key, unnest({_TOKS}) AS term FROM src),
tf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_key, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM src) avgdl
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_key,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_key = tf.doc_key
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_key,
         floor((CASE src.role {case} ELSE 1.0 END * sum(c.w)) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c JOIN src ON src.doc_key = c.doc_key
  GROUP BY c.qid, c.doc_key, src.role
)
SELECT qid, rank, doc_key, score_micro FROM (
  SELECT qid, doc_key, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_key ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_bm25_incremental_sql(k: int) -> str:
    """Oracle for the incremental-build entry: BM25 over the UNION of both
    corpus parts (one single-pass SQL truth) — a hash match against the
    two-pass engine index proves partial builds compose deterministically."""
    from engine.oracle.bm25 import seeded_query_set
    from engine.pipelines import _tr_incremental_corpus

    d = _tr_incremental_corpus()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in seeded_query_set(20, seed=7))
    return f"""
WITH src AS (SELECT doc_key, text FROM read_parquet('{d}/*.parquet')),
tok AS (SELECT doc_key, unnest({_TOKS}) AS term FROM src),
tf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_key, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM src) avgdl
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_key,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_key = tf.doc_key
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_key, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_key, score_micro FROM (
  SELECT qid, doc_key, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_key ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_conv_stats_sql() -> str:
    """Conversation rollup oracle over the same materialized parquet —
    epoch-µs ints and char counts, all exact."""
    from engine.pipelines import tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    return f"""
SELECT conv_id,
       count(*)::BIGINT n_turns,
       sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)::BIGINT n_tool,
       min(epoch_us(ts))::BIGINT first_us,
       max(epoch_us(ts))::BIGINT last_us,
       (max(epoch_us(ts)) - min(epoch_us(ts)))::BIGINT duration_us,
       sum(length(text))::BIGINT sum_chars
FROM read_parquet('{path}')
GROUP BY conv_id ORDER BY conv_id
"""


def _tr_match_histogram_sql() -> str:
    """Date-histogram oracle: a doc matches a query iff it shares ≥1 term;
    daily counts of each query's full match set over the same materialized
    transcript parquet."""
    from engine.oracle.bm25 import seeded_query_set
    from engine.pipelines import tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in seeded_query_set(20, seed=7))
    return f"""
WITH src AS (SELECT doc_key, ts, text FROM read_parquet('{path}')),
tok AS (SELECT DISTINCT doc_key, unnest({_TOKS}) AS term FROM src),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, tok.doc_key FROM qterm qt JOIN tok ON tok.term = qt.term)
SELECT m.qid, epoch(date_trunc('day', src.ts))::BIGINT day_epoch, count(*)::BIGINT n_matches
FROM m JOIN src ON src.doc_key = m.doc_key
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _bm25_postfilter_sql(k: int) -> str:
    """Post-filter oracle: BM25 restricted to docs whose attribute column
    equals the query's required value."""
    from engine.pipelines import POSTFILTER_QUERIES

    rows = ", ".join(
        f"({q}, '{t}', '{c}', '{v}')" for q, t, c, v in POSTFILTER_QUERIES
    )
    return f"""
WITH {_TOK_CTE},
q(qid, qtext, fcol, fval) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c
  JOIN q ON q.qid = c.qid
  JOIN documents d ON d.doc_id = c.doc_id
  WHERE (q.fcol = 'lang' AND d.lang = q.fval)
     OR (q.fcol = 'source' AND d.source = q.fval)
  GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_range_sql(k: int) -> str:
    """Range-query oracle: BM25 restricted to docs whose n_chars falls in
    the query's half-open [lo, hi) window (the RANGE_QUERIES literal)."""
    from engine.pipelines import RANGE_QUERIES

    rows = ", ".join(f"({q}, '{t}', {lo}, {hi})" for q, t, lo, hi in RANGE_QUERIES)
    return f"""
WITH {_TOK_CTE},
q(qid, qtext, lo, hi) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c
  JOIN q ON q.qid = c.qid
  JOIN documents d ON d.doc_id = c.doc_id
  WHERE d.n_chars >= q.lo AND d.n_chars < q.hi
  GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _ta_bpe_merges_sql() -> str:
    """BPE merge-loop oracle: BPE_MERGE_ROUNDS rounds unrolled as chained
    CTEs (the emb_kmeans pattern) over the weighted vocabulary. Each round
    re-counts adjacent symbol pairs from the space-separated state string,
    adopts the (cnt desc, left asc, right asc) argmax, and applies it with
    ``replace`` — whose left-to-right non-overlapping semantics match the
    engine's pandas ``str.replace`` exactly (verified)."""
    from engine.ops.textstats import BPE_MERGE_ROUNDS

    ctes = ["state0 AS (SELECT cf, ' ' || regexp_replace(term, '(.)', '\\1 ', 'g') s FROM vocab)"]
    sels = []
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        ctes.append(f"""p{r} AS (
  SELECT pr.a a, pr.b b, sum(cf)::BIGINT cnt FROM (
    SELECT cf,
           unnest(list_transform(range(1, len(syms)),
                                 i -> {{'a': syms[i], 'b': syms[i + 1]}})) pr
    FROM (SELECT cf, list_filter(string_split(s, ' '), x -> x <> '') syms
          FROM state{r - 1})
  ) GROUP BY 1, 2
)""")
        ctes.append(f"best{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)")
        ctes.append(f"""state{r} AS (
  SELECT cf, replace(s, ' ' || ba.a || ' ' || ba.b || ' ',
                     ' ' || ba.a || ba.b || ' ') s
  FROM state{r - 1}, best{r} ba
)""")
        sels.append(f"SELECT {r - 1}::BIGINT merge_idx, a AS \"left\", b AS \"right\", cnt FROM best{r}")
    toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    return (
        f"WITH tok AS (SELECT unnest({toks}) term FROM documents),\n"
        "vocab AS (SELECT term, count(*)::BIGINT cf FROM tok GROUP BY 1),\n"
        + ",\n".join(ctes)
        + "\n" + "\nUNION ALL\n".join(sels)
        + "\nORDER BY merge_idx"
    )


def _script_fields_sql(k: int) -> str:
    """Scripted-fields oracle: the standard BM25 top-k, then the SAME
    expression strings the engine compiles (engine/pipelines.py::
    SCRIPT_FIELDS) evaluated verbatim by DuckDB over the joined doc
    values — the parity contract of the shared '//' / '%' semantics."""
    from engine.pipelines import SCRIPT_FIELDS

    exprs = ",\n       ".join(f"({src})::BIGINT AS {name}"
                              for name, src in SCRIPT_FIELDS)
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
ranked AS (
  SELECT qid, doc_id, score_micro, rank FROM (
    SELECT qid, doc_id, score_micro,
           row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
    FROM scored
  ) WHERE rank <= {k}
),
base AS (
  SELECT r.qid, r.rank, r.doc_id, r.score_micro, d.n_chars
  FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
)
SELECT qid, rank, doc_id, score_micro,
       {exprs}
FROM base
ORDER BY qid, rank
"""


def _scripted_metric_sql() -> str:
    """Scripted-metric oracle: the full per-query match set (union of term
    postings), BM25 micro score per (qid, doc), then the SAME expression
    string summed by DuckDB."""
    from engine.pipelines import SCRIPTED_METRIC_EXPR

    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
base AS (
  SELECT s.qid, s.doc_id, s.score_micro, d.n_chars
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT qid, count(*)::BIGINT n_matches,
       sum({SCRIPTED_METRIC_EXPR})::BIGINT metric_sum
FROM base GROUP BY 1 ORDER BY qid
"""


def _ta_html_extract_sql() -> str:
    """HTML-extraction oracle: DuckDB replays the documented rule chain
    (script/style blocks → link count → tag strip → fixed entity decode
    with &amp; last → whitespace collapse) over the SAME materialized
    HTML parquet the engine reads, and md5's the extracted text — a
    value-hash proof of the extracted BYTES. Pinned to the driver's
    correctness scale via a documents-view fingerprint guard."""
    import os

    import pyarrow.parquet as _pq

    from engine.ops.html import ENTITIES, html_corpus_path

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/documents.parquet"):
        raise OSError("driver correctness dataset absent")
    path = html_corpus_path(sf)
    t = _pq.read_table(f"{sf}/documents.parquet", columns=["n_chars"])
    n, sm = t.num_rows, int(sum(t["n_chars"].to_pylist()))
    ent_chain = "s"
    for ent, rep in ENTITIES:
        rep_sql = rep.replace("'", "''")
        ent_chain = f"replace({ent_chain}, '{ent}', '{rep_sql}')"
    return f"""
WITH pinchk AS (
  SELECT CASE WHEN (SELECT count(*) FROM documents) = {n}
               AND (SELECT sum(n_chars) FROM documents) = {sm}
         THEN 1 ELSE error('attached documents view is not the pinned '
              'sf0.01 table this materialized HTML corpus derives from; '
              'run at sf0.01') END ok
),
src AS (SELECT doc_id, html FROM read_parquet('{path}'), pinchk),
noblocks AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(html, '<script.*?</script>', ' ', 'gs'),
                        '<style.*?</style>', ' ', 'gs') s
  FROM src
),
counted AS (
  SELECT doc_id, s, len(regexp_extract_all(s, '<a '))::BIGINT n_links
  FROM noblocks
),
stripped AS (
  SELECT doc_id, n_links, regexp_replace(s, '<[^>]*>', ' ', 'g') s FROM counted
),
decoded AS (SELECT doc_id, n_links, {ent_chain} s FROM stripped),
finaltext AS (
  SELECT doc_id, n_links,
         trim(regexp_replace(s, '\\s+', ' ', 'g')) txt
  FROM decoded
)
SELECT doc_id, length(txt)::BIGINT n_chars_text, n_links,
       (n_links * 1000000) // greatest(length(txt), 1) link_density_micro,
       md5(txt) text_md5
FROM finaltext ORDER BY doc_id
"""


def _ta_link_hosts_sql() -> str:
    """Link-host rollup oracle: hrefs re-extracted and host-parsed by
    DuckDB RE2 over the same materialized HTML parquet; per-host link and
    distinct-doc counts. Same sf0.01 pin guard as ta_html_extract."""
    import os

    import pyarrow.parquet as _pq

    from engine.ops.html import html_corpus_path

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/documents.parquet"):
        raise OSError("driver correctness dataset absent")
    path = html_corpus_path(sf)
    t = _pq.read_table(f"{sf}/documents.parquet", columns=["n_chars"])
    n, sm = t.num_rows, int(sum(t["n_chars"].to_pylist()))
    return f"""
WITH pinchk AS (
  SELECT CASE WHEN (SELECT count(*) FROM documents) = {n}
               AND (SELECT sum(n_chars) FROM documents) = {sm}
         THEN 1 ELSE error('attached documents view is not the pinned '
              'sf0.01 table this materialized HTML corpus derives from; '
              'run at sf0.01') END ok
),
src AS (SELECT doc_id, html FROM read_parquet('{path}'), pinchk),
links AS (
  SELECT doc_id, unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) url
  FROM src
),
hosts AS (
  SELECT doc_id, regexp_extract(url, '^https?://([^/]+)/', 1) host FROM links
  WHERE regexp_matches(url, '^https?://[^/]+/')
)
SELECT host, count(*)::BIGINT n_links, count(DISTINCT doc_id)::BIGINT n_docs
FROM hosts GROUP BY 1 ORDER BY 1
"""


def _bm25_stopword_sql(k: int) -> str:
    """Stopword-analyzer oracle: the token CTE drops Lucene's English stop
    set on BOTH sides, so tf/df/dl/avgdl are all content-term statistics
    (a stopword-keeping dl would shift every BM25 score)."""
    from engine.pipelines import STOP_QUERIES
    from engine.text.analyzer import ENGLISH_STOPWORDS

    stops = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOPWORDS))
    rows = ", ".join(f"({q}, '{t}')" for q, t in STOP_QUERIES)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
ctok AS (SELECT doc_id, term FROM tok WHERE term NOT IN ({stops})),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM ctok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM ctok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid, term FROM (
    SELECT qid,
           unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
    FROM q
  ) WHERE term NOT IN ({stops})
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _ta_bpe_encode_sql() -> str:
    """Apply-BPE oracle: REPLAYS the whole tokenizer story — the
    BPE_MERGE_ROUNDS training rounds unrolled as chained CTEs (carrying
    the term through the state this time), then ENCODING: per term the
    final symbol split, symbol ids = rank in the sorted distinct symbol
    set, and per doc Σ tf·n_syms / Σ tf·sum_id via plain joins."""
    from engine.ops.textstats import BPE_MERGE_ROUNDS

    ctes = [
        "state0 AS (SELECT term, cf, ' ' || regexp_replace(term, '(.)', '\\1 ', 'g') s FROM vocab)"
    ]
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        ctes.append(f"""p{r} AS (
  SELECT pr.a a, pr.b b, sum(cf)::BIGINT cnt FROM (
    SELECT cf,
           unnest(list_transform(range(1, len(syms)),
                                 i -> {{'a': syms[i], 'b': syms[i + 1]}})) pr
    FROM (SELECT cf, list_filter(string_split(s, ' '), x -> x <> '') syms
          FROM state{r - 1})
  ) GROUP BY 1, 2
)""")
        ctes.append(f"best{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)")
        ctes.append(f"""state{r} AS (
  SELECT term, cf, replace(s, ' ' || ba.a || ' ' || ba.b || ' ',
                           ' ' || ba.a || ba.b || ' ') s
  FROM state{r - 1}, best{r} ba
)""")
    K = BPE_MERGE_ROUNDS
    toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    return (
        f"WITH tok AS (SELECT doc_id, unnest({toks}) term FROM documents),\n"
        "vocab AS (SELECT term, count(*)::BIGINT cf FROM tok GROUP BY 1),\n"
        "doctf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),\n"
        + ",\n".join(ctes) + f""",
split AS (
  SELECT term, list_filter(string_split(s, ' '), x -> x <> '') syms FROM state{K}
),
symtab AS (
  SELECT sym, (row_number() OVER (ORDER BY sym) - 1)::BIGINT id
  FROM (SELECT DISTINCT unnest(syms) sym FROM split)
),
word AS (
  SELECT sp.term, len(sp.syms)::BIGINT n_syms, sum(st.id)::BIGINT sum_id
  FROM (SELECT term, syms, unnest(syms) sym FROM split) sp
  JOIN symtab st ON st.sym = sp.sym
  GROUP BY sp.term, sp.syms
)
SELECT dt.doc_id,
       sum(dt.tf)::BIGINT n_toks,
       sum(dt.tf * w.n_syms)::BIGINT n_bpe,
       sum(dt.tf * w.sum_id)::BIGINT checksum
FROM doctf dt JOIN word w ON w.term = dt.term
GROUP BY 1 ORDER BY 1
""")


def _bm25_synonyms_sql(k: int) -> str:
    """Synonym oracle: a (term → class member) mapping table expands each
    query token via LEFT JOIN (unmapped tokens pass through), then standard
    BM25 over the expanded disjunction. The mapping rows are generated from
    the SAME SYNONYM_GROUPS the engine uses."""
    from engine.pipelines import SYN_QUERIES, SYNONYM_GROUPS

    qrows = ", ".join(f"({q}, '{t}')" for q, t in SYN_QUERIES)
    srows = ", ".join(
        f"('{t}', '{s}')" for grp in SYNONYM_GROUPS for t in grp for s in grp
    )
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS (VALUES {qrows}),
syn(t, s) AS (VALUES {srows}),
base AS (
  SELECT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) t
  FROM q
),
qterm AS (
  SELECT DISTINCT b.qid, coalesce(syn.s, b.t) term
  FROM base b LEFT JOIN syn ON syn.t = b.t
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_search_after_sql(k: int) -> str:
    """Page-2 oracle: global ranks k+1..2k of the standard BM25 ranking —
    what a correct search_after cursor walk must reproduce exactly."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank > {k} AND rank <= {2 * k}
ORDER BY qid, rank
"""


def _bm25_wildcard_sql(k: int, max_expand: int = 5) -> str:
    """Wildcard oracle: trailing-* tokens expand to their max_expand
    highest-df vocabulary terms (df desc, term asc), literals pass through;
    the union scores as standard BM25."""
    from engine.pipelines import WILDCARD_QUERIES

    rows = ", ".join(f"({q}, '{t}')" for q, t in WILDCARD_QUERIES)
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS (VALUES {rows}),
rawtok AS (
  SELECT qid::BIGINT qid, unnest(regexp_split_to_array(qtext, ' ')) tok FROM q
),
lit AS (SELECT qid, tok term FROM rawtok WHERE tok NOT LIKE '%*'),
pfx AS (SELECT qid, rtrim(tok, '*') p FROM rawtok WHERE tok LIKE '%*'),
expand AS (
  SELECT qid, term FROM (
    SELECT pfx.qid, df.term,
           row_number() OVER (PARTITION BY pfx.qid, pfx.p
                              ORDER BY df.df DESC, df.term ASC) r
    FROM pfx JOIN df ON df.term LIKE pfx.p || '%'
  ) WHERE r <= {max_expand}
),
qterm AS (
  SELECT DISTINCT qid, term FROM (
    SELECT * FROM lit UNION ALL SELECT * FROM expand
  )
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


_SSTEM_CASE = """CASE
  WHEN t LIKE '%ies' THEN
    CASE WHEN length(t) <= 3 OR t LIKE '%eies' OR t LIKE '%aies' THEN t
         ELSE substr(t, 1, length(t) - 3) || 'y' END
  WHEN t LIKE '%es' THEN
    CASE WHEN length(t) <= 3 OR t LIKE '%aes' OR t LIKE '%ees' OR t LIKE '%oes' THEN t
         ELSE substr(t, 1, length(t) - 1) END
  WHEN t LIKE '%s' THEN
    CASE WHEN length(t) <= 2 OR t LIKE '%us' OR t LIKE '%ss' THEN t
         ELSE substr(t, 1, length(t) - 1) END
  ELSE t END"""


def _bm25_stemmed_sql(k: int) -> str:
    """Stemmed-retrieval oracle: the sstem ladder (SURVEY X113) replayed as
    a suffix-form CASE applied to BOTH document tokens and query tokens;
    BM25 stats computed over the stemmed token stream."""
    from engine.pipelines import STEM_QUERIES

    rows = ", ".join(f"({q}, '{t}')" for q, t in STEM_QUERIES)
    stem = f"list_transform({_TOKS}, t -> {_SSTEM_CASE})"
    qstem = ("list_transform(list_filter(regexp_split_to_array(lower(qtext),"
             " '[^a-z0-9]+'), x -> x <> ''), t -> " + _SSTEM_CASE + ")")
    return f"""
WITH tok AS (SELECT doc_id, unnest({stem}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (SELECT DISTINCT qid::BIGINT qid, unnest({qstem}) term FROM q),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_wildcard_leading_sql(k: int, max_expand: int = 5) -> str:
    """Leading-wildcard oracle: *suffix tokens expand by endswith (LIKE
    '%' || suffix), same top-terms cap; the union scores as standard BM25."""
    from engine.pipelines import LEADING_WILDCARD_QUERIES

    rows = ", ".join(f"({q}, '{t}')" for q, t in LEADING_WILDCARD_QUERIES)
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS (VALUES {rows}),
rawtok AS (
  SELECT qid::BIGINT qid, unnest(regexp_split_to_array(qtext, ' ')) tok FROM q
),
lit AS (SELECT qid, tok term FROM rawtok WHERE tok NOT LIKE '*%'),
sfx AS (SELECT qid, ltrim(tok, '*') s FROM rawtok WHERE tok LIKE '*%'),
expand AS (
  SELECT qid, term FROM (
    SELECT sfx.qid, df.term,
           row_number() OVER (PARTITION BY sfx.qid, sfx.s
                              ORDER BY df.df DESC, df.term ASC) r
    FROM sfx JOIN df ON df.term LIKE '%' || sfx.s
  ) WHERE r <= {max_expand}
),
qterm AS (
  SELECT DISTINCT qid, term FROM (
    SELECT * FROM lit UNION ALL SELECT * FROM expand
  )
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_regexp_sql(k: int, max_expand: int = 5) -> str:
    """Regexp oracle: /pattern/ tokens expand to their max_expand highest-df
    FULL-match vocabulary terms (regexp_full_match — same subset Python
    re.fullmatch evaluates identically), literals pass through; the union
    scores as standard BM25."""
    from engine.pipelines import REGEX_QUERIES

    rows = ", ".join(f"({q}, '{t}')" for q, t in REGEX_QUERIES)
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS (VALUES {rows}),
rawtok AS (
  SELECT qid::BIGINT qid, unnest(regexp_split_to_array(qtext, ' ')) tok FROM q
),
lit AS (SELECT qid, tok term FROM rawtok WHERE tok NOT LIKE '/%/'),
pat AS (
  SELECT qid, substr(tok, 2, len(tok) - 2) p FROM rawtok
  WHERE tok LIKE '/%/' AND len(tok) >= 2
),
expand AS (
  SELECT qid, term FROM (
    SELECT pat.qid, df.term,
           row_number() OVER (PARTITION BY pat.qid, pat.p
                              ORDER BY df.df DESC, df.term ASC) r
    FROM pat JOIN df ON regexp_full_match(df.term, pat.p)
  ) WHERE r <= {max_expand}
),
qterm AS (
  SELECT DISTINCT qid, term FROM (
    SELECT * FROM lit UNION ALL SELECT * FROM expand
  )
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_fuzzy_sql(k: int, max_expand: int = 5) -> str:
    """Fuzzy oracle: trailing-~ tokens expand to their max_expand highest-df
    vocabulary terms within Levenshtein distance 1 (df desc, term asc),
    literals pass through; the union scores as standard BM25."""
    from engine.pipelines import FUZZY_QUERIES

    rows = ", ".join(f"({q}, '{t}')" for q, t in FUZZY_QUERIES)
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS (VALUES {rows}),
rawtok AS (
  SELECT qid::BIGINT qid, unnest(regexp_split_to_array(qtext, ' ')) tok FROM q
),
lit AS (SELECT qid, tok term FROM rawtok WHERE tok NOT LIKE '%~'),
fz AS (SELECT qid, rtrim(tok, '~') p FROM rawtok WHERE tok LIKE '%~'),
expand AS (
  SELECT qid, term FROM (
    SELECT fz.qid, df.term,
           row_number() OVER (PARTITION BY fz.qid, fz.p
                              ORDER BY df.df DESC, df.term ASC) r
    FROM fz JOIN df ON levenshtein(df.term, fz.p) <= 1
  ) WHERE r <= {max_expand}
),
qterm AS (
  SELECT DISTINCT qid, term FROM (
    SELECT * FROM lit UNION ALL SELECT * FROM expand
  )
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_dsl_sql(k: int, max_expand: int = 5) -> str:
    """Composable-DSL oracle (engine/query/dsl.py): recomputes the WHOLE
    query tree in SQL — must / should / must_not clause sets, per-term max
    boost, fuzzy edit-1 expansion re-derived from the df dictionary
    (levenshtein, df desc / term asc, row_number <= max_expand), phrase
    adjacency by canonical-token LIKE, minimum_should_match counting, and
    the n_chars range window. The VALUES lists are generated from the SAME
    parse_dsl/analyzer the engine uses; everything after the parse is
    recomputed by DuckDB."""
    from engine.pipelines import DSL_QUERIES
    from engine.query.dsl import parse_dsl
    from engine.text.analyzer import Analyzer

    an = Analyzer()
    must_rows: list[tuple] = []    # (qid, term, boost) — incl. phrase terms
    should_rows: list[tuple] = []  # (qid, term, boost)
    not_rows: list[tuple] = []     # (qid, term)
    fz_rows: list[tuple] = []      # (qid, seed, is_must)
    ph_rows: list[tuple] = []      # (qid, pid, canonical phrase text)
    rng_rows: list[tuple] = []     # (qid, lo, hi)
    msm_rows: list[tuple] = []     # (qid, msm)
    for qid, text in DSL_QUERIES:
        p = parse_dsl(text)
        for tok in p.must_tokens:
            for t in an.tokens(tok):
                must_rows.append((qid, t, 1.0))
        for tok, b in p.must_boosts:
            for t in an.tokens(tok):
                must_rows.append((qid, t, b))
        for pid, ph in enumerate(p.phrases):
            toks = an.tokens(ph)
            if not toks:
                continue
            ph_rows.append((qid, pid, " ".join(toks)))
            for t in toks:
                must_rows.append((qid, t, 1.0))
        for tok, b in p.should_tokens:
            for t in an.tokens(tok):
                should_rows.append((qid, t, b))
        for tok in p.not_tokens:
            for t in an.tokens(tok):
                not_rows.append((qid, t))
        for tok in p.fuzzy_must:
            for t in an.tokens(tok):
                fz_rows.append((qid, t, 1))
        for tok in p.fuzzy_should:
            for t in an.tokens(tok):
                fz_rows.append((qid, t, 0))
        lo, hi = p.range if p.range else (0, 1 << 40)
        rng_rows.append((qid, lo, hi))
        msm_rows.append((qid, p.msm if p.msm is not None
                         else (0 if p.has_required else 1)))

    def vals(rows, sentinel):
        rows = rows or [sentinel]
        return ", ".join(
            "(" + ", ".join(f"'{v}'" if isinstance(v, str) else str(v)
                            for v in r) + ")"
            for r in rows
        )

    return f"""
WITH {_TOK_CTE},
mraw(qid, term, boost) AS (VALUES {vals(must_rows, (-1, 'zz', 1.0))}),
sraw(qid, term, boost) AS (VALUES {vals(should_rows, (-1, 'zz', 1.0))}),
nterm(qid, term) AS (VALUES {vals(not_rows, (-1, 'zz'))}),
fzraw(qid, seed, is_must) AS (VALUES {vals(fz_rows, (-1, 'zz', 0))}),
phr(qid, pid, ptext) AS (VALUES {vals(ph_rows, (-1, 0, 'zz'))}),
rng(qid, lo, hi) AS (VALUES {vals(rng_rows, (-1, 0, 0))}),
msmv(qid, msm) AS (VALUES {vals(msm_rows, (-1, 0))}),
fexp AS (
  SELECT qid, seed, is_must, term FROM (
    SELECT f.qid, f.seed, f.is_must, d.term,
           row_number() OVER (PARTITION BY f.qid, f.seed, f.is_must
                              ORDER BY d.df DESC, d.term ASC) r
    FROM fzraw f JOIN df d ON levenshtein(d.term, f.seed) <= 1
  ) WHERE r <= {max_expand}
),
pos AS (
  SELECT qid::BIGINT qid, term, max(boost) boost FROM (
    SELECT qid, term, boost FROM mraw
    UNION ALL SELECT qid, term, boost FROM sraw
    UNION ALL SELECT qid, term, 1.0 boost FROM fexp
  ) GROUP BY 1, 2
),
mneed AS (SELECT qid::BIGINT qid, count(DISTINCT term) n FROM mraw GROUP BY 1),
mhit AS (
  SELECT m.qid::BIGINT qid, tf.doc_id, count(DISTINCT m.term) n
  FROM (SELECT DISTINCT qid, term FROM mraw) m JOIN tf ON tf.term = m.term
  GROUP BY 1, 2
),
fneed AS (SELECT qid::BIGINT qid, count(DISTINCT seed) n FROM fzraw WHERE is_must = 1 GROUP BY 1),
fhit AS (
  SELECT f.qid::BIGINT qid, tf.doc_id, count(DISTINCT f.seed) n
  FROM fexp f JOIN tf ON tf.term = f.term WHERE f.is_must = 1
  GROUP BY 1, 2
),
sterm AS (
  SELECT DISTINCT qid::BIGINT qid, term FROM (
    SELECT qid, term FROM sraw
    UNION ALL SELECT qid, term FROM fexp WHERE is_must = 0
  )
),
shit AS (
  SELECT st.qid, tf.doc_id, count(DISTINCT st.term) n
  FROM sterm st JOIN tf ON tf.term = st.term GROUP BY 1, 2
),
doc_canon AS (
  SELECT doc_id, ' ' || array_to_string({_TOKS}, ' ') || ' ' canon FROM documents
),
pneed AS (SELECT qid::BIGINT qid, count(*) n FROM phr GROUP BY 1),
phit AS (
  SELECT p.qid::BIGINT qid, dc.doc_id, count(DISTINCT p.pid) n
  FROM phr p JOIN doc_canon dc
    ON dc.canon LIKE '%' || ' ' || p.ptext || ' ' || '%'
  GROUP BY 1, 2
),
excluded AS (
  SELECT DISTINCT n.qid::BIGINT qid, tf.doc_id FROM nterm n JOIN tf ON tf.term = n.term
),
contrib AS (
  SELECT p.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
           * p.boost w
  FROM pos p
  JOIN df ON df.term = p.term
  JOIN tf ON tf.term = p.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
gated AS (
  SELECT s.qid, s.doc_id, s.score_micro
  FROM scored s
  JOIN documents d ON d.doc_id = s.doc_id
  JOIN rng r ON r.qid = s.qid
  JOIN msmv mv ON mv.qid = s.qid
  LEFT JOIN mneed ON mneed.qid = s.qid
  LEFT JOIN mhit ON mhit.qid = s.qid AND mhit.doc_id = s.doc_id
  LEFT JOIN fneed ON fneed.qid = s.qid
  LEFT JOIN fhit ON fhit.qid = s.qid AND fhit.doc_id = s.doc_id
  LEFT JOIN pneed ON pneed.qid = s.qid
  LEFT JOIN phit ON phit.qid = s.qid AND phit.doc_id = s.doc_id
  LEFT JOIN shit ON shit.qid = s.qid AND shit.doc_id = s.doc_id
  WHERE d.n_chars >= r.lo AND d.n_chars < r.hi
    AND (mneed.n IS NULL OR coalesce(mhit.n, 0) = mneed.n)
    AND (fneed.n IS NULL OR coalesce(fhit.n, 0) = fneed.n)
    AND (pneed.n IS NULL OR coalesce(phit.n, 0) = pneed.n)
    AND (mv.msm = 0 OR coalesce(shit.n, 0) >= mv.msm)
    AND NOT EXISTS (SELECT 1 FROM excluded x
                    WHERE x.qid = s.qid AND x.doc_id = s.doc_id)
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM gated
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _hybrid_rrf_sql(k: int, n_each: int = 20) -> str:
    """Hybrid BM25 + embedding-cosine retrieval fused by reciprocal-rank
    fusion, all-integer: each side ranks by its micro score (desc, doc_id
    asc), a doc at rank r contributes RRF_SCALE // (RRF_K + r), absent
    sides contribute 0; fused order = (rrf_micro desc, doc_id asc)."""
    from engine.pipelines import HYBRID_QUERIES, RRF_K, RRF_SCALE

    rows = ", ".join(f"({q}, '{t}', {v})" for q, t, v in HYBRID_QUERIES)
    return f"""
WITH {_TOK_CTE},
q(qid, qtext, seed) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
tscore AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT s
  FROM contrib GROUP BY 1, 2
),
trank AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY s DESC, doc_id ASC)::BIGINT r
  FROM tscore
),
vsim AS (
  SELECT q.qid::BIGINT qid, e.vec_id::BIGINT doc_id,
         floor(list_cosine_similarity(e.embedding::DOUBLE[], sv.embedding::DOUBLE[]) * 1e6 + 0.5)::BIGINT sim
  FROM q JOIN embeddings sv ON sv.vec_id = q.seed
  CROSS JOIN embeddings e
),
vrank AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, doc_id ASC)::BIGINT r
  FROM vsim
),
both_sides AS (
  SELECT qid, doc_id, {RRF_SCALE} // ({RRF_K} + r) c FROM trank WHERE r <= {n_each}
  UNION ALL
  SELECT qid, doc_id, {RRF_SCALE} // ({RRF_K} + r) c FROM vrank WHERE r <= {n_each}
),
fused AS (SELECT qid, doc_id, sum(c)::BIGINT rrf_micro FROM both_sides GROUP BY 1, 2)
SELECT qid, rank, doc_id, rrf_micro FROM (
  SELECT qid, doc_id, rrf_micro,
         row_number() OVER (PARTITION BY qid ORDER BY rrf_micro DESC, doc_id ASC)::BIGINT rank
  FROM fused
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _mlt_sql(k: int, n_terms: int = 3) -> str:
    """More-like-this oracle: per seed doc, its top-n tf·idf-surrogate terms
    (same integer arithmetic as ta_tfidf_topk) run as a BM25 query, seed
    excluded from the ranking."""
    from engine.pipelines import MLT_SEEDS

    seeds = ", ".join(f"({s})" for s in MLT_SEEDS)
    return f"""
WITH {_TOK_CTE},
seeds(seed) AS (VALUES {seeds}),
sterm AS (
  SELECT seed, term FROM (
    SELECT s.seed, tf.term,
           row_number() OVER (PARTITION BY s.seed
                              ORDER BY (tf.tf * 1000000) // df.df DESC, tf.term ASC) rn
    FROM seeds s JOIN tf ON tf.doc_id = s.seed JOIN df ON df.term = tf.term
  ) WHERE rn <= {n_terms}
),
contrib AS (
  SELECT st.seed qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM sterm st
  JOIN df ON df.term = st.term
  JOIN tf ON tf.term = st.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib WHERE doc_id <> qid GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _term_suggest_sql(k: int) -> str:
    from engine.pipelines import SUGGEST_PREFIXES

    rows = ", ".join(f"('{p}')" for p in SUGGEST_PREFIXES)
    return f"""
WITH {_TOK_CTE},
p(prefix) AS (VALUES {rows}),
r AS (
  SELECT p.prefix, df.term, df.df,
         row_number() OVER (PARTITION BY p.prefix
                            ORDER BY df.df DESC, df.term ASC)::BIGINT rank
  FROM p JOIN df ON df.term LIKE p.prefix || '%'
)
SELECT prefix, rank, term, df FROM r WHERE rank <= {k} ORDER BY prefix, rank
"""


def _bm25_facets_sql() -> str:
    """Facet counts: per query, matching-doc count per source/lang value."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, tf.doc_id FROM qterm qt JOIN tf ON tf.term = qt.term),
j AS (SELECT m.qid, d.source, d.lang FROM m JOIN documents d ON d.doc_id = m.doc_id)
SELECT qid, facet, "value", count(*)::BIGINT n_matches FROM (
  SELECT qid, 'source' facet, source AS "value" FROM j
  UNION ALL
  SELECT qid, 'lang' facet, lang AS "value" FROM j
) GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def _hit_count_sql() -> str:
    """Hit counts: per query, total matching docs + distinct sources
    spanned (same OR-match gate as the facets oracle)."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, tf.doc_id FROM qterm qt JOIN tf ON tf.term = qt.term)
SELECT m.qid, count(*)::BIGINT n_matches, count(DISTINCT d.source)::BIGINT n_sources
FROM m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY m.qid ORDER BY m.qid
"""


def _match_stats_sql() -> str:
    """Numeric stats agg: per query, count/sum/min/max/avg-micro of n_chars
    over the OR-match set (same gate as the facets oracle)."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, tf.doc_id FROM qterm qt JOIN tf ON tf.term = qt.term)
SELECT m.qid, count(*)::BIGINT n_matches, sum(d.n_chars)::BIGINT sum_chars,
       min(d.n_chars)::BIGINT min_chars, max(d.n_chars)::BIGINT max_chars,
       (sum(d.n_chars)::BIGINT * 1000000 // count(*)::BIGINT)::BIGINT avg_chars_micro
FROM m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY m.qid ORDER BY m.qid
"""


def _terms_sub_aggs_sql() -> str:
    """Terms-bucket + metric sub-aggs oracle over the OR-match gate."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, tf.doc_id FROM qterm qt JOIN tf ON tf.term = qt.term)
SELECT m.qid, d.source, count(*)::BIGINT n_matches,
       min(d.n_chars)::BIGINT min_chars, max(d.n_chars)::BIGINT max_chars,
       sum(d.n_chars)::BIGINT sum_chars,
       (sum(d.n_chars)::BIGINT * 1000000 // count(*)::BIGINT)::BIGINT avg_chars_micro
FROM m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _match_phrase_prefix_sql(k: int) -> str:
    """match_phrase_prefix oracle: base tokens adjacent, next position's
    token among the prefix's top-max_expand df-desc dictionary terms (the
    same wildcard rewrite recomputed in SQL); ranked by BM25 over the
    base tokens."""
    from engine.pipelines import MPP_MAX_EXPAND, MPP_QUERIES
    from engine.text.analyzer import Analyzer

    an = Analyzer()
    pfx_rows, qbase_rows, chains = [], [], []
    for qid, qtext in MPP_QUERIES:
        toks = an.tokens(qtext)
        base, p = toks[:-1], toks[-1]
        pfx_rows.append(f"({qid}, '{p}')")
        qbase_rows.extend(f"({qid}, '{t}')" for t in sorted(set(base)))
        joins = "".join(
            f"\n    JOIN tokpos o{i + 1} ON o{i + 1}.doc_id = o1.doc_id"
            f" AND o{i + 1}.term = '{t}' AND o{i + 1}.pos = o1.pos + {i}"
            for i, t in enumerate(base[1:], start=1)
        )
        chains.append(
            f"  SELECT DISTINCT {qid}::BIGINT qid, o1.doc_id FROM tokpos o1"
            f"{joins}\n    JOIN tokpos oe ON oe.doc_id = o1.doc_id"
            f" AND oe.pos = o1.pos + {len(base)}"
            f"\n    JOIN expand x ON x.qid = {qid} AND x.term = oe.term"
            f"\n    WHERE o1.term = '{base[0]}'"
        )
    matched = "\n  UNION ALL\n".join(chains)
    return f"""
WITH {_TOK_CTE},
tokpos AS (
  SELECT doc_id,
         unnest({_TOKS}) term,
         unnest(range(1, len({_TOKS}) + 1)) pos
  FROM documents
),
pfx(qid, p) AS (VALUES {', '.join(pfx_rows)}),
expand AS (
  SELECT qid::BIGINT qid, term FROM (
    SELECT pfx.qid, df.term,
           row_number() OVER (PARTITION BY pfx.qid
                              ORDER BY df.df DESC, df.term ASC) r
    FROM pfx JOIN df ON df.term LIKE pfx.p || '%'
  ) WHERE r <= {MPP_MAX_EXPAND}
),
matched AS (
{matched}
),
qbase(qid, term) AS (VALUES {', '.join(qbase_rows)}),
contrib AS (
  SELECT qb.qid::BIGINT qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qbase qb
  JOIN df ON df.term = qb.term
  JOIN tf ON tf.term = qb.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_id, floor(sum(c.w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c JOIN matched m ON m.qid = c.qid AND m.doc_id = c.doc_id
  GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _query_profile_sql() -> str:
    """Profile oracle: per query, in-vocab term count, Σdf (postings a
    union scan touches) and distinct-candidate count — zero rows for
    queries with no vocabulary hits are still emitted (left joins)."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
hits AS (
  SELECT qt.qid, count(*)::BIGINT n_terms, sum(d.df)::BIGINT sum_df
  FROM qterm qt JOIN df d ON d.term = qt.term GROUP BY 1
),
m AS (
  SELECT qt.qid, count(DISTINCT tf.doc_id)::BIGINT n_candidates
  FROM qterm qt JOIN tf ON tf.term = qt.term GROUP BY 1
)
SELECT q.qid::BIGINT qid,
       coalesce(h.n_terms, 0)::BIGINT n_terms,
       coalesce(h.sum_df, 0)::BIGINT sum_df,
       coalesce(m.n_candidates, 0)::BIGINT n_candidates
FROM q LEFT JOIN hits h ON h.qid = q.qid LEFT JOIN m ON m.qid = q.qid
ORDER BY qid
"""


def _span_first_sql(k: int) -> str:
    """span_first oracle: term within the first `end` positions (SQL pos is
    1-indexed: pos <= end ⟺ engine 0-indexed pos < end), BM25-ranked."""
    from engine.pipelines import SPAN_FIRST_QUERIES

    rows = ", ".join(f"({q}, '{t}', {e})" for q, t, e in SPAN_FIRST_QUERIES)
    return f"""
WITH {_TOK_CTE},
qspec(qid, term, window_end) AS (VALUES {rows}),
tokpos AS (
  SELECT doc_id,
         unnest({_TOKS}) term,
         unnest(range(1, len({_TOKS}) + 1)) pos
  FROM documents
),
matched AS (
  SELECT DISTINCT q.qid::BIGINT qid, t.doc_id
  FROM qspec q JOIN tokpos t ON t.term = q.term AND t.pos <= q.window_end
),
contrib AS (
  SELECT q.qid::BIGINT qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qspec q
  JOIN df ON df.term = q.term
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_id, floor(sum(c.w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c JOIN matched m ON m.qid = c.qid AND m.doc_id = c.doc_id
  GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _did_you_mean_sql() -> str:
    """did-you-mean oracle: argmax-df vocab term within levenshtein ≤ 1
    (DuckDB's levenshtein matches _within_edit1: transposition = 2)."""
    from engine.pipelines import DYM_QUERIES
    from engine.text.analyzer import Analyzer

    an = Analyzer()
    rows = ", ".join(
        f"({qid}, {pos}, '{tok}')"
        for qid, qtext in DYM_QUERIES
        for pos, tok in enumerate(an.tokens(qtext))
    )
    return f"""
WITH {_TOK_CTE},
probes(qid, pos, token) AS (VALUES {rows}),
invocab AS (
  SELECT p.qid::BIGINT qid, p.pos::BIGINT pos, p.token, p.token suggestion, d.df
  FROM probes p JOIN df d ON d.term = p.token
),
oov AS (SELECT * FROM probes WHERE token NOT IN (SELECT term FROM df)),
cand AS (
  SELECT p.qid::BIGINT qid, p.pos::BIGINT pos, p.token, d.term suggestion, d.df,
         row_number() OVER (PARTITION BY p.qid, p.pos
                            ORDER BY d.df DESC, d.term ASC) rn
  FROM oov p JOIN df d ON levenshtein(p.token, d.term) <= 1
)
SELECT qid, pos, token, suggestion, df FROM invocab
UNION ALL
SELECT qid, pos, token, suggestion, df FROM cand WHERE rn = 1
UNION ALL
SELECT p.qid::BIGINT, p.pos::BIGINT, p.token, p.token, 0::BIGINT
FROM oov p
WHERE NOT EXISTS (SELECT 1 FROM df d WHERE levenshtein(p.token, d.term) <= 1)
ORDER BY qid, pos
"""


def _autocomplete_sql() -> str:
    """Autocomplete oracle: distinct-doc count of tokens extending each
    probe prefix (token LIKE 'p%')."""
    from engine.pipelines import AUTOCOMPLETE_PREFIXES

    rows = ", ".join(f"('{p}')" for p in AUTOCOMPLETE_PREFIXES)
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({_TOKS}) term FROM documents
),
p(prefix) AS (VALUES {rows})
SELECT p.prefix, count(DISTINCT tok.doc_id)::BIGINT df
FROM p JOIN tok ON tok.term LIKE p.prefix || '%'
GROUP BY p.prefix
ORDER BY p.prefix
"""


def _extended_stats_sql() -> str:
    """extended_stats oracle: integer-exact moments over the OR-match gate."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, tf.doc_id FROM qterm qt JOIN tf ON tf.term = qt.term)
SELECT qid, n_matches, min_chars, max_chars, sum_chars, sum_sq_chars,
       (n_matches * sum_sq_chars - sum_chars * sum_chars)::BIGINT var_num
FROM (
  SELECT m.qid, count(*)::BIGINT n_matches,
         min(d.n_chars)::BIGINT min_chars, max(d.n_chars)::BIGINT max_chars,
         sum(d.n_chars)::BIGINT sum_chars,
         sum(d.n_chars::BIGINT * d.n_chars::BIGINT)::BIGINT sum_sq_chars
  FROM m JOIN documents d ON d.doc_id = m.doc_id
  GROUP BY m.qid
) ORDER BY qid
"""


def _matrix_stats_sql() -> str:
    """matrix_stats oracle: exact joint moments of (token count, n_chars)
    over the OR-match gate; numerators carry the covariance/variance."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, tf.doc_id FROM qterm qt JOIN tf ON tf.term = qt.term),
xy AS (
  SELECT doc_id, len({_TOKS})::BIGINT x, n_chars::BIGINT y FROM documents
),
s AS (
  SELECT m.qid, count(*)::BIGINT n_matches,
         sum(x)::BIGINT sum_x, sum(y)::BIGINT sum_y,
         sum(x * x)::BIGINT sum_xx, sum(y * y)::BIGINT sum_yy,
         sum(x * y)::BIGINT sum_xy
  FROM m JOIN xy USING (doc_id) GROUP BY m.qid
)
SELECT qid, n_matches, sum_x, sum_y, sum_xx, sum_yy, sum_xy,
       (n_matches * sum_xy - sum_x * sum_y)::BIGINT cov_num,
       (n_matches * sum_xx - sum_x * sum_x)::BIGINT var_x_num,
       (n_matches * sum_yy - sum_y * sum_y)::BIGINT var_y_num
FROM s ORDER BY qid
"""


def _percentile_ranks_sql() -> str:
    """percentile_ranks oracle: per query and fixed threshold, the ≤-share
    of n_chars over the OR-match gate in exact micro units."""
    from engine.pipelines import PRANK_VALUES

    vals = ", ".join(f"({v})" for v in PRANK_VALUES)
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, tf.doc_id FROM qterm qt JOIN tf ON tf.term = qt.term),
v(thr) AS (VALUES {vals})
SELECT qid, thr::BIGINT thr,
       sum(CASE WHEN d.n_chars <= thr THEN 1 ELSE 0 END)::BIGINT n_le,
       count(*)::BIGINT n_matches,
       (sum(CASE WHEN d.n_chars <= thr THEN 1 ELSE 0 END) * 1000000
        // count(*))::BIGINT rank_micro
FROM m JOIN documents d ON d.doc_id = m.doc_id CROSS JOIN v
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _ev_max_bucket_sql() -> str:
    return """
WITH daily AS (
  SELECT epoch(date_trunc('day', ts))::BIGINT day_epoch, event_type,
         count(*)::BIGINT n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, day_epoch, n_events FROM (
  SELECT event_type, day_epoch, n_events,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n_events DESC, day_epoch ASC) rn
  FROM daily
) WHERE rn = 1 ORDER BY event_type
"""


def _diversified_sampler_sql() -> str:
    """Sampler oracle: first SAMPLER_SHARD docs per (qid, source) in
    doc_id order over the OR-match gate."""
    from engine.pipelines import SAMPLER_SHARD

    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, tf.doc_id FROM qterm qt JOIN tf ON tf.term = qt.term)
SELECT qid, source, doc_id FROM (
  SELECT m.qid, d.source, m.doc_id,
         row_number() OVER (PARTITION BY m.qid, d.source ORDER BY m.doc_id ASC) rn
  FROM m JOIN documents d ON d.doc_id = m.doc_id
) WHERE rn <= {SAMPLER_SHARD}
ORDER BY qid, source, doc_id
"""


def _term_vectors_sql() -> str:
    """Term-vectors oracle: tf by retokenizing the requested docs, df over
    the whole corpus."""
    from engine.pipelines import TV_DOC_IDS

    ids = ", ".join(str(i) for i in TV_DOC_IDS)
    return f"""
WITH {_TOK_CTE}
SELECT t.doc_id, t.term, t.tf, d.df
FROM tf t JOIN df d ON d.term = t.term
WHERE t.doc_id IN ({ids})
ORDER BY t.doc_id, t.term
"""


def _rare_terms_sql() -> str:
    from engine.pipelines import RARE_MAX_DF

    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, tf.doc_id FROM qterm qt JOIN tf ON tf.term = qt.term)
SELECT m.qid, d.n_chars::BIGINT AS "value", count(*)::BIGINT n_matches
FROM m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY 1, 2
HAVING count(*) <= {RARE_MAX_DF}
ORDER BY 1, 2
"""


def _match_len_histogram_sql() -> str:
    """Numeric histogram agg: per query, OR-match set bucketed by
    floor(n_chars / interval) × interval."""
    from engine.pipelines import HIST_INTERVAL

    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, tf.doc_id FROM qterm qt JOIN tf ON tf.term = qt.term)
SELECT m.qid, (d.n_chars // {HIST_INTERVAL} * {HIST_INTERVAL})::BIGINT bucket,
       count(*)::BIGINT n_matches
FROM m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _bm25_boosted_terms_sql(k: int) -> str:
    """Term-boost oracle: the (qid, term, boost) table is derived from
    BOOST_QUERIES with the engine's own parser/analyzer (the query set is
    static engine state, like the synonym map); each contribution scales by
    its boost — exact for the power-of-two boosts the query set uses."""
    from engine.pipelines import BOOST_QUERIES
    from engine.query.engine import SegmentServer
    from engine.text.analyzer import Analyzer

    an = Analyzer()
    parse = SegmentServer._parse_boosts
    rows = []
    for qid, text in BOOST_QUERIES:
        plain, bm = parse(type("S", (), {"analyzer": an})(), text)
        for t in sorted(set(an.tokens(plain))):
            rows.append(f"({qid}, '{t}', {bm.get(t, 1.0)!r})")
    vals = ", ".join(rows)
    return f"""
WITH {_TOK_CTE},
qterm(qid, term, boost) AS (VALUES {vals}),
contrib AS (
  SELECT qt.qid::BIGINT qid, tf.doc_id,
         (ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
           * qt.boost w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_msm_sql(k: int, msm: int) -> str:
    """minimum_should_match oracle: docs matching >= msm distinct query
    terms, scored as BM25 over every matched term."""
    from engine.pipelines import MSM_QUERIES

    rows = ", ".join(f"({q}, '{t}')" for q, t in MSM_QUERIES)
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2 HAVING count(*) >= {msm}
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_explain_sql(k: int) -> str:
    """Explain oracle: per-term BM25 contribution for every top-k hit —
    the same contrib arithmetic as the top-k oracle, joined back to the
    rank window instead of summed away."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id, qt.term, tf.tf,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY floor(sum(w) * 1e6 + 0.5)::BIGINT DESC,
                                     doc_id ASC)::BIGINT rank
  FROM contrib GROUP BY qid, doc_id
)
SELECT c.qid, r.rank, c.doc_id, c.term, c.tf::BIGINT tf,
       floor(c.w * 1e6 + 0.5)::BIGINT w_micro
FROM contrib c JOIN ranked r ON r.qid = c.qid AND r.doc_id = c.doc_id
WHERE r.rank <= {k}
ORDER BY c.qid, r.rank, c.term
"""


def _bm25_highlight_sql(k: int, frag: int) -> str:
    """Best-fragment highlight oracle: same ranked top-k as snippets, then
    per hit every frag-token window is scored by COUNT(DISTINCT query
    terms contained), argmax with leftmost tie-break (sc DESC, i ASC)."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
topk AS (
  SELECT qid, rank, doc_id, score_micro FROM (
    SELECT qid, doc_id, score_micro,
           row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
    FROM scored
  ) WHERE rank <= {k}
),
dtok AS (SELECT doc_id, {_TOKS} toks FROM documents),
win AS (
  SELECT t.qid, t.rank, t.doc_id, t.score_micro, d.toks,
         unnest(range(1, greatest(1, len(d.toks) - {frag} + 1) + 1)) i
  FROM topk t JOIN dtok d ON d.doc_id = t.doc_id
),
wsc AS (
  SELECT qid, rank, doc_id, score_micro, toks, i,
         (SELECT count(DISTINCT qt.term) FROM qterm qt
          WHERE qt.qid = win.qid
            AND list_contains(list_slice(win.toks, win.i, win.i + {frag} - 1), qt.term))::BIGINT sc
  FROM win
),
best AS (
  SELECT qid, rank, doc_id, score_micro, toks, i, sc FROM (
    SELECT *, row_number() OVER (PARTITION BY qid, rank
                                 ORDER BY sc DESC, i ASC) rn
    FROM wsc
  ) WHERE rn = 1
)
SELECT qid, rank, doc_id, score_micro,
       (i - 1)::BIGINT frag_start, sc n_qterms,
       array_to_string(list_slice(toks, i, i + {frag} - 1), ' ') fragment
FROM best ORDER BY qid, rank
"""


def _bm25_rescore_sql(k: int, window: int, boost: int) -> str:
    """Rescore oracle: the ranked top-window per query, then the proximity
    bonus boost // min-pair-gap over distinct query terms (positions from
    the shared tokenization), reranked (combined desc, doc_id asc)."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
topw AS (
  SELECT qid, doc_id, score_micro FROM (
    SELECT qid, doc_id, score_micro,
           row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
    FROM scored
  ) WHERE rank <= {window}
),
dtok AS (SELECT doc_id, {_TOKS} toks FROM documents
         WHERE doc_id IN (SELECT DISTINCT doc_id FROM topw)),
pos AS (
  SELECT doc_id, s['p'] pos, s['t'] term FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
                          i -> {{'p': i, 't': toks[i]}})) s
    FROM dtok)
),
gaps AS (
  SELECT w.qid, w.doc_id, min(abs(p1.pos - p2.pos))::BIGINT g
  FROM topw w
  JOIN qterm q1 ON q1.qid = w.qid
  JOIN qterm q2 ON q2.qid = w.qid AND q1.term < q2.term
  JOIN pos p1 ON p1.doc_id = w.doc_id AND p1.term = q1.term
  JOIN pos p2 ON p2.doc_id = w.doc_id AND p2.term = q2.term
  GROUP BY 1, 2
),
resc AS (
  SELECT w.qid, w.doc_id, w.score_micro,
         (w.score_micro + coalesce({boost} // g.g, 0))::BIGINT combined_micro
  FROM topw w LEFT JOIN gaps g ON g.qid = w.qid AND g.doc_id = w.doc_id
)
SELECT qid, rank, doc_id, score_micro, combined_micro FROM (
  SELECT qid, doc_id, score_micro, combined_micro,
         row_number() OVER (PARTITION BY qid
                            ORDER BY combined_micro DESC, doc_id ASC)::BIGINT rank
  FROM resc
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bool_queries_values() -> str:
    from engine.pipelines import BOOL_QUERIES

    rows = ", ".join(
        f"({qid}, '{m}', '{s}', '{n}')" for qid, m, s, n in BOOL_QUERIES
    )
    return f"(VALUES {rows})"


def _bm25_boolean_sql(k: int) -> str:
    """Boolean must/should/must_not oracle (engine/query/boolean.py):
    candidates contain ALL must terms (or >=1 should term when no must
    clause), docs with any must_not term are excluded, and the score is the
    BM25 sum over every matching positive (must ∪ should) term."""

    def _terms(col: str) -> str:
        return ("list_filter(regexp_split_to_array(lower(" + col + "), "
                "'[^a-z0-9]+'), x -> x <> '')")

    return f"""
WITH {_TOK_CTE},
q(qid, mtext, stext, ntext) AS {_bool_queries_values()},
mterm AS (SELECT DISTINCT qid::BIGINT qid, unnest({_terms('mtext')}) term FROM q),
sterm AS (SELECT DISTINCT qid::BIGINT qid, unnest({_terms('stext')}) term FROM q),
nterm AS (SELECT DISTINCT qid::BIGINT qid, unnest({_terms('ntext')}) term FROM q),
mn AS (SELECT qid, count(*)::BIGINT n_must FROM mterm GROUP BY 1),
posterm AS (SELECT qid, term FROM mterm UNION SELECT qid, term FROM sterm),
mmatch AS (
  SELECT m.qid, tf.doc_id
  FROM mterm m JOIN tf ON tf.term = m.term JOIN mn ON mn.qid = m.qid
  GROUP BY m.qid, tf.doc_id, mn.n_must
  HAVING count(DISTINCT m.term) = mn.n_must
),
excluded AS (
  SELECT DISTINCT n.qid, tf.doc_id FROM nterm n JOIN tf ON tf.term = n.term
),
contrib AS (
  SELECT pt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM posterm pt
  JOIN df ON df.term = pt.term
  JOIN tf ON tf.term = pt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c
  WHERE (c.qid NOT IN (SELECT qid FROM mn)
         OR EXISTS (SELECT 1 FROM mmatch m WHERE m.qid = c.qid AND m.doc_id = c.doc_id))
    AND NOT EXISTS (SELECT 1 FROM excluded x WHERE x.qid = c.qid AND x.doc_id = c.doc_id)
  GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_and_sql(k: int) -> str:
    """Conjunctive BM25: a doc ranks only if it matched EVERY term of its
    query (count of distinct matched terms == the query's term count)."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
qn AS (SELECT qid, count(*)::BIGINT n_terms FROM qterm GROUP BY 1),
contrib AS (
  SELECT qt.qid, qt.term, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_id, floor(sum(c.w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c JOIN qn ON qn.qid = c.qid
  GROUP BY c.qid, c.doc_id, qn.n_terms
  HAVING count(DISTINCT c.term) = qn.n_terms
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _rank_eval_sql(k: int) -> str:
    """ft_rank_eval oracle: union BM25 top-k (the _bm25_sql CTE) evaluated
    against conjunctive-containment qrels (the _bm25_and_sql HAVING shape,
    presence-only). Micro ratios repeat the engine's exact IEEE op
    sequence: one double division, *1e6, floor(+0.5)."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
qn AS (SELECT qid, count(*)::BIGINT n_terms FROM qterm GROUP BY 1),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
topk AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
    FROM scored
  ) WHERE rank <= {k}
),
rel AS (
  SELECT qt.qid, tf.doc_id
  FROM qterm qt
  JOIN tf ON tf.term = qt.term
  JOIN qn ON qn.qid = qt.qid
  GROUP BY qt.qid, tf.doc_id, qn.n_terms
  HAVING count(DISTINCT qt.term) = qn.n_terms
),
m AS (
  SELECT qq.qid,
         coalesce(r.n_rel, 0)::BIGINT n_rel,
         coalesce(h.hits, 0)::BIGINT hits,
         h.best_rank
  FROM (SELECT DISTINCT qid::BIGINT qid FROM q) qq
  LEFT JOIN (SELECT qid, count(*)::BIGINT n_rel FROM rel GROUP BY 1) r USING (qid)
  LEFT JOIN (SELECT t.qid, count(*)::BIGINT hits, min(t.rank) best_rank
             FROM topk t JOIN rel ON rel.qid = t.qid AND rel.doc_id = t.doc_id
             GROUP BY 1) h USING (qid)
)
SELECT qid, n_rel, hits,
       floor(hits / {k}::DOUBLE * 1e6 + 0.5)::BIGINT p_at_k_micro,
       floor(hits / greatest(n_rel, 1)::DOUBLE * 1e6 + 0.5)::BIGINT recall_micro,
       (CASE WHEN hits > 0 THEN floor(1e6 / best_rank::DOUBLE + 0.5) ELSE 0 END)::BIGINT mrr_micro
FROM m ORDER BY qid
"""


def _token_count_sql() -> str:
    """ta_token_count oracle built from the SAME pattern constants the
    engine compiles (engine/ops/textstats.py) — explicit ASCII whitespace
    classes, valid identically under Python re and DuckDB RE2, so the two
    engines count the same tokens on any input (Python \\s is Unicode-wide,
    RE2's is ASCII-only — never use \\s in a parity pattern)."""
    from engine.ops.textstats import BPE_PATTERN, WS_PATTERN

    return f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '{WS_PATTERN}'), x -> x <> ''))::BIGINT n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}'))::BIGINT n_bpe_tokens
FROM documents ORDER BY doc_id
"""


def _pii_sql() -> str:
    """ta_pii_redact oracle: the SAME RE2 rule chain as engine/ops/pii.py
    (constants imported so engine and SQL can never drift), applied in the
    same order over the same deterministically-planted text; each rule's
    count is taken over the text state that rule actually sees. Arrow C++
    and DuckDB both execute RE2, so counts and rewrites are byte-identical."""
    from engine.ops.pii import PII_RULES, plant_sql

    prog = [f"({plant_sql()})"]
    for _name, pat, repl in PII_RULES:
        prog.append(f"regexp_replace({prog[-1]}, '{pat}', '{repl}', 'g')")
    counts = ",\n       ".join(
        f"len(regexp_extract_all({prog[i]}, '{pat}'))::BIGINT n_{name}"
        for i, (name, pat, _repl) in enumerate(PII_RULES)
    )
    return f"""
SELECT doc_id,
       {counts},
       {prog[-1]} text_redacted
FROM documents ORDER BY doc_id
"""


def _pack_cte() -> str:
    """Shared CTE for the packing oracles: slim (doc_id, part, n_tokens)
    rows + per-part ordered cumulative sums — constants imported from
    engine/ops/packing.py so engine and SQL can never drift. The Knuth
    multiplicative hash products stay far below 2^63 (exact BIGINT)."""
    from engine.ops.packing import KNUTH, PACK_PARTS
    from engine.ops.textstats import TokenCounter

    return f"""t AS (
  SELECT doc_id,
         (((doc_id * {KNUTH}) % 4294967296) % {PACK_PARTS})::BIGINT part,
         len(regexp_extract_all(text, '{TokenCounter.NON_WS_PATTERN}'))::BIGINT n_tokens
  FROM documents
),
o AS (
  SELECT *,
         sum(n_tokens) OVER (PARTITION BY part ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
         row_number() OVER (PARTITION BY part ORDER BY doc_id) rn
  FROM t
)"""


def _seq_pack_sql() -> str:
    """ta_seq_pack oracle: concat-and-chunk ids from the windowed cumsum
    (all operands non-negative, so // floors identically in both engines)."""
    from engine.ops.packing import PACK_BUDGET as B

    return f"""
WITH {_pack_cte()}
SELECT doc_id, part, n_tokens,
       ((cum - n_tokens) // {B})::BIGINT start_chunk,
       (CASE WHEN n_tokens > 0 THEN (cum - 1) // {B}
             ELSE (cum - n_tokens) // {B} END)::BIGINT end_chunk,
       (CASE WHEN n_tokens > 0
             THEN (cum - 1) // {B} - (cum - n_tokens) // {B} + 1
             ELSE 0 END)::BIGINT n_chunks
FROM o ORDER BY doc_id
"""


def _pack_greedy_sql() -> str:
    """ta_pack_greedy oracle: greedy first-fit boundaries recomputed by a
    recursive CTE — each step jumps to the furthest row whose cumulative
    sum fits base+budget (≥ one row, so an oversized doc owns its pack),
    exactly the engine's searchsorted jump loop."""
    from engine.ops.packing import PACK_BUDGET as B

    return f"""
WITH RECURSIVE {_pack_cte()},
b(part, pack_id, last_rn, last_cum) AS (
  SELECT part, -1, 0, 0::BIGINT FROM (SELECT DISTINCT part FROM o) p
  UNION ALL
  SELECT b.part, b.pack_id + 1,
         greatest(b.last_rn + 1,
           coalesce((SELECT max(rn) FROM o WHERE o.part = b.part
                     AND o.cum <= b.last_cum + {B}), 0)),
         (SELECT cum FROM o WHERE o.part = b.part AND o.rn =
           greatest(b.last_rn + 1,
             coalesce((SELECT max(rn) FROM o WHERE o.part = b.part
                       AND o.cum <= b.last_cum + {B}), 0)))
  FROM b WHERE b.last_rn < (SELECT max(rn) FROM o WHERE o.part = b.part)
),
p AS (
  SELECT part, pack_id, last_rn,
         lag(last_rn, 1, 0) OVER (PARTITION BY part ORDER BY pack_id) prev_rn
  FROM b WHERE pack_id >= 0
)
SELECT o.doc_id, o.part, o.n_tokens,
       p.pack_id::BIGINT pack_id, (o.rn - p.prev_rn)::BIGINT pack_pos
FROM o JOIN p ON o.part = p.part AND o.rn > p.prev_rn AND o.rn <= p.last_rn
ORDER BY o.doc_id
"""


def _feature_hash_sql() -> str:
    """Hashing-trick oracle: bucket = md5(token)[:8 hex] % FH_BUCKETS
    (constant imported so engine and SQL can never drift), per-doc bucket
    counts, sparse rows."""
    from engine.ops.textstats import FH_BUCKETS

    return f"""
WITH t AS (SELECT doc_id, unnest({_TOKS}) term FROM documents)
SELECT doc_id,
       (('0x' || substr(md5(term), 1, 8))::UBIGINT % {FH_BUCKETS})::BIGINT bucket,
       count(*)::BIGINT tf
FROM t GROUP BY 1, 2 ORDER BY 1, 2
"""


def _emb_infer_sql() -> str:
    """Hash-projection encoder oracle: same md5-prefix bucket map as
    ta_feature_hash, ±1 weights from md5('emb|b|d') first-nibble parity,
    v[d] = Σ_b tf_b · M[b,d] — all exact BIGINT arithmetic."""
    from engine.ops.embed import EMB_BUCKETS, EMB_DIM

    return f"""
WITH t AS (SELECT doc_id, unnest({_TOKS}) term FROM documents),
b AS (
  SELECT doc_id,
         (('0x' || substr(md5(term), 1, 8))::UBIGINT % {EMB_BUCKETS})::BIGINT bucket,
         count(*)::BIGINT tf
  FROM t GROUP BY 1, 2
),
dims AS (SELECT unnest(range({EMB_DIM})) dim),
m AS (
  SELECT bk.bucket, d.dim,
         CASE WHEN ('0x' || substr(md5('emb|' || bk.bucket || '|' || d.dim), 1, 1))::UBIGINT % 2 = 0
              THEN 1 ELSE -1 END s
  FROM (SELECT DISTINCT bucket FROM b) bk CROSS JOIN dims d
)
SELECT b.doc_id, m.dim::BIGINT dim, sum(b.tf * m.s)::BIGINT val
FROM b JOIN m ON m.bucket = b.bucket
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _dsir_sql() -> str:
    """ta_dsir_weights oracle: the Laplace-smoothed hashed-unigram
    importance ratio in exact BIGINTs — same md5 % FH_BUCKETS feature map
    as ta_feature_hash (constants imported so engine and SQL can never
    drift), target slice lang = DSIR_TARGET_LANG, weight
    floor((tgt+1)*1e6/(raw+1)) realized as nonneg integer division.
    Zero-token docs are absent (no unnest rows), mirroring the engine."""
    from engine.ops.textstats import DSIR_TARGET_LANG, FH_BUCKETS

    return f"""
WITH t AS (SELECT doc_id, lang, unnest({_TOKS}) term FROM documents),
b AS (SELECT doc_id, lang,
             (('0x' || substr(md5(term), 1, 8))::UBIGINT % {FH_BUCKETS})::BIGINT bucket
      FROM t),
cnt AS (SELECT bucket,
               count(*)::BIGINT raw_tf,
               count(*) FILTER (lang = '{DSIR_TARGET_LANG}')::BIGINT tgt_tf
        FROM b GROUP BY 1),
w AS (SELECT bucket, (tgt_tf + 1) * 1000000 // (raw_tf + 1) AS w_micro FROM cnt),
d AS (SELECT doc_id, count(*)::BIGINT n_tokens, sum(w.w_micro)::BIGINT score_sum
      FROM b JOIN w USING (bucket) GROUP BY 1)
SELECT doc_id, n_tokens, score_sum,
       (score_sum // n_tokens)::BIGINT importance_micro
FROM d ORDER BY doc_id
"""


def _fingerprint_sql() -> str:
    """ta_fingerprint oracle: the SAME md5-token-hash + mod-prime rolling
    polynomial as engine/ops/textstats.Fingerprinter (constants imported so
    the two can never drift). All arithmetic is exact BIGINT."""
    from engine.ops.textstats import FP_BASE, FP_MOD

    b2 = FP_BASE * FP_BASE
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
h AS (SELECT doc_id,
             list_transform(toks, x -> (('0x' || substr(md5(x), 1, 8))::UBIGINT % {FP_MOD})::BIGINT) hs
      FROM t),
g AS (
  SELECT doc_id,
    CASE
      WHEN len(hs) = 0 THEN []::BIGINT[]
      WHEN len(hs) < 3 THEN [list_reduce(hs, (a, b) -> (a * {FP_BASE} + b) % {FP_MOD})]
      ELSE list_transform(range(1, len(hs) - 1),
                          i -> (hs[i]*{b2} + hs[i+1]*{FP_BASE} + hs[i+2]) % {FP_MOD})
    END AS grams
  FROM h
)
SELECT doc_id,
       coalesce(list_min(grams), -1)::BIGINT fp_min,
       coalesce(len(list_distinct(grams)), 0)::BIGINT fp_distinct
FROM g ORDER BY doc_id
"""


def _repetition_sql() -> str:
    """ta_repetition oracle: token-level n-gram repetition recomputed from
    string n-grams (the engine's packed dictionary codes are exact, so the
    two can only agree). Integer // division mirrors the engine."""
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
bigs AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) bg
  FROM t
),
bc AS (SELECT doc_id, bg, count(*)::BIGINT c FROM bigs GROUP BY 1, 2),
bstat AS (SELECT doc_id, max(c) mx, sum(c) n FROM bc GROUP BY 1),
tris AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) tg
  FROM t
),
tc AS (SELECT doc_id, tg, count(*)::BIGINT c FROM tris GROUP BY 1, 2),
tstat AS (SELECT doc_id, sum(c) n, count(*)::BIGINT nd FROM tc GROUP BY 1)
SELECT d.doc_id,
       coalesce(bstat.mx * 1000000 // bstat.n, 0)::BIGINT top_bigram_frac_micro,
       coalesce((tstat.n - tstat.nd) * 1000000 // tstat.n, 0)::BIGINT dup_trigram_frac_micro
FROM documents d
LEFT JOIN bstat ON bstat.doc_id = d.doc_id
LEFT JOIN tstat ON tstat.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def _contamination_sql() -> str:
    """ta_contamination oracle: the SAME md5-mod-prime token hash and
    CONTAM_WIDTH-token Horner rolling polynomial as engine/ops/textstats's
    _ContamShingles (constants imported so the two can never drift), then a
    distinct-shingle join of corpus docs against the benchmark slice. All
    arithmetic exact BIGINT; every Horner step reduces mod CONTAM_MOD, which
    is congruent to the engine's fold."""
    from engine.ops.textstats import (CONTAM_BASE, CONTAM_BENCH_EVERY,
                                      CONTAM_MOD, CONTAM_WIDTH)

    B, M, W = CONTAM_BASE, CONTAM_MOD, CONTAM_WIDTH
    # Horner chain over hs[i..i+W-1], one mod per multiply-add step
    expr = "hs[i]"
    for j in range(1, W):
        expr = f"(({expr}) * {B} % {M} + hs[i+{j}])"
    expr = f"({expr}) % {M}"
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
h AS (SELECT doc_id,
             list_transform(toks, x -> (('0x' || substr(md5(x), 1, 8))::UBIGINT % {M})::BIGINT) hs
      FROM t),
g AS (
  SELECT doc_id,
    CASE
      WHEN len(hs) = 0 THEN []::BIGINT[]
      WHEN len(hs) < {W} THEN [list_reduce(hs, (a, b) -> (a * {B} + b) % {M})]
      ELSE list_transform(range(1, len(hs) - {W - 2}), i -> {expr})
    END AS grams
  FROM h
),
bgrams AS (
  SELECT DISTINCT unnest(grams) gram FROM g WHERE doc_id % {CONTAM_BENCH_EVERY} = 0
),
cg AS (
  SELECT doc_id, unnest(list_distinct(grams)) gram
  FROM g WHERE doc_id % {CONTAM_BENCH_EVERY} <> 0
),
hits AS (
  SELECT cg.doc_id, count(*)::BIGINT n FROM cg JOIN bgrams USING (gram) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(hits.n, 0)::BIGINT n_shared,
       (coalesce(hits.n, 0) > 0)::BIGINT contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {CONTAM_BENCH_EVERY} <> 0) d
LEFT JOIN hits ON hits.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def _contamination_bloom_sql() -> str:
    """Bloom pre-filter oracle: the SAME shingle prologue as
    _contamination_sql, then the filter's bit set and the all-k-bits pass
    test replayed in SQL (count of set positions per (doc, gram) = k)."""
    from engine.ops.textstats import (BLOOM_BITS, BLOOM_K, CONTAM_BASE,
                                      CONTAM_BENCH_EVERY, CONTAM_MOD,
                                      CONTAM_WIDTH)

    B, M, W = CONTAM_BASE, CONTAM_MOD, CONTAM_WIDTH
    expr = "hs[i]"
    for j in range(1, W):
        expr = f"(({expr}) * {B} % {M} + hs[i+{j}])"
    expr = f"({expr}) % {M}"
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
h AS (SELECT doc_id,
             list_transform(toks, x -> (('0x' || substr(md5(x), 1, 8))::UBIGINT % {M})::BIGINT) hs
      FROM t),
g AS (
  SELECT doc_id,
    CASE
      WHEN len(hs) = 0 THEN []::BIGINT[]
      WHEN len(hs) < {W} THEN [list_reduce(hs, (a, b) -> (a * {B} + b) % {M})]
      ELSE list_transform(range(1, len(hs) - {W - 2}), i -> {expr})
    END AS grams
  FROM h
),
bgrams AS (
  SELECT DISTINCT unnest(grams) gram FROM g WHERE doc_id % {CONTAM_BENCH_EVERY} = 0
),
bits AS (
  SELECT DISTINCT (('0x' || substr(md5(r.range::VARCHAR || ':' || gram::VARCHAR), 1, 8))::UBIGINT
                   % {BLOOM_BITS})::BIGINT b_pos
  FROM bgrams CROSS JOIN range({BLOOM_K}) r
),
cg AS (
  SELECT doc_id, unnest(list_distinct(grams)) gram
  FROM g WHERE doc_id % {CONTAM_BENCH_EVERY} <> 0
),
cpos AS (
  SELECT doc_id, gram,
         (('0x' || substr(md5(r.range::VARCHAR || ':' || gram::VARCHAR), 1, 8))::UBIGINT
          % {BLOOM_BITS})::BIGINT b_pos
  FROM cg CROSS JOIN range({BLOOM_K}) r
),
passg AS (
  SELECT doc_id, gram FROM cpos JOIN bits USING (b_pos)
  GROUP BY doc_id, gram HAVING count(*) = {BLOOM_K}
),
nd AS (SELECT doc_id, count(*)::BIGINT n_shingles FROM cg GROUP BY 1),
np AS (SELECT doc_id, count(*)::BIGINT n_bloom_hits FROM passg GROUP BY 1)
SELECT d.doc_id,
       coalesce(nd.n_shingles, 0)::BIGINT n_shingles,
       coalesce(np.n_bloom_hits, 0)::BIGINT n_bloom_hits,
       (coalesce(np.n_bloom_hits, 0) > 0)::BIGINT flagged
FROM (SELECT doc_id FROM documents WHERE doc_id % {CONTAM_BENCH_EVERY} <> 0) d
LEFT JOIN nd ON nd.doc_id = d.doc_id
LEFT JOIN np ON np.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def _winnowing_sql() -> str:
    """Winnowing oracle: same shingle prologue, then per window the minimal
    gram with the RIGHTMOST-tie rule via max(pos) over the min-valued
    members; incomplete trailing windows gated by a full-window count."""
    from engine.ops.textstats import (CONTAM_BASE, CONTAM_MOD, CONTAM_WIDTH,
                                      WINNOW_W)

    B, M, W = CONTAM_BASE, CONTAM_MOD, CONTAM_WIDTH
    ww = WINNOW_W
    expr = "hs[i]"
    for j in range(1, W):
        expr = f"(({expr}) * {B} % {M} + hs[i+{j}])"
    expr = f"({expr}) % {M}"
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
h AS (SELECT doc_id,
             list_transform(toks, x -> (('0x' || substr(md5(x), 1, 8))::UBIGINT % {M})::BIGINT) hs
      FROM t),
g AS (
  SELECT doc_id,
    CASE
      WHEN len(hs) = 0 THEN []::BIGINT[]
      WHEN len(hs) < {W} THEN [list_reduce(hs, (a, b) -> (a * {B} + b) % {M})]
      ELSE list_transform(range(1, len(hs) - {W - 2}), i -> {expr})
    END AS grams
  FROM h
),
p AS (
  SELECT doc_id, s['p'] pos, s['g'] gram FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(grams) + 1),
           i -> {{'p': i - 1, 'g': grams[i]}})) s
    FROM g)
),
wmin AS (
  SELECT doc_id, pos i,
         min(gram) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND {ww - 1} FOLLOWING) mn,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {ww - 1} FOLLOWING) cnt
  FROM p
),
sel AS (
  SELECT w.doc_id, w.i, max(p.pos)::BIGINT pos, w.mn gram
  FROM wmin w JOIN p ON p.doc_id = w.doc_id
                    AND p.pos BETWEEN w.i AND w.i + {ww - 1}
                    AND p.gram = w.mn
  WHERE w.cnt = {ww}
  GROUP BY w.doc_id, w.i, w.mn
)
SELECT DISTINCT doc_id::BIGINT doc_id, pos, gram FROM sel
ORDER BY doc_id, pos
"""


def _span_coverage_sql() -> str:
    """dedup_span_coverage oracle: SAME md5-mod-prime token hash +
    SPAN_WIDTH Horner rolling polynomial as engine/ops/dedup._SpanGrams
    (constants imported — no drift), dup grams = min(doc)!=max(doc), then
    per doc the island union of duplicated windows via a lag window: first
    span of a doc contributes w_eff = least(W, n_tokens), later spans
    min(pos_gap, w_eff) — identical to the engine's vectorised kernel."""
    from engine.ops.dedup import SPAN_BASE, SPAN_MOD, SPAN_WIDTH

    B, M, W = SPAN_BASE, SPAN_MOD, SPAN_WIDTH
    expr = "hs[i]"
    for j in range(1, W):
        expr = f"(({expr}) * {B} % {M} + hs[i+{j}])"
    expr = f"({expr}) % {M}"
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
h AS (SELECT doc_id, len(toks)::BIGINT n_tokens,
             list_transform(toks, x -> (('0x' || substr(md5(x), 1, 8))::UBIGINT % {M})::BIGINT) hs
      FROM t),
g AS (
  SELECT doc_id, n_tokens,
    CASE
      WHEN len(hs) = 0 THEN []::BIGINT[]
      WHEN len(hs) < {W} THEN [list_reduce(hs, (a, b) -> (a * {B} + b) % {M})]
      ELSE list_transform(range(1, len(hs) - {W - 2}), i -> {expr})
    END AS grams
  FROM h
),
p AS (
  SELECT doc_id, unnest(grams) gram, unnest(range(1, len(grams) + 1)) pos
  FROM g
),
dup AS (SELECT gram FROM p GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
dp AS (SELECT p.doc_id, p.pos FROM p JOIN dup USING (gram)),
contrib AS (
  SELECT dp.doc_id,
         CASE WHEN lag(dp.pos) OVER w IS NULL THEN least({W}, g.n_tokens)
              ELSE least(dp.pos - lag(dp.pos) OVER w, least({W}, g.n_tokens))
         END c
  FROM dp JOIN g ON g.doc_id = dp.doc_id
  WINDOW w AS (PARTITION BY dp.doc_id ORDER BY dp.pos)
),
agg AS (
  SELECT doc_id, count(*)::BIGINT n_dup_spans, sum(c)::BIGINT dup_tokens
  FROM contrib GROUP BY 1
)
SELECT g.doc_id,
       g.n_tokens,
       len(g.grams)::BIGINT n_spans,
       coalesce(agg.n_dup_spans, 0)::BIGINT n_dup_spans,
       coalesce(agg.dup_tokens, 0)::BIGINT dup_tokens,
       floor(coalesce(agg.dup_tokens, 0) / greatest(g.n_tokens, 1)::DOUBLE * 1e6 + 0.5)::BIGINT dup_ratio_micro
FROM g LEFT JOIN agg USING (doc_id)
ORDER BY g.doc_id
"""


def _dedup_simhash_sql() -> str:
    """PARTIAL oracle for simhash banding (VERDICT r2 #8): the signature
    function is engine-defined (Jaccard-SQL equivalence is measured
    infeasible — engine/ops/dedup.py simhash_pairs docstring), but the pair
    LOGIC — 4×16-bit band explode, bucket-size guard, hamming≤3 verify,
    pair dedup — is replayed by DuckDB from the materialized signature
    parquet. Pinned to the driver's correctness scale (sf0.01); OSError
    degrades this entry to rows-only."""
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/documents.parquet"):
        raise OSError("driver correctness dataset absent")
    from engine.ops.dedup import simhash_signature_parquet

    sig_path = simhash_signature_parquet(sf)
    # uval: the int64 signature reinterpreted as its unsigned 64-bit value
    # (HUGEINT, exact) so the band extraction matches numpy's uint64 shifts
    return f"""
WITH {_pinned_documents_guard_cte()},
s AS (
  SELECT doc_id,
         simhash,
         CASE WHEN simhash < 0
              THEN simhash::HUGEINT + 18446744073709551616::HUGEINT
              ELSE simhash::HUGEINT END AS uval
  FROM read_parquet('{sig_path}')
),
b AS (
  -- divisor spelled as exact HUGEINT literals: ^ is pow() returning DOUBLE,
  -- which loses bits against 2^64-scale uval
  SELECT doc_id, simhash, band,
         ((uval // divisor) % 65536)::BIGINT AS band_val
  FROM s, (SELECT unnest([0, 1, 2, 3]) AS band,
                  unnest([1::HUGEINT, 65536::HUGEINT,
                          4294967296::HUGEINT, 281474976710656::HUGEINT]) AS divisor) bands
),
ok_buckets AS (
  SELECT band, band_val FROM b GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 2000
),
pairs AS (
  SELECT DISTINCT x.doc_id doc_a, y.doc_id doc_b,
         bit_count(xor(x.simhash, y.simhash))::BIGINT hamming
  FROM b x
  JOIN ok_buckets USING (band, band_val)
  JOIN b y USING (band, band_val)
  WHERE x.doc_id < y.doc_id
)
SELECT doc_a::BIGINT doc_a, doc_b::BIGINT doc_b, hamming
FROM pairs CROSS JOIN pindoc
WHERE hamming <= 3 AND pindoc.ok = 1 ORDER BY doc_a, doc_b
"""


def _dedup_minhash_candidates_sql() -> str:
    """MinHash-LSH candidate-pair oracle from the materialized banding
    signatures (the simhash partial-oracle seam): bucket = (band,
    band_hash), size guard 2 ≤ n ≤ max_bucket, within-bucket pair explode
    (a < b), cross-band count = n_bands_shared. Pinned to sf0.01 with the
    documents-fingerprint guard; OSError degrades to rows-only."""
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/documents.parquet"):
        raise OSError("driver correctness dataset absent")
    from engine.ops.dedup import minhash_band_parquet

    sig_path = minhash_band_parquet(sf)
    return f"""
WITH {_pinned_documents_guard_cte()},
sig AS (SELECT doc_id, band, band_hash FROM read_parquet('{sig_path}')),
bucket AS (
  SELECT band, band_hash FROM sig GROUP BY 1, 2
  HAVING count(*) >= 2 AND count(*) <= 1000
),
p AS (
  SELECT s1.doc_id doc_a, s2.doc_id doc_b
  FROM sig s1
  JOIN sig s2 ON s1.band = s2.band AND s1.band_hash = s2.band_hash
             AND s1.doc_id < s2.doc_id
  JOIN bucket b ON b.band = s1.band AND b.band_hash = s1.band_hash
)
SELECT doc_a::BIGINT doc_a, doc_b::BIGINT doc_b,
       count(*)::BIGINT n_bands_shared
FROM p CROSS JOIN pindoc
WHERE pindoc.ok = 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _pinned_documents_guard_cte() -> str:
    """Sibling of _pinned_embeddings_guard_cte for oracles whose
    materialized artifact derives from the pinned sf0.01 DOCUMENTS table
    (the simhash signature parquet): fingerprint = (count, Σ n_chars) —
    text-derived, so same-row-count sfs still differ."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    t = _pq.read_table("/root/testdata/sf0.01/documents.parquet",
                       columns=["n_chars"])
    n, sm = t.num_rows, int(_pc.sum(t["n_chars"]).as_py() or 0)
    return f"""pindoc AS (
  SELECT CASE WHEN (SELECT count(*) FROM documents) = {n}
               AND (SELECT coalesce(sum(n_chars), 0) FROM documents) = {sm}
         THEN 1 ELSE error('attached documents view is not the pinned '
              'sf0.01 table this materialized signature artifact derives '
              'from; run at sf0.01 or treat this entry as rows-only') END ok
)"""


def _pinned_embeddings_guard_cte() -> str:
    """Guard CTE for oracles whose persisted ANN artifacts are trained on
    the pinned sf0.01 embeddings (ADVICE r3 #1): when the session-attached
    `embeddings` view is a DIFFERENT table, DuckDB raises a CLEAR
    diagnostic instead of silently comparing the engine (which builds
    artifacts for the attached sf) against sf0.01-trained codebooks and
    reporting a spurious value mismatch. Fingerprint = (count, Σ of the
    micro-rounded FIRST embedding component) of the pinned table — vector
    VALUES, not ids: different sfs share (count, Σ vec_id) by
    construction — computed at SQL-build time."""
    import math

    import pyarrow.parquet as _pq

    t = _pq.read_table("/root/testdata/sf0.01/embeddings.parquet",
                       columns=["embedding"])
    n = t.num_rows
    sm = sum(int(math.floor(float(v[0]) * 1e6 + 0.5))
             for v in t["embedding"].to_pylist())
    return f"""pinchk AS (
  SELECT CASE WHEN (SELECT count(*) FROM embeddings) = {n}
               AND (SELECT coalesce(sum(floor(embedding[1]::DOUBLE * 1e6 + 0.5)::BIGINT), 0)
                    FROM embeddings) = {sm}
         THEN 1 ELSE error('attached embeddings view is not the pinned '
              'sf0.01 table these persisted ANN artifacts were trained on; '
              'run at sf0.01 or treat this entry as rows-only') END ok
)"""


def _ann_ivf_topk_sql() -> str:
    """Oracle for the APPROXIMATE IVF path (nprobe < n_lists): brute-force
    cosine restricted to each query's probed lists, recomputed by DuckDB
    from the engine's own persisted artifacts — the hive assignment parquet
    (vec_id, lid) and a probe table (qid, lid) materialized with the same
    numpy routing expression ivf_query uses. Pinned to the driver's
    correctness scale (sf0.01), like the lang-ID profile oracle; raises
    OSError when that dataset is absent so the caller degrades this entry
    to rows-only."""
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/embeddings.parquet"):
        raise OSError("driver correctness dataset absent")
    from engine.ops.ann import ivf_probe_artifacts

    index_dir, probe_path = ivf_probe_artifacts(sf, n_queries=5, nprobe=4)
    lists_glob = f"{index_dir}/lists/*/*.parquet"
    return f"""
WITH {_pinned_embeddings_guard_cte()},
q AS (SELECT vec_id qid, embedding FROM embeddings WHERE vec_id < 5),
probe AS (SELECT qid, lid FROM read_parquet('{probe_path}')),
assign AS (SELECT vec_id, lid FROM read_parquet('{lists_glob}')),
cand AS (SELECT p.qid, a.vec_id FROM probe p JOIN assign a USING (lid)),
sims AS (
  SELECT c.qid::BIGINT qid, e.vec_id::BIGINT vec_id,
         floor(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) * 1e6 + 0.5)::BIGINT sim_micro
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id AND e.vec_id <> c.qid
  JOIN q ON q.qid = c.qid
)
SELECT qid, rank, vec_id, sim_micro FROM (
  SELECT qid, vec_id, sim_micro,
         row_number() OVER (PARTITION BY qid ORDER BY sim_micro DESC, vec_id ASC)::BIGINT rank
  FROM sims
) CROSS JOIN pinchk WHERE rank <= 10 AND pinchk.ok = 1 ORDER BY qid, rank
"""


def _ann_pq_topk_sql() -> str:
    """Oracle for the PQ/ADC path: because every quantity is int64-exact
    (micro-int queries, integer centroids, squared-distance LUT, code-sum),
    DuckDB replays the ENTIRE approximate ranking bit-for-bit from the
    engine's persisted artifacts — codebooks.parquet (sub, code, j, c) and
    the compressed codes/ table — not merely a restriction of brute force.
    Pinned to the driver's correctness scale (sf0.01); OSError degrades
    this entry to rows-only."""
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/embeddings.parquet"):
        raise OSError("driver correctness dataset absent")
    from engine.ops.ann import PQ_M, pq_artifacts

    adir = pq_artifacts(sf)
    import json

    with open(f"{adir}/meta.json") as f:
        dsub = json.load(f)["dsub"]
    unpivot = ", ".join(
        f"{{'sub': {s}, 'code': code_{s}}}" for s in range(PQ_M))
    return f"""
WITH {_pinned_embeddings_guard_cte()},
q AS (SELECT vec_id qid, embedding FROM embeddings WHERE vec_id < 5),
qc AS (
  SELECT qid, s['j'] j, s['v'] v FROM (
    SELECT qid, unnest(list_transform(range(1, len(embedding) + 1),
           i -> {{'j': i - 1,
                  'v': floor(embedding[i]::DOUBLE * 1e6 + 0.5)::BIGINT}})) s
    FROM q)
),
cb AS (SELECT sub, code, j, c FROM read_parquet('{adir}/codebooks.parquet')),
dist AS (
  SELECT qid, cb.sub, cb.code,
         sum((qc.v - cb.c) * (qc.v - cb.c))::BIGINT d
  FROM cb JOIN qc ON qc.j = cb.sub * {dsub} + cb.j
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, s['sub'] sub, s['code'] code FROM (
    SELECT vec_id, unnest([{unpivot}]) s
    FROM read_parquet('{adir}/codes/*.parquet'))
),
adc AS (
  SELECT d.qid::BIGINT qid, c.vec_id::BIGINT vec_id, sum(d.d)::BIGINT adc
  FROM codes c JOIN dist d ON d.sub = c.sub AND d.code = c.code
  GROUP BY 1, 2
)
SELECT qid, rank, vec_id, adc FROM (
  SELECT qid, vec_id, adc,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc ASC, vec_id ASC)::BIGINT rank
  FROM adc WHERE vec_id <> qid
) CROSS JOIN pinchk WHERE rank <= 10 AND pinchk.ok = 1 ORDER BY qid, rank
"""


def _ann_ivfpq_topk_sql() -> str:
    """Oracle for IVF-PQ: the probe table restricts candidates (the IVF
    arm) and the int64 ADC ranking is replayed exactly from the persisted
    codebooks + per-list codes (the PQ arm) — the WHOLE approximate path
    in one SQL statement. Pinned to sf0.01; OSError degrades."""
    import json
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/embeddings.parquet"):
        raise OSError("driver correctness dataset absent")
    from engine.ops.ann import PQ_M, ivfpq_probe_artifacts

    adir, probe_path = ivfpq_probe_artifacts(sf, n_queries=5, nprobe=4)
    with open(f"{adir}/meta.json") as f:
        dsub = json.load(f)["dsub"]
    unpivot = ", ".join(
        f"{{'sub': {s}, 'code': code_{s}}}" for s in range(PQ_M))
    return f"""
WITH {_pinned_embeddings_guard_cte()},
q AS (SELECT vec_id qid, embedding FROM embeddings WHERE vec_id < 5),
qc AS (
  SELECT qid, s['j'] j, s['v'] v FROM (
    SELECT qid, unnest(list_transform(range(1, len(embedding) + 1),
           i -> {{'j': i - 1,
                  'v': floor(embedding[i]::DOUBLE * 1e6 + 0.5)::BIGINT}})) s
    FROM q)
),
cb AS (SELECT sub, code, j, c FROM read_parquet('{adir}/codebooks.parquet')),
dist AS (
  SELECT qid, cb.sub, cb.code,
         sum((qc.v - cb.c) * (qc.v - cb.c))::BIGINT d
  FROM cb JOIN qc ON qc.j = cb.sub * {dsub} + cb.j
  GROUP BY 1, 2, 3
),
probe AS (SELECT qid, lid FROM read_parquet('{probe_path}')),
lists AS (SELECT * FROM read_parquet('{adir}/lists/*/*.parquet')),
cand AS (
  SELECT p.qid, l.* FROM probe p JOIN lists l ON l.lid = p.lid
  WHERE l.vec_id <> p.qid
),
codes AS (
  SELECT qid, vec_id, s['sub'] sub, s['code'] code FROM (
    SELECT qid, vec_id, unnest([{unpivot}]) s FROM cand)
),
adc AS (
  SELECT c.qid::BIGINT qid, c.vec_id::BIGINT vec_id, sum(d.d)::BIGINT adc
  FROM codes c JOIN dist d ON d.qid = c.qid AND d.sub = c.sub AND d.code = c.code
  GROUP BY 1, 2
)
SELECT qid, rank, vec_id, adc FROM (
  SELECT qid, vec_id, adc,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc ASC, vec_id ASC)::BIGINT rank
  FROM adc
) CROSS JOIN pinchk WHERE rank <= 10 AND pinchk.ok = 1 ORDER BY qid, rank
"""


def _ann_ivfpq_residual_topk_sql() -> str:
    """IVFADC oracle: like _ann_ivfpq_topk_sql but the query subtracts each
    probed list's micro centroid (centroids_micro.parquet) BEFORE the
    distance table, so the per-(qid, lid) LUT is replayed exactly."""
    import json
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/embeddings.parquet"):
        raise OSError("driver correctness dataset absent")
    from engine.ops.ann import PQ_M, ivfpq_probe_artifacts

    adir, probe_path = ivfpq_probe_artifacts(sf, n_queries=5, nprobe=4,
                                             residual=True)
    with open(f"{adir}/meta.json") as f:
        dsub = json.load(f)["dsub"]
    unpivot = ", ".join(
        f"{{'sub': {s}, 'code': code_{s}}}" for s in range(PQ_M))
    return f"""
WITH {_pinned_embeddings_guard_cte()},
q AS (SELECT vec_id qid, embedding FROM embeddings WHERE vec_id < 5),
qc AS (
  SELECT qid, s['j'] j, s['v'] v FROM (
    SELECT qid, unnest(list_transform(range(1, len(embedding) + 1),
           i -> {{'j': i - 1,
                  'v': floor(embedding[i]::DOUBLE * 1e6 + 0.5)::BIGINT}})) s
    FROM q)
),
probe AS (SELECT qid, lid FROM read_parquet('{probe_path}')),
cm AS (SELECT lid, j, c FROM read_parquet('{adir}/centroids_micro.parquet')),
qr AS (
  SELECT p.qid, p.lid, qc.j, (qc.v - cm.c)::BIGINT vr
  FROM probe p JOIN qc ON qc.qid = p.qid
  JOIN cm ON cm.lid = p.lid AND cm.j = qc.j
),
cb AS (SELECT sub, code, j, c FROM read_parquet('{adir}/codebooks.parquet')),
dist AS (
  SELECT qid, lid, cb.sub, cb.code,
         sum((qr.vr - cb.c) * (qr.vr - cb.c))::BIGINT d
  FROM cb JOIN qr ON qr.j = cb.sub * {dsub} + cb.j
  GROUP BY 1, 2, 3, 4
),
lists AS (SELECT * FROM read_parquet('{adir}/lists/*/*.parquet')),
cand AS (
  SELECT p.qid, l.* FROM probe p JOIN lists l ON l.lid = p.lid
  WHERE l.vec_id <> p.qid
),
codes AS (
  SELECT qid, vec_id, lid, s['sub'] sub, s['code'] code FROM (
    SELECT qid, vec_id, lid, unnest([{unpivot}]) s FROM cand)
),
adc AS (
  SELECT c.qid::BIGINT qid, c.vec_id::BIGINT vec_id, sum(d.d)::BIGINT adc
  FROM codes c JOIN dist d ON d.qid = c.qid AND d.lid = c.lid
                          AND d.sub = c.sub AND d.code = c.code
  GROUP BY 1, 2
)
SELECT qid, rank, vec_id, adc FROM (
  SELECT qid, vec_id, adc,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc ASC, vec_id ASC)::BIGINT rank
  FROM adc
) CROSS JOIN pinchk WHERE rank <= 10 AND pinchk.ok = 1 ORDER BY qid, rank
"""


def _lang_id_scored_sql() -> str:
    """ta_lang_id_scored oracle: trigram extraction, integer scoring, argmax
    and confidence recomputed by DuckDB against the SAME materialized profile
    parquet the Ray op scores with (engine/ops/textstats.langid_profile_parquet
    — called here so the artifact exists whichever side the driver runs
    first). The only floats are single divisions of exact integers
    (score/sqrt(pnormsq), then *1e6 floor) — IEEE-identical across engines."""
    from engine.ops.textstats import langid_profile_parquet

    path = langid_profile_parquet()
    return f"""
WITH d AS (
  SELECT doc_id,
         ' ' || regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g') || ' ' AS s
  FROM documents
),
tg AS (
  SELECT doc_id, unnest(list_transform(range(1, length(s) - 1), i -> substr(s, i, 3))) AS g
  FROM d
),
cnt AS (SELECT doc_id, g, count(*)::BIGINT c FROM tg GROUP BY 1, 2),
dn AS (SELECT doc_id, sum(c * c)::BIGINT docnormsq FROM cnt GROUP BY 1),
prof AS (SELECT lang, gram, w_micro FROM read_parquet('{path}')),
pn AS (SELECT lang, sum(w_micro * w_micro)::BIGINT pnormsq FROM prof GROUP BY 1),
sc AS (
  SELECT cnt.doc_id, p.lang, sum(cnt.c * p.w_micro)::BIGINT score
  FROM cnt JOIN prof p ON p.gram = cnt.g GROUP BY 1, 2
),
grid AS (
  SELECT docs.doc_id, pn.lang, pn.pnormsq, coalesce(sc.score, 0) AS score
  FROM (SELECT doc_id FROM documents) docs
  CROSS JOIN pn
  LEFT JOIN sc ON sc.doc_id = docs.doc_id AND sc.lang = pn.lang
),
ranked AS (
  SELECT doc_id, lang, score, pnormsq,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY score / sqrt(pnormsq) DESC, lang ASC
         ) AS rn
  FROM grid
)
SELECT r.doc_id, r.lang AS lang_pred,
       CASE WHEN r.score = 0 OR dn.docnormsq IS NULL OR dn.docnormsq = 0 THEN 0
            ELSE floor(r.score / (sqrt(r.pnormsq) * sqrt(dn.docnormsq)) * 1e6 + 0.5)::BIGINT
       END AS confidence_micro
FROM ranked r LEFT JOIN dn ON dn.doc_id = r.doc_id
WHERE r.rn = 1 ORDER BY r.doc_id
"""


def _clean_corpus_sql() -> str:
    """clean_corpus oracle: the full cleaning decision recomputed by DuckDB —
    exact-dup group min over the canonical fingerprint, near-dup component
    min via the recursive-CTE closure over the exact Jaccard pair graph
    (same closure as the dedup_clusters oracle), the ta_quality ratio
    arithmetic, and the scored lang-ID embedded as a derived table (same
    materialized profile artifact as ta_lang_id_scored, hence the same
    OSError degrade). CASE order == engine/ops/clean.py reason precedence."""
    lang_sql = _lang_id_scored_sql()
    return f"""
WITH RECURSIVE
tk AS (SELECT doc_id, {_TOKS} toks FROM documents),
fp AS (SELECT doc_id, md5(array_to_string(toks, ' ')) f,
              len(toks)::BIGINT n_tokens,
              floor(len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE * 1e6 + 0.5)::BIGINT uniq
       FROM tk),
er AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY f) rep, n_tokens, uniq FROM fp),
ts AS (SELECT doc_id, list_distinct(toks) s FROM tk),
p AS (SELECT doc_a, doc_b FROM (
        SELECT a.doc_id doc_a, b.doc_id doc_b,
               floor((len(list_intersect(a.s, b.s))::DOUBLE
                      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) * 1e6 + 0.5)::BIGINT jm
        FROM ts a JOIN ts b ON a.doc_id < b.doc_id
      ) WHERE jm >= 900000),
e AS (SELECT doc_a a, doc_b b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
walk(doc, lab) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, w.lab FROM e JOIN walk w ON w.doc = e.b
),
clus AS (SELECT doc, min(lab) cid FROM walk GROUP BY doc),
lang AS (SELECT doc_id, lang_pred FROM ({lang_sql})),
sel AS (
  SELECT er.doc_id,
         CASE WHEN er.doc_id <> er.rep THEN 'exact_dup'
              WHEN c.doc IS NOT NULL AND er.doc_id <> c.cid THEN 'near_dup'
              WHEN er.n_tokens < 20 OR er.uniq < 330000 THEN 'low_quality'
              WHEN l.lang_pred <> 'en' THEN 'lang_other'
              ELSE 'kept' END reason
  FROM er LEFT JOIN clus c ON c.doc = er.doc_id
          LEFT JOIN lang l ON l.doc_id = er.doc_id)
SELECT doc_id::BIGINT doc_id, (reason = 'kept')::BIGINT keep, reason
FROM sel ORDER BY doc_id
"""


def _phrase_queries_values() -> str:
    from engine.pipelines import PHRASE_QUERIES

    rows = ", ".join(f"({qid}, '{text}')" for qid, text in PHRASE_QUERIES)
    return f"(VALUES {rows})"


def _match_percentiles_sql() -> str:
    """ft_match_percentiles oracle: per-query inverted-CDF percentiles of
    n_chars over the OR match set (window cumsum per qid — the per-group
    version of the ta_dl_quantiles definition)."""
    from engine.pipelines import MATCH_PCTS

    pcts = ", ".join(f"({p})" for p in MATCH_PCTS)
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
matched AS (
  SELECT DISTINCT qt.qid, tok.doc_id
  FROM qterm qt JOIN tok ON tok.term = qt.term
),
mv AS (
  SELECT m.qid, d.n_chars::BIGINT n_chars
  FROM matched m JOIN documents d ON d.doc_id = m.doc_id
),
h AS (SELECT qid, n_chars, count(*)::BIGINT n FROM mv GROUP BY 1, 2),
c AS (SELECT qid, n_chars, n,
             sum(n) OVER (PARTITION BY qid ORDER BY n_chars)::BIGINT cum
      FROM h),
tot AS (SELECT qid, count(*)::BIGINT n FROM mv GROUP BY 1),
p(pct) AS (VALUES {pcts}),
sel AS (
  SELECT c.qid, p.pct, c.n_chars, c.cum,
         row_number() OVER (PARTITION BY c.qid, p.pct ORDER BY c.n_chars) r
  FROM p CROSS JOIN tot JOIN c ON c.qid = tot.qid
   AND c.cum >= (p.pct * tot.n + 99) // 100
)
SELECT qid, pct::BIGINT pct, n_chars, cum n_le FROM sel WHERE r = 1
ORDER BY qid, pct
"""


def _cardinality_sql() -> str:
    """ft_cardinality oracle: per-query exact distinct counts of each facet
    attribute over the OR match set, melted to (qid, facet, n_distinct)."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
matched AS (
  SELECT DISTINCT qt.qid, tok.doc_id
  FROM qterm qt JOIN tok ON tok.term = qt.term
),
mv AS (
  SELECT m.qid, d.source, d.lang
  FROM matched m JOIN documents d ON d.doc_id = m.doc_id
)
SELECT qid, 'lang' facet, count(DISTINCT lang)::BIGINT n_distinct FROM mv GROUP BY qid
UNION ALL
SELECT qid, 'source' facet, count(DISTINCT source)::BIGINT n_distinct FROM mv GROUP BY qid
ORDER BY qid, facet
"""


def _adjacency_sql() -> str:
    """ft_adjacency oracle: pairwise OR-match-set intersection sizes
    (qid_a <= qid_b; the diagonal is each query's own match count)."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
matched AS (
  SELECT DISTINCT qt.qid, tok.doc_id
  FROM qterm qt JOIN tok ON tok.term = qt.term
)
SELECT a.qid qid_a, b.qid qid_b, count(*)::BIGINT n_both
FROM matched a JOIN matched b ON a.doc_id = b.doc_id AND a.qid <= b.qid
GROUP BY 1, 2
ORDER BY 1, 2
"""


def _significant_terms_sql(top_n: int) -> str:
    """ft_significant_terms oracle: OR match set per query, per-term
    foreground df within it, background df from the corpus, integer lift
    score fg_df * n_docs * SCALE // (bg_df * n_fg)."""
    from engine.pipelines import SIGTERMS_SCALE

    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
matched AS (
  SELECT DISTINCT qt.qid, tok.doc_id
  FROM qterm qt JOIN tok ON tok.term = qt.term
),
nfg AS (SELECT qid, count(*)::BIGINT n FROM matched GROUP BY 1),
dterm AS (SELECT DISTINCT doc_id, term FROM tok),
fg AS (
  SELECT m.qid, dt.term, count(*)::BIGINT fg_df
  FROM matched m JOIN dterm dt ON dt.doc_id = m.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT fg.qid, fg.term, fg.fg_df, df.df bg_df,
         fg.fg_df * s.n_docs * {SIGTERMS_SCALE} // (df.df * nfg.n) score_micro
  FROM fg
  JOIN df ON df.term = fg.term
  JOIN nfg ON nfg.qid = fg.qid
  CROSS JOIN stats s
)
SELECT qid, rank, term, fg_df, bg_df, score_micro FROM (
  SELECT qid, term, fg_df, bg_df, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, term ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {top_n}
ORDER BY qid, rank
"""


def _bm25_proximity_sql(k: int) -> str:
    """Proximity (slop) oracle: both terms within slop tokens of each other
    (either order) — min |pos_a - pos_b| <= slop + 1 over 1-based positions
    in the normalized token array — ranked by BM25 over the pair."""
    from engine.pipelines import PROX_QUERIES

    rows = ", ".join(f"({q}, '{a}', '{b}', {s})" for q, a, b, s in PROX_QUERIES)
    return f"""
WITH {_TOK_CTE},
q(qid, term_a, term_b, slop) AS (VALUES {rows}),
tokpos AS (
  SELECT doc_id,
         unnest({_TOKS}) term,
         unnest(range(1, len({_TOKS}) + 1)) pos
  FROM documents
),
matched AS (
  SELECT q.qid::BIGINT qid, a.doc_id
  FROM q
  JOIN tokpos a ON a.term = q.term_a
  JOIN tokpos b ON b.doc_id = a.doc_id AND b.term = q.term_b
  GROUP BY q.qid, a.doc_id, q.slop
  HAVING min(abs(a.pos - b.pos)) <= q.slop + 1
),
qterm AS (
  SELECT qid::BIGINT qid, term_a term FROM q
  UNION
  SELECT qid::BIGINT, term_b FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_id, floor(sum(c.w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c JOIN matched m ON m.qid = c.qid AND m.doc_id = c.doc_id
  GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _span_near_sql(k: int) -> str:
    """span_near oracle (unordered, slop): a doc matches a query when some
    anchor occurrence of any query term has ALL the query's distinct terms
    occurring in [anchor, anchor + n − 1 + slop] — the minimal window of a
    valid span always starts at the span's own min position, so anchoring
    at every occurrence is exact. Ranked by BM25 over the query's terms."""
    from engine.pipelines import SPAN_QUERIES

    rows = ", ".join(
        f"({q}, '{t}', {s}, {len(set(ts))})"
        for q, ts, s in SPAN_QUERIES
        for t in sorted(set(ts))
    )
    return f"""
WITH {_TOK_CTE},
qspec(qid, term, slop, n) AS (VALUES {rows}),
tokpos AS (
  SELECT doc_id,
         unnest({_TOKS}) term,
         unnest(range(1, len({_TOKS}) + 1)) pos
  FROM documents
),
occ AS (
  SELECT q.qid::BIGINT qid, t.doc_id, t.pos, q.term, q.slop, q.n
  FROM qspec q JOIN tokpos t ON t.term = q.term
),
matched AS (
  SELECT DISTINCT qid, doc_id FROM (
    SELECT o.qid, o.doc_id
    FROM occ o
    JOIN occ t2 ON t2.qid = o.qid AND t2.doc_id = o.doc_id
              AND t2.pos BETWEEN o.pos AND o.pos + o.n - 1 + o.slop
    GROUP BY o.qid, o.doc_id, o.pos, o.n
    HAVING count(DISTINCT t2.term) = o.n
  )
),
qterm AS (SELECT DISTINCT qid::BIGINT qid, term FROM qspec),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_id, floor(sum(c.w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c JOIN matched m ON m.qid = c.qid AND m.doc_id = c.doc_id
  GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _span_near_ordered_sql(k: int) -> str:
    """Ordered span_near oracle: existence of strictly increasing positions
    p1 < … < pn (term i at p_i) with pn − p1 ≤ n − 1 + slop, written as a
    chained self-join per query (EXISTS over all combinations ⟺ the
    engine's greedy-chain minimum). Ranked by BM25 over the query's terms."""
    from engine.pipelines import SPAN_ORDERED_QUERIES

    chains = []
    for qid, ts, slop in SPAN_ORDERED_QUERIES:
        bound = len(ts) - 1 + slop
        joins = "".join(
            f"\n    JOIN tokpos o{i + 1} ON o{i + 1}.doc_id = o1.doc_id"
            f" AND o{i + 1}.term = '{t}' AND o{i + 1}.pos > o{i}.pos"
            f" AND o{i + 1}.pos <= o1.pos + {bound}"
            for i, t in enumerate(ts[1:], start=1)
        )
        chains.append(
            f"  SELECT DISTINCT {qid}::BIGINT qid, o1.doc_id FROM tokpos o1"
            f"{joins}\n    WHERE o1.term = '{ts[0]}'"
        )
    matched = "\n  UNION ALL\n".join(chains)
    qterms = ", ".join(
        f"({qid}, '{t}')" for qid, ts, _ in SPAN_ORDERED_QUERIES for t in ts
    )
    return f"""
WITH {_TOK_CTE},
tokpos AS (
  SELECT doc_id,
         unnest({_TOKS}) term,
         unnest(range(1, len({_TOKS}) + 1)) pos
  FROM documents
),
matched AS (
{matched}
),
qterm(qid, term) AS (VALUES {qterms}),
contrib AS (
  SELECT qt.qid::BIGINT qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_id, floor(sum(c.w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c JOIN matched m ON m.qid = c.qid AND m.doc_id = c.doc_id
  GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _top_hits_sql(n: int) -> str:
    """top_hits oracle: BM25 micro scores (union match semantics) joined to
    the source attribute, row_number per (qid, source) bucket."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, source, rank, doc_id, score_micro FROM (
  SELECT s.qid, d.source, s.doc_id, s.score_micro,
         row_number() OVER (PARTITION BY s.qid, d.source
                            ORDER BY s.score_micro DESC, s.doc_id ASC)::BIGINT rank
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
) WHERE rank <= {n}
ORDER BY qid, source, rank
"""


def _composite_buckets_sql() -> str:
    """Composite-agg page oracle: bucket counts after the exclusive
    after-key in (source, lang) order, first PAGE rows."""
    from engine.pipelines import COMPOSITE_AFTER, COMPOSITE_PAGE

    s, l = COMPOSITE_AFTER
    return f"""
SELECT source, lang, count(*)::BIGINT n_docs
FROM documents
GROUP BY source, lang
HAVING source > '{s}' OR (source = '{s}' AND lang > '{l}')
ORDER BY source, lang
LIMIT {COMPOSITE_PAGE}
"""


def _percolate_sql() -> str:
    """Percolator oracle: presence-set semantics per (doc, rule) — all
    must terms present, no not term present."""
    from engine.pipelines import PERC_QUERIES

    must = ", ".join(f"({q}, '{t}')" for q, ms, _ in PERC_QUERIES for t in sorted(set(ms)))
    not_rows = [f"({q}, '{t}')" for q, _, ns in PERC_QUERIES for t in sorted(set(ns))]
    qnot = (
        f"qnot(qid, term) AS (VALUES {', '.join(not_rows)})"
        if not_rows
        else "qnot(qid, term) AS (SELECT NULL::BIGINT, NULL::VARCHAR WHERE false)"
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({_TOKS}) term FROM documents
),
qmust(qid, term) AS (VALUES {must}),
{qnot},
arity AS (SELECT qid, count(*)::BIGINT n FROM qmust GROUP BY 1),
hits AS (
  SELECT q.qid, t.doc_id, count(*)::BIGINT c
  FROM qmust q JOIN tok t ON t.term = q.term GROUP BY 1, 2
),
bad AS (SELECT DISTINCT q.qid, t.doc_id FROM qnot q JOIN tok t ON t.term = q.term)
SELECT h.qid::BIGINT qid, h.doc_id
FROM hits h JOIN arity a ON a.qid = h.qid
WHERE h.c = a.n
  AND NOT EXISTS (SELECT 1 FROM bad b WHERE b.qid = h.qid AND b.doc_id = h.doc_id)
ORDER BY qid, doc_id
"""


def _bm25_phrase_sql(k: int) -> str:
    """Phrase oracle: docs whose normalized token stream contains the
    phrase's token sequence contiguously ('% needle %' over the
    space-joined tokens), ranked by BM25 over the phrase's distinct terms."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_phrase_queries_values()},
qnorm AS (
  SELECT qid::BIGINT qid,
         list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '') qtoks
  FROM q
),
qterm AS (SELECT DISTINCT qid, unnest(qtoks) term FROM qnorm),
doc_canon AS (
  SELECT doc_id, ' ' || array_to_string({_TOKS}, ' ') || ' ' canon FROM documents
),
matched AS (
  SELECT qn.qid, dc.doc_id
  FROM qnorm qn JOIN doc_canon dc
    ON dc.canon LIKE '%' || ' ' || array_to_string(qn.qtoks, ' ') || ' ' || '%'
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT c.qid, c.doc_id, floor(sum(c.w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib c JOIN matched m ON m.qid = c.qid AND m.doc_id = c.doc_id
  GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_text_identity_sql() -> str:
    """Per-row invariant oracle: docID and text fingerprint recomputed by
    DuckDB from the same materialized corpus parquet, keyed by the engine's
    precomputed doc_key column."""
    from engine.pipelines import tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    return f"""
SELECT doc_key, conv_id || ':' || turn_idx::VARCHAR AS doc_id, md5(text) fingerprint
FROM read_parquet('{path}') ORDER BY doc_key
"""


def _bm25_sql(k: int) -> str:
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _kmeans_asn_cte() -> str:
    """The KM_ITERS Lloyd rounds UNROLLED as a WITH-chain ending in
    ``asn(vec_id, cluster, dist2)`` — the final k-means assignment —
    shared by the emb_kmeans and dedup_semantic oracles: micro-int
    quantization, hash-order seeds, floor-averaged integer centroids
    (explicit floor(): DuckDB's // truncates toward zero), Σ(x−c)² int64
    distances, ties to the smallest cluster id. Empty clusters simply have
    no rows in c{t} and stop being candidates, same as the engine."""
    from engine.ops.ann import KM_ITERS, KM_K

    k = KM_K
    parts = [f"""
WITH v AS (
  SELECT vec_id, i, floor(e::DOUBLE * 1e6 + 0.5)::BIGINT x
  FROM (SELECT vec_id, unnest(embedding) e,
               generate_subscripts(embedding, 1) i
        FROM embeddings)
),
sd AS (
  SELECT vec_id, rn - 1 AS cluster FROM (
    SELECT vec_id, row_number() OVER (
      ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 16))::UBIGINT, vec_id) rn
    FROM embeddings)
  WHERE rn <= {k}
),
c0 AS (SELECT sd.cluster, v.i, v.x cx FROM sd JOIN v USING (vec_id))"""]
    for t in range(KM_ITERS):
        parts.append(f""",
d{t} AS (
  SELECT v.vec_id, c.cluster,
         sum((v.x - c.cx) * (v.x - c.cx))::BIGINT d
  FROM v JOIN c{t} c ON c.i = v.i GROUP BY 1, 2
),
a{t} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) rn
    FROM d{t}) WHERE rn = 1
),
c{t + 1} AS (
  SELECT a.cluster, v.i,
         CAST(floor(sum(v.x)::DOUBLE / count(*)) AS BIGINT) cx
  FROM a{t} a JOIN v USING (vec_id) GROUP BY 1, 2
)""")
    T = KM_ITERS
    parts.append(f""",
dF AS (
  SELECT v.vec_id, c.cluster,
         sum((v.x - c.cx) * (v.x - c.cx))::BIGINT d
  FROM v JOIN c{T} c ON c.i = v.i GROUP BY 1, 2
),
asn AS (
  SELECT vec_id, cluster, d AS dist2 FROM (
    SELECT vec_id, cluster, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) rn
    FROM dF) WHERE rn = 1
)""")
    return "".join(parts)


def _emb_kmeans_sql() -> str:
    return _kmeans_asn_cte() + """
SELECT vec_id, cluster, dist2 FROM asn ORDER BY vec_id
"""


def _dedup_semantic_sql(threshold_micro: int = 350_000) -> str:
    """dedup_semantic oracle: the shared k-means assignment chain, then
    within-cluster cosine pairs and the SemDeDup keep tournament — a doc is
    dropped iff some in-cluster neighbour with sim ≥ τ is farther from the
    centroid (larger dist2; ties → smaller vec_id wins)."""
    return _kmeans_asn_cte() + f""",
pair AS (
  SELECT a.vec_id va, a.dist2 da, b.vec_id vb, b.dist2 db,
         floor(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) * 1e6 + 0.5)::BIGINT sm
  FROM asn a JOIN asn b ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
)
SELECT a.vec_id::BIGINT vec_id, a.cluster::BIGINT AS "cluster", a.dist2::BIGINT dist2,
       (CASE WHEN EXISTS (
          SELECT 1 FROM pair p
          WHERE p.va = a.vec_id AND p.sm >= {threshold_micro}
            AND (p.db > p.da OR (p.db = p.da AND p.vb < p.va))
        ) THEN 0 ELSE 1 END)::BIGINT keep
FROM asn a ORDER BY vec_id
"""


def _function_score_sql(k: int) -> str:
    """ft_function_score oracle: _bm25_sql's scoring with the linear
    field_value_factor applied as the SAME integer expression the engine
    uses — score_micro × (1000 + n_chars) // 1000 — then re-ranked."""
    return f"""
WITH {_TOK_CTE},
q(qid, qtext) AS {_doc_queries_values()},
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_id,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_id, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
fv AS (
  SELECT sc.qid, sc.doc_id,
         ((sc.score_micro * (1000 + d.n_chars)) // 1000)::BIGINT score_micro
  FROM scored sc JOIN documents d USING (doc_id)
)
SELECT qid, rank, doc_id, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC)::BIGINT rank
  FROM fv
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_sft_examples_sql() -> str:
    """tr_sft_examples oracle: same longest-suffix-under-budget cut via a
    turn_idx-DESC running token sum, same "role: text" newline assembly,
    md5-first-8-hex fingerprint — over the SAME materialized corpus."""
    from engine.pipelines import SFT_BUDGET, tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    B = SFT_BUDGET
    return f"""
WITH src AS (
  SELECT conv_id, turn_idx, role, text, len({_TOKS})::BIGINT ntok
  FROM read_parquet('{path}')
),
w AS (
  SELECT *, sum(ntok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC)::BIGINT cum
  FROM src
),
w2 AS (
  SELECT *, min(cum) OVER (PARTITION BY conv_id) mn,
         max(turn_idx) OVER (PARTITION BY conv_id) mxt
  FROM w
),
kept AS (SELECT * FROM w2 WHERE cum <= {B} OR (mn > {B} AND turn_idx = mxt)),
ka AS (
  SELECT conv_id, count(*)::BIGINT n_kept, sum(ntok)::BIGINT n_tokens_kept,
         ('0x' || substr(md5(string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)), 1, 8))::UBIGINT::BIGINT text_fp
  FROM kept GROUP BY 1
),
ta AS (
  SELECT conv_id, count(*)::BIGINT n_turns, sum(ntok)::BIGINT n_tokens_total
  FROM src GROUP BY 1
)
SELECT ta.conv_id, n_turns, n_kept, n_tokens_total, n_tokens_kept, text_fp
FROM ta JOIN ka USING (conv_id)
ORDER BY conv_id
"""


def _tr_bm25_oracle_sql(k: int, where: str = "", post_where: str = "") -> str:
    """Oracle for tr_bm25_oracle: BM25 recomputed by DuckDB over the SAME
    materialized transcript parquet the engine indexes (engine/pipelines.py::
    tr_oracle_corpus_path — called here so the file exists regardless of
    whether the driver runs SQL or the Ray pipeline first). Ties break on the
    precomputed doc_key column, which equals the engine's internal
    hash(conv_id)<<20|turn_idx key. ``where``: optional corpus predicate —
    tr_bm25_purged excludes the deleted convs here, so stats (n_docs/df/
    avgdl) are the FILTERED corpus's, proving run_purge rewrote them.
    ``post_where``: optional FILTER-CONTEXT predicate (ES exists/term
    filter) — applied to the scored set only, so stats stay corpus-wide."""
    from engine.oracle.bm25 import seeded_query_set
    from engine.pipelines import tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in seeded_query_set(20, seed=7))
    wsql = f"WHERE {where}" if where else ""
    post = (f"JOIN src c ON c.doc_key = scored.doc_key WHERE {post_where}"
            if post_where else "")
    return f"""
WITH src AS (SELECT doc_key, doc_id, text, role, tool
             FROM read_parquet('{path}') {wsql}),
tok AS (SELECT doc_key, unnest({_TOKS}) AS term FROM src),
tf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_key, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM src) avgdl
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_key,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_key = tf.doc_key
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_key, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT r.qid, r.rank, src.doc_id, r.doc_key, r.score_micro FROM (
  SELECT scored.qid, scored.doc_key, scored.score_micro,
         row_number() OVER (PARTITION BY scored.qid
                            ORDER BY scored.score_micro DESC,
                                     scored.doc_key ASC)::BIGINT rank
  FROM scored {post}
) r JOIN src ON src.doc_key = r.doc_key
WHERE r.rank <= {k}
ORDER BY r.qid, r.rank
"""


def _tr_pref_pairs_sql() -> str:
    """Preference pairs replayed by SQL over the materialized corpus: same
    uniq-ratio micro score, same asymmetric tie-breaks (chosen doc_key asc,
    rejected doc_key DESC — distinct turns even under a full tie)."""
    from engine.pipelines import tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    return f"""
WITH a AS (
  SELECT conv_id, doc_key,
         floor(len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE
               * 1e6 + 0.5)::BIGINT score
  FROM (SELECT conv_id, doc_key, {_TOKS} toks
        FROM read_parquet('{path}') WHERE role = 'assistant')
),
n AS (SELECT conv_id FROM a GROUP BY 1 HAVING count(*) >= 2),
c AS (SELECT conv_id, doc_key chosen_key, score cs FROM (
        SELECT *, row_number() OVER (PARTITION BY conv_id
                 ORDER BY score DESC, doc_key ASC) r FROM a) WHERE r = 1),
rj AS (SELECT conv_id, doc_key rejected_key, score rs FROM (
        SELECT *, row_number() OVER (PARTITION BY conv_id
                 ORDER BY score ASC, doc_key DESC) r FROM a) WHERE r = 1)
SELECT conv_id, chosen_key, rejected_key, (cs - rs)::BIGINT margin_micro
FROM c JOIN rj USING (conv_id) JOIN n USING (conv_id) ORDER BY conv_id
"""


def _tr_context_windows_sql() -> str:
    """Context-window oracle: per-turn canonical strings via the shared
    token grammar, rolling window of the previous CTX_WINDOW turns
    aggregated oldest-first, md5 of the space-join — turn order pinned by
    the window ORDER BY."""
    from engine.pipelines import CTX_WINDOW, tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    k = CTX_WINDOW
    return f"""
WITH src AS (
  SELECT conv_id, turn_idx,
         array_to_string({_TOKS}, ' ') canon
  FROM read_parquet('{path}')
),
w AS (
  SELECT conv_id, turn_idx,
         list(canon) OVER (PARTITION BY conv_id ORDER BY turn_idx
                           ROWS BETWEEN {k} PRECEDING AND 1 PRECEDING) ctx,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) rn
  FROM src
)
SELECT conv_id, turn_idx::BIGINT turn_idx,
       len(ctx)::BIGINT ctx_turns,
       md5(array_to_string(ctx, ' ')) ctx_fp
FROM w WHERE rn > 1
ORDER BY conv_id, turn_idx
"""


def _tr_has_child_sql(k: int) -> str:
    """Oracle for tr_has_child: per-turn BM25 micro scores (union match
    semantics) summed per conversation, inner-hit count, ranked by
    (sum_micro desc, conv_id asc)."""
    from engine.oracle.bm25 import seeded_query_set
    from engine.pipelines import tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in seeded_query_set(20, seed=7))
    return f"""
WITH src AS (SELECT doc_key, conv_id, text FROM read_parquet('{path}')),
tok AS (SELECT doc_key, unnest({_TOKS}) AS term FROM src),
tf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_key, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM src) avgdl
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_key,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_key = tf.doc_key
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_key, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
conv AS (
  SELECT s.qid, src.conv_id, sum(s.score_micro)::BIGINT sum_micro,
         count(*)::BIGINT n_hits
  FROM scored s JOIN src ON src.doc_key = s.doc_key
  GROUP BY 1, 2
)
SELECT qid, rank, conv_id, sum_micro, n_hits FROM (
  SELECT qid, conv_id, sum_micro, n_hits,
         row_number() OVER (PARTITION BY qid ORDER BY sum_micro DESC, conv_id ASC)::BIGINT rank
  FROM conv
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_sort_by_field_sql(k: int) -> str:
    """Field-sort oracle: OR-match gate, ordered by (ts desc, doc_key asc)."""
    from engine.oracle.bm25 import seeded_query_set
    from engine.pipelines import tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in seeded_query_set(20, seed=7))
    return f"""
WITH src AS (SELECT doc_key, epoch_us(ts)::BIGINT ts_us, text FROM read_parquet('{path}')),
tok AS (SELECT DISTINCT doc_key, unnest({_TOKS}) AS term FROM src),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
m AS (SELECT DISTINCT qt.qid, t.doc_key FROM qterm qt JOIN tok t ON t.term = qt.term)
SELECT qid, rank, doc_key, ts_us FROM (
  SELECT m.qid, m.doc_key, s.ts_us,
         row_number() OVER (PARTITION BY m.qid ORDER BY s.ts_us DESC, m.doc_key ASC)::BIGINT rank
  FROM m JOIN src s ON s.doc_key = m.doc_key
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_has_parent_sql(k: int) -> str:
    """has_parent oracle: per-turn BM25 restricted to turns whose
    conversation has at least HAS_PARENT_MIN_TURNS turns."""
    from engine.oracle.bm25 import seeded_query_set
    from engine.pipelines import HAS_PARENT_MIN_TURNS, tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in seeded_query_set(20, seed=7))
    return f"""
WITH src AS (SELECT doc_key, conv_id, text FROM read_parquet('{path}')),
tok AS (SELECT doc_key, unnest({_TOKS}) AS term FROM src),
tf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_key, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM src) avgdl
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_key,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_key = tf.doc_key
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_key, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
sizes AS (SELECT conv_id, count(*)::BIGINT n_turns FROM src GROUP BY 1)
SELECT qid, rank, doc_key, score_micro FROM (
  SELECT s.qid, s.doc_key, s.score_micro,
         row_number() OVER (PARTITION BY s.qid ORDER BY s.score_micro DESC, s.doc_key ASC)::BIGINT rank
  FROM scored s
  JOIN src ON src.doc_key = s.doc_key
  JOIN sizes z ON z.conv_id = src.conv_id
  WHERE z.n_turns >= {HAS_PARENT_MIN_TURNS}
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_boosting_sql(k: int) -> str:
    """Boosting oracle: positive BM25, matches of the negative term
    demoted by integer halving (score_micro // 2)."""
    from engine.pipelines import _boosting_query_set, tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({q}, '{t}', '{n}')" for q, t, n in _boosting_query_set())
    return f"""
WITH src AS (SELECT doc_key, text FROM read_parquet('{path}')),
tok AS (SELECT doc_key, unnest({_TOKS}) AS term FROM src),
tf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_key, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM src) avgdl
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(qid, qtext, negterm) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_key,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_key = tf.doc_key
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_key, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
negm AS (
  SELECT DISTINCT q.qid::BIGINT qid, t.doc_key
  FROM q JOIN tok t ON t.term = q.negterm
),
demoted AS (
  SELECT s.qid, s.doc_key,
         CASE WHEN n.doc_key IS NULL THEN s.score_micro
              ELSE s.score_micro // 2 END::BIGINT score_micro
  FROM scored s LEFT JOIN negm n ON n.qid = s.qid AND n.doc_key = s.doc_key
)
SELECT qid, rank, doc_key, score_micro FROM (
  SELECT qid, doc_key, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_key ASC)::BIGINT rank
  FROM demoted
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_dis_max_sql(k: int) -> str:
    """dis_max oracle: BM25 recomputed per FIELD (text and tool, each with
    its own tf/dl/df and avgdl = Σdl / n_docs over the SAME n_docs — the
    engine's A3 convention where every docmap row counts), best field wins
    per (qid, doc_key)."""
    from engine.pipelines import _dismax_query_set, tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in _dismax_query_set())

    def field_ctes(p: str, col: str) -> str:
        toks = f"list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"
        return f"""
{p}tok AS (SELECT doc_key, unnest({toks}) AS term FROM src),
{p}tf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM {p}tok GROUP BY 1, 2),
{p}dl AS (SELECT doc_key, count(*)::BIGINT dl FROM {p}tok GROUP BY 1),
{p}stats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM {p}dl)::DOUBLE / (SELECT count(*) FROM src) avgdl
),
{p}df AS (SELECT term, count(*)::BIGINT df FROM {p}tf GROUP BY 1),
{p}scored AS (
  SELECT qt.qid, tf.doc_key,
         floor(sum(
           ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
         ) * 1e6 + 0.5)::BIGINT score_micro
  FROM qterm qt
  JOIN {p}df df ON df.term = qt.term
  JOIN {p}tf tf ON tf.term = qt.term
  JOIN {p}dl dl ON dl.doc_key = tf.doc_key
  CROSS JOIN {p}stats s
  GROUP BY 1, 2
)"""

    return f"""
WITH src AS (SELECT doc_key, text, tool FROM read_parquet('{path}')),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),{field_ctes("t", "text")},{field_ctes("k", "tool")},
best AS (
  SELECT qid, doc_key, max(score_micro)::BIGINT score_micro FROM (
    SELECT * FROM tscored UNION ALL SELECT * FROM kscored
  ) GROUP BY 1, 2
)
SELECT qid, rank, doc_key, score_micro FROM (
  SELECT qid, doc_key, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_key ASC)::BIGINT rank
  FROM best
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_dsl_sql(k: int) -> str:
    """Field-scoped DSL oracle: text-field BM25 (boolean must/should model
    over the text field's own tf/dl/df/avgdl) gated by tool-field FILTER
    clauses recomputed from the tool column — include = EXISTS in the
    tool token set (bypassed for queries with no include clause),
    exclude = NOT EXISTS. Filters never score (ES filter context)."""
    from engine.pipelines import _tr_dsl_query_set, tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    rows = []
    for qid, qtext in _tr_dsl_query_set():
        rest, inc, exc = [], [], []
        for tok in qtext.split():
            if tok.startswith("tool:"):
                inc.append(tok[len("tool:"):])
            elif tok.startswith("-tool:"):
                exc.append(tok[len("-tool:"):])
            elif tok.startswith("+"):
                rest.append(("m", tok[1:]))
            else:
                rest.append(("s", tok))
        m = " ".join(t for k2, t in rest if k2 == "m")
        s = " ".join(t for k2, t in rest if k2 == "s")
        rows.append(f"({qid}, '{m}', '{s}', '{' '.join(inc)}', '{' '.join(exc)}')")

    def terms(col: str) -> str:
        return (f"list_filter(regexp_split_to_array(lower({col}), "
                "'[^a-z0-9]+'), x -> x <> '')")

    return f"""
WITH src AS (SELECT doc_key, text, tool FROM read_parquet('{path}')),
q(qid, mtext, stext, inctool, exctool) AS (VALUES {", ".join(rows)}),
ttok AS (SELECT doc_key, unnest({terms('text')}) AS term FROM src),
ttf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM ttok GROUP BY 1, 2),
tdl AS (SELECT doc_key, count(*)::BIGINT dl FROM ttok GROUP BY 1),
tstats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM tdl)::DOUBLE / (SELECT count(*) FROM src) avgdl
),
tdf AS (SELECT term, count(*)::BIGINT df FROM ttf GROUP BY 1),
mterm AS (SELECT DISTINCT qid::BIGINT qid, unnest({terms('mtext')}) term FROM q),
sterm AS (SELECT DISTINCT qid::BIGINT qid, unnest({terms('stext')}) term FROM q),
mn AS (SELECT qid, count(*)::BIGINT n_must FROM mterm GROUP BY 1),
posterm AS (SELECT qid, term FROM mterm UNION SELECT qid, term FROM sterm),
mmatch AS (
  SELECT m.qid, tf.doc_key
  FROM mterm m JOIN ttf tf ON tf.term = m.term JOIN mn ON mn.qid = m.qid
  GROUP BY m.qid, tf.doc_key, mn.n_must
  HAVING count(DISTINCT m.term) = mn.n_must
),
tscored AS (
  SELECT pt.qid, tf.doc_key,
         floor(sum(
           ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
         ) * 1e6 + 0.5)::BIGINT score_micro
  FROM posterm pt
  JOIN tdf df ON df.term = pt.term
  JOIN ttf tf ON tf.term = pt.term
  JOIN tdl dl ON dl.doc_key = tf.doc_key
  CROSS JOIN tstats s
  GROUP BY 1, 2
),
ktok AS (SELECT doc_key, unnest({terms('tool')}) AS term FROM src),
incterm AS (SELECT DISTINCT qid::BIGINT qid, unnest({terms('inctool')}) term FROM q),
excterm AS (SELECT DISTINCT qid::BIGINT qid, unnest({terms('exctool')}) term FROM q),
hasinc AS (SELECT DISTINCT qid FROM incterm),
inc AS (SELECT DISTINCT i.qid, kt.doc_key FROM incterm i JOIN ktok kt ON kt.term = i.term),
exc AS (SELECT DISTINCT x.qid, kt.doc_key FROM excterm x JOIN ktok kt ON kt.term = x.term),
gated AS (
  SELECT s.qid, s.doc_key, s.score_micro
  FROM tscored s
  WHERE (s.qid NOT IN (SELECT qid FROM mn)
         OR EXISTS (SELECT 1 FROM mmatch m WHERE m.qid = s.qid AND m.doc_key = s.doc_key))
    AND (s.qid NOT IN (SELECT qid FROM hasinc)
         OR EXISTS (SELECT 1 FROM inc i WHERE i.qid = s.qid AND i.doc_key = s.doc_key))
    AND NOT EXISTS (SELECT 1 FROM exc x WHERE x.qid = s.qid AND x.doc_key = s.doc_key)
)
SELECT qid, rank, doc_key, score_micro FROM (
  SELECT qid, doc_key, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_key ASC)::BIGINT rank
  FROM gated
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_most_fields_sql(k: int) -> str:
    """most_fields oracle: the dis_max per-field CTEs with SUM + integer
    boost in place of MAX."""
    from engine.pipelines import (MOST_FIELDS_TOOL_BOOST, _dismax_query_set,
                                  tr_oracle_corpus_path)

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in _dismax_query_set())

    def field_ctes(p: str, col: str) -> str:
        toks = f"list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"
        return f"""
{p}tok AS (SELECT doc_key, unnest({toks}) AS term FROM src),
{p}tf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM {p}tok GROUP BY 1, 2),
{p}dl AS (SELECT doc_key, count(*)::BIGINT dl FROM {p}tok GROUP BY 1),
{p}stats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM {p}dl)::DOUBLE / (SELECT count(*) FROM src) avgdl
),
{p}df AS (SELECT term, count(*)::BIGINT df FROM {p}tf GROUP BY 1),
{p}scored AS (
  SELECT qt.qid, tf.doc_key,
         floor(sum(
           ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
         ) * 1e6 + 0.5)::BIGINT score_micro
  FROM qterm qt
  JOIN {p}df df ON df.term = qt.term
  JOIN {p}tf tf ON tf.term = qt.term
  JOIN {p}dl dl ON dl.doc_key = tf.doc_key
  CROSS JOIN {p}stats s
  GROUP BY 1, 2
)"""

    return f"""
WITH src AS (SELECT doc_key, text, tool FROM read_parquet('{path}')),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),{field_ctes("t", "text")},{field_ctes("k", "tool")},
summed AS (
  SELECT qid, doc_key, sum(score_micro)::BIGINT score_micro FROM (
    SELECT * FROM tscored
    UNION ALL
    SELECT qid, doc_key, score_micro * {MOST_FIELDS_TOOL_BOOST} FROM kscored
  ) GROUP BY 1, 2
)
SELECT qid, rank, doc_key, score_micro FROM (
  SELECT qid, doc_key, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_key ASC)::BIGINT rank
  FROM summed
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_time_routed_sql(k: int) -> str:
    """Time-routed oracle: slice membership, per-slice tf/dl/df/avgdl
    stats, and the query ts windows all derived from the SAME integer-µs
    expressions as the engine ((ts−lo)·N//span; window = lo + span·x//8),
    BM25 per slice, docs gated to their query's window, ranked."""
    from engine.pipelines import TIME_SLICES, _time_routed_queries, tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    N = TIME_SLICES
    rows = ", ".join(f"({q}, '{t}', {a}, {b})" for q, t, a, b in _time_routed_queries())
    toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    return f"""
WITH src AS (SELECT doc_key, text, epoch_us(ts) ts_us FROM read_parquet('{path}')),
b AS (SELECT min(ts_us) lo, max(ts_us) + 1 - min(ts_us) span FROM src),
sl AS (SELECT doc_key, text, ts_us,
              ((ts_us - b.lo) * {N} // b.span)::BIGINT s
       FROM src CROSS JOIN b),
q(qid, qtext, a8, b8) AS (VALUES {rows}),
qw AS (SELECT qid::BIGINT qid, qtext,
              (b.lo + b.span * a8 // 8)::BIGINT wlo,
              (b.lo + b.span * b8 // 8)::BIGINT whi
       FROM q CROSS JOIN b),
qterm AS (
  SELECT DISTINCT qid, wlo, whi,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM qw
),
stok AS (SELECT s, doc_key, unnest({toks}) term FROM sl),
stf AS (SELECT s, doc_key, term, count(*)::BIGINT tf FROM stok GROUP BY 1, 2, 3),
sdl AS (SELECT s, doc_key, count(*)::BIGINT dl FROM stok GROUP BY 1, 2),
sstats AS (
  SELECT sl.s, count(*)::BIGINT n_docs,
         coalesce(sum(d.dl), 0)::DOUBLE / count(*) avgdl
  FROM sl LEFT JOIN sdl d ON d.doc_key = sl.doc_key
  GROUP BY 1
),
sdf AS (SELECT s, term, count(*)::BIGINT df FROM stf GROUP BY 1, 2),
contrib AS (
  SELECT qt.qid, tf.doc_key,
         ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)) w
  FROM qterm qt
  JOIN stf tf ON tf.term = qt.term
  JOIN sl ON sl.doc_key = tf.doc_key AND sl.s = tf.s
  JOIN sdf df ON df.term = qt.term AND df.s = tf.s
  JOIN sdl dl ON dl.doc_key = tf.doc_key AND dl.s = tf.s
  JOIN sstats st ON st.s = tf.s
  WHERE sl.ts_us >= qt.wlo AND sl.ts_us < qt.whi
),
scored AS (
  SELECT qid, doc_key, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
)
SELECT qid, rank, doc_key, score_micro FROM (
  SELECT qid, doc_key, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_key ASC)::BIGINT rank
  FROM scored
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_cross_fields_sql(k: int) -> str:
    """cross_fields oracle: per-field tf/dl/avgdl CTEs (the dis_max
    pattern) but idf from the BLENDED df — greatest(df_text, df_tool) per
    query term — with per-(term, field, doc) w micro-rounded BEFORE the
    cross-field max, then summed over terms (both groupbys integer-exact,
    mirroring the engine). tf_sat is parenthesised to the engine's IEEE op
    order: idf * ((tf * 2.2) / den)."""
    from engine.pipelines import _dismax_query_set, tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in _dismax_query_set())

    def field_ctes(p: str, col: str) -> str:
        toks = f"list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"
        return f"""
{p}tok AS (SELECT doc_key, unnest({toks}) AS term FROM src),
{p}tf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM {p}tok GROUP BY 1, 2),
{p}dl AS (SELECT doc_key, count(*)::BIGINT dl FROM {p}tok GROUP BY 1),
{p}stats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM {p}dl)::DOUBLE / (SELECT count(*) FROM src) avgdl
),
{p}df AS (SELECT term, count(*)::BIGINT df FROM {p}tf GROUP BY 1),
{p}contrib AS (
  SELECT qt.qid, qt.term, tf.doc_key,
         floor(ln(1 + (s.n_docs - b.df + 0.5) / (b.df + 0.5))
               * (tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
               * 1e6 + 0.5)::BIGINT w_micro
  FROM qterm qt
  JOIN blend b ON b.term = qt.term
  JOIN {p}tf tf ON tf.term = qt.term
  JOIN {p}dl dl ON dl.doc_key = tf.doc_key
  CROSS JOIN {p}stats s
)"""

    return f"""
WITH src AS (SELECT doc_key, text, tool FROM read_parquet('{path}')),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
ttok0 AS (SELECT doc_key, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term FROM src),
ktok0 AS (SELECT doc_key, unnest(list_filter(regexp_split_to_array(lower(tool), '[^a-z0-9]+'), x -> x <> '')) AS term FROM src),
tdf0 AS (SELECT term, count(DISTINCT doc_key)::BIGINT df FROM ttok0 GROUP BY 1),
kdf0 AS (SELECT term, count(DISTINCT doc_key)::BIGINT df FROM ktok0 GROUP BY 1),
blend AS (
  SELECT t.term,
         greatest(coalesce(tdf0.df, 0), coalesce(kdf0.df, 0))::BIGINT df
  FROM (SELECT DISTINCT term FROM qterm) t
  LEFT JOIN tdf0 ON tdf0.term = t.term
  LEFT JOIN kdf0 ON kdf0.term = t.term
  WHERE greatest(coalesce(tdf0.df, 0), coalesce(kdf0.df, 0)) > 0
),{field_ctes("t", "text")},{field_ctes("k", "tool")},
crossed AS (
  SELECT qid, term, doc_key, max(w_micro)::BIGINT w_micro FROM (
    SELECT * FROM tcontrib UNION ALL SELECT * FROM kcontrib
  ) GROUP BY 1, 2, 3
),
summed AS (
  SELECT qid, doc_key, sum(w_micro)::BIGINT score_micro FROM crossed GROUP BY 1, 2
)
SELECT qid, rank, doc_key, score_micro FROM (
  SELECT qid, doc_key, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_key ASC)::BIGINT rank
  FROM summed
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_bm25_recency_sql(k: int) -> str:
    """Oracle for tr_bm25_recency: BM25 micro scores scaled by the linear
    integer ppm recency weight (age in whole hours below the corpus max ts,
    clamped at the floor) — identical integer arithmetic to the engine."""
    from engine.oracle.bm25 import seeded_query_set
    from engine.pipelines import (RECENCY_DECAY_PPM_PER_HOUR,
                                  RECENCY_FLOOR_PPM, tr_oracle_corpus_path)

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in seeded_query_set(20, seed=7))
    return f"""
WITH src AS (SELECT doc_key, text, epoch_us(ts) ts_us FROM read_parquet('{path}')),
tok AS (SELECT doc_key, unnest({_TOKS}) AS term FROM src),
tf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_key, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM src) avgdl,
         (SELECT max(ts_us) FROM src)::BIGINT ts_max
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_key,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_key = tf.doc_key
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_key, floor(sum(w) * 1e6 + 0.5)::BIGINT raw_micro
  FROM contrib GROUP BY 1, 2
),
decayed AS (
  SELECT sc.qid, sc.doc_key,
         sc.raw_micro * greatest(
           1000000 - ((s.ts_max - src.ts_us) // 3600000000) * {RECENCY_DECAY_PPM_PER_HOUR},
           {RECENCY_FLOOR_PPM}
         ) // 1000000 score_micro
  FROM scored sc
  JOIN src ON src.doc_key = sc.doc_key
  CROSS JOIN stats s
)
SELECT qid, rank, doc_key, score_micro FROM (
  SELECT qid, doc_key, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_key ASC)::BIGINT rank
  FROM decayed
) WHERE rank <= {k}
ORDER BY qid, rank
"""


def _tr_bm25_collapse_sql(k: int) -> str:
    """Oracle for tr_bm25_collapse: BM25 over the materialized transcript
    parquet, collapsed to the best turn per (qid, conv_id) — rn=1 under
    (score desc, doc_key asc) — then ranked per qid by the representative's
    (score desc, doc_key asc)."""
    from engine.oracle.bm25 import seeded_query_set
    from engine.pipelines import tr_oracle_corpus_path

    path = tr_oracle_corpus_path()
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in seeded_query_set(20, seed=7))
    return f"""
WITH src AS (SELECT doc_key, conv_id, text FROM read_parquet('{path}')),
tok AS (SELECT doc_key, unnest({_TOKS}) AS term FROM src),
tf AS (SELECT doc_key, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_key, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM src)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM src) avgdl
),
df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(qid, qtext) AS (VALUES {rows}),
qterm AS (
  SELECT DISTINCT qid::BIGINT qid,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) term
  FROM q
),
contrib AS (
  SELECT qt.qid, tf.doc_key,
         ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) w
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_key = tf.doc_key
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, doc_key, floor(sum(w) * 1e6 + 0.5)::BIGINT score_micro
  FROM contrib GROUP BY 1, 2
),
best AS (
  SELECT sc.qid, src.conv_id, sc.doc_key, sc.score_micro,
         row_number() OVER (PARTITION BY sc.qid, src.conv_id
                            ORDER BY sc.score_micro DESC, sc.doc_key ASC) rn
  FROM scored sc JOIN src ON src.doc_key = sc.doc_key
)
SELECT qid, rank, conv_id, doc_key, score_micro FROM (
  SELECT qid, conv_id, doc_key, score_micro,
         row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_key ASC)::BIGINT rank
  FROM best WHERE rn = 1
) WHERE rank <= {k}
ORDER BY qid, rank
"""


# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the documents BM25
    index with the distributed engine, run the reference query set, and also
    exercise the transcript corpus path."""
    from engine.pipelines import ft_bm25_topk, tr_bm25_topk

    _ = tr_bm25_topk("/root/testdata/sf0.001", k=10)
    return ft_bm25_topk("/root/testdata/sf0.001", k=10)


def _q_clean(sf: str):
    from engine.ops.clean import clean_corpus

    return clean_corpus(sf)


def queries() -> dict[str, Callable[[str], Any]]:
    from engine.ops import (
        ann,
        dedup,
        html,
        multimodal,
        packing,
        embed,
        pii,
        relational,
        sampling,
        textstats,
    )
    from engine import pipelines as P

    return {
        # full-text engine (documents corpus, real build+query path)
        "ft_bm25_topk10": lambda sf: P.ft_bm25_topk(sf, k=10),
        # function_score: linear field_value_factor on n_chars via DocValues
        "ft_function_score": lambda sf: P.ft_function_score(sf, k=10),
        "ft_bm25_topk100": lambda sf: P.ft_bm25_topk(sf, k=100),
        "ft_bm25_not": lambda sf: P.ft_bm25_not(sf, k=10),
        "ft_bm25_and": lambda sf: P.ft_bm25_and(sf, k=10),
        "ft_bm25_phrase": lambda sf: P.ft_bm25_phrase(sf, k=10),
        # same phrase semantics via the persisted positional index (no
        # text read-back) — shares ft_bm25_phrase's SQL oracle
        "ft_bm25_phrase_pos": lambda sf: P.ft_bm25_phrase_pos(sf, k=10),
        "ft_bm25_proximity_pos": lambda sf: P.ft_bm25_proximity_pos(sf, k=10),
        # unordered span_near over the positional sidecar (new semantics,
        # not expressible without positions)
        "ft_span_near": lambda sf: P.ft_span_near(sf, k=10),
        # in_order=true variant: keyed greedy-chain verify (order couples
        # position choices — no associative vote form exists)
        "ft_span_near_ordered": lambda sf: P.ft_span_near_ordered(sf, k=10),
        "ft_span_first": lambda sf: P.ft_span_first(sf, k=10),
        # deterministic query profile: the index accounts for its own work
        "ft_query_profile": P.ft_query_profile,
        # ES _rank_eval: p@k / recall / MRR vs containment qrels
        "ft_rank_eval": P.ft_rank_eval,
        # search-as-you-type phrase completion
        "ft_match_phrase_prefix": lambda sf: P.ft_match_phrase_prefix(sf, k=10),
        # reverse search: registered rule set matched against every doc in
        # one shuffle-free broadcast-join scan
        "ft_percolate": P.ft_percolate,
        # top_hits inside a terms bucket: best n hits per source per query
        "ft_top_hits": lambda sf: P.ft_top_hits(sf, n=3),
        # composite sources + after-key pagination over (source, lang)
        "ft_composite_buckets": P.ft_composite_buckets,
        # numeric histogram agg over match sets (n_chars length profile)
        "ft_match_len_histogram": P.ft_match_len_histogram,
        # terms bucket + metric sub-aggs; rare_terms long-tail buckets
        "ft_terms_sub_aggs": P.ft_terms_sub_aggs,
        "ft_rare_terms": P.ft_rare_terms,
        # _termvectors: per-doc (term, tf) + corpus df, index-native
        "ft_term_vectors": P.ft_term_vectors,
        # diversified sampler: deterministic ≤m-per-source match sample
        "ft_diversified_sampler": P.ft_diversified_sampler,
        # extended_stats: integer-exact moments incl. the variance pair
        "ft_extended_stats": P.ft_extended_stats,
        # ES matrix_stats: exact joint moments of (token count, n_chars)
        "ft_matrix_stats": P.ft_matrix_stats,
        # ES percentile_ranks: inverse percentiles, exact micro shares
        "ft_percentile_ranks": P.ft_percentile_ranks,
        # edge-ngram autocomplete: prefix df as exact term lookups
        "ft_autocomplete": P.ft_autocomplete,
        # phrase suggester: per-token argmax-df edit-1 correction
        "ft_did_you_mean": P.ft_did_you_mean,
        # max_bucket sibling pipeline agg over the daily histogram
        "ev_max_bucket": P.ev_max_bucket,
        "ft_bm25_proximity": lambda sf: P.ft_bm25_proximity(sf, k=10),
        "ft_significant_terms": lambda sf: P.ft_significant_terms(sf, top_n=5),
        "ft_match_percentiles": P.ft_match_percentiles,
        "ft_cardinality": P.ft_cardinality,
        "ft_adjacency": P.ft_adjacency,
        # Lucene-style +must/-not/should clause retrieval
        "ft_bm25_boolean": lambda sf: P.ft_bm25_boolean(sf, k=10),
        "ft_bm25_dsl": lambda sf: P.ft_bm25_dsl(sf, k=10),
        # facet counts over each query's FULL match set (match-stream →
        # keyed attr join → multi-key groupby count)
        "ft_bm25_facets": P.ft_bm25_facets,
        # hit counting (_count) + exact distributed COUNT DISTINCT of the
        # sources each query's FULL match set spans
        "ft_hit_count": P.ft_hit_count,
        # numeric stats agg (count/sum/min/max/avg) over full match sets
        "ft_match_stats": P.ft_match_stats,
        # same agg served from the n_chars docvalues sidecar (no join)
        "ft_match_stats_dv": P.ft_match_stats_dv,
        # per-term BM25 contribution breakdown for every top-k hit (explain)
        "ft_bm25_explain": lambda sf: P.ft_bm25_explain(sf, k=5),
        "ft_script_fields": lambda sf: P.ft_script_fields(sf, k=10),
        "ft_scripted_metric": P.ft_scripted_metric,
        # minimum_should_match: >= 2 distinct query terms must match
        "ft_bm25_msm": lambda sf: P.ft_bm25_msm(sf, k=10, msm=2),
        # Lucene term^boost query-time boosting (power-of-two boosts)
        "ft_bm25_boosted_terms": lambda sf: P.ft_bm25_boosted_terms(sf, k=10),
        # top-k + context-window snippets (bounded candidate-only scan)
        "ft_bm25_snippets": lambda sf: P.ft_bm25_snippets(sf, k=10),
        # ES highlight semantics: BEST fragment (max distinct query terms)
        "ft_bm25_highlight": lambda sf: P.ft_bm25_highlight(sf, k=5),
        # ES rescore: top-window BM25 reranked by a proximity bonus
        "ft_bm25_rescore": lambda sf: P.ft_bm25_rescore(sf, k=10),
        # query-time attribute filter (filter-context search): scored match
        # stream → attr hash join → predicate filter → per-block top-k
        "ft_bm25_postfilter": lambda sf: P.ft_bm25_postfilter(sf, k=10),
        # numeric range gate in query context, served from the X68
        # DocValues sidecar inside the match stream (zero query-time shuffle)
        "ft_bm25_range": lambda sf: P.ft_bm25_range(sf, k=10),
        # hybrid BM25 + embedding-cosine retrieval, integer RRF fusion
        "ft_hybrid_rrf": lambda sf: P.ft_hybrid_rrf(sf, k=10),
        # trailing-* wildcard expansion against the term dictionary
        "ft_bm25_wildcard_leading": P.ft_bm25_wildcard_leading,
        # s-stemmed field: plural queries match singular docs
        "ft_bm25_stemmed": lambda sf: P.ft_bm25_stemmed(sf, k=10),
        "ft_bm25_stopword": lambda sf: P.ft_bm25_stopword(sf, k=10),
        "ft_bm25_wildcard": lambda sf: P.ft_bm25_wildcard(sf, k=10),
        # fuzzy retrieval: term~ expands to edit-distance-1 vocab terms
        "ft_bm25_fuzzy": lambda sf: P.ft_bm25_fuzzy(sf, k=10),
        "ft_bm25_regexp": lambda sf: P.ft_bm25_regexp(sf, k=10),
        # deep pagination: page 2 via a (score, key) search_after cursor
        "ft_bm25_search_after": lambda sf: P.ft_bm25_search_after(sf, k=10),
        # synonym-class query expansion (SynonymQuery-as-disjunction)
        "ft_bm25_synonyms": lambda sf: P.ft_bm25_synonyms(sf, k=10),
        # more-like-this: seed doc → top tf·idf terms → BM25, seed excluded
        "ft_more_like_this": lambda sf: P.ft_more_like_this(sf, k=10),
        # prefix autocomplete from the vocab-sized term_stats artifact
        "ft_term_suggest": lambda sf: P.ft_term_suggest(sf, k=5),
        # transcript-schema path (role/ts input filters + docID hydration)
        "ft_bm25_filtered": lambda sf: P.ft_bm25_filtered(sf, k=10),
        "ft_term_stats": P.ft_term_stats,
        "ft_stats": P.ft_stats,
        "ft_doc_stats": textstats.doc_stats,
        # transcript pipelines (no SQL view for the synth corpus → rows-only)
        "tr_bm25_topk10": lambda sf: P.tr_bm25_topk(sf, k=10),
        # flagship transcript path, oracle-checked: engine and DuckDB both
        # read the same materialized synth-corpus parquet
        "tr_bm25_oracle": lambda sf: P.tr_bm25_oracle(sf, k=10),
        # the spec's per-row invariant as a driver-checked entry
        "tr_text_identity": P.tr_text_identity,
        # delete+purge lifecycle: ~10% of convs tombstoned then folded by
        # run_purge; the oracle recomputes BM25 over the FILTERED corpus,
        # proving stats/df/docmap all moved (engine/index/deletes.py)
        "tr_bm25_purged": lambda sf: P.tr_bm25_purged(sf, k=10),
        # ES exists query: filter-context gate on tool presence, stats
        # stay corpus-wide (contrast with purged, where stats shrink)
        "tr_exists": lambda sf: P.tr_exists(sf, k=10),
        # DPO preference pairs: best/worst assistant turn per conversation
        "tr_pref_pairs": P.tr_pref_pairs,
        # rolling chat-history fingerprints (prefill cache key)
        "tr_context_windows": P.tr_context_windows,
        # daily date-histogram of each query's full match set (match stream
        # → keyed ts join → partial day counts → one small groupby)
        "tr_match_histogram": P.tr_match_histogram,
        # role-boosted ranking: scored match stream × corpus role join
        "tr_bm25_boosted": lambda sf: P.tr_bm25_boosted(sf, k=10),
        "tr_bm25_collapse": lambda sf: P.tr_bm25_collapse(sf, k=10),
        # parent-child: conversations ranked by sum of matching child-turn
        # scores (ES has_child, score_mode=sum) + inner-hit counts
        "tr_has_child": lambda sf: P.tr_has_child(sf, k=10),
        # multi-field best_fields: max of per-field BM25 over one index
        # per field (text + tool)
        "tr_most_fields": lambda sf: P.tr_most_fields(sf, k=10),
        "tr_dis_max": lambda sf: P.tr_dis_max(sf, k=10),
        "tr_dsl": lambda sf: P.tr_dsl(sf, k=10),
        # multi-field cross_fields: blended per-term df across text+tool
        # (BM25F-style), per-term best-field saturation, summed over terms
        "tr_cross_fields": lambda sf: P.tr_cross_fields(sf, k=10),
        # time-routed retrieval: per-period slice indexes, window fan-out
        "tr_bm25_time_routed": lambda sf: P.tr_bm25_time_routed(sf, k=10),
        # field-sorted retrieval: newest matching turns first
        "tr_sort_by_field": lambda sf: P.tr_sort_by_field(sf, k=10),
        # same semantics served from the mmap'd docvalues sidecar: zero
        # query-time shuffle — shares the sort-by-field SQL oracle
        "tr_sort_by_field_dv": lambda sf: P.tr_sort_by_field_dv(sf, k=10),
        # has_parent: turns gated by a conversation-level predicate
        "tr_has_parent": lambda sf: P.tr_has_parent(sf, k=10),
        # boosting query: negative clause demotes (integer halving)
        "tr_boosting_query": lambda sf: P.tr_boosting_query(sf, k=10),
        "tr_bm25_recency": lambda sf: P.tr_bm25_recency(sf, k=10),
        # two-pass incremental build (lineage resume + tiered merge) vs
        # a single-pass SQL truth over the union corpus
        "tr_bm25_incremental": lambda sf: P.tr_bm25_incremental(sf, k=10),
        # conversation-level rollup (multi-aggregate keyed groupby)
        "tr_conv_stats": P.tr_conv_stats,
        # chat-SFT example assembly: suffix-truncated per-conv examples
        "tr_sft_examples": P.tr_sft_examples,
        # dedup family
        "dedup_exact": dedup.dedup_exact,
        "dedup_jaccard_pairs": lambda sf: dedup.jaccard_pairs(sf, threshold_micro=900_000),
        "dedup_minhash_candidates": dedup.minhash_candidates,
        "dedup_minhash_verified": lambda sf: dedup.minhash_verified(sf, threshold_micro=900_000),
        "dedup_simhash_pairs": dedup.simhash_pairs,
        # exact substring dedup: per-doc duplicated-span count + union
        # token coverage of cross-doc repeated SPAN_WIDTH-token windows
        "dedup_span_coverage": dedup.span_coverage,
        # connected components over the verified pair graph (the "keep one
        # representative per duplicate cluster" action)
        "dedup_clusters": lambda sf: dedup.dedup_clusters(sf, threshold_micro=900_000),
        # keep-best-quality canonical selection within each cluster
        "dedup_keep_best": lambda sf: dedup.dedup_keep_best(sf, threshold_micro=900_000),
        "dedup_embedding_pairs": lambda sf: dedup.embedding_pairs(sf, threshold_micro=400_000),
        # SemDeDup (Abbas et al. 2023): k-means clusters, within-cluster
        # cosine duplicates, keep the farthest-from-centroid member
        "dedup_semantic": lambda sf: dedup.dedup_semantic(sf, threshold_micro=350_000),
        # the end-to-end cleaning decision pipeline (dedup → quality → lang)
        "clean_corpus": _q_clean,
        # similarity search
        "ann_cosine_topk": lambda sf: ann.cosine_topk(sf, n_queries=5, k=10),
        "ann_sq8_topk": lambda sf: ann.sq8_topk(sf, n_queries=5, k=10),
        # knn with filter: pre-filtered exact cosine within the query's label
        "ann_filtered_topk": lambda sf: ann.filtered_cosine_topk(sf, n_queries=5, k=10),
        # hard-negative mining: nearest DIFFERENT-label vectors
        "ann_hard_negatives": lambda sf: ann.filtered_cosine_topk(
            sf, n_queries=5, k=10, same_label=False),
        # per-label embedding centroids (order-free integer-exact sums)
        # distributed Lloyd k-means, exact integer contract
        "emb_kmeans": ann.emb_kmeans,
        "emb_label_centroids": ann.label_centroids,
        # kNN graph seed: every vector's nearest other vector. Exact
        # all-vectors brute force — the documented small-scale oracle of
        # the near-neighbour-graph op; the 100-TB path is the bucketed
        # LSH/IVF candidate machinery (dedup.embedding_lsh_pairs /
        # ann.ivf_query) + this exact scorer per bucket.
        "ann_knn_top1": lambda sf: ann.cosine_topk(sf, n_queries=1_000_000_000, k=1),
        # kNN label classification: majority label of the 5 exact neighbours
        "ann_knn_classify": lambda sf: ann.knn_classify(sf, n_queries=50, k=5),
        "ann_ivf_topk": lambda sf: ann.ivf_topk(sf, n_queries=5, k=10),
        # PQ compression + asymmetric-distance top-k over the codes table
        "ann_pq_topk": lambda sf: ann.pq_adc_topk(sf, n_queries=5, k=10),
        # IVF-PQ: coarse-routed probes + ADC over per-list codes
        "ann_ivfpq_topk": lambda sf: ann.ivfpq_topk(sf, n_queries=5, nprobe=4, k=10),
        # IVFADC proper: residual-encoded codes, per-list query LUTs
        "ann_ivfpq_residual_topk": lambda sf: ann.ivfpq_topk(
            sf, n_queries=5, nprobe=4, k=10, residual=True),
        # full probe (nprobe = n_lists) is EXACT: proves the persisted-IVF
        # read path (partition routing, per-list scan, merge) against the
        # same SQL oracle as brute force
        "ann_ivf_full_probe": lambda sf: ann.ivf_topk(
            sf, n_queries=5, k=10, n_lists=16, nprobe=16
        ),
        # text analysis
        "ta_lang_id": textstats.lang_id,
        "ta_lang_id_scored": textstats.lang_id_scored,
        "ta_token_count": textstats.token_count,
        "ta_fingerprint": textstats.fingerprint,
        "ta_contamination": textstats.contamination,
        "ta_repetition": textstats.repetition,
        # hashing-trick vectorizer: sparse (doc, bucket, tf) features
        "ta_feature_hash": textstats.feature_hash,
        # model-in-actor embed stage: deterministic hash-projection
        # encoder, text -> int vectors (dense (doc_id, dim, val) rows)
        "emb_infer": embed.emb_infer,
        # group-wise top-k: best docs per source by unique-token ratio
        "ta_top_per_source": lambda sf: textstats.top_quality_per_source(sf, k=3),
        # exact histogram-based doc-length percentiles (no sketch)
        "ta_dl_quantiles": textstats.dl_quantiles,
        # head-vocabulary pair co-occurrence (matmul partials)
        "ta_cooccur": textstats.cooccur_top_terms,
        # PMI over the head-vocab pairs (collocation statistic)
        "ta_pmi": textstats.cooccur_pmi,
        "ta_corpus_stats": textstats.corpus_stats,
        # per-doc characteristic terms (tf·idf, rational idf surrogate)
        "ta_tfidf_topk": lambda sf: textstats.tfidf_topk(sf, k=3),
        # corpus-wide adjacent-bigram counts (partial-combine → one groupby)
        "ta_top_bigrams": lambda sf: textstats.top_bigrams(sf, k=20),
        # BPE tokenizer training step 1: weighted char-pair counts over the
        # vocab rollup (corpus reduces to the vocabulary before pair work)
        "ta_bpe_pairs": lambda sf: textstats.bpe_pairs(sf, k=20),
        # the trained merge TABLE: X89's statistic iterated K rounds
        "ta_bpe_merges": lambda sf: textstats.bpe_merges(sf),
        "ta_bpe_encode": lambda sf: textstats.bpe_encode(sf),
        # tokenizer-vocab coverage audit: per-doc OOV rate vs the top-16
        # corpus vocabulary
        "ta_vocab_coverage": textstats.vocab_coverage,
        # RAG sliding-window chunking with overlap + chunk fingerprints
        "ta_chunks": textstats.chunk_windows,
        "ta_html_extract": html.html_extract,
        "ta_link_hosts": html.link_hosts,
        # chunk-grain exact dedup with canonical keepers
        "dedup_chunks": textstats.chunk_dedup,
        # count-min sketch: bounded-memory frequency estimates + truth audit
        "ta_cms": textstats.cms_estimates,
        # Bloom pre-filter for the contamination gate (superset guarantee)
        "ta_contamination_bloom": textstats.contamination_bloom,
        # Zipf audit: frequency-of-frequencies (Good-Turing input)
        "ta_freq_spectrum": textstats.freq_spectrum,
        # Good-Turing adjusted counts from the spectrum
        "ta_good_turing": textstats.good_turing,
        # MOSS winnowing fingerprints (rightmost-min window selection)
        "ta_winnowing": textstats.winnowing,
        # deterministic hash-based train/val/test assignment
        "sample_hash_split": sampling.hash_split,
        # deterministic k-per-language sample (hash-order 'reservoir')
        "sample_stratified": lambda sf: sampling.stratified_sample(sf, k=30),
        # source-weighted epoch mixing (fractional upsample by md5 draw)
        "sample_mixture_epochs": sampling.mixture_epochs,
        "sample_temperature_mix": sampling.temperature_mix,
        # hash-partitioned training-shard export (written + read back)
        "sample_export_shards": sampling.export_shards,
        # multimodal binary-column dataflow (actor-pool metadata decode)
        "mm_decode_meta": multimodal.media_meta,
        # REAL video decode: Y4M frame counts/dims from the bytes
        "mm_video_meta": multimodal.video_meta,
        "ta_quality": textstats.quality,
        # CCNet-style head/middle/tail bucketing by quality-score terciles
        "ta_quality_buckets": textstats.quality_buckets,
        # DSIR-style hashed-unigram importance scoring vs the lang-target
        "ta_dsir_weights": textstats.dsir_weights,
        # DSIR selection: deterministic importance-weighted resample
        "sample_dsir_resample": textstats.dsir_resample,
        # CCNet-style unigram-LM perplexity filter: train on the hash-split
        # train half, score every doc in exact integer micro-nats
        # trained NB-linear quality/domain classifier over hashed features
        "ta_quality_clf": lambda sf: textstats.quality_clf(sf),
        "ta_lm_nll": textstats.lm_nll,
        # bigram sibling: context-conditioned add-one costs, same contract
        "ta_lm_nll_bigram": textstats.lm_nll_bigram,
        # PII detection + redaction (RE2 kernel chain; deterministic
        # planted fixture — see engine/ops/pii.py docstring)
        "ta_pii_redact": pii.pii_redact,
        # sequence packing: concat-and-chunk + greedy first-fit (slim-row
        # exchange only; see engine/ops/packing.py)
        "ta_seq_pack": packing.seq_pack,
        "ta_pack_greedy": packing.pack_greedy,
        # relational operator layer
        "rel_pricing_summary": relational.q1_pricing_summary,
        "rel_nation_revenue": relational.nation_revenue,
        "rel_top_orders": relational.top_orders,
        # TPC-H Q3: 3-way join + pushed-down predicates + top-k by revenue
        "rel_shipping_priority": relational.shipping_priority,
        "ev_hourly": relational.events_hourly,
        # as-of join (SURVEY J4): last-click attribution within 24 h
        "ev_attribution": relational.events_attribution,
        # HLL register sketch: mergeable bounded-memory count-distinct state
        "ev_hll_registers": relational.events_hll_registers,
        # heavy hitters: top users by micro-exact total value
        "ev_heavy_hitters": lambda sf: relational.events_heavy_hitters(sf, k=25),
        "ev_sliding": lambda sf: relational.events_sliding(sf, window_hours=24),
        # pipeline aggs over the daily histogram: derivative, cumulative
        # sum, trailing 3-bucket moving sum
        "ev_pipeline_aggs": relational.events_pipeline_aggs,
        # exact cumulative cardinality via the first-seen decomposition
        "ev_cumulative_cardinality": relational.events_cumulative_cardinality,
        # behavioral analytics: ordered in-window funnel; cohort retention
        "ev_funnel": relational.events_funnel,
        "ev_retention": relational.events_retention,
        # 3-sigma hourly-count spikes via the integer-variance identity
        "ev_anomaly": relational.events_anomaly,
        "ev_json_stats": relational.events_json_stats,
        "ev_sessions": lambda sf: relational.events_sessions(sf, gap_minutes=30),
    }


def oracle_sql() -> dict[str, str]:
    from engine.ops import relational, textstats
    from engine.pipelines import HL_FRAG
    from engine.pipelines import RESCORE_BOOST_MICRO as P_RESCORE_BOOST
    from engine.pipelines import RESCORE_WINDOW as P_RESCORE_WINDOW

    sql = {
        "ft_bm25_topk10": _bm25_sql(10),
        "ft_function_score": _function_score_sql(10),
        "ft_bm25_topk100": _bm25_sql(100),
        "ft_bm25_not": _bm25_not_sql(10),
        "ft_bm25_and": _bm25_and_sql(10),
        "ft_bm25_phrase": _bm25_phrase_sql(10),
        "ft_bm25_phrase_pos": _bm25_phrase_sql(10),
        "ft_bm25_proximity_pos": _bm25_proximity_sql(10),
        "ft_span_near": _span_near_sql(10),
        "ft_span_near_ordered": _span_near_ordered_sql(10),
        "ft_span_first": _span_first_sql(10),
        "ft_query_profile": _query_profile_sql(),
        "ft_rank_eval": _rank_eval_sql(10),
        "ft_match_phrase_prefix": _match_phrase_prefix_sql(10),
        "ft_percolate": _percolate_sql(),
        "ft_top_hits": _top_hits_sql(3),
        "ft_composite_buckets": _composite_buckets_sql(),
        "ft_match_len_histogram": _match_len_histogram_sql(),
        "ft_terms_sub_aggs": _terms_sub_aggs_sql(),
        "ft_rare_terms": _rare_terms_sql(),
        "ft_term_vectors": _term_vectors_sql(),
        "ft_diversified_sampler": _diversified_sampler_sql(),
        "ft_extended_stats": _extended_stats_sql(),
        "ft_matrix_stats": _matrix_stats_sql(),
        "ft_percentile_ranks": _percentile_ranks_sql(),
        "ft_autocomplete": _autocomplete_sql(),
        "ft_did_you_mean": _did_you_mean_sql(),
        "ev_max_bucket": _ev_max_bucket_sql(),
        # HLL registers replayed in SQL: same md5 hash, register = low 6
        # bits, rank = 58-bit leading zeros + 1 via length(bin(suffix))
        "ev_hll_registers": f"""
WITH h AS (
  SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 16))::UBIGINT hv
  FROM events
),
r AS (SELECT (hv % {relational.HLL_M})::BIGINT reg,
             (hv >> {relational.HLL_P})::UBIGINT suffix FROM h),
rk AS (
  SELECT reg,
         CASE WHEN suffix = 0 THEN {relational.HLL_SUFFIX_BITS} + 1
              ELSE {relational.HLL_SUFFIX_BITS} - length(bin(suffix)) + 1
         END::BIGINT rank
  FROM r
),
regs AS (SELECT range::BIGINT reg FROM range({relational.HLL_M}))
SELECT regs.reg, coalesce(max(rk.rank), 0)::BIGINT max_rank
FROM regs LEFT JOIN rk ON rk.reg = regs.reg
GROUP BY 1 ORDER BY 1
""",
        # as-of semantics via a click-grain window: a purchase's grp counts
        # clicks at-or-before it in strict (ts_us, event_id) order; the
        # grp-th click IS its most recent prior click
        "ev_attribution": """
WITH u AS (
  SELECT user_id, event_id, epoch_us(ts)::BIGINT ts_us,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END ic
  FROM events WHERE event_type IN ('click', 'purchase')
),
s AS (
  SELECT *, sum(ic) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS UNBOUNDED PRECEDING)::BIGINT grp
  FROM u
),
clicks AS (SELECT user_id, grp, event_id click_id, ts_us click_ts
           FROM s WHERE ic = 1),
buys AS (SELECT user_id, event_id purchase_id, ts_us, grp
         FROM s WHERE ic = 0 AND grp > 0)
SELECT b.purchase_id::BIGINT purchase_id, b.user_id::BIGINT user_id,
       c.click_id::BIGINT click_id, (b.ts_us - c.click_ts)::BIGINT gap_us
FROM buys b JOIN clicks c ON c.user_id = b.user_id AND c.grp = b.grp
WHERE b.ts_us - c.click_ts <= 86400000000
ORDER BY b.purchase_id
""",
        "ft_bm25_proximity": _bm25_proximity_sql(10),
        "ft_significant_terms": _significant_terms_sql(5),
        "ft_match_percentiles": _match_percentiles_sql(),
        "ft_cardinality": _cardinality_sql(),
        "ft_adjacency": _adjacency_sql(),
        "ft_bm25_boolean": _bm25_boolean_sql(10),
        "ft_bm25_dsl": _bm25_dsl_sql(10),
        "ft_bm25_facets": _bm25_facets_sql(),
        "ft_hit_count": _hit_count_sql(),
        "ft_match_stats": _match_stats_sql(),
        "ft_match_stats_dv": _match_stats_sql(),
        "ft_bm25_explain": _bm25_explain_sql(5),
        "ft_script_fields": _script_fields_sql(10),
        "ft_scripted_metric": _scripted_metric_sql(),
        "ft_bm25_msm": _bm25_msm_sql(10, 2),
        "ft_bm25_boosted_terms": _bm25_boosted_terms_sql(10),
        "ft_bm25_snippets": _bm25_snippets_sql(10),
        "ft_bm25_highlight": _bm25_highlight_sql(5, HL_FRAG),
        "ft_bm25_rescore": _bm25_rescore_sql(
            10, P_RESCORE_WINDOW, P_RESCORE_BOOST),
        "ft_bm25_postfilter": _bm25_postfilter_sql(10),
        "ft_bm25_range": _bm25_range_sql(10),
        "ft_hybrid_rrf": _hybrid_rrf_sql(10),
        "ft_bm25_wildcard": _bm25_wildcard_sql(10),
        "ft_bm25_wildcard_leading": _bm25_wildcard_leading_sql(10),
        "ft_bm25_stemmed": _bm25_stemmed_sql(10),
        "ft_bm25_stopword": _bm25_stopword_sql(10),
        "ft_bm25_fuzzy": _bm25_fuzzy_sql(10),
        "ft_bm25_regexp": _bm25_regexp_sql(10),
        "ft_bm25_search_after": _bm25_search_after_sql(10),
        "ft_bm25_synonyms": _bm25_synonyms_sql(10),
        "ft_more_like_this": _mlt_sql(10),
        "ft_term_suggest": _term_suggest_sql(5),
        "ft_bm25_filtered": _bm25_filtered_sql(10),
        # tr_bm25_topk10 runs the SAME materialized corpus + query set through
        # the query_index surface, so the same SQL value-checks both entries
        "tr_bm25_topk10": _tr_bm25_oracle_sql(10),
        "tr_bm25_oracle": _tr_bm25_oracle_sql(10),
        "tr_bm25_purged": _tr_bm25_oracle_sql(10, where="conv_id NOT LIKE '%7'"),
        "tr_exists": _tr_bm25_oracle_sql(10, post_where="c.tool <> ''"),
        "tr_pref_pairs": _tr_pref_pairs_sql(),
        "tr_context_windows": _tr_context_windows_sql(),
        "tr_text_identity": _tr_text_identity_sql(),
        "tr_match_histogram": _tr_match_histogram_sql(),
        "tr_bm25_boosted": _tr_bm25_boosted_sql(10),
        "tr_bm25_collapse": _tr_bm25_collapse_sql(10),
        "tr_has_child": _tr_has_child_sql(10),
        "tr_dis_max": _tr_dis_max_sql(10),
        "tr_dsl": _tr_dsl_sql(10),
        "tr_most_fields": _tr_most_fields_sql(10),
        "tr_cross_fields": _tr_cross_fields_sql(10),
        "tr_bm25_time_routed": _tr_time_routed_sql(10),
        "tr_sort_by_field": _tr_sort_by_field_sql(10),
        "tr_sort_by_field_dv": _tr_sort_by_field_sql(10),
        "tr_has_parent": _tr_has_parent_sql(10),
        "tr_boosting_query": _tr_boosting_sql(10),
        "tr_bm25_recency": _tr_bm25_recency_sql(10),
        "tr_bm25_incremental": _tr_bm25_incremental_sql(10),
        "tr_conv_stats": _tr_conv_stats_sql(),
        "tr_sft_examples": _tr_sft_examples_sql(),
        "ft_term_stats": f"""
WITH {_TOK_CTE}
SELECT tf.term, count(*)::BIGINT df, sum(tf.tf)::BIGINT cf
FROM tf GROUP BY 1 ORDER BY 1
""",
        "ft_stats": f"""
WITH {_TOK_CTE}
SELECT n_docs, (SELECT sum(dl) FROM dl)::BIGINT sum_dl, avgdl FROM stats
""",
        "ft_doc_stats": f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents)
SELECT doc_id,
       len(toks)::BIGINT n_tokens,
       len(list_distinct(toks))::BIGINT n_uniq_tokens,
       len(list_filter(toks, x -> x IN ('a','the','of','and','to','in')))::BIGINT stop_count,
       coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT sum_token_len,
       md5(array_to_string(toks, ' ')) fingerprint
FROM t ORDER BY doc_id
""",
        "ta_quality": f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
s AS (SELECT doc_id,
             len(toks)::BIGINT n_tokens,
             len(list_distinct(toks))::BIGINT n_uniq,
             len(list_filter(toks, x -> x IN ('a','the','of','and','to','in')))::BIGINT stop_count,
             coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT sum_len
      FROM t)
SELECT doc_id, n_tokens,
       floor(stop_count / greatest(n_tokens, 1)::DOUBLE * 1e6 + 0.5)::BIGINT stop_ratio_micro,
       floor(n_uniq / greatest(n_tokens, 1)::DOUBLE * 1e6 + 0.5)::BIGINT uniq_ratio_micro,
       floor(sum_len / greatest(n_tokens, 1)::DOUBLE * 1e6 + 0.5)::BIGINT mean_token_len_micro
FROM s ORDER BY doc_id
""",
        "ta_quality_buckets": f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
s AS (SELECT doc_id,
             floor(len(list_distinct(toks))
                   / greatest(len(toks), 1)::DOUBLE * 1e6 + 0.5)::BIGINT score
      FROM t),
n AS (SELECT count(*)::BIGINT c FROM s),
h AS (SELECT score, count(*)::BIGINT cnt FROM s GROUP BY 1),
cum AS (SELECT score, sum(cnt) OVER (ORDER BY score)::BIGINT cum FROM h),
th AS (SELECT
         (SELECT min(score) FROM cum, n WHERE cum >= (c + 2) // 3) t1,
         (SELECT min(score) FROM cum, n WHERE cum >= (2 * c + 2) // 3) t2
       FROM n)
SELECT doc_id, score,
       CASE WHEN score <= t1 THEN 'tail'
            WHEN score <= t2 THEN 'middle'
            ELSE 'head' END AS bucket
FROM s CROSS JOIN th ORDER BY doc_id
""",
        "ta_dsir_weights": _dsir_sql(),
        "sample_dsir_resample": f"""
WITH w AS ({{_dsir_inner}}),
d AS (
  SELECT doc_id, importance_micro,
         (('0x' || substr(md5('resample:' || doc_id::VARCHAR), 1, 8))::UBIGINT
          % 1000000)::BIGINT draw
  FROM w
)
SELECT doc_id, importance_micro, draw,
       (draw < least(importance_micro, 1000000))::BIGINT kept
FROM d ORDER BY doc_id
""".format(_dsir_inner=_dsir_sql().strip().rstrip(';')),
        # NB-linear classifier: train-half per-class hashed-occurrence
        # counts -> per-bucket ln-ratio weights (exact-int ln inputs, the
        # lm_nll parity), bias from doc-count priors, scored by occurrence
        "ta_quality_clf": f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) term FROM documents),
f AS (SELECT doc_id,
             (('0x' || substr(md5(term), 1, 8))::UBIGINT % {textstats.FH_BUCKETS})::BIGINT b
      FROM tok),
trn AS (
  SELECT doc_id, (lang = '{textstats.DSIR_TARGET_LANG}') pos FROM documents
  WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100) >= {textstats.CLF_TRAIN_MIN_BUCKET}
),
pri AS (SELECT coalesce(sum(CASE WHEN pos THEN 1 ELSE 0 END), 0)::BIGINT n_pos,
               coalesce(sum(CASE WHEN pos THEN 0 ELSE 1 END), 0)::BIGINT n_neg FROM trn),
cnt AS (SELECT b, sum(CASE WHEN t.pos THEN 1 ELSE 0 END)::BIGINT cp,
               sum(CASE WHEN t.pos THEN 0 ELSE 1 END)::BIGINT cn
        FROM f JOIN trn t USING (doc_id) GROUP BY 1),
tot AS (SELECT coalesce(sum(cp), 0)::BIGINT tp, coalesce(sum(cn), 0)::BIGINT tn FROM cnt),
w AS (SELECT b,
             floor((ln(cp + 1) - ln(tp + {textstats.FH_BUCKETS}) - ln(cn + 1)
                    + ln(tn + {textstats.FH_BUCKETS})) * 1e6 + 0.5)::BIGINT w
      FROM cnt CROSS JOIN tot),
w0 AS (SELECT floor((ln(1) - ln(tp + {textstats.FH_BUCKETS}) - ln(1)
                     + ln(tn + {textstats.FH_BUCKETS})) * 1e6 + 0.5)::BIGINT w FROM tot),
bias AS (SELECT floor((ln(n_pos + 1) - ln(n_neg + 1)) * 1e6 + 0.5)::BIGINT bm FROM pri),
sc AS (SELECT f.doc_id, count(*)::BIGINT n_tokens,
              sum(coalesce(w.w, (SELECT w FROM w0)))::BIGINT ssum
       FROM f LEFT JOIN w USING (b) GROUP BY 1)
SELECT doc_id::BIGINT doc_id, n_tokens,
       ((SELECT bm FROM bias) + ssum)::BIGINT score_micro,
       (CASE WHEN (SELECT bm FROM bias) + ssum > 0 THEN 1 ELSE 0 END)::BIGINT pred
FROM sc ORDER BY doc_id
""",
        "ta_lm_nll": f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
trn AS (
  SELECT doc_id FROM documents
  WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100) >= 20
),
cf AS (SELECT term, count(*)::BIGINT cf FROM tok JOIN trn USING (doc_id) GROUP BY 1),
tot AS (SELECT sum(cf)::BIGINT total, count(*)::BIGINT v FROM cf),
w AS (
  SELECT term,
         floor((ln(total + v) - ln(cf + 1)) * 1e6 + 0.5)::BIGINT w
  FROM cf CROSS JOIN tot
),
sc AS (
  SELECT t.doc_id, count(*)::BIGINT n_tokens,
         sum(coalesce(w.w,
             (SELECT floor(ln(total + v) * 1e6 + 0.5)::BIGINT FROM tot)))::BIGINT nll_micro
  FROM tok t LEFT JOIN w ON w.term = t.term GROUP BY 1
)
SELECT doc_id::BIGINT doc_id, n_tokens, nll_micro,
       (nll_micro // n_tokens)::BIGINT mean_nll_micro
FROM sc ORDER BY doc_id
""",
        # bigram LM: same ln-minus-ln micro-nat contract, conditioned on the
        # preceding token; struct unnest keeps (w1, w2) exact (no separator
        # ambiguity), coalesce(·, 0) covers the unseen bigram/context arms
        "ta_lm_nll_bigram": f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) term FROM t),
bgall AS (
  SELECT doc_id, s['w1'] w1, s['w2'] w2 FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                          i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) s
    FROM t WHERE len(toks) >= 2)
),
trn AS (SELECT doc_id FROM documents
        WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100) >= 20),
cbg AS (SELECT w1, w2, count(*)::BIGINT c
        FROM bgall JOIN trn USING (doc_id) GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c)::BIGINT cc FROM cbg GROUP BY 1),
voc AS (SELECT count(DISTINCT term)::BIGINT v FROM tok JOIN trn USING (doc_id)),
sc AS (
  SELECT g.doc_id, count(*)::BIGINT n_bigrams,
         sum(floor((ln(coalesce(ctx.cc, 0) + v) - ln(coalesce(cbg.c, 0) + 1))
                   * 1e6 + 0.5)::BIGINT)::BIGINT nll_micro
  FROM bgall g
  LEFT JOIN cbg ON cbg.w1 = g.w1 AND cbg.w2 = g.w2
  LEFT JOIN ctx ON ctx.w1 = g.w1
  CROSS JOIN voc
  GROUP BY 1)
SELECT doc_id::BIGINT doc_id, n_bigrams, nll_micro,
       (nll_micro // n_bigrams)::BIGINT mean_nll_micro
FROM sc ORDER BY doc_id
""",
        "ta_token_count": _token_count_sql(),
        "ta_pii_redact": _pii_sql(),
        "ta_seq_pack": _seq_pack_sql(),
        "ta_pack_greedy": _pack_greedy_sql(),
        "ta_fingerprint": _fingerprint_sql(),
        "ta_contamination": _contamination_sql(),
        "ta_contamination_bloom": _contamination_bloom_sql(),
        "ta_freq_spectrum": f"""
WITH tok AS (SELECT unnest({_TOKS}) term FROM documents),
cf AS (SELECT term, count(*)::BIGINT cf FROM tok GROUP BY 1)
SELECT cf, count(*)::BIGINT n_terms FROM cf GROUP BY cf ORDER BY cf
""",
        "ta_winnowing": _winnowing_sql(),
        "ta_good_turing": f"""
WITH tok AS (SELECT unnest({_TOKS}) term FROM documents),
cf AS (SELECT term, count(*)::BIGINT cf FROM tok GROUP BY 1),
s AS (SELECT cf, count(*)::BIGINT n_terms FROM cf GROUP BY cf)
SELECT a.cf, a.n_terms, b.n_terms n_next,
       ((a.cf + 1) * b.n_terms * 1000000 // a.n_terms)::BIGINT gt_micro
FROM s a JOIN s b ON b.cf = a.cf + 1
ORDER BY a.cf
""",
        "ta_repetition": _repetition_sql(),
        "ta_feature_hash": _feature_hash_sql(),
        "emb_infer": _emb_infer_sql(),
        # doc co-occurrence among the head vocabulary: same top-N selection
        # (df desc, term asc) and lexicographic pair order as the engine
        "ta_pmi": f"""
WITH tok AS (SELECT DISTINCT doc_id, unnest({_TOKS}) term FROM documents),
df AS (SELECT term, count(*)::BIGINT df FROM tok GROUP BY 1),
top AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) r FROM df
  ) WHERE r <= {textstats.COOCCUR_TOP_N}
),
tt AS (SELECT doc_id, term FROM tok WHERE term IN (SELECT term FROM top)),
n AS (SELECT count(*)::BIGINT n_docs FROM documents),
pairs AS (
  SELECT a.term t1, b.term t2, count(*)::BIGINT n_docs_both
  FROM tt a JOIN tt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
)
SELECT t1, t2, n_docs_both,
       floor((ln(n_docs_both * n_docs) - ln(da.df * db.df)) * 1e6 + 0.5)::BIGINT pmi_micro
FROM pairs CROSS JOIN n
JOIN df da ON da.term = t1 JOIN df db ON db.term = t2
ORDER BY t1, t2
""",
        "ta_cooccur": f"""
WITH tok AS (SELECT DISTINCT doc_id, unnest({_TOKS}) term FROM documents),
df AS (SELECT term, count(*)::BIGINT df FROM tok GROUP BY 1),
top AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) r FROM df
  ) WHERE r <= {textstats.COOCCUR_TOP_N}
),
tt AS (SELECT doc_id, term FROM tok WHERE term IN (SELECT term FROM top))
SELECT a.term t1, b.term t2, count(*)::BIGINT n_docs_both
FROM tt a JOIN tt b ON a.doc_id = b.doc_id AND a.term < b.term
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # inverted-CDF discrete quantile: smallest dl whose cumulative count
        # reaches ceil(p/100 · N) — identical definition to dl_quantiles
        "ta_dl_quantiles": f"""
WITH t AS (SELECT len({_TOKS})::BIGINT dl FROM documents),
h AS (SELECT dl, count(*)::BIGINT n FROM t GROUP BY 1),
c AS (SELECT dl, n, sum(n) OVER (ORDER BY dl)::BIGINT cum FROM h),
tot AS (SELECT count(*)::BIGINT n FROM t),
p(pct) AS (VALUES (10), (25), (50), (75), (90), (99)),
sel AS (
  SELECT p.pct, c.dl, c.cum,
         row_number() OVER (PARTITION BY p.pct ORDER BY c.dl) r
  FROM p CROSS JOIN tot JOIN c ON c.cum >= (p.pct * tot.n + 99) // 100
)
SELECT pct::BIGINT pct, dl, cum n_docs_le FROM sel WHERE r = 1 ORDER BY pct
""",
        "ta_top_per_source": f"""
WITH t AS (SELECT doc_id, source, {_TOKS} toks FROM documents),
s AS (SELECT doc_id, source,
             floor(len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE * 1e6 + 0.5)::BIGINT uniq_ratio_micro
      FROM t)
SELECT source, rank, doc_id, uniq_ratio_micro FROM (
  SELECT source, doc_id, uniq_ratio_micro,
         row_number() OVER (PARTITION BY source
                            ORDER BY uniq_ratio_micro DESC, doc_id ASC)::BIGINT rank
  FROM s
) WHERE rank <= 3 ORDER BY source, rank
""",
        # integer-division score: tf*1e6 // df on both sides, no float ln()
        "ta_tfidf_topk": f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT df FROM tok GROUP BY 1),
s AS (SELECT doc_id, tf.term, (tf * 1000000) // df AS score_micro
      FROM tf JOIN df ON df.term = tf.term),
r AS (SELECT doc_id, term, score_micro,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_micro DESC, term ASC)::BIGINT rank
      FROM s)
SELECT doc_id, rank, term, score_micro FROM r WHERE rank <= 3
ORDER BY doc_id, rank
""",
        # DuckDB lists are 1-indexed; range(1, len) yields 1..len-1 so
        # toks[i+1] stays in bounds — adjacent pairs within each doc only
        "ta_top_bigrams": f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
bg AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t WHERE len(toks) >= 2
)
SELECT bigram, count(*)::BIGINT cnt FROM bg GROUP BY bigram
ORDER BY cnt DESC, bigram ASC LIMIT 20
""",
        # BPE step-1 pair counts: vocab-side explode (cf-weighted adjacent
        # char pairs inside each distinct term), never the corpus
        "ta_bpe_merges": _ta_bpe_merges_sql(),
        "ta_bpe_encode": _ta_bpe_encode_sql(),
        "ta_bpe_pairs": f"""
WITH tok AS (SELECT unnest({_TOKS}) term FROM documents),
cf AS (SELECT term, count(*)::BIGINT cf FROM tok GROUP BY 1),
pr AS (
  SELECT unnest(list_transform(range(1, length(term)),
                               i -> substr(term, i, 2))) AS pair, cf
  FROM cf WHERE length(term) >= 2
)
SELECT pair, sum(cf)::BIGINT cnt FROM pr GROUP BY pair
ORDER BY cnt DESC, pair ASC LIMIT 20
""",
        # OOV rate vs the deterministic top-16 vocab (cf desc, term asc)
        # CMS counters + min-estimate replayed entirely in SQL (same md5
        # row-hash); top-k slice keyed by the same (cf desc, term asc) rule
        # chunk dedup over the same chunk CTE as ta_chunks
        "dedup_chunks": f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
d AS (SELECT doc_id, toks, len(toks)::BIGINT dl FROM t WHERE len(toks) > 0),
ch AS (
  SELECT doc_id, dl, toks,
         unnest(range(0, 1 + (greatest(dl - {textstats.CHUNK_W}, 0)
                              + {textstats.CHUNK_S} - 1) // {textstats.CHUNK_S}))::BIGINT chunk_idx
  FROM d
),
f AS (
  SELECT doc_id, chunk_idx,
         md5(array_to_string(list_slice(toks, chunk_idx * {textstats.CHUNK_S} + 1,
             least(chunk_idx * {textstats.CHUNK_S} + {textstats.CHUNK_W}, dl)), ' ')) fp
  FROM ch
),
g AS (
  SELECT fp, count(*)::BIGINT n_copies,
         min(doc_id * {textstats.CHUNK_PACK} + chunk_idx)::BIGINT kk
  FROM f GROUP BY fp HAVING count(*) >= 2
)
SELECT fp, n_copies, (kk // {textstats.CHUNK_PACK})::BIGINT keep_doc,
       (kk % {textstats.CHUNK_PACK})::BIGINT keep_chunk
FROM g ORDER BY fp
""",
        "ta_cms": f"""
WITH tok AS (SELECT unnest({_TOKS}) term FROM documents),
cf AS (SELECT term, count(*)::BIGINT cf FROM tok GROUP BY 1),
h AS (
  SELECT term, cf, r.range::BIGINT r,
         (('0x' || substr(md5(r.range::VARCHAR || ':' || term), 1, 8))::UBIGINT
          % {textstats.CMS_WIDTH})::BIGINT w
  FROM cf CROSS JOIN range({textstats.CMS_DEPTH}) r
),
counters AS (SELECT r, w, sum(cf)::BIGINT cnt FROM h GROUP BY 1, 2),
top AS (
  SELECT term, cf FROM (
    SELECT term, cf, row_number() OVER (ORDER BY cf DESC, term ASC) rn FROM cf
  ) WHERE rn <= {textstats.CMS_TOP_K}
)
SELECT t.term, t.cf cf_true, min(c.cnt)::BIGINT cf_est
FROM top t JOIN h ON h.term = t.term
JOIN counters c ON c.r = h.r AND c.w = h.w
GROUP BY 1, 2 ORDER BY t.term
""",
        # stride/window chunking; list_slice is 1-indexed and end-inclusive
        "ta_chunks": f"""
WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
d AS (SELECT doc_id, toks, len(toks)::BIGINT dl FROM t WHERE len(toks) > 0),
ch AS (
  SELECT doc_id, dl, toks,
         unnest(range(0, 1 + (greatest(dl - {textstats.CHUNK_W}, 0)
                              + {textstats.CHUNK_S} - 1) // {textstats.CHUNK_S}))::BIGINT chunk_idx
  FROM d
)
SELECT doc_id::BIGINT doc_id, chunk_idx,
       (chunk_idx * {textstats.CHUNK_S})::BIGINT chunk_start,
       (least(chunk_idx * {textstats.CHUNK_S} + {textstats.CHUNK_W}, dl)
        - chunk_idx * {textstats.CHUNK_S})::BIGINT n_tokens,
       md5(array_to_string(list_slice(toks, chunk_idx * {textstats.CHUNK_S} + 1,
           least(chunk_idx * {textstats.CHUNK_S} + {textstats.CHUNK_W}, dl)), ' ')) fp
FROM ch ORDER BY doc_id, chunk_idx
""",
        "ta_vocab_coverage": f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) term FROM documents),
cf AS (SELECT term, count(*)::BIGINT cf FROM tok GROUP BY 1),
voc AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY cf DESC, term ASC) r FROM cf
  ) WHERE r <= {textstats.VOCAB_TOP_K}
),
sc AS (
  SELECT doc_id, count(*)::BIGINT n_tokens,
         sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)::BIGINT n_oov
  FROM tok t LEFT JOIN voc v ON v.term = t.term GROUP BY 1
)
SELECT doc_id::BIGINT doc_id, n_tokens, n_oov,
       (n_oov * 1000000 // n_tokens)::BIGINT oov_micro
FROM sc ORDER BY doc_id
""",
        "ta_corpus_stats": f"""
SELECT lang, source, count(*)::BIGINT n_docs,
       sum(len({_TOKS}))::BIGINT sum_tokens,
       sum(n_chars)::BIGINT sum_chars
FROM documents GROUP BY 1, 2 ORDER BY 1, 2
""",
        "sample_hash_split": """
WITH b AS (
  SELECT doc_id,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100)::BIGINT bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 10 THEN 'val'
            WHEN bucket < 20 THEN 'test'
            ELSE 'train' END AS split
FROM b ORDER BY doc_id
""",
        # same md5 purity as hash_split, 64-bit hash; row_number == the
        # engine's global k-smallest-per-stratum selection
        "sample_stratified": """
WITH h AS (
  SELECT lang, doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 16))::UBIGINT hv
  FROM documents
),
r AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)::BIGINT rank
  FROM h
)
SELECT lang, rank, doc_id FROM r WHERE rank <= 30 ORDER BY lang, rank
""",
        # engine/ops/sampling.py::mixture_epochs — weight = pure function of
        # the source STRING, fractional epoch by the doc's md5 draw
        # engine/ops/sampling.py::temperature_mix — α=0.5 temperature
        # sampling with the integer-exact floor(sqrt) weight surrogate and
        # the shared md5 fractional-epoch lottery, fully replayed
        "sample_temperature_mix": """
WITH base AS (SELECT source, count(*)::BIGINT n_docs FROM documents GROUP BY 1),
w AS (SELECT source, n_docs, floor(sqrt(n_docs::DOUBLE))::BIGINT w FROM base),
z AS (SELECT sum(w)::BIGINT z, sum(n_docs)::BIGINT b FROM w),
rate AS (
  SELECT w.source, w.n_docs,
         ((z.b * w.w * 1000000) // (z.z * w.n_docs))::BIGINT rate_micro
  FROM w, z
),
d AS (
  SELECT dd.source, dd.n_chars, r.n_docs, r.rate_micro,
         (r.rate_micro // 1000000
          + CASE WHEN (('0x' || substr(md5(dd.doc_id::VARCHAR), 1, 8))::UBIGINT
                       % 1000000) < r.rate_micro % 1000000
                 THEN 1 ELSE 0 END)::BIGINT reps
  FROM documents dd JOIN rate r USING (source)
)
SELECT source, n_docs, rate_micro,
       sum(reps)::BIGINT n_emitted,
       sum(reps * n_chars)::BIGINT n_chars_emitted
FROM d GROUP BY 1, 2, 3 ORDER BY source
""",
        "sample_mixture_epochs": """
WITH w AS (
  SELECT source,
         (250000 + (('0x' || substr(md5(source), 1, 8))::UBIGINT % 30)
                   * 100000)::BIGINT weight_micro
  FROM (SELECT DISTINCT source FROM documents)
),
d AS (
  SELECT doc_id, dd.source, n_chars, weight_micro,
         (weight_micro // 1000000
          + CASE WHEN (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
                       % 1000000) < weight_micro % 1000000
                 THEN 1 ELSE 0 END)::BIGINT reps
  FROM documents dd JOIN w USING (source)
)
SELECT source, weight_micro, count(*)::BIGINT n_docs,
       sum(reps)::BIGINT n_emitted,
       sum(reps * n_chars)::BIGINT n_chars_emitted
FROM d GROUP BY 1, 2 ORDER BY source
""",
        # engine/ops/sampling.py::export_shards — the SQL recomputes the
        # shard assignment + per-shard checksum the engine derives from the
        # WRITTEN hive partitions (round-trip proof)
        "sample_export_shards": """
SELECT (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 8)::BIGINT shard_id,
       count(*)::BIGINT n_docs,
       sum(n_chars)::BIGINT n_chars,
       sum((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
            % 2147483647))::BIGINT key_checksum
FROM documents GROUP BY 1 ORDER BY 1
""",
        "ev_sessions": """
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts)::BIGINT sid
  FROM e
),
per_session AS (
  SELECT user_id, sid, count(*)::BIGINT n FROM s GROUP BY 1, 2
)
SELECT user_id::BIGINT user_id, sum(n)::BIGINT n_events,
       count(*)::BIGINT n_sessions, max(n)::BIGINT max_session_events
FROM per_session GROUP BY 1 ORDER BY 1
""",
        "dedup_exact": f"""
WITH t AS (SELECT doc_id, md5(array_to_string({_TOKS}, ' ')) fingerprint FROM documents)
SELECT min(doc_id)::BIGINT doc_id, count(*)::BIGINT dup_count
FROM t GROUP BY fingerprint ORDER BY doc_id
""",
        "dedup_jaccard_pairs": f"""
WITH t AS (SELECT doc_id, list_distinct({_TOKS}) s FROM documents)
SELECT doc_a, doc_b, jaccard_micro FROM (
  SELECT a.doc_id doc_a, b.doc_id doc_b,
         floor((len(list_intersect(a.s, b.s))::DOUBLE
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) * 1e6 + 0.5)::BIGINT jaccard_micro
  FROM t a JOIN t b ON a.doc_id < b.doc_id
) WHERE jaccard_micro >= 900000
ORDER BY doc_a, doc_b
""",
        # LSH candidates + exact verify converge to the same pair set as the
        # all-pairs Jaccard (recall argument in engine/ops/dedup.py)
        "dedup_minhash_verified": f"""
WITH t AS (SELECT doc_id, list_distinct({_TOKS}) s FROM documents)
SELECT doc_a, doc_b, jaccard_micro FROM (
  SELECT a.doc_id doc_a, b.doc_id doc_b,
         floor((len(list_intersect(a.s, b.s))::DOUBLE
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) * 1e6 + 0.5)::BIGINT jaccard_micro
  FROM t a JOIN t b ON a.doc_id < b.doc_id
) WHERE jaccard_micro >= 900000
ORDER BY doc_a, doc_b
""",
        # components of the same verified pair graph, as a recursive CTE:
        # walk seeds every endpoint with its own id and propagates labels
        # along edges until closure; min reachable id == component min ==
        # the engine's min-label-propagation fixpoint
        "dedup_clusters": f"""
WITH RECURSIVE t AS (SELECT doc_id, list_distinct({_TOKS}) s FROM documents),
p AS (
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id doc_a, b.doc_id doc_b,
           floor((len(list_intersect(a.s, b.s))::DOUBLE
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) * 1e6 + 0.5)::BIGINT jm
    FROM t a JOIN t b ON a.doc_id < b.doc_id
  ) WHERE jm >= 900000
),
e AS (SELECT doc_a a, doc_b b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
walk(doc, lab) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, w.lab FROM e JOIN walk w ON w.doc = e.b
)
SELECT doc::BIGINT doc_id, min(lab)::BIGINT cluster_id,
       (CASE WHEN doc = min(lab) THEN 1 ELSE 0 END)::BIGINT keep
FROM walk GROUP BY doc ORDER BY doc_id
""",
        "dedup_keep_best": f"""
WITH RECURSIVE t AS (SELECT doc_id, list_distinct({_TOKS}) s FROM documents),
p AS (
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id doc_a, b.doc_id doc_b,
           floor((len(list_intersect(a.s, b.s))::DOUBLE
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) * 1e6 + 0.5)::BIGINT jm
    FROM t a JOIN t b ON a.doc_id < b.doc_id
  ) WHERE jm >= 900000
),
e AS (SELECT doc_a a, doc_b b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
walk(doc, lab) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, w.lab FROM e JOIN walk w ON w.doc = e.b
),
cl AS (SELECT doc doc_id, min(lab) cluster_id FROM walk GROUP BY doc),
sc AS (
  SELECT doc_id,
         floor(len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE
               * 1e6 + 0.5)::BIGINT score
  FROM (SELECT doc_id, {_TOKS} toks FROM documents)
),
r AS (
  SELECT cl.doc_id, cl.cluster_id, sc.score,
         row_number() OVER (PARTITION BY cl.cluster_id
                            ORDER BY sc.score DESC, cl.doc_id ASC) rn
  FROM cl JOIN sc USING (doc_id)
)
SELECT doc_id::BIGINT doc_id, cluster_id::BIGINT cluster_id, score,
       (rn = 1)::BIGINT keep
FROM r ORDER BY doc_id
""",
        "dedup_embedding_pairs": """
SELECT vec_a, vec_b, sim_micro FROM (
  SELECT a.vec_id::BIGINT vec_a, b.vec_id::BIGINT vec_b,
         floor(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1e6 + 0.5)::BIGINT sim_micro
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE sim_micro >= 400000
ORDER BY vec_a, vec_b
""",
        "ann_knn_top1": """
WITH sims AS (
  SELECT a.vec_id::BIGINT qid, b.vec_id::BIGINT vec_id,
         floor(list_cosine_similarity(b.embedding::DOUBLE[], a.embedding::DOUBLE[]) * 1e6 + 0.5)::BIGINT sim_micro
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
)
SELECT qid, rank, vec_id, sim_micro FROM (
  SELECT qid, vec_id, sim_micro,
         row_number() OVER (PARTITION BY qid ORDER BY sim_micro DESC, vec_id ASC)::BIGINT rank
  FROM sims
) WHERE rank <= 1 ORDER BY qid
""",
        "ann_knn_classify": """
WITH q AS (SELECT vec_id qid, label, embedding FROM embeddings WHERE vec_id < 50),
sims AS (
  SELECT q.qid::BIGINT qid, e.vec_id::BIGINT vec_id, e.label::BIGINT lab,
         floor(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) * 1e6 + 0.5)::BIGINT sim_micro
  FROM embeddings e JOIN q ON e.vec_id <> q.qid
),
nn AS (
  SELECT qid, lab FROM (
    SELECT qid, lab,
           row_number() OVER (PARTITION BY qid ORDER BY sim_micro DESC, vec_id ASC) rn
    FROM sims
  ) WHERE rn <= 5
),
vote AS (SELECT qid, lab, count(*)::BIGINT n FROM nn GROUP BY 1, 2)
SELECT qid, pred_label, votes, true_label FROM (
  SELECT v.qid, v.lab pred_label, v.n votes, q.label::BIGINT true_label,
         row_number() OVER (PARTITION BY v.qid ORDER BY v.n DESC, v.lab ASC) pick
  FROM vote v JOIN q ON q.qid = v.qid
) WHERE pick = 1 ORDER BY qid
""",
        "emb_label_centroids": """
WITH ex AS (
  SELECT label::BIGINT AS "label",
         unnest(range(1, len(embedding)+1))::BIGINT AS dim,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
)
SELECT "label", dim,
       sum(floor(v * 1e6 + 0.5)::BIGINT)::BIGINT sum_micro,
       count(*)::BIGINT n_vecs,
       floor(sum(floor(v * 1e6 + 0.5)::BIGINT) / count(*))::BIGINT mean_micro
FROM ex GROUP BY 1, 2 ORDER BY 1, 2
""",
        "emb_kmeans": _emb_kmeans_sql(),
        "dedup_semantic": _dedup_semantic_sql(),
        "ann_sq8_topk": """
WITH comp AS (
  SELECT vec_id, s['j'] j, s['v'] v FROM (
    SELECT vec_id, unnest(list_transform(range(1, len(embedding) + 1),
           i -> {'j': i - 1,
                 'v': floor(embedding[i]::DOUBLE * 1e6 + 0.5)::BIGINT})) s
    FROM embeddings)
),
bounds AS (SELECT greatest(max(abs(v)), 1) m FROM comp),
q8 AS (SELECT vec_id, j, (v * 127) // b.m AS c FROM comp, bounds b),
q AS (SELECT vec_id qid, j, c FROM q8 WHERE vec_id < 5),
dots AS (
  SELECT q.qid::BIGINT qid, e.vec_id::BIGINT vec_id, sum(q.c * e.c)::BIGINT dot
  FROM q8 e JOIN q ON q.j = e.j AND e.vec_id <> q.qid
  GROUP BY 1, 2
)
SELECT qid, rank, vec_id, dot FROM (
  SELECT qid, vec_id, dot,
         row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC)::BIGINT rank
  FROM dots
) WHERE rank <= 10 ORDER BY qid, rank
""",
        "ann_cosine_topk": """
WITH q AS (SELECT vec_id qid, embedding FROM embeddings WHERE vec_id < 5),
sims AS (
  SELECT q.qid::BIGINT qid, e.vec_id::BIGINT vec_id,
         floor(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) * 1e6 + 0.5)::BIGINT sim_micro
  FROM embeddings e JOIN q ON e.vec_id <> q.qid
)
SELECT qid, rank, vec_id, sim_micro FROM (
  SELECT qid, vec_id, sim_micro,
         row_number() OVER (PARTITION BY qid ORDER BY sim_micro DESC, vec_id ASC)::BIGINT rank
  FROM sims
) WHERE rank <= 10 ORDER BY qid, rank
""",
        "ann_hard_negatives": """
WITH q AS (SELECT vec_id qid, label, embedding FROM embeddings WHERE vec_id < 5),
sims AS (
  SELECT q.qid::BIGINT qid, e.vec_id::BIGINT vec_id,
         floor(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) * 1e6 + 0.5)::BIGINT sim_micro
  FROM embeddings e JOIN q ON e.vec_id <> q.qid AND e.label <> q.label
)
SELECT qid, rank, vec_id, sim_micro FROM (
  SELECT qid, vec_id, sim_micro,
         row_number() OVER (PARTITION BY qid ORDER BY sim_micro DESC, vec_id ASC)::BIGINT rank
  FROM sims
) WHERE rank <= 10 ORDER BY qid, rank
""",
        "ann_filtered_topk": """
WITH q AS (SELECT vec_id qid, label, embedding FROM embeddings WHERE vec_id < 5),
sims AS (
  SELECT q.qid::BIGINT qid, e.vec_id::BIGINT vec_id,
         floor(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) * 1e6 + 0.5)::BIGINT sim_micro
  FROM embeddings e JOIN q ON e.vec_id <> q.qid AND e.label = q.label
)
SELECT qid, rank, vec_id, sim_micro FROM (
  SELECT qid, vec_id, sim_micro,
         row_number() OVER (PARTITION BY qid ORDER BY sim_micro DESC, vec_id ASC)::BIGINT rank
  FROM sims
) WHERE rank <= 10 ORDER BY qid, rank
""",
        "rel_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       sum(floor(l_quantity * 100 + 0.5)::BIGINT)::BIGINT sum_qty_cents,
       sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT sum_price_cents,
       sum(floor(l_discount * 100 + 0.5)::BIGINT)::BIGINT sum_disc_cents,
       count(*)::BIGINT count_order
FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-09-01'
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "rel_nation_revenue": """
SELECT n_name,
       sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT revenue_cents,
       count(*)::BIGINT n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1
""",
        "rel_shipping_priority": f"""
SELECT o_orderkey, o_orderdate_epoch, revenue_cents FROM (
  SELECT l_orderkey o_orderkey,
         epoch_us(o_orderdate)::BIGINT o_orderdate_epoch,
         sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT)::BIGINT revenue_cents
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = '{relational.Q3_SEGMENT}'
    AND o_orderdate < TIMESTAMP '{relational.Q3_DATE}'
    AND l_shipdate > TIMESTAMP '{relational.Q3_DATE}'
  GROUP BY 1, 2
)
ORDER BY revenue_cents DESC, o_orderkey ASC LIMIT {relational.Q3_TOPK}
""",
        "rel_top_orders": """
SELECT o_orderkey, o_custkey, floor(o_totalprice * 100 + 0.5)::BIGINT price_cents
FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 25
""",
        "ev_heavy_hitters": """
SELECT user_id, rank, n_events, sum_value_micro FROM (
  SELECT user_id, count(*)::BIGINT n_events,
         sum(floor(value * 1e6 + 0.5)::BIGINT)::BIGINT sum_value_micro,
         row_number() OVER (ORDER BY sum(floor(value * 1e6 + 0.5)::BIGINT) DESC,
                            user_id ASC)::BIGINT rank
  FROM events GROUP BY user_id
) WHERE rank <= 25 ORDER BY rank
""",
        "ev_hourly": """
SELECT epoch(date_trunc('hour', ts))::BIGINT hour_epoch, event_type,
       count(*)::BIGINT n_events,
       sum(floor(value * 1e6 + 0.5)::BIGINT)::BIGINT sum_value_micro
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        # engine/ops/relational.py::events_anomaly — |x-μ| > 3σ tested as
        # (n·x-S)² > 9·(n·Q-S²) in exact HUGEINT (no float mean/std)
        "ev_anomaly": """
WITH h AS (
  SELECT event_type, epoch(date_trunc('hour', ts))::BIGINT hour_epoch,
         count(*)::HUGEINT x
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, count(*)::HUGEINT n, sum(x)::HUGEINT S,
         sum(x * x)::HUGEINT Q
  FROM h GROUP BY 1
)
SELECT h.event_type, hour_epoch, x::BIGINT n_events,
       (CASE WHEN (n * x - S) * (n * x - S) > 9 * (n * Q - S * S)
             THEN 1 ELSE 0 END)::BIGINT is_anomaly
FROM h JOIN s USING (event_type)
ORDER BY event_type, hour_epoch
""",
        "ev_sliding": """
WITH hourly AS (
  SELECT epoch(date_trunc('hour', ts))::BIGINT hour_epoch, event_type,
         count(*)::BIGINT n_events,
         sum(floor(value * 1e6 + 0.5)::BIGINT)::BIGINT sum_value_micro
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour_epoch,
       SUM(n_events) OVER w::BIGINT w_events,
       SUM(sum_value_micro) OVER w::BIGINT w_value_micro
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour_epoch
             RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW)
ORDER BY event_type, hour_epoch
""",
        "ev_pipeline_aggs": """
WITH daily AS (
  SELECT epoch(date_trunc('day', ts))::BIGINT day_epoch, event_type,
         count(*)::BIGINT n_events,
         sum(floor(value * 1e6 + 0.5)::BIGINT)::BIGINT sum_value_micro
  FROM events GROUP BY 1, 2
)
SELECT event_type, day_epoch, n_events,
       (n_events - lag(n_events, 1, 0) OVER w)::BIGINT deriv_events,
       SUM(n_events) OVER (PARTITION BY event_type ORDER BY day_epoch
                           ROWS UNBOUNDED PRECEDING)::BIGINT cum_events,
       SUM(sum_value_micro) OVER (PARTITION BY event_type ORDER BY day_epoch
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)::BIGINT mv3_value_micro
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day_epoch)
ORDER BY event_type, day_epoch
""",
        "ev_funnel": f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts)::BIGINT t FROM events),
s1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
s2 AS (
  SELECT DISTINCT a.user_id FROM e a
  JOIN e b ON b.user_id = a.user_id AND b.event_type = 'click'
          AND b.t > a.t AND b.t <= a.t + {72 * 3_600_000_000}
  WHERE a.event_type = 'view'
),
s3 AS (
  SELECT DISTINCT a.user_id FROM e a
  JOIN e b ON b.user_id = a.user_id AND b.event_type = 'click' AND b.t > a.t
  JOIN e c ON c.user_id = a.user_id AND c.event_type = 'purchase'
          AND c.t > b.t AND c.t <= a.t + {72 * 3_600_000_000}
  WHERE a.event_type = 'view' AND b.t <= a.t + {72 * 3_600_000_000}
)
SELECT * FROM (
  SELECT 1::BIGINT step, 'view' event_type, (SELECT count(*) FROM s1)::BIGINT n_users
  UNION ALL
  SELECT 2::BIGINT, 'click', (SELECT count(*) FROM s2)::BIGINT
  UNION ALL
  SELECT 3::BIGINT, 'purchase', (SELECT count(*) FROM s3)::BIGINT
) ORDER BY step
""",
        "ev_retention": """
WITH d AS (
  SELECT DISTINCT user_id, epoch(date_trunc('day', ts))::BIGINT ud FROM events
),
f AS (SELECT user_id, min(ud) first_day FROM d GROUP BY 1),
r AS (
  SELECT f.user_id, f.first_day,
         max(CASE WHEN d.ud BETWEEN f.first_day + 7 * 86400
                              AND f.first_day + 13 * 86400
                  THEN 1 ELSE 0 END) ret
  FROM f JOIN d ON d.user_id = f.user_id GROUP BY 1, 2
)
SELECT first_day cohort_day_epoch, count(*)::BIGINT n_users,
       sum(ret)::BIGINT n_retained_w1
FROM r GROUP BY 1 ORDER BY 1
""",
        "ev_cumulative_cardinality": """
WITH first_seen AS (
  SELECT user_id, min(epoch(date_trunc('day', ts))::BIGINT) first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT first_day day_epoch, count(*)::BIGINT new_users
  FROM first_seen GROUP BY 1
)
SELECT day_epoch, new_users,
       SUM(new_users) OVER (ORDER BY day_epoch ROWS UNBOUNDED PRECEDING)::BIGINT cum_users
FROM daily ORDER BY day_epoch
""",
        "ev_json_stats": """
SELECT event_type, count(*)::BIGINT n,
       sum((props::JSON ->> 'k')::BIGINT)::BIGINT sum_k,
       max((props::JSON ->> 'k')::BIGINT)::BIGINT max_k
FROM events GROUP BY 1 ORDER BY 1
""",
    }
    # full-probe IVF is exact — same result set as brute-force cosine
    sql["ann_ivf_full_probe"] = sql["ann_cosine_topk"]
    # multimodal metadata decode: byte-level truth DuckDB can recompute
    # video decode vs the ground-truth meta JSON of the same parquet
    try:
        from engine.ops.multimodal import y4m_oracle_corpus_path

        _y4m_path = y4m_oracle_corpus_path()
        sql["mm_video_meta"] = f"""
SELECT id::BIGINT id,
       (meta::JSON ->> 't')::BIGINT n_frames,
       (meta::JSON ->> 'h')::BIGINT h,
       (meta::JSON ->> 'w')::BIGINT w
FROM read_parquet('{_y4m_path}') ORDER BY id
"""
    except OSError:
        pass
    sql["mm_decode_meta"] = """
SELECT doc_id,
       octet_length(encode(text))::BIGINT n_bytes,
       (octet_length(encode(text)) % 640)::BIGINT width,
       (octet_length(encode(text)) % 480)::BIGINT height
FROM documents ORDER BY doc_id
"""
    # This oracle materializes its profile artifact from the pinned sf0.001
    # sample at dict-build time; if that dataset is absent (non-driver
    # environment) degrade ONLY this entry to the rows-only check instead of
    # breaking every oracle in the dict.
    try:
        sql["ta_lang_id_scored"] = _lang_id_scored_sql()
    except OSError:
        pass
    # clean_corpus embeds the lang-ID oracle as a derived table, so it
    # degrades with it
    try:
        sql["clean_corpus"] = _clean_corpus_sql()
    except OSError:
        pass
    # same degrade rule: the approximate-IVF oracle reads the engine's
    # persisted assignments for the pinned correctness dataset (sf0.01)
    try:
        sql["ann_ivf_topk"] = _ann_ivf_topk_sql()
    except OSError:
        pass
    # partial oracle: pair logic replayed from the materialized signatures
    try:
        sql["dedup_simhash_pairs"] = _dedup_simhash_sql()
    except OSError:
        pass
    # same seam for MinHash-LSH candidates: bucket/pair/cross-band logic
    # replayed from the materialized banding signatures
    try:
        sql["dedup_minhash_candidates"] = _dedup_minhash_candidates_sql()
    except OSError:
        pass
    # PQ/ADC is int64-exact end-to-end, so the oracle replays the WHOLE
    # approximate path (codebook distances + code-table sum + top-k) from
    # the persisted artifacts; degrades with the pinned dataset like IVF
    try:
        sql["ann_pq_topk"] = _ann_pq_topk_sql()
    except OSError:
        pass
    # IVF-PQ: probe restriction + exact ADC replay, both from artifacts
    try:
        sql["ann_ivfpq_topk"] = _ann_ivfpq_topk_sql()
    except OSError:
        pass
    try:
        sql["ann_ivfpq_residual_topk"] = _ann_ivfpq_residual_topk_sql()
    except OSError:
        pass
    # HTML extraction + link rollup read the materialized HTML corpus
    # derived from the pinned sf0.01 documents; degrade like the ANN family
    try:
        sql["ta_html_extract"] = _ta_html_extract_sql()
    except OSError:
        pass
    try:
        sql["ta_link_hosts"] = _ta_link_hosts_sql()
    except OSError:
        pass
    sql["dedup_span_coverage"] = _span_coverage_sql()
    return sql
