"""Keyword top-k search over the document corpus: BM25 ranking with
INTEGER fixed-point arithmetic — the lexical counterpart of the
`ann_*` embedding searches (public method: Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond").

All scoring terms are integers with explicit floor division, so the
whole ranking — corpus statistics, idf, tf saturation, final order —
is reproduced bit-for-bit by a DuckDB oracle (the repo-wide idiom;
float log-idf would not hash-match across engines):

- ``idf_m(t)   = (N * 1000) // df(t)``                (fixed-point 1/df)
- ``norm_m(d)  = 250 + (750 * len_d * N) // L``       (1000*(1-b+b*len/avg), b=0.75)
- ``sat_m(t,d) = (tf * 2_200_000_000) // (tf * 1_000_000 + 1200 * norm_m)``
  (1000 * tf*(k1+1)/(tf + k1*norm), k1=1.2 — the BM25 tf saturation)
- ``score_m(d) = sum_t (idf_m * sat_m) // 1000``

Plan shape (100 TB-ready): ONE tokenize pass emits a slim per-doc row
(doc_id, n_tokens, tf per query term — the term list is a tiny
constant); corpus stats (N, L, df) fold from per-batch integer
partials; scoring + per-batch partial top-k runs over the slim
materialized dataset, so the driver only ever sees k rows per block.
No shuffle anywhere — the only all-to-all a search needs is none.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# present in every sf tier of the synthetic corpus vocabulary
DEFAULT_TERMS = ("scan", "column", "window", "sort")


# token = maximal run of non-whitespace where whitespace is RE2's \s
# class [\t\n\f\r ] EXACTLY — pandas .str.split() would split on
# unicode whitespace (and python \s adds \v), silently diverging from
# the DuckDB mirror on e.g. a NBSP (the same re/RE2 parity discipline
# as the PII patterns)
_TOKEN_RE = r"[^\t\n\f\r ]+"


def _tf_fn(terms: tuple[str, ...]):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.lower().str.findall(_TOKEN_RE)
        out = {
            "doc_id": batch["doc_id"].astype("int64"),
            "n_tokens": toks.str.len().astype("int64"),
        }
        for i, t in enumerate(terms):
            # list.count is a C-level scan per document, not a token loop
            out[f"tf_{i}"] = toks.map(lambda ws, t=t: ws.count(t)).astype("int64")
        return pd.DataFrame(out)

    return fn


def bm25_topk(
    sf_dir: str, terms: tuple[str, ...] = DEFAULT_TERMS, k: int = 10
) -> pa.Table:
    """Top-k documents for a keyword query under integer BM25.

    Returns (doc_id, score_m, n_tokens) ordered by (score_m DESC,
    doc_id) — zero-score documents rank too, exactly like the SQL
    ``ORDER BY ... LIMIT k`` they are checked against."""
    m = len(terms)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    slim = ds.map_batches(_tf_fn(terms), batch_format="pandas").materialize()

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        row = {
            "n_docs": [np.int64(len(batch))],
            "total_tokens": [np.int64(batch["n_tokens"].sum())],
        }
        for i in range(m):
            row[f"df_{i}"] = [np.int64((batch[f"tf_{i}"] > 0).sum())]
        return pd.DataFrame(row)

    stats = slim.map_batches(stats_partial, batch_format="pandas").to_pandas().sum()
    n_docs = int(stats["n_docs"])
    total = max(1, int(stats["total_tokens"]))
    df_t = [int(stats[f"df_{i}"]) for i in range(m)]

    def score_topk(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        len_d = batch["n_tokens"].to_numpy(dtype=np.int64)
        if len(len_d):
            # exact pre-multiply bounds (python ints don't wrap): the
            # norm intermediate is 750 * len_d * N, and the saturation
            # numerator is tf * 2.2e9 with tf <= len_d
            mx = int(len_d.max())
            assert 750 * mx * n_docs < 2**63 and mx * 2_200_000_000 < 2**63, (
                "BM25 fixed-point intermediate would overflow int64 "
                "(doc length x corpus size too large for the scale)"
            )
        norm_m = 250 + (750 * len_d * n_docs) // total
        score = np.zeros(len(ids), dtype=np.int64)
        for i in range(m):
            if df_t[i] == 0:
                continue  # term absent from the corpus: contributes 0
            idf_m = (n_docs * 1000) // df_t[i]
            tf = batch[f"tf_{i}"].to_numpy(dtype=np.int64)
            sat_m = (tf * 2_200_000_000) // (tf * 1_000_000 + 1200 * norm_m)
            score += (idf_m * sat_m) // 1000
        # partial top-k: (score DESC, doc_id ASC), np.lexsort not
        # argpartition — boundary ties must match the oracle's ORDER BY
        order = np.lexsort((ids, -score))[:k]
        return pd.DataFrame(
            {
                "doc_id": ids[order],
                "score_m": score[order],
                "n_tokens": len_d[order],
            }
        )

    parts = slim.map_batches(score_topk, batch_format="pandas").to_pandas()
    order = np.lexsort((parts["doc_id"].to_numpy(), -parts["score_m"].to_numpy()))[:k]
    out = parts.iloc[order].reset_index(drop=True).astype(
        {"doc_id": "int64", "score_m": "int64", "n_tokens": "int64"}
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def bm25_topk_sql(terms: tuple[str, ...] = DEFAULT_TERMS, k: int = 10) -> str:
    """DuckDB oracle mirroring :func:`bm25_topk` term for term (same
    tokenization, same fixed-point formulas, same floor divisions —
    all operands non-negative, so ``//`` truncation == floor)."""
    tf_cols = ",\n           ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{i}" for i, t in enumerate(terms)
    )
    df_cols = ",\n           ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(terms))
    )
    term_sum = " + ".join(
        f"(CASE WHEN s.df_{i} = 0 THEN 0 ELSE "
        f"(((s.n_docs * 1000) // s.df_{i}) * "
        f"((tf_{i} * 2200000000) // (tf_{i} * 1000000 + 1200 * norm_m))) // 1000 END)"
        for i in range(len(terms))
    )
    return f"""
WITH tk AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[\\t\\n\\f\\r ]+'), x -> x <> '') AS w
    FROM documents
),
tf AS (
    SELECT doc_id, len(w) AS n_tokens,
           {tf_cols}
    FROM tk
),
s AS (
    SELECT COUNT(*) AS n_docs, CAST(GREATEST(1, SUM(n_tokens)) AS BIGINT) AS total_tokens,
           {df_cols}
    FROM tf
),
normed AS (
    SELECT tf.*, s.*,
           250 + (750 * tf.n_tokens * s.n_docs) // s.total_tokens AS norm_m
    FROM tf CROSS JOIN s
)
SELECT doc_id,
       CAST({term_sum.replace('s.', 'normed.')} AS BIGINT) AS score_m,
       n_tokens
FROM normed
ORDER BY score_m DESC, doc_id
LIMIT {k}
"""
