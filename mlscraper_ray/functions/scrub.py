"""Corpus-level text SCRUBBING operators — rewrites that remove
duplicated or degenerate spans while keeping every document:

- :func:`dedup_segments`: MassiveText/RefinedWeb-style duplicated-
  segment removal. Documents are chunked into non-overlapping
  ``seg_words``-word segments; any segment whose exact text appears in
  MORE THAN ONE document is removed from ALL documents (boilerplate
  headers/footers, license blocks, navigation chrome). Unlike
  doc-level dedup (functions/dedup.py) this rewrites document BODIES.
- :func:`collapse_repeats`: C4-style consecutive-duplicate-token
  collapse ("batch batch batch" -> "batch"), a pure streaming map.

Plan shape for dedup_segments (100 TB-ready, mirrors
curate.decontaminate_survivors):
1. one slim pass computes per-doc DISTINCT segments and ships only
   (segment string, 1) rows — exact strings, no hash collisions;
2. segment document-frequency = coarse-bucket aggregate
   (functions/bucketed.py); duplicated segments are the df > 1 rows;
3. path choice by the duplicated-segment COUNT (the repo's
   count-based idiom): small -> ``ray.put`` the set once and rewrite
   every doc in one broadcast streaming pass (text never shuffles);
   large -> bucketed join-back: segments ride crc32 buckets with the
   dup set, per-bucket ``isin`` flags them, and documents reassemble
   in a doc-bucket groupby (text crosses the wire once per shuffle,
   co-partitioned — never driver-sized).

All arithmetic is integer and the segment/token rules are reproduced
term-for-term by DEDUP_SEGMENTS_SQL / COLLAPSE_REPEATS_SQL, so both
operators are DuckDB hash-checked end to end.
"""
from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from mlscraper_ray.functions.broadcast import cached_object

from mlscraper_ray.functions.bucketed import bucketed_aggregate
from mlscraper_ray.functions.joins import adaptive_n_buckets


def _segments(text: str, seg_words: int) -> list[str]:
    """Non-overlapping ``seg_words``-word chunks (last may be shorter).
    ``str.split()`` == DuckDB ``regexp_split_to_array(trim(text),
    '\\s+')`` on non-blank text; blank text yields no segments."""
    words = text.split()
    return [" ".join(words[i : i + seg_words]) for i in range(0, len(words), seg_words)]


def dedup_segments_ds(
    sf_dir: str,
    seg_words: int = 8,
    broadcast_limit: int = 2_000_000,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Remove every segment that appears in >1 distinct document;
    returns (doc_id, clean_text, n_segs_removed) for EVERY input doc
    as a streaming Dataset. ``n_segs_removed`` counts removed
    occurrences (a segment repeated inside one doc but shared with
    another is removed everywhere and counted each time)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def doc_distinct_segs(batch: pa.Table) -> pa.Table:
        segs: list[str] = []
        for text in batch["text"].to_pylist():
            segs.extend(set(_segments(text, seg_words)))
        return pa.table({"seg": pa.array(segs, pa.string())})

    df_counts = bucketed_aggregate(
        docs.map_batches(doc_distinct_segs, batch_format="pyarrow"),
        ["seg"],
        {"df": ("seg", "count")},
    )
    dup_rows = df_counts.map_batches(
        lambda d: d.loc[d["df"] > 1, ["seg"]], batch_format="pandas"
    ).materialize()
    n_dup = dup_rows.count()

    if n_dup <= broadcast_limit:
        dup_ref = ray.put(set(dup_rows.to_pandas()["seg"]))

        def rewrite(batch: pa.Table) -> pa.Table:
            dup = cached_object(dup_ref)
            ids, cleans, removed = [], [], []
            for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
                segs = _segments(text, seg_words)
                kept = [s for s in segs if s not in dup]
                ids.append(doc_id)
                cleans.append(" ".join(kept))
                removed.append(len(segs) - len(kept))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "clean_text": pa.array(cleans, pa.string()),
                    "n_segs_removed": pa.array(removed, pa.int64()),
                }
            )

        return docs.map_batches(rewrite, batch_format="pyarrow")

    # join-back path: nothing driver-sized. Segments (with their doc
    # slot) and the dup set meet in crc32(seg) buckets; flagged rows
    # then reassemble per doc in a doc-hash bucket groupby.
    if n_buckets is None:
        n_buckets = adaptive_n_buckets(docs.count())

    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, segs, buckets = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            doc_segs = _segments(text, seg_words)
            if not doc_segs:
                # carrier row so blank docs still reach the output;
                # "" is never a real segment (segments are non-empty
                # word joins) and is skipped at reassembly (idx -1)
                ids.append(doc_id)
                idxs.append(-1)
                segs.append("")
                buckets.append(zlib.crc32(b"") % n_buckets)
                continue
            for i, s in enumerate(doc_segs):
                ids.append(doc_id)
                idxs.append(i)
                segs.append(s)
                buckets.append(zlib.crc32(s.encode()) % n_buckets)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "seg_idx": pa.array(idxs, pa.int64()),
                "seg": pa.array(segs, pa.string()),
                "bucket": pa.array(buckets, pa.int32()),
                "side": pa.array(["t"] * len(ids), pa.string()),
            }
        )

    def tag_dup(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": pa.array([-1] * n, pa.int64()),
                "seg_idx": pa.array([-1] * n, pa.int64()),
                "seg": batch["seg"],
                "bucket": pa.array(
                    [zlib.crc32(s.encode()) % n_buckets for s in batch["seg"].to_pylist()],
                    pa.int32(),
                ),
                "side": pa.array(["d"] * n, pa.string()),
            }
        )

    unioned = docs.map_batches(explode, batch_format="pyarrow").union(
        dup_rows.map_batches(tag_dup, batch_format="pyarrow")
    )

    def flag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dup = set(g.loc[g["side"] == "d", "seg"])
        t = g[g["side"] == "t"]
        if t.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "seg_idx": pd.Series(dtype="int64"),
                    "seg": pd.Series(dtype=str),
                    "keep": pd.Series(dtype="bool"),
                    "doc_bucket": pd.Series(dtype="int32"),
                }
            )
        out = pd.DataFrame(
            {
                "doc_id": t["doc_id"].astype("int64"),
                "seg_idx": t["seg_idx"].astype("int64"),
                "seg": t["seg"],
                "keep": ~t["seg"].isin(dup),
            }
        )
        out["doc_bucket"] = (out["doc_id"] % n_buckets).astype("int32")
        return out

    flagged = unioned.groupby("bucket").map_groups(flag_bucket, batch_format="pandas")

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or "doc_id" not in g.columns:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "clean_text": pd.Series(dtype=str),
                    "n_segs_removed": pd.Series(dtype="int64"),
                }
            )
        rows = []
        for doc_id, d in g.groupby("doc_id", sort=False):
            d = d.sort_values("seg_idx")
            real = d[d["seg_idx"] >= 0]
            kept = real.loc[real["keep"], "seg"]
            rows.append((int(doc_id), " ".join(kept), int((~real["keep"]).sum())))
        return pd.DataFrame(rows, columns=["doc_id", "clean_text", "n_segs_removed"])

    return flagged.groupby("doc_bucket").map_groups(reassemble, batch_format="pandas")


def dedup_segments(sf_dir: str, seg_words: int = 8, **kwargs) -> pa.Table:
    """Driver-table wrapper for the compare contract (sorted by
    doc_id); :func:`dedup_segments_ds` is the streaming form."""
    out = dedup_segments_ds(sf_dir, seg_words, **kwargs).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True).astype(
        {"doc_id": "int64", "n_segs_removed": "int64"}
    )
    return pa.Table.from_pandas(
        out[["doc_id", "clean_text", "n_segs_removed"]], preserve_index=False
    )


def dedup_segments_sql(seg_words: int = 8) -> str:
    return f"""
WITH words AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS word,
           generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS ord
    FROM documents WHERE trim(text) <> ''
),
segs AS (
    SELECT doc_id, (ord - 1) // {seg_words} AS seg_idx,
           string_agg(word, ' ' ORDER BY ord) AS seg
    FROM words GROUP BY doc_id, (ord - 1) // {seg_words}
),
df AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg),
marked AS (
    SELECT s.doc_id, s.seg_idx, s.seg, (d.df > 1) AS dup
    FROM segs s JOIN df d USING (seg)
),
agg AS (
    SELECT doc_id,
           COALESCE(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (NOT dup), '') AS clean_text,
           COUNT(*) FILTER (dup) AS n_segs_removed
    FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       CAST(COALESCE(a.n_segs_removed, 0) AS BIGINT) AS n_segs_removed
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


DEDUP_SEGMENTS_SQL = dedup_segments_sql()


def collapse_repeats(sf_dir: str) -> pa.Table:
    """Collapse runs of consecutive identical whitespace tokens to a
    single occurrence — the cheap repetition-cleanup pass (C4 uses the
    same idea at line level). Pure streaming map: no shuffle, no
    state; per-doc run detection is one numpy comparison."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        collapsed, removed = [], []
        for text in batch["text"]:
            words = text.split()
            if not words:
                collapsed.append("")
                removed.append(0)
                continue
            arr = np.asarray(words, dtype=object)
            keep = np.concatenate(([True], arr[1:] != arr[:-1]))
            collapsed.append(" ".join(arr[keep]))
            removed.append(int(len(arr) - keep.sum()))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "text_collapsed": collapsed,
                "n_removed": pd.Series(removed, dtype="int64", index=batch.index),
            }
        )

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


COLLAPSE_REPEATS_SQL = """
WITH words AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS word,
           generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS ord
    FROM documents WHERE trim(text) <> ''
),
lagd AS (
    SELECT doc_id, word, ord,
           lag(word) OVER (PARTITION BY doc_id ORDER BY ord) AS prev
    FROM words
),
agg AS (
    SELECT doc_id,
           string_agg(word, ' ' ORDER BY ord)
               FILTER (prev IS NULL OR word <> prev) AS text_collapsed,
           COUNT(*) FILTER (word = prev) AS n_removed
    FROM lagd GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.text_collapsed, '') AS text_collapsed,
       CAST(COALESCE(a.n_removed, 0) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""
