"""Text-table sources: JSONL and CSV ingestion into the documents
schema (doc_id, text, lang, source, n_chars).

The reference has no I/O layer at all; a training-data pipeline needs
to ingest whatever the upstream dump format is. These wrap Ray's
native readers (file = block, so parallelism comes from sharding) and
normalize to the canonical documents schema with a vectorized
per-batch pass — downstream operators (dedup, textstats, tokenize)
are source-agnostic.
"""
from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DOC_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


def _normalize(batch: pa.Table) -> pa.Table:
    cols = {name: batch[name] for name in batch.column_names}
    if "n_chars" not in cols:
        cols["n_chars"] = pc.cast(pc.utf8_length(cols["text"]), pa.int64())
    if "lang" not in cols:
        cols["lang"] = pa.array(["und"] * batch.num_rows, pa.string())
    if "source" not in cols:
        cols["source"] = pa.array(["ingest"] * batch.num_rows, pa.string())
    cols["doc_id"] = pc.cast(cols["doc_id"], pa.int64())
    return pa.table({name: cols[name] for name in DOC_COLUMNS})


def read_documents_jsonl(path: str) -> ray.data.Dataset:
    """Sharded JSONL (one object per line with at least doc_id+text)
    -> documents-schema Dataset."""
    return ray.data.read_json(path).map_batches(_normalize, batch_format="pyarrow")


def read_documents_csv(path: str) -> ray.data.Dataset:
    """Sharded CSV (header with at least doc_id,text) ->
    documents-schema Dataset."""
    return ray.data.read_csv(path).map_batches(_normalize, batch_format="pyarrow")


def export_documents_jsonl(sf_dir: str, out_dir: str) -> int:
    """documents parquet -> sharded JSONL (each task writes its own
    shard; streaming, no driver funnel). Returns row count."""
    os.makedirs(out_dir, exist_ok=True)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    ds.write_json(out_dir)
    return ray.data.read_json(out_dir).count()
