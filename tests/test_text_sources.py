"""JSONL/CSV document ingestion round-trips to the canonical schema."""
import csv
import json
import os

import pyarrow.parquet as pq


def test_jsonl_roundtrip(ray_session, tmp_path):
    from mlscraper_ray.sources.text import export_documents_jsonl, read_documents_jsonl

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "jsonl")
    n = export_documents_jsonl(sf, out)
    orig = pq.read_table(os.path.join(sf, "documents.parquet"))
    assert n == orig.num_rows

    back = read_documents_jsonl(out).to_pandas().sort_values("doc_id", ignore_index=True)
    odf = orig.to_pandas().sort_values("doc_id", ignore_index=True)
    assert back["text"].tolist() == odf["text"].tolist()
    assert back["n_chars"].tolist() == odf["n_chars"].tolist()
    assert list(back.columns) == ["doc_id", "text", "lang", "source", "n_chars"]


def test_csv_ingest_fills_missing_columns(ray_session, tmp_path):
    from mlscraper_ray.sources.text import read_documents_csv

    p = tmp_path / "docs.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "text"])
        w.writerow([1, "hello world"])
        w.writerow([2, "ray data pipelines"])
    out = read_documents_csv(str(p)).to_pandas().sort_values("doc_id", ignore_index=True)
    assert out["n_chars"].tolist() == [11, 18]
    assert out["lang"].tolist() == ["und", "und"]
    assert out["source"].tolist() == ["ingest", "ingest"]
