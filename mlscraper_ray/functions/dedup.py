"""Deduplication operators over document tables.

All are shaped for 100 TB: per-batch vectorized signature computation
(``map_batches``), signature-keyed shuffles on SLIM rows (doc_id +
signature, never full text), and pair verification that rejoins text
only for the (tiny) candidate set.

- exact: content-hash groupby (hash column, not text, crosses the wire)
- MinHash + LSH: shingle -> k minhashes -> b bands -> band-bucket
  groupby -> candidate pairs -> exact-Jaccard verify
- SimHash: 64-bit simhash; near-dups via 4x16-bit band buckets
  (Hamming <= 3 guarantee by pigeonhole over candidate checks)
"""
from __future__ import annotations

import hashlib
import os
import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _ncpus() -> int:
    return int(ray.cluster_resources().get("CPU", 8))

# -- exact dedup ---------------------------------------------------------


def exact_dedup(sf_dir: str) -> pa.Table:
    """Exact duplicate groups by md5(text): one row per distinct text
    with the surviving (minimum) doc_id and the duplicate count."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"h": pa.array(hashes, pa.string()), "doc_id": batch["doc_id"]})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    out = (
        hashed.groupby("h")
        .aggregate(
            ray.data.aggregate.Min("doc_id", alias_name="doc_id"),
            ray.data.aggregate.Count(alias_name="n_dups"),
        )
        .to_pandas()
        .sort_values("h", ignore_index=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


EXACT_DEDUP_SQL = """
SELECT md5(text) AS h, MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents
GROUP BY md5(text)
ORDER BY h
"""


# -- minhash + LSH -------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def word_shingles(text: str, n: int = 3) -> set[int]:
    words = text.split()
    if len(words) < n:
        return {zlib.crc32(" ".join(words).encode())} if words else set()
    return {zlib.crc32(" ".join(words[i : i + n]).encode()) for i in range(len(words) - n + 1)}


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a * x + b) mod p, vectorized over (perm, shingle)
    prods = (a[:, None] * vals[None, :] + b[:, None]) % _MERSENNE
    return prods.min(axis=1)


class MinHashStage:
    """Actor-pool stage: doc -> (band, bucket, doc_id) rows."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3, seed: int = 42):
        self.a, self.b = _perm_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_ids, buckets, doc_ids = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = minhash_signature(word_shingles(text, self.shingle_n), self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                band_ids.append(band)
                buckets.append(struct.unpack("<q", digest)[0])
                doc_ids.append(doc_id)
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "bucket": pa.array(buckets, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
            }
        )


def minhash_candidate_pairs(ds_docs: ray.data.Dataset, num_perm=64, bands=16, shingle_n=3, seed=42) -> pa.Table:
    """LSH candidate pairs: docs sharing any band bucket. The shuffle
    moves only (band, bucket, doc_id) rows."""
    sigs = ds_docs.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_n": shingle_n, "seed": seed},
        batch_format="pyarrow",
        concurrency=(1, _ncpus()),
    )

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    pairs = sigs.groupby(["band", "bucket"]).map_groups(pairs_in_group, batch_format="pandas")
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    pdf = pdf.drop_duplicates().sort_values(["doc_a", "doc_b"], ignore_index=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


def minhash_dedup(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """Near-duplicate pairs on documents: MinHash-LSH candidates, then
    exact word-3-gram Jaccard verification (text rejoined only for the
    candidate set via a broadcast lookup)."""
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    candidates = minhash_candidate_pairs(docs)
    if candidates.num_rows == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard_pct": pa.array([], pa.int64()),
            }
        )
    cand_ids = set(candidates["doc_a"].to_pylist()) | set(candidates["doc_b"].to_pylist())
    import pyarrow.parquet as pq

    texts_tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    mask = pc.is_in(texts_tbl["doc_id"], value_set=pa.array(sorted(cand_ids), pa.int64()))
    texts_tbl = texts_tbl.filter(mask)
    texts = dict(zip(texts_tbl["doc_id"].to_pylist(), texts_tbl["text"].to_pylist()))

    out_a, out_b, out_j = [], [], []
    for a_id, b_id in zip(candidates["doc_a"].to_pylist(), candidates["doc_b"].to_pylist()):
        sa, sb = word_shingles(texts[a_id]), word_shingles(texts[b_id])
        union = len(sa | sb)
        j = len(sa & sb) / union if union else 0.0
        if j >= threshold:
            out_a.append(a_id)
            out_b.append(b_id)
            out_j.append(int(round(j * 100)))
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard_pct": pa.array(out_j, pa.int64()),
        }
    )


# -- simhash -------------------------------------------------------------


def simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for word in set(text.split()):
        h = struct.unpack("<Q", hashlib.blake2b(word.encode(), digest_size=8).digest())[0]
        bits = np.unpackbits(np.frombuffer(struct.pack("<Q", h), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    return int(np.packbits((acc > 0).astype(np.uint8)).view(">u8")[0])


def simhash_table(sf_dir: str) -> pa.Table:
    """doc_id -> 64-bit simhash (as signed int64) + 4x16-bit band keys
    for near-dup bucketing."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sh = [simhash64(t) for t in batch["text"].to_pylist()]
        signed = [s - (1 << 64) if s >= (1 << 63) else s for s in sh]
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "simhash": pa.array(signed, pa.int64())})

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas().sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def simhash_neardup_pairs(ds_docs: ray.data.Dataset, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by simhash banding: 4 bands of 16 bits; any pair
    within Hamming distance 3 shares at least one exact band
    (pigeonhole). Bucket groupby -> in-bucket Hamming verify."""

    def sig(batch: pa.Table) -> pa.Table:
        bands, keys, ids, hashes = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            s = simhash64(text)
            for band in range(4):
                bands.append(band)
                keys.append((s >> (band * 16)) & 0xFFFF)
                ids.append(doc_id)
                hashes.append(s - (1 << 64) if s >= (1 << 63) else s)
        return pa.table(
            {
                "band": pa.array(bands, pa.int32()),
                "key": pa.array(keys, pa.int32()),
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array(hashes, pa.int64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].tolist()
        hs = [h & ((1 << 64) - 1) for h in g["simhash"].tolist()]
        out_a, out_b, out_d = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= max_hamming:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_d.append(d)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_d})

    res = (
        ds_docs.map_batches(sig, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(res) == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()), "hamming": pa.array([], pa.int64())}
        )
    res = res.drop_duplicates().sort_values(["doc_a", "doc_b"], ignore_index=True)
    return pa.Table.from_pandas(res, preserve_index=False)
