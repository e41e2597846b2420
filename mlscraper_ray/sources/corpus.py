"""Host-bucket corpus access: the fetch stage's lookup join.

The corpus is laid out as ``pages/hb=NNNN/part-*.parquet`` with
``hb = crc32(host) % n_buckets`` (see corpusgen). "Fetching" a URL is
a lookup join of frontier rows against their bucket file — the
Ray-Data translation of an HTTP fetch in this sandbox (no network),
and of an index-backed WARC store at 100 TB.

Scale notes:
- a bucket file is read once per (actor, bucket) and LRU-cached, so a
  fetch stage with an actor pool amortizes reads across batches;
  routing admitted URLs so batches are bucket-coherent (the crawler
  repartitions by bucket hash) keeps the cache hit rate high.
- reads prune to the needed columns only.
"""
from __future__ import annotations

import glob
import os
from collections import OrderedDict

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mlscraper_ray.sources.corpusgen import host_bucket, url_host


class CorpusReader:
    def __init__(self, corpus_dir: str, n_buckets: int, cache_buckets: int = 32):
        self.pages_dir = os.path.join(corpus_dir, "pages")
        self.n_buckets = n_buckets
        self.cache_buckets = cache_buckets
        self._cache: OrderedDict[tuple, pa.Table] = OrderedDict()

    def bucket_table(self, hb: int, columns: tuple = ("url", "warc_ts", "html")) -> pa.Table:
        key = (hb, columns)
        table = self._cache.get(key)
        if table is None:
            files = sorted(glob.glob(os.path.join(self.pages_dir, f"hb={hb:04d}", "*.parquet")))
            if not files:
                table = pa.table({c: [] for c in columns})
            else:
                parts = [pq.read_table(f, columns=list(columns)) for f in files]
                table = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
            self._cache[key] = table
            if len(self._cache) > self.cache_buckets:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(key)
        return table

    def lookup(self, urls: list[str], columns: tuple = ("url", "warc_ts", "html")) -> pa.Table:
        """Rows for the given urls (present ones only), grouped by
        bucket, within-bucket in corpus (url-sorted) order."""
        by_bucket: dict[int, list[str]] = {}
        for u in urls:
            by_bucket.setdefault(host_bucket(url_host(u), self.n_buckets), []).append(u)
        parts = []
        for hb in sorted(by_bucket):
            table = self.bucket_table(hb, columns)
            mask = pc.is_in(table["url"], value_set=pa.array(by_bucket[hb], pa.string()))
            part = table.filter(mask)
            if part.num_rows:
                parts.append(part)
        if not parts:
            return pa.table({c: [] for c in columns})
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    def get_text(self, url: str) -> str | None:
        """Single-row text lookup (robots bodies)."""
        t = self.lookup([url], columns=("url", "text"))
        return t["text"][0].as_py() if t.num_rows else None
