"""WARC-style source/sink for Common-Crawl-shaped page tables.

The reference has no I/O layer at all (callers hand in HTML strings,
/root/reference/mlscraper/html.py:189); Common Crawl, the workload this
engine's frontier is designed for, ships WARC. This module gives the
engine a WARC path without external deps:

- :func:`write_warc_from_pages` — pages Parquet -> sharded ``.warc.gz``
  files (one gzip member per record, like CC, so a reader can split
  on member boundaries; one file per input shard keeps the read
  parallel and the write resumable per shard).
- :func:`read_warc` — ``ray.data.read_binary_files`` over the shard
  files -> ``flat_map``-style per-batch record parse -> (url, warc_ts,
  html) rows. File = block, so parallelism comes from sharding, and
  record parsing is per-batch inside the stage (no driver loop).

Only the record fields this engine uses are written (WARC-Target-URI,
WARC-Date, Content-Length); this is a WARC subset, not a validator.
"""
from __future__ import annotations

import gzip
import os
from datetime import datetime, timezone

import pyarrow as pa
import ray.data

_CRLF = b"\r\n"


def _format_record(url: str, warc_ts, html: bytes) -> bytes:
    if hasattr(warc_ts, "to_pydatetime"):
        warc_ts = warc_ts.to_pydatetime()
    ts = (
        warc_ts.astimezone(timezone.utc)
        if warc_ts.tzinfo
        else warc_ts.replace(tzinfo=timezone.utc)
    )
    header = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        # WARC 1.1 allows fractional seconds; emit them only when
        # nonzero so whole-second archives keep the 1.0 byte format
        + b"WARC-Date: "
        + ts.strftime(
            "%Y-%m-%dT%H:%M:%S.%fZ" if ts.microsecond else "%Y-%m-%dT%H:%M:%SZ"
        ).encode()
        + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
    )
    return header + html + _CRLF + _CRLF


def write_warc_shard(table: pa.Table, path: str) -> int:
    """One .warc.gz shard: one gzip member per record (CC layout)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        for url, warc_ts, html in zip(
            table["url"].to_pylist(),
            table["warc_ts"].to_pylist(),
            table["html"].to_pylist(),
        ):
            f.write(gzip.compress(_format_record(url, warc_ts, html)))
    os.replace(tmp, path)
    return table.num_rows


def write_warc_from_pages(pages_dir: str, warc_dir: str) -> int:
    """Distributed pages-Parquet -> sharded WARC sink. Each map task
    writes its own shard file (named by task index via the url-hash of
    the first row — deterministic for a deterministic input), so the
    write streams and never funnels through the driver."""
    import zlib

    os.makedirs(warc_dir, exist_ok=True)
    ds = ray.data.read_parquet(pages_dir, columns=["url", "warc_ts", "html"])

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        shard_key = zlib.crc32(batch["url"][0].as_py().encode())
        path = os.path.join(warc_dir, f"shard-{shard_key:08x}.warc.gz")
        n = write_warc_shard(batch, path)
        return pa.table({"path": pa.array([path]), "n": pa.array([n], pa.int64())})

    written = ds.map_batches(write_batch, batch_format="pyarrow", batch_size=4096).to_pandas()
    return int(written["n"].sum())


def parse_warc_bytes(data: bytes) -> list[tuple[str, datetime, bytes]]:
    """Parse concatenated gzip members of WARC response records."""
    out = []
    # stdlib gzip handles multi-member streams; readers like Ray's
    # read_binary_files may have already decompressed by extension
    blob = gzip.decompress(data) if data[:2] == b"\x1f\x8b" else data
    pos = 0
    while pos < len(blob):
        header_end = blob.find(_CRLF + _CRLF, pos)
        if header_end < 0:
            break
        headers = {}
        for line in blob[pos:header_end].split(_CRLF)[1:]:
            key, _, value = line.partition(b": ")
            headers[key.decode().lower()] = value.decode()
        length = int(headers["content-length"])
        body_start = header_end + 4
        html = blob[body_start : body_start + length]
        raw_ts = headers["warc-date"]
        ts = datetime.strptime(
            raw_ts, "%Y-%m-%dT%H:%M:%S.%fZ" if "." in raw_ts else "%Y-%m-%dT%H:%M:%SZ"
        )
        out.append((headers["warc-target-uri"], ts, html))
        pos = body_start + length + 4  # skip record + trailing 2x CRLF
    return out


def read_warc(warc_dir: str) -> ray.data.Dataset:
    """Sharded .warc.gz -> Dataset of (url, warc_ts, html). One file
    per block; record parsing happens per batch inside the stage."""
    files = ray.data.read_binary_files(warc_dir, include_paths=False)

    def to_rows(batch: dict) -> pa.Table:
        urls, stamps, htmls = [], [], []
        for data in batch["bytes"]:
            for url, ts, html in parse_warc_bytes(bytes(data)):
                urls.append(url)
                stamps.append(ts)
                htmls.append(html)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(stamps, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return files.map_batches(to_rows, batch_format="numpy")
