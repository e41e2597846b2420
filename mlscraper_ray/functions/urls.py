"""URL canonicalization + canonical-URL dedup.

Web crawls see the same page under many spellings — case-variant
hosts, default ports, tracking query params, fragments, trailing
slashes, shuffled query order. ``canonicalize_url`` normalizes one
URL with the real stdlib parser; ``url_canonical_dedup`` is the
corpus-level operator: canonicalize every URL, group by canonical
form, keep one representative per group (the crawl-frontier /
manifest dedup key).

Canonical form (documented contract, each rule unit-tested):
  - scheme and host lowercased;
  - default ports stripped (http:80, https:443);
  - fragment removed;
  - query params with a ``utm_``-prefixed key dropped (tracking);
  - remaining query params sorted by (key, value), duplicates kept;
  - trailing slashes stripped from the path.
Percent-encoding in the PATH is preserved as-is; query pairs go
through a parse_qsl/urlencode round trip, so equivalent query escape
spellings NORMALIZE (e.g. ``%20`` and ``+`` both canonicalize to
``+``) — the right behavior for a dedup key, documented because it
differs from byte-preservation. An authority whose port fails to
parse falls back to the lowercased raw netloc instead of raising
(a malformed frontier URL must not kill the batch).

The testdata tables carry no URL column, so the oracled query
synthesizes a DETERMINISTIC dirty-URL table from ``documents`` (five
spellings per doc covering every rule above — the north-rule "build
over a table of exactly that shape" discipline) and the DuckDB oracle
states each spelling's EXPECTED canonical as a literal expression:
the SQL never reimplements the parser, it asserts what the parser
must produce, so a canonicalization regression flips the hash.
"""
from __future__ import annotations

import os
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
import pyarrow as pa
import ray.data

from mlscraper_ray.functions.bucketed import bucketed_aggregate

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    if ":" in host:  # IPv6 literal: urlsplit strips the brackets
        host = f"[{host}]"
    try:
        port = parts.port
    except ValueError:  # malformed port: keep the authority verbatim
        netloc = parts.netloc.lower()
    else:
        netloc = host
        if parts.username is not None:
            cred = parts.username + (f":{parts.password}" if parts.password is not None else "")
            netloc = f"{cred}@{netloc}"
        if port is not None and _DEFAULT_PORTS.get(scheme) != str(port):
            netloc = f"{netloc}:{port}"
    path = parts.path.rstrip("/")
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not k.startswith("utm_")
    ]
    query = urlencode(sorted(q))
    return urlunsplit((scheme, netloc, path, query, ""))


class _VariantStage:
    """Synthesizes the deterministic five-spelling dirty-URL table and
    canonicalizes each spelling with the real parser (one batch map;
    a real deployment replaces this stage with its URL source)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        urls = []
        for doc_id, source in zip(batch["doc_id"], batch["source"]):
            base = f"https://{source}.example.com/docs/{doc_id}"
            urls.extend(
                [
                    base,
                    f"HTTPS://{source.upper()}.EXAMPLE.COM:443/docs/{doc_id}/",
                    base + "?utm_source=rss&utm_medium=feed#frag",
                    base + "?b=2&a=1",
                    base + "?a=1&b=2",
                ]
            )
        return pd.DataFrame(
            {
                "url": pd.Series(urls, dtype=str),
                "canonical_url": pd.Series(
                    [canonicalize_url(u) for u in urls], dtype=str
                ),
            }
        )


def url_canonical_dedup_ds(docs: ray.data.Dataset) -> ray.data.Dataset:
    exploded = docs.map_batches(_VariantStage, batch_format="pandas", concurrency=(1, 8))
    return bucketed_aggregate(
        exploded,
        ["canonical_url"],
        {"n_dups": ("url", "count"), "kept_url": ("url", "min")},
    )


def url_canonical_dedup(sf_dir: str) -> pa.Table:
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    out = url_canonical_dedup_ds(docs).to_pandas()
    out["n_dups"] = out["n_dups"].astype("int64")
    out = out[["canonical_url", "n_dups", "kept_url"]].sort_values(
        "canonical_url", ignore_index=True
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# Expected-value oracle: each synthesized spelling is listed with the
# canonical form the parser MUST produce (host case-fold + default
# port + trailing slash for v1, utm/fragment strip for v2, query sort
# for v3/v4). MIN(url) relies on DuckDB's binary collation matching
# Python's ASCII string ordering.
URL_CANONICAL_DEDUP_SQL = """
WITH v AS (
    SELECT 'https://' || source || '.example.com/docs/' || doc_id AS base,
           upper(source) AS us, doc_id
    FROM documents
),
variants AS (
    SELECT base AS url, base AS canonical FROM v
    UNION ALL
    SELECT 'HTTPS://' || us || '.EXAMPLE.COM:443/docs/' || doc_id || '/', base FROM v
    UNION ALL
    SELECT base || '?utm_source=rss&utm_medium=feed#frag', base FROM v
    UNION ALL
    SELECT base || '?b=2&a=1', base || '?a=1&b=2' FROM v
    UNION ALL
    SELECT base || '?a=1&b=2', base || '?a=1&b=2' FROM v
)
SELECT canonical AS canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_dups,
       MIN(url) AS kept_url
FROM variants
GROUP BY canonical
ORDER BY canonical
"""
