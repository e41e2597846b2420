"""Coarse-bucketed groupby-aggregate.

Ray Data's native ``groupby(...).aggregate(...)`` (2.49, sort-based)
has per-distinct-group overhead that makes high-cardinality aggregates
unusable: a 1.3M-row / 1M-group Count did not finish in 5 minutes on
32 cpus (measured in this repo), while the same data through this
helper takes ~2s. The pattern:

1. assign every row a coarse ``__bucket`` = content-hash(keys) mod B
   (B ~ hundreds; ``pd.util.hash_pandas_object`` — deterministic,
   process-independent, vectorized);
2. ONE Ray groupby over the B buckets (tiny key domain, so the sort
   shuffle is cheap and every map_groups call gets substantial work);
3. the real per-key aggregation runs vectorized in pandas inside each
   bucket.

Same all-to-all data movement as a native groupby (each row crosses
the wire once, co-partitioned by key), but the group-resolution cost
is pandas-vectorized instead of per-group scheduler overhead. This is
the repo-wide idiom for any aggregate whose distinct-key count scales
with the data (doc ids, url hashes, (a, b) pair keys, time windows).
"""
from __future__ import annotations

import pandas as pd
import ray.data


def bucketed_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_buckets: int = 241,
) -> ray.data.Dataset:
    """Group ``ds`` by ``keys`` computing ``aggs`` (out_col -> (in_col,
    op), op in {sum, min, max, count}) via the coarse-bucket pattern.
    Returns a Dataset with columns keys + aggs; 'count' counts rows."""
    named = {
        out: pd.NamedAgg(column=col, aggfunc=("size" if op == "count" else op))
        for out, (col, op) in aggs.items()
    }

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (
            pd.util.hash_pandas_object(df[keys], index=False) % n_buckets
        ).astype("int32")
        return df

    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(keys, sort=False)
            .agg(**named)
            .reset_index()
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(agg_bucket, batch_format="pandas")
    )


def coalesce_blocks(ds: ray.data.Dataset, approx_rows: int) -> ray.data.Dataset:
    """Bound block count before feeding a sort/groupby round. Ray's
    sort shuffle pays per-INPUT-BLOCK plan/sample overhead, so a wide
    union of hundreds of tiny blocks costs far more in fixed overhead
    than in data movement — measured 31.8s for a 416-tiny-block
    existence-filter sort at sf0.1, ~1s after coalescing (see
    functions/pagerank.py). ``repartition(shuffle=False)`` is a local
    block merge (no all-to-all); target ~200k rows per block, the
    same constant as the adaptive bucket formula."""
    nb = max(8, min(256, approx_rows // 200_000 + 8))
    return ds.repartition(nb, shuffle=False)
