"""Shared scaffolding for RESUMABLE partitioned parquet sinks.

The repo's sink protocol (established by
``pipelines/crawl_pipeline.py:extract_all_to_parquet`` and shared by
every corpus-manifest twin): output is partitioned into
``shard=NNNN/`` directories, each committed by a ``_SUCCESS`` marker
written AFTER its parquet (marker-last). A re-invoked run skips
finished shards, wipes and rewrites incomplete ones — so a failed
100 TB job resumes at shard granularity instead of restarting, and
output is never one giant file.
"""
from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor


def all_shards_done(out_dir: str, n_shards: int) -> bool:
    """True when every shard's ``_SUCCESS`` marker exists — callers
    check this BEFORE building the (possibly expensive) slim input
    pass so a fully-finished resume costs nothing."""
    return all(
        os.path.exists(os.path.join(out_dir, f"shard={s:04d}", "_SUCCESS"))
        for s in range(n_shards)
    )


def run_resumable_shards(
    out_dir: str,
    n_shards: int,
    window: int,
    write_shard: Callable[[int, str], None],
) -> dict:
    """Run ``write_shard(shard_id, dest_dir)`` for every shard whose
    ``_SUCCESS`` marker is missing, ``window`` at a time (each call is
    expected to launch its own Dataset execution — the thread pool
    overlaps those executions). Partial output of a crashed run is
    wiped before rewrite; the marker commits last. Returns
    ``{"written": n, "skipped": n}``."""
    todo, skipped = [], 0
    for s in range(n_shards):
        dest = os.path.join(out_dir, f"shard={s:04d}")
        if os.path.exists(os.path.join(dest, "_SUCCESS")):
            skipped += 1
        else:
            todo.append((s, dest))
    if not todo:
        return {"written": 0, "skipped": skipped}

    def run_one(job: tuple[int, str]) -> None:
        s, dest = job
        shutil.rmtree(dest, ignore_errors=True)
        write_shard(s, dest)
        with open(os.path.join(dest, "_SUCCESS"), "w") as f:
            f.write("")

    with ThreadPoolExecutor(max_workers=max(1, window)) as pool:
        list(pool.map(run_one, todo))
    return {"written": len(todo), "skipped": skipped}
