"""Distributed BSP crawl driver: rounds of
submit -> admit -> fetch/parse/extract -> link discovery -> checkpoint.

Ray-Data-first structure per round k:

1. **submit**: seeds (round 0 only) go through a per-batch min-depth
   pre-dedup -> ``map_batches(submit_fn)`` routing rows to the owning
   :class:`FrontierShard` actor. Rounds >= 1 have no submit pass at
   all: the previous round's fetch/extract stage pushed discovered
   links to the shards in-stage. Either way the shard round buffer
   resolves the global min depth per url (min is commutative, so this
   replaces a per-round all-to-all ``groupby(url).min(depth)`` with
   shard-local state; seen-set dedup + robots gating happen at the
   admit flush).
2. **admit**: each shard actor emits its politeness-admitted rows
   pre-split into corpus-bucket-aligned parts (``admit_parts`` with
   ``num_returns``); ``ray.data.from_arrow_refs`` assembles ~shards x
   parts blocks without driver materialization — full fetch-pool
   parallelism with no Dataset shuffle, and each block touches only a
   slice of the corpus bucket files.
3. **fetch+parse+extract**: ``map_batches(fetch_parse_extract_task)``
   over the bucket-aligned blocks ->
   ``write_parquet(out/rounds/round=K/results)``. html bytes live only
   inside this stage; per-host skew is bounded by the politeness
   budget, the bucket-part interleaving, and hot-host salting
   (``FrontierShard.admit_parts``).
4. **checkpoint**: every shard snapshots (bloom + heaps + robots +
   counters) to ``out/checkpoint/round=K/shard-i.bin``; the driver
   writes ``MANIFEST.json`` last — the atomic commit point.

Resume: :func:`RayCrawler.resume` loads the latest complete manifest,
restores every shard, and continues with round K+1 — producing
byte-identical output to an uninterrupted run (tested).

Determinism: crawl order is a pure function of (corpus, seeds,
config). Ordering comes from data keys — (depth, warc_ts, url) heaps, per-host
token quotas, BSP barriers — never from task arrival order, so Ray's
scheduling nondeterminism cannot leak into results. The canonical
order is materialized by :func:`crawl_order` as
sort by (round, depth, host, url).
"""
from __future__ import annotations

import glob
import json
import os
import re
import time

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from mlscraper_ray.frontier.config import CrawlConfig
from mlscraper_ray.frontier.shard import FrontierShard
from mlscraper_ray.stages.crawl_stages import fetch_parse_extract_task, make_submit_fn


def _batch_min_depth(batch: pa.Table) -> pa.Table:
    """Per-batch candidate pre-dedup (min depth per url). The GLOBAL
    min-per-url is resolved inside the owning shard's round buffer —
    min is commutative, so no cross-batch shuffle is needed; this
    partial pass just shrinks the actor-RPC volume."""
    grouped = batch.group_by("url").aggregate([("depth", "min")])
    # select by NAME: aggregate output column order differed across
    # pyarrow versions (keys-first vs aggregates-first)
    return pa.table({"url": grouped["url"], "depth": grouped["depth_min"]})


def _round_dir(out_dir: str, k: int) -> str:
    return os.path.join(out_dir, "rounds", f"round={k}")


def _ckpt_dir(out_dir: str, k: int) -> str:
    return os.path.join(out_dir, "checkpoint", f"round={k}")


class RayCrawler:
    def __init__(self, corpus_dir: str, out_dir: str, config: CrawlConfig):
        self.corpus_dir = corpus_dir
        self.out_dir = out_dir
        self.cfg = config
        remote_shard = ray.remote(FrontierShard)
        # num_cpus=0: shard actors are lightweight bookkeeping; on a real
        # cluster give them fractional CPUs and spread across nodes.
        self.shards = [
            remote_shard.options(num_cpus=0).remote(i, config.to_dict(), corpus_dir)
            for i in range(config.n_shards)
        ]
        self._fetch_parallelism = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
        self._prev_admitted: int | None = None

    # -- round primitives ----------------------------------------------
    def _submit_dataset(self, candidates: ray.data.Dataset) -> dict:
        submit_fn = make_submit_fn(self.shards, self.cfg.n_shards)
        counter_rows = candidates.map_batches(
            submit_fn, batch_format="pyarrow", batch_size=4096
        ).take_all()
        totals: dict = {}
        for row in counter_rows:
            for key, value in row.items():
                totals[key] = totals.get(key, 0) + value
        return totals

    def _admit(self) -> tuple[ray.data.Dataset, int]:
        # each shard splits its admitted rows into bucket-aligned parts
        # (part = corpus_bucket % n_parts) so the fetch stage gets
        # ~n_shards x n_parts blocks, each touching only
        # n_buckets/n_parts corpus bucket files. This restores full
        # pool parallelism WITHOUT a Dataset shuffle and without the
        # blind-repartition failure mode where every worker cold-reads
        # every bucket (both variants measured slower at sf0.3).
        #
        # ADAPTIVE part count: small rounds must not be shredded into
        # tiny tasks (at sf0.1 a 1,200-url round over 32 parts is ~37
        # urls/task and per-task overhead dominates — measured: 7 cpus
        # == 28 cpus). Size parts so blocks carry >= ~192 urls, using
        # the previous round's admitted count as the (deterministic)
        # estimate; cap at the pool-parallelism split for big rounds.
        pool_cap = max(
            1,
            min(self.cfg.n_buckets, round(self._fetch_parallelism / self.cfg.n_shards)),
        )
        if self._prev_admitted is None:
            n_parts = pool_cap
        else:
            per_block = max(1, self.cfg.fetch_rows_per_block)
            by_size = max(1, round(self._prev_admitted / (self.cfg.n_shards * per_block)))
            n_parts = min(pool_cap, by_size)
        refs = []
        for s in self.shards:
            if n_parts == 1:
                refs.append(s.admit_parts.remote(1))
            else:
                refs.extend(s.admit_parts.options(num_returns=n_parts).remote(n_parts))
        counts = ray.get([s.last_admitted.remote() for s in self.shards])
        ds = ray.data.from_arrow_refs(refs)
        self._prev_admitted = sum(counts)
        return ds, sum(counts)

    def _fetch_extract(self, admitted: ray.data.Dataset, k: int, n_admitted: int = 0) -> str:
        results_dir = os.path.join(_round_dir(self.out_dir, k), "results")
        # blocks arrive bucket-aligned from admit_parts (see _admit);
        # per-host skew within a round is bounded by the politeness
        # token budget, and hosts hot enough to dominate a part are
        # salted round-robin across parts (shard.admit_parts)
        stage = admitted.map_batches(
            fetch_parse_extract_task,
            fn_kwargs={
                "corpus_dir": self.corpus_dir,
                "n_buckets": self.cfg.n_buckets,
                "plan": self.cfg.plan,
                "round_k": k,
                # in-stage link submission: round k+1's candidates go
                # straight to their shard actors, not through parquet
                "shard_handles": self.shards,
                "n_shards": self.cfg.n_shards,
            },
            batch_format="pyarrow",
            batch_size=256,
        )
        stage.write_parquet(results_dir)
        return results_dir

    def _round_lineage(self, k: int) -> dict:
        """Per-partition lineage for round k: every results file with
        its row count and content hash, so a resume (or an auditor) can
        check exactly which partitions are complete and unchanged."""
        import hashlib

        files = []
        for path in sorted(
            glob.glob(os.path.join(_round_dir(self.out_dir, k), "results", "*.parquet"))
        ):
            h = hashlib.sha256()
            with open(path, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            files.append(
                {
                    "file": os.path.basename(path),
                    "bytes": os.path.getsize(path),
                    "rows": pq.read_metadata(path).num_rows,
                    "sha256": h.hexdigest(),
                }
            )
        return {"results_files": files, "n_rows": sum(f["rows"] for f in files)}

    def _checkpoint(self, k: int, round_stats: dict) -> None:
        ckpt = _ckpt_dir(self.out_dir, k)
        os.makedirs(ckpt, exist_ok=True)
        ray.get(
            [
                s.checkpoint_to.remote(os.path.join(ckpt, f"shard-{i}.bin"))
                for i, s in enumerate(self.shards)
            ]
        )
        counters = ray.get([s.get_counters.remote() for s in self.shards])
        manifest = {
            "round": k,
            "config": self.cfg.to_dict(),
            "round_stats": round_stats,
            "shard_counters": counters,
            "n_shards": self.cfg.n_shards,
            "lineage": self._round_lineage(k),
        }
        tmp = os.path.join(ckpt, "MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, os.path.join(ckpt, "MANIFEST.json"))
        self._prune_checkpoints()

    def _prune_checkpoints(self) -> None:
        """Retention policy (config.keep_checkpoints): after a commit,
        drop all but the newest K COMPLETE checkpoints. Pruning only
        ever runs AFTER the new manifest is in place, so a crash
        mid-prune still leaves a complete latest checkpoint to resume
        from; manifest-less (crashed) round dirs are left for resume's
        partial-output cleanup."""
        keep = self.cfg.keep_checkpoints
        if keep <= 0:
            return
        import shutil

        complete = sorted(
            int(os.path.basename(os.path.dirname(m)).split("=")[1])
            for m in glob.glob(
                os.path.join(self.out_dir, "checkpoint", "round=*", "MANIFEST.json")
            )
        )
        for old in complete[:-keep]:
            shutil.rmtree(_ckpt_dir(self.out_dir, old), ignore_errors=True)

    # -- main loop ------------------------------------------------------
    def run(self, seeds_path: str | None = None, start_round: int = 0) -> dict:
        os.makedirs(self.out_dir, exist_ok=True)
        stats: dict = {"rounds": []}
        for k in range(start_round, self.cfg.max_rounds):
            if k == 0:
                # seeds are the only candidates that enter through a
                # dedicated submit pass; rounds >= 1 get their candidates
                # pushed from inside the previous fetch/extract stage
                # (round buffers are part of the checkpoint, so resume
                # needs no re-read either)
                seeds = ray.data.read_parquet(
                    seeds_path or os.path.join(self.corpus_dir, "seeds.parquet"),
                    columns=["url", "depth"],
                ).map_batches(_batch_min_depth, batch_format="pyarrow")
                self._submit_dataset(seeds)
            t0 = time.monotonic()
            admitted, n_admitted = self._admit()
            t_admit = time.monotonic() - t0
            if n_admitted == 0:
                break
            t0 = time.monotonic()
            self._fetch_extract(admitted, k, n_admitted)
            t_fetch = time.monotonic() - t0
            t0 = time.monotonic()
            round_stats = {
                "round": k,
                "admitted": n_admitted,
                "sec_admit": round(t_admit, 3),
                "sec_fetch_extract": round(t_fetch, 3),
            }
            stats["rounds"].append(round_stats)
            self._checkpoint(k, round_stats)
            round_stats["sec_checkpoint"] = round(time.monotonic() - t0, 3)
        stats["seen"] = sum(ray.get([s.seen_count.remote() for s in self.shards]))
        stats["counters"] = {}
        for c in ray.get([s.get_counters.remote() for s in self.shards]):
            for key, value in c.items():
                stats["counters"][key] = stats["counters"].get(key, 0) + value
        with open(os.path.join(self.out_dir, "metrics.json"), "w") as f:
            json.dump(stats, f, sort_keys=True)
        return stats

    # -- resume ---------------------------------------------------------
    @classmethod
    def latest_complete_round(cls, out_dir: str) -> int | None:
        rounds = []
        for path in glob.glob(os.path.join(out_dir, "checkpoint", "round=*", "MANIFEST.json")):
            m = re.search(r"round=(\d+)", path)
            if m:
                rounds.append(int(m.group(1)))
        return max(rounds) if rounds else None

    @classmethod
    def resume(cls, corpus_dir: str, out_dir: str) -> "tuple[RayCrawler, int]":
        k = cls.latest_complete_round(out_dir)
        assert k is not None, "no complete checkpoint to resume from"
        ckpt = _ckpt_dir(out_dir, k)
        with open(os.path.join(ckpt, "MANIFEST.json")) as f:
            manifest = json.load(f)
        crawler = cls(corpus_dir, out_dir, CrawlConfig.from_dict(manifest["config"]))
        ray.get(
            [
                s.restore_from.remote(os.path.join(ckpt, f"shard-{i}.bin"))
                for i, s in enumerate(crawler.shards)
            ]
        )
        # discard any partial output after the checkpointed round
        for rd in glob.glob(os.path.join(out_dir, "rounds", "round=*")):
            m = re.search(r"round=(\d+)", rd)
            if m and int(m.group(1)) > k:
                import shutil

                shutil.rmtree(rd)
        return crawler, k + 1


@ray.remote
def _rank_block(block: pa.Table, offset: int) -> pa.Table:
    import numpy as np

    return block.append_column(
        "rank", pa.array(np.arange(offset, offset + block.num_rows), pa.int64())
    )


def crawl_order_dataset(out_dir: str) -> ray.data.Dataset:
    """The canonical deterministic crawl order as a DISTRIBUTED
    Dataset: fetched urls sorted by (round, depth, host, url) with a
    global rank column.

    Scale path (nothing row-sized touches the driver):
    1. ``read_parquet`` over the per-round results (column-pruned);
    2. per-batch ``fetch_ok`` filter;
    3. Ray Data distributed sort on the total key — url is unique, so
       block boundaries are value-deterministic;
    4. rank = exclusive prefix sum of per-block row counts (driver
       reads only O(n_blocks) METADATA via ``iter_internal_ref_bundles``,
       never block contents) + a per-block arange added by remote tasks.
    """
    results = sorted(glob.glob(os.path.join(out_dir, "rounds", "round=*", "results", "*.parquet")))
    ds = ray.data.read_parquet(results, columns=["round", "depth", "host", "url", "fetch_ok"])

    def keep_fetched(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["fetch_ok"]).drop_columns(["fetch_ok"])

    sorted_ds = ds.map_batches(keep_fetched, batch_format="pyarrow").sort(
        ["round", "depth", "host", "url"]
    )
    block_refs, counts = [], []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for block_ref, block_md in zip(bundle.block_refs, bundle.metadata):
            block_refs.append(block_ref)
            counts.append(block_md.num_rows)
    offset = 0
    ranked_refs = []
    for block_ref, n in zip(block_refs, counts):
        ranked_refs.append(_rank_block.remote(block_ref, offset))
        offset += n
    return ray.data.from_arrow_refs(ranked_refs)


def crawl_order(out_dir: str) -> pa.Table:
    """Driver-contract convenience: the distributed crawl order pulled
    into one Arrow table (test-scale result; at the 10^10-url design
    point consume :func:`crawl_order_dataset` with ``write_parquet``)."""
    out = crawl_order_dataset(out_dir).to_pandas()
    return pa.Table.from_pandas(out, preserve_index=False)
