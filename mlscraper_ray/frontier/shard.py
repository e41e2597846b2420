"""Frontier shard: the stateful heart of the crawl scheduler.

One shard owns every host with ``crc32(host) % n_shards == shard_id``
and holds, per the north-star design:

- the URL-seen set: a deterministic :class:`BloomFilter` (cuckoo
  variant available for delete-capable policies),
- per-host politeness state: a token-bucket refilled each BSP round
  (``tokens_per_round``), plus a robots.txt rules cache lazily loaded
  from the corpus,
- a per-host heap-based priority queue keyed ``(depth, warc_ts, url)``
  (the north-star key: host budget enforced structurally by the
  per-host token pop, then depth — BFS-flavored politeness — then the
  discovering page's capture time, then url as the deterministic
  total-order tiebreaker). The key is intrinsic to the row, never
  arrival-order, so parallel submission cannot change the crawl order.

The class is deliberately plain Python: the distributed crawler wraps
it in ``ray.remote`` (one actor per shard), while tests can drive it
in-process. All state round-trips through ``state_bytes``/``restore``
— the per-round checkpoint unit.

The reference has no counterpart to any of this (mlscraper never
fetches or schedules; the only fetch in its repo is ``requests.get``
in ``examples/quotes_to_scrape.py:16``) — semantics here are defined
by this engine and pinned by the single-process oracle crawler.
"""
from __future__ import annotations

import heapq
import pickle
from collections import Counter

import pyarrow as pa

from mlscraper_ray.frontier.config import CrawlConfig
from mlscraper_ray.frontier.robots import RobotsRules
from mlscraper_ray.sources.corpus import CorpusReader
from mlscraper_ray.sources.corpusgen import url_host
from mlscraper_ray.state.bloom import BloomFilter
from mlscraper_ray.state.cuckoo import CuckooFilter


def url_path(url: str) -> str:
    parts = url.split("/", 3)
    return "/" + (parts[3] if len(parts) > 3 else "")


def salt_threshold(cfg, host: str, fair_share: int) -> int:
    """Hot-host salting trigger for one host: exceed
    max(min(salt_min_rows, budget_for(host) - 1), fair_share) and the
    host's rows are dealt across all fetch parts. The floor clamps
    below the host's OWN tier budget (admitted rows can never exceed
    it), so salting stays reachable for every tier — a single floor
    at the maximum budget would silently disable it for lower tiers."""
    return max(min(cfg.salt_min_rows, cfg.budget_for(host) - 1), fair_share)


class FrontierShard:
    def __init__(self, shard_id: int, config: dict | CrawlConfig, corpus_dir: str):
        cfg = config if isinstance(config, CrawlConfig) else CrawlConfig.from_dict(config)
        self.shard_id = shard_id
        self.cfg = cfg
        # crawl-once -> bloom; recrawl/TTL -> delete-capable cuckoo
        # (north_star: "cuckoo fallback for deletes")
        if cfg.recrawl_after_rounds > 0:
            self.seen: BloomFilter | CuckooFilter = CuckooFilter(cfg.bloom_capacity)
        else:
            self.seen = BloomFilter(cfg.bloom_capacity, cfg.bloom_fpr)
        # TTL eviction ring: (admit_round, [urls admitted that round])
        self.expiry_ring: list[tuple[int, list[str]]] = []
        self.round_counter = 0
        self.round_buffer: dict[str, int] = {}
        self.heaps: dict[str, list] = {}
        self.robots: dict[str, RobotsRules] = {}
        self.reader = CorpusReader(corpus_dir, cfg.n_buckets)
        self.counters: Counter = Counter()
        self._last_admitted = 0

    # -- robots ---------------------------------------------------------
    def _robots_for(self, host: str) -> RobotsRules:
        rules = self.robots.get(host)
        if rules is None:
            body = self.reader.get_text(f"http://{host}/robots.txt")
            rules = RobotsRules.parse(body) if body else RobotsRules.ALLOW_ALL
            self.robots[host] = rules
        return rules

    # -- submission (candidate URLs -> round buffer) --------------------
    def submit(self, urls: list[str], depths: list[int], ts_list: list[int] | None = None) -> dict:
        """Buffer candidates at their MINIMUM (depth, warc_ts_us) for
        this round — warc_ts is the discovering page's capture time
        (seeds use 0), the north-star's priority component. Tuple-min
        is commutative, so concurrent duplicate submissions resolve
        identically regardless of task arrival order — this replaces a
        per-round driver-side ``groupby(url).min(...)`` all-to-all
        shuffle with shard-local state (every url routes to exactly one
        shard)."""
        if ts_list is None:
            ts_list = [0] * len(urls)
        buf = self.round_buffer
        for url, depth, ts in zip(urls, depths, ts_list):
            prev = buf.get(url)
            key = (depth, ts)
            if prev is None or key < prev:
                buf[url] = key
        self.counters["submitted"] += len(urls)
        return {"submitted": len(urls)}

    def _seen_add(self, url: str) -> bool:
        """True if url was NOT seen and is now marked seen."""
        if isinstance(self.seen, BloomFilter):
            return self.seen.add(url)
        if url in self.seen:
            return False
        self.seen.add(url)
        return True

    def _evict_expired(self) -> None:
        """Recrawl/TTL: delete urls admitted >= recrawl_after_rounds
        rounds ago from the (cuckoo) seen set, making them
        re-crawlable on rediscovery. No-op in crawl-once mode."""
        ttl = self.cfg.recrawl_after_rounds
        if ttl <= 0:
            return
        while self.expiry_ring and self.round_counter - self.expiry_ring[0][0] >= ttl:
            _, urls = self.expiry_ring.pop(0)
            for url in urls:
                if self.seen.delete(url):
                    self.counters["recrawl_evicted"] += 1

    def _flush_round(self) -> None:
        """Dedup + robots-gate + enqueue the buffered round candidates,
        in sorted url order (determinism; mirrors the oracle)."""
        c = Counter()
        for url in sorted(self.round_buffer):
            depth, ts = self.round_buffer[url]
            if depth > self.cfg.max_depth:
                c["dropped_depth"] += 1
                continue
            if not self._seen_add(url):
                c["dropped_seen"] += 1
                continue
            host = url_host(url)
            if not self._robots_for(host).allowed(url_path(url)):
                c["dropped_robots"] += 1
                continue
            # the north-star priority key: host budget is enforced
            # structurally by admit's per-host token pop; within a host
            # the heap orders (depth, warc_ts, url) — url as the final
            # deterministic tiebreaker
            heapq.heappush(self.heaps.setdefault(host, []), (depth, ts, url))
            c["enqueued"] += 1
        self.round_buffer = {}
        self.counters.update(c)

    # -- admission (politeness gate) ------------------------------------
    def admit(self) -> pa.Table:
        """Flush the round buffer, then pop up to the host's TIER
        BUDGET (``cfg.budget_for(host)``; uniform ``tokens_per_round``
        when no tiers are configured) URLs per host, in (depth,
        warc_ts, url) order; hosts processed in sorted order so the
        emitted table is deterministic."""
        self._evict_expired()
        self._flush_round()
        urls, hosts, depths = [], [], []
        for host in sorted(self.heaps):
            heap = self.heaps[host]
            for _ in range(min(self.cfg.budget_for(host), len(heap))):
                depth, _ts, url = heapq.heappop(heap)
                urls.append(url)
                hosts.append(host)
                depths.append(depth)
            if not heap:
                del self.heaps[host]
        self._last_admitted = len(urls)
        self.counters["admitted"] += len(urls)
        if self.cfg.recrawl_after_rounds > 0 and urls:
            self.expiry_ring.append((self.round_counter, list(urls)))
        self.round_counter += 1
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "depth": pa.array(depths, pa.int32()),
            }
        )

    def admit_parts(self, n_parts: int):
        """Admit, split into bucket-aligned parts: part r holds the
        hosts whose corpus bucket satisfies bucket % n_parts == r. The
        crawler's fetch stage then gets one block per (shard, part),
        each touching only n_buckets/n_parts corpus bucket files —
        full-pool parallelism without a Dataset shuffle.

        HOT-HOST SALTING: a host whose admitted rows exceed
        max(min(cfg.salt_min_rows, cfg.budget_for(host) - 1),
        ceil(total/n_parts)) would dominate its bucket-aligned part
        and serialize the fetch pool; its rows are instead dealt
        round-robin across ALL parts (deterministic: the admit order
        is deterministic, so the deal is too). The floor is clamped
        BELOW the host's OWN per-round budget — admitted rows per
        host can never exceed budget_for(host), so a fixed floor
        above that cap (the old bug) made salting unreachable; the
        clamp is PER HOST so under a tiered config every tier keeps
        the trigger: a host that saturates its own budget AND exceeds
        its fair part share gets dealt. Politeness was already enforced by the
        per-host token pop above, so salting changes only WHERE rows
        are fetched, never what or how many. Cost: salted parts touch
        the hot host's corpus bucket file too — bounded, because
        lookups are per-host range predicates whose row-read cost is
        ~ hits (sources/corpus.py)."""
        import pyarrow.compute as pc

        from mlscraper_ray.sources.corpusgen import host_bucket

        t = self.admit()
        if n_parts == 1:
            return t
        hosts = t["host"].to_pylist()
        counts = Counter(hosts)
        # the salting floor clamps below each host's OWN tier budget
        # (admitted rows per host never exceed budget_for(host)) — a
        # single floor at max_budget()-1 would make salting
        # unreachable for every lower-budget tier, re-introducing the
        # fixed-floor bug the clamp exists to prevent
        fair = -(-len(hosts) // n_parts)
        part_ids: list[int] = []
        dealt: Counter = Counter()
        for h in hosts:
            if counts[h] > salt_threshold(self.cfg, h, fair):
                # deal starts at the host's own bucket, not part 0:
                # several hosts salted in one round would otherwise
                # all drop their remainder rows on the low parts
                part_ids.append((dealt[h] + host_bucket(h, self.cfg.n_buckets)) % n_parts)
                dealt[h] += 1
            else:
                part_ids.append(host_bucket(h, self.cfg.n_buckets) % n_parts)
        if dealt:
            self.counters["salted_rows"] += sum(dealt.values())
            self.counters["salted_hosts"] += len(dealt)
        parts = pa.array(part_ids, pa.int32())
        return tuple(t.filter(pc.equal(parts, r)) for r in range(n_parts))

    def last_admitted(self) -> int:
        return self._last_admitted

    def pending(self) -> int:
        return sum(len(h) for h in self.heaps.values())

    def get_counters(self) -> dict:
        return dict(self.counters)

    def seen_count(self) -> int:
        if isinstance(self.seen, BloomFilter):
            return self.seen.n_added
        return self.seen.n_items  # currently tracked (post-eviction)

    # -- checkpoint/restore ---------------------------------------------
    def state_bytes(self) -> bytes:
        is_bloom = isinstance(self.seen, BloomFilter)
        return pickle.dumps(
            {
                "shard_id": self.shard_id,
                "seen_kind": "bloom" if is_bloom else "cuckoo",
                "seen": self.seen.to_bytes(),
                "expiry_ring": self.expiry_ring,
                "round_counter": self.round_counter,
                "round_buffer": self.round_buffer,
                "heaps": self.heaps,
                "robots": {h: r.disallow_prefixes for h, r in self.robots.items()},
                "counters": dict(self.counters),
            }
        )

    def restore(self, data: bytes) -> None:
        state = pickle.loads(data)
        assert state["shard_id"] == self.shard_id, "shard id mismatch on restore"
        # legacy (pre-recrawl) checkpoints stored the filter under "bloom"
        seen_bytes = state.get("seen", state.get("bloom"))
        seen_kind = state.get("seen_kind", "bloom")
        if seen_kind == "bloom" and self.cfg.recrawl_after_rounds > 0:
            # a bloom filter cannot delete(): silently loading it into a
            # recrawl-enabled shard would crash at the first TTL
            # eviction, ``recrawl_after_rounds`` rounds later
            raise ValueError(
                "checkpoint has a delete-incapable 'bloom' seen set but "
                "config enables recrawl_after_rounds="
                f"{self.cfg.recrawl_after_rounds}; resume with the "
                "original crawl-once config or restart the crawl"
            )
        if seen_kind == "bloom":
            self.seen = BloomFilter.from_bytes(seen_bytes)
        else:
            self.seen = CuckooFilter.from_bytes(seen_bytes)
        self.expiry_ring = [tuple(e) for e in state.get("expiry_ring", [])]
        self.round_counter = state.get("round_counter", 0)
        self.round_buffer = state.get("round_buffer", {})
        self.heaps = state["heaps"]
        self.robots = {h: RobotsRules(p) for h, p in state["robots"].items()}
        self.counters = Counter(state["counters"])

    def checkpoint_to(self, path: str) -> int:
        data = self.state_bytes()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        import os

        os.replace(tmp, path)
        return len(data)

    def restore_from(self, path: str) -> None:
        with open(path, "rb") as f:
            self.restore(f.read())
