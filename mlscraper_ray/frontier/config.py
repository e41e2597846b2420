"""Crawl configuration — everything that must be identical between the
distributed crawler, the single-process oracle, and a resumed run.

The config is part of the checkpoint manifest; resume refuses a
mismatched config (determinism depends on it: shard count fixes the
bloom-shard layout, tokens_per_round fixes admission).

Scale guidance (the 10^10-URL design point, tested at ~10^4):
- ``n_shards``: one frontier shard actor per partition; P should be
  ~2-4x total cluster cores. Host -> shard is ``crc32(host) % P``, so
  P must stay constant across resume (it is in the manifest).
- ``bloom_capacity``: sized per shard; 10^10/P keys at the configured
  FPR. At P=1024, fpr=1e-9: ~52 GB/shard of bits — budget accordingly
  (or raise fpr / use the cuckoo variant with eviction).
- ``tokens_per_round``: per-host politeness budget per BSP round
  (token-bucket refill). Bounds per-round skew: no host can produce
  more than this many fetches per round regardless of frontier skew.
"""
from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass
class CrawlConfig:
    n_shards: int = 8
    n_buckets: int = 16  # corpus host-hash buckets (must match corpus)
    tokens_per_round: int = 4
    max_depth: int = 10
    max_rounds: int = 64
    bloom_capacity: int = 1 << 17  # per shard; test-scale default
    bloom_fpr: float = 1e-9
    # hot-host salting: a host whose admitted rows this round exceed
    # max(min(salt_min_rows, budget_for(host) - 1),
    # ceil(admitted/n_parts)) is spread round-robin across ALL fetch
    # parts instead of its bucket-aligned part, so one mega-host cannot
    # serialize the fetch pool. The floor is clamped below the host's
    # OWN tier budget because per-host admitted rows never exceed
    # budget_for(host) — a fixed floor above that cap would make
    # salting unreachable (per-host, so every tier keeps the
    # saturates-budget-and-exceeds-fair-share trigger).
    # Politeness is already enforced at admission (owner shard), so
    # salting never changes WHAT is fetched — only where.
    salt_min_rows: int = 256
    # recrawl/TTL policy: 0 = crawl-once (bloom seen set). N > 0 =
    # delete-capable cuckoo seen set; a url fetched in round k is
    # EVICTED at round k+N and becomes re-crawlable when its links are
    # rediscovered. The per-round eviction schedule is the round's own
    # admitted-url list (at the 10^10 design point that list is the
    # round's results parquet, streamed back at eviction time).
    recrawl_after_rounds: int = 0
    # adaptive fetch-part sizing: split a round into enough parts that
    # blocks carry >= this many urls (small rounds must not be
    # shredded into tiny tasks), capped by pool parallelism
    fetch_rows_per_block: int = 192
    # checkpoint retention: 0 = keep every round's checkpoint (resume
    # from ANY round — the test/debug contract). K > 0 prunes to the
    # newest K COMPLETE checkpoints after each commit — the production
    # setting: a full shard snapshot at the 10^10 design point is
    # ~53 MB x P shards per round (bloom bits dominate), so unbounded
    # retention is a storage leak; resume only ever needs the latest
    # complete manifest.
    keep_checkpoints: int = 0
    seed: int = 42
    plan: dict = field(default_factory=dict)  # learned scraper plan (JSON)
    # TIERED CRAWL: per-host fetch budget by host tier (the north-star
    # "host-budget" leg of the priority key). ``tier_budgets[t]`` is
    # the per-round token budget of a tier-``t`` host; hosts absent
    # from ``host_tiers`` fall to ``default_tier``. Empty
    # ``tier_budgets`` = uniform ``tokens_per_round`` (the crawl-once
    # contract, unchanged). The tier map is policy metadata (domain
    # reputation / authority ranking); it rides in the checkpoint
    # manifest like everything determinism depends on. At the 10^10
    # design point keep it to the ranked head+tail of hosts (the
    # default tier covers the torso), not all hosts.
    host_tiers: dict = field(default_factory=dict)  # host -> tier index
    tier_budgets: list = field(default_factory=list)  # tokens per tier
    default_tier: int = 1

    def budget_for(self, host: str) -> int:
        if not self.tier_budgets:
            return self.tokens_per_round
        t = self.host_tiers.get(host, self.default_tier)
        return self.tier_budgets[min(max(t, 0), len(self.tier_budgets) - 1)]

    def max_budget(self) -> int:
        return max(self.tier_budgets) if self.tier_budgets else self.tokens_per_round

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "CrawlConfig":
        return cls(**d)
