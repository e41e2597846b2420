"""High-level pipeline glue: sf_dir -> synthetic corpus -> learned
plan -> crawl / extraction runs. Used by __ray_entry__, tests and
bench.py.

The synthetic corpus for a testdata scale factor is generated (and
cached) under /tmp/mlscraper_ray_data — deterministic in (sf, seed),
so every run at the same scale sees identical inputs.
"""
from __future__ import annotations

import json
import os
import re
import shutil

import pyarrow as pa

from mlscraper_ray.frontier.config import CrawlConfig
from mlscraper_ray.sources.corpusgen import CorpusSpec, generate_corpus, spec_for_scale

DATA_ROOT = os.environ.get("MLSCRAPER_RAY_TMP", "/tmp/mlscraper_ray_data")

def ncpus() -> int:
    import ray

    return int(ray.cluster_resources().get("CPU", 8))



def sf_of_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.001


def corpus_for_sf(sf: float) -> tuple[str, CorpusSpec]:
    spec = spec_for_scale(sf)
    corpus_dir = os.path.join(DATA_ROOT, f"corpus_sf{sf}")
    os.makedirs(corpus_dir, exist_ok=True)
    generate_corpus(corpus_dir, spec)  # cached if already generated
    return corpus_dir, spec


def learn_plan(corpus_dir: str, spec: CorpusSpec) -> dict:
    """Train the scraper from the corpus's labeled samples (driver-side
    — a handful of pages, reference training.py semantics)."""
    cache = os.path.join(corpus_dir, "_PLAN.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    from mlscraper_ray.htmlcore.dom import parse_html
    from mlscraper_ray.learn.samples import Sample, TrainingSet
    from mlscraper_ray.learn.training import train_scraper
    from mlscraper_ray.sources.corpus import CorpusReader

    reader = CorpusReader(corpus_dir, spec.n_buckets)
    ts = TrainingSet()
    with open(os.path.join(corpus_dir, "samples.json")) as f:
        for s in json.load(f):
            html = reader.lookup([s["url"]])["html"][0].as_py()
            ts.add_sample(Sample(parse_html(html), s["value"]))
    plan = train_scraper(ts, complexity=2).to_plan()
    with open(cache, "w") as f:
        json.dump(plan, f, sort_keys=True)
    return plan


def crawl_config_for(spec: CorpusSpec, plan: dict, tokens_per_round: int = 8, max_rounds: int = 40) -> CrawlConfig:
    return CrawlConfig(
        n_shards=8,
        n_buckets=spec.n_buckets,
        tokens_per_round=tokens_per_round,
        max_rounds=max_rounds,
        max_depth=24,
        plan=plan,
    )


def run_crawl(sf_dir: str, fresh: bool = True, tokens_per_round: int = 8, max_rounds: int = 40):
    """Full crawl pipeline at the scale implied by sf_dir. Returns
    (out_dir, stats, config)."""
    from mlscraper_ray.frontier.crawler import RayCrawler

    sf = sf_of_dir(sf_dir)
    corpus_dir, spec = corpus_for_sf(sf)
    plan = learn_plan(corpus_dir, spec)
    cfg = crawl_config_for(spec, plan, tokens_per_round, max_rounds)
    out_dir = os.path.join(DATA_ROOT, f"crawl_sf{sf}")
    if fresh and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    stats = RayCrawler(corpus_dir, out_dir, cfg).run()
    return out_dir, stats, cfg


def crawl_order_query(sf_dir: str) -> pa.Table:
    """Flagship: deterministic crawl order table (rank, round, depth,
    host, url)."""
    from mlscraper_ray.frontier.crawler import crawl_order

    out_dir, _, _ = run_crawl(sf_dir)
    return crawl_order(out_dir)


def tiers_from_counts(counts: dict[str, int]) -> dict[str, int]:
    """Host tier assignment rule, shared VERBATIM by the distributed
    pipeline and the single-process truth oracle (the COUNTS reach it
    by independent paths): rank hosts by (-count, host), top quarter
    (ceil) -> tier 0, bottom quarter (floor) -> tier 2; the torso is
    OMITTED from the map (it falls to ``default_tier`` = 1), keeping
    the policy table to the ranked head+tail — the shape that stays
    bounded at the 10^10 design point."""
    hosts = sorted(counts, key=lambda h: (-counts[h], h))
    n = len(hosts)
    top, bot = -(-n // 4), n // 4
    tiers = {h: 0 for h in hosts[:top]}
    if bot:
        tiers.update({h: 2 for h in hosts[n - bot :]})
    return tiers


def host_page_counts_distributed(corpus_dir: str) -> dict[str, int]:
    """Per-host corpus page counts via the bucketed aggregate (the
    AUTHORITY PROXY feeding the tier map; a production crawl would
    feed host_rank / a reputation list here instead). Only the
    per-host aggregate — #hosts, orders of magnitude below #urls —
    ever reaches the driver."""
    import pandas as pd
    import ray.data

    from mlscraper_ray.functions.bucketed import bucketed_aggregate
    from mlscraper_ray.sources.corpusgen import url_host

    pages = ray.data.read_parquet(os.path.join(corpus_dir, "pages"), columns=["url"])

    def to_host(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": pd.Series([url_host(u) for u in b["url"]], dtype=str),
                "c": pd.Series([1] * len(b), dtype="int64"),
            }
        )

    agg = bucketed_aggregate(
        pages.map_batches(to_host, batch_format="pandas"), ["host"], {"c": ("c", "sum")}
    ).to_pandas()
    return dict(zip(agg["host"], agg["c"].astype(int)))


def tier_budgets_for(tokens_per_round: int) -> list[int]:
    """Tier budget policy: head hosts get 2x the torso budget, tail
    hosts 1/8 (floored at 1). One definition shared by the pipeline,
    the truth oracle and the bench (which scales tokens_per_round up
    for production-shaped rounds)."""
    t = tokens_per_round
    return [2 * t, t, max(1, t // 8)]


def crawl_order_tiered_query(
    sf_dir: str, tokens_per_round: int = 8, max_rounds: int = 40
) -> pa.Table:
    """TIERED crawl: per-host fetch budgets by authority tier — the
    north-star "host-budget" leg of the priority key. High-tier hosts
    drain 2x the torso budget per round, the tail 1/8, so the crawl
    spends its politeness-bounded budget on high-authority hosts
    first. Same deterministic-order contract as crawl_order,
    value-pinned by the single-process oracle crawler run under the
    SAME tier config
    (pipelines/truth_oracles.crawl_order_tiered_truth_sql)."""
    from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order

    sf = sf_of_dir(sf_dir)
    corpus_dir, spec = corpus_for_sf(sf)
    plan = learn_plan(corpus_dir, spec)
    cfg = crawl_config_for(spec, plan, tokens_per_round=tokens_per_round, max_rounds=max_rounds)
    cfg.host_tiers = tiers_from_counts(host_page_counts_distributed(corpus_dir))
    cfg.tier_budgets = tier_budgets_for(tokens_per_round)
    out_dir = os.path.join(DATA_ROOT, f"tiered_sf{sf}")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    RayCrawler(corpus_dir, out_dir, cfg).run()
    return crawl_order(out_dir)


def host_rank_totals_distributed(sf_dir: str) -> dict[str, int]:
    """Per-host integer PageRank mass from the DISTRIBUTED pipeline
    (parse -> link graph -> fixed-point PageRank -> host roll-up) —
    the real authority signal feeding the rank-driven tier map. Only
    the per-host table (#hosts rows) reaches the driver."""
    from mlscraper_ray.functions.pagerank import host_rank

    t = host_rank(sf_dir).to_pandas()
    return dict(zip(t["host"], t["rank_total"].astype(int)))


def crawl_order_ranked_query(
    sf_dir: str, tokens_per_round: int = 8, max_rounds: int = 40
) -> pa.Table:
    """RANK-driven tiered crawl — the full north-star prioritization
    loop closed: host authority comes from the link graph's own
    integer PageRank mass (:func:`host_rank_totals_distributed`)
    instead of the page-count proxy, feeding the same tier rule and
    budget policy as ``crawl_order_tiered``. Because ranks are
    fixed-point integers, the truth side
    (truth_oracles.crawl_order_ranked_truth_sql) recomputes the SAME
    tier map from generator link records + the single-process
    reference loop — so one constant table value-pins parse, graph
    assembly, the distributed PageRank iteration, the host roll-up,
    the tier rule AND the resulting crawl order end to end."""
    from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order

    sf = sf_of_dir(sf_dir)
    corpus_dir, spec = corpus_for_sf(sf)
    plan = learn_plan(corpus_dir, spec)
    cfg = crawl_config_for(spec, plan, tokens_per_round=tokens_per_round, max_rounds=max_rounds)
    cfg.host_tiers = tiers_from_counts(host_rank_totals_distributed(sf_dir))
    cfg.tier_budgets = tier_budgets_for(tokens_per_round)
    out_dir = os.path.join(DATA_ROOT, f"ranked_sf{sf}")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    RayCrawler(corpus_dir, out_dir, cfg).run()
    return crawl_order(out_dir)


# the counters both the shard actors and the single-process oracle
# maintain with identical semantics (same check order: depth -> seen
# -> robots); the metrics queries compare exactly this set
CRAWL_COUNTER_NAMES = (
    "admitted",
    "dropped_depth",
    "dropped_robots",
    "dropped_seen",
    "enqueued",
)


def robots_stats_query(sf_dir: str) -> pa.Table:
    """Per-host robots report over the corpus: (host, n_rules,
    n_pages, n_blocked) — rules parsed from each host's robots.txt
    row with the REAL crawler parser (frontier/robots.py) and applied
    to every corpus page path, so the parser's semantics are
    value-pinned against the generator's synthesis-time policy
    (truth_oracles.robots_stats_truth_sql) independent of crawl
    behavior. Robots bodies are a bounded per-host policy table
    (pulled once, parsed once, broadcast); the page scan is one
    streaming pass folding per-host (pages, blocked) partials through
    the coarse-bucket aggregate."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from mlscraper_ray.frontier.robots import RobotsRules
    from mlscraper_ray.frontier.shard import url_path
    from mlscraper_ray.functions.broadcast import cached_object
    from mlscraper_ray.functions.bucketed import bucketed_aggregate
    from mlscraper_ray.sources.corpusgen import url_host

    sf = sf_of_dir(sf_dir)
    corpus_dir, _spec = corpus_for_sf(sf)
    pages = ray.data.read_parquet(
        os.path.join(corpus_dir, "pages"), columns=["url", "text"]
    )

    # robots rows: one per host — the bounded policy table (pull is
    # O(#hosts), the same class as the tier map)
    rb = pages.map_batches(
        lambda t: t.filter(pc.ends_with(t["url"], pattern="/robots.txt")).select(
            ["url", "text"]
        ),
        batch_format="pyarrow",
    ).to_pandas()
    rules = {
        url_host(u): RobotsRules.parse(body)
        for u, body in zip(rb["url"], rb["text"])
    }
    rules_ref = ray.put(rules)

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        r = cached_object(rules_ref)
        hosts, pages_c, blocked_c = {}, {}, {}
        for u in batch["url"]:
            if u.endswith("/robots.txt"):
                continue
            h = url_host(u)
            pages_c[h] = pages_c.get(h, 0) + 1
            rl = r.get(h)
            if rl is not None and not rl.allowed(url_path(u)):
                blocked_c[h] = blocked_c.get(h, 0) + 1
        ks = sorted(pages_c)
        return pd.DataFrame(
            {
                "host": pd.Series(ks, dtype=str),
                "n_pages": pd.Series([pages_c[k] for k in ks], dtype="int64"),
                "n_blocked": pd.Series([blocked_c.get(k, 0) for k in ks], dtype="int64"),
            }
        )

    agg = bucketed_aggregate(
        pages.map_batches(partials, batch_format="pandas"),
        ["host"],
        {"n_pages": ("n_pages", "sum"), "n_blocked": ("n_blocked", "sum")},
    ).to_pandas()
    agg["n_rules"] = [
        len(rules[h].disallow_prefixes) if h in rules else 0 for h in agg["host"]
    ]
    agg = agg.astype({"n_pages": "int64", "n_blocked": "int64", "n_rules": "int64"})
    agg = agg[["host", "n_rules", "n_pages", "n_blocked"]].sort_values(
        "host", ignore_index=True
    )
    return pa.Table.from_pandas(agg, preserve_index=False)


def crawl_order_tiered_recrawl_query(sf_dir: str) -> pa.Table:
    """Tier budgets COMPOSED with the recrawl/TTL policy (cuckoo seen
    set, eviction after 3 rounds): high-authority hosts get both more
    tokens per round AND proportionally more re-fetch slots when their
    urls expire — the realistic freshness-crawl shape. Value-pinned by
    the oracle crawler under the same composed config (the eviction
    ring and the tier admission interact only at the per-host token
    pop, which both engines share via budget_for)."""
    from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order

    sf = sf_of_dir(sf_dir)
    corpus_dir, spec = corpus_for_sf(sf)
    plan = learn_plan(corpus_dir, spec)
    cfg = crawl_config_for(spec, plan, tokens_per_round=8, max_rounds=10)
    cfg.recrawl_after_rounds = 3
    cfg.host_tiers = tiers_from_counts(host_page_counts_distributed(corpus_dir))
    cfg.tier_budgets = tier_budgets_for(8)
    out_dir = os.path.join(DATA_ROOT, f"tiered_recrawl_sf{sf}")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    RayCrawler(corpus_dir, out_dir, cfg).run()
    return crawl_order(out_dir)


def _plain_crawl_artifacts(sf_dir: str) -> str:
    """``out_dir`` of a COMPLETED plain crawl under the standard
    config, REUSING crawl_order_query's output when the recorded
    manifest config matches — the metrics queries only read the run's
    artifacts, and re-crawling for each of them cost ~3x the crawl
    per registry pass. Any config mismatch (e.g. the bench's
    128-token runs share the directory) falls through to a fresh
    run."""
    import json as _json

    from mlscraper_ray.frontier.crawler import RayCrawler, _ckpt_dir

    sf = sf_of_dir(sf_dir)
    corpus_dir, spec = corpus_for_sf(sf)
    plan = learn_plan(corpus_dir, spec)
    cfg = crawl_config_for(spec, plan)
    out_dir = os.path.join(DATA_ROOT, f"crawl_sf{sf}")
    if os.path.exists(os.path.join(out_dir, "metrics.json")):
        k = RayCrawler.latest_complete_round(out_dir)
        if k is not None:
            try:
                with open(os.path.join(_ckpt_dir(out_dir, k), "MANIFEST.json")) as f:
                    if _json.load(f)["config"] == cfg.to_dict():
                        return out_dir
            except (OSError, KeyError, ValueError):
                pass
    out_dir, _, _ = run_crawl(sf_dir)
    return out_dir


def crawl_metrics_query(sf_dir: str) -> pa.Table:
    """Per-round crawl metrics off the crawl's own output partitions:
    (round, n_fetched, n_hosts, max_depth) — the lineage/metrics leg
    of the north rule as a queryable table, value-pinned by the oracle
    crawler's per-round fetch log
    (truth_oracles.crawl_metrics_truth_sql)."""
    import pandas as pd

    from mlscraper_ray.frontier.crawler import crawl_order_dataset

    out_dir = _plain_crawl_artifacts(sf_dir)

    def per_round(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "round": pd.Series([int(g["round"].iloc[0])], dtype="int64"),
                "n_fetched": pd.Series([len(g)], dtype="int64"),
                "n_hosts": pd.Series([g["host"].nunique()], dtype="int64"),
                "max_depth": pd.Series([int(g["depth"].max())], dtype="int64"),
            }
        )

    out = (
        crawl_order_dataset(out_dir)
        .groupby("round")
        .map_groups(per_round, batch_format="pandas")
        .to_pandas()
        .sort_values("round", ignore_index=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def crawl_counter_totals_query(sf_dir: str) -> pa.Table:
    """Final frontier-counter totals summed across shard actors (the
    run's metrics.json artifact — the per-round checkpoint MANIFESTs
    carry the same per-shard counters but stop one flush EARLY: the
    terminating 0-admit round's flush drops are counted in shard state
    after the last checkpoint is written) — must equal the
    single-process oracle's counters exactly, a distributed-state
    invariant far stricter than order equality: every dedup/robots/
    depth drop decision matches one-for-one."""
    import json as _json

    out_dir = _plain_crawl_artifacts(sf_dir)
    with open(os.path.join(out_dir, "metrics.json")) as f:
        recorded = _json.load(f)["counters"]
    totals = {name: int(recorded.get(name, 0)) for name in CRAWL_COUNTER_NAMES}
    names = sorted(totals)
    return pa.table(
        {
            "counter": pa.array(names, pa.string()),
            "value": pa.array([totals[n] for n in names], pa.int64()),
        }
    )


def crawl_order_recrawl_query(sf_dir: str) -> pa.Table:
    """Crawl order under the recrawl/TTL policy (cuckoo seen set with
    eviction after 3 rounds): same deterministic-order contract, pages
    re-fetched on rediscovery. Pinned by tests/test_crawl.py
    TestRecrawlTTL against the single-process oracle."""
    from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order

    sf = sf_of_dir(sf_dir)
    corpus_dir, spec = corpus_for_sf(sf)
    plan = learn_plan(corpus_dir, spec)
    cfg = crawl_config_for(spec, plan, tokens_per_round=8, max_rounds=10)
    cfg.recrawl_after_rounds = 3
    out_dir = os.path.join(DATA_ROOT, f"recrawl_sf{sf}")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    RayCrawler(corpus_dir, out_dir, cfg).run()
    return crawl_order(out_dir)


def extract_all_dataset(sf_dir: str):
    """PRODUCTION PATH of the M1 slice: pruned read (url + html only)
    -> map_batches(learned-scraper apply) returned AS A DATASET — the
    shape a 100-TB consumer streams into ``write_parquet`` /
    ``iter_batches`` with no driver materialization anywhere.
    ``extract_all_query`` is the driver-contract twin that pulls this
    into one comparable in-memory table."""
    import ray.data

    from mlscraper_ray.stages.apply import apply_scraper_task

    sf = sf_of_dir(sf_dir)
    corpus_dir, spec = corpus_for_sf(sf)
    plan = learn_plan(corpus_dir, spec)
    pages = ray.data.read_parquet(os.path.join(corpus_dir, "pages"), columns=["url", "html"])
    return pages.map_batches(
        apply_scraper_task,
        fn_kwargs={"plan_json": json.dumps(plan, sort_keys=True)},
        batch_format="pyarrow",
        batch_size=128,
    )


def _pin_fsspec_http_stub() -> None:
    """Make Ray Data's per-call ``fsspec.implementations.http`` probe
    deterministic under CONCURRENT Dataset executions. Absent aiohttp
    that module can never import; Python retries the failing import on
    every path resolution, and with several threads resolving at once
    the failure races and can surface as a bare ImportError where
    Ray's guard catches only ModuleNotFoundError. Caching a minimal
    stub once removes the repeated import entirely; local-filesystem
    paths never reach the stubbed class."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        mod = types.ModuleType("fsspec.implementations.http")
        mod.HTTPFileSystem = type("HTTPFileSystem", (), {})
        sys.modules["fsspec.implementations.http"] = mod


def extract_all_to_parquet(sf_dir: str, out_dir: str, window: int = 4) -> dict:
    """Streaming sink twin, RESUMABLE: output is partitioned by the
    corpus host-hash bucket — one directory per input shard, mirroring
    the read layout — and each bucket directory is committed by a
    ``_SUCCESS`` marker written AFTER its parquet (marker-last, the
    same commit protocol as the crawl checkpoints). A failed or killed
    run re-invoked with the same ``out_dir`` skips finished buckets
    and rewrites only incomplete ones — never one giant file, never a
    restart from zero (the 100-TB resumable-output contract).

    Unfinished buckets run as ``window`` CONCURRENT Dataset
    executions (one thread each — Ray Data executions are independent
    per Dataset), so the cluster is not left idle during each
    bucket's straggler tail while keeping per-bucket resume
    granularity. Returns ``{"written": n, "skipped": n}``."""
    import glob as _glob
    from concurrent.futures import ThreadPoolExecutor

    import ray.data

    from mlscraper_ray.stages.apply import apply_scraper_task

    sf = sf_of_dir(sf_dir)
    corpus_dir, spec = corpus_for_sf(sf)
    plan_json = json.dumps(learn_plan(corpus_dir, spec), sort_keys=True)
    todo, skipped = [], 0
    for bdir in sorted(_glob.glob(os.path.join(corpus_dir, "pages", "hb=*"))):
        dest = os.path.join(out_dir, os.path.basename(bdir))
        if os.path.exists(os.path.join(dest, "_SUCCESS")):
            skipped += 1
        else:
            todo.append((bdir, dest))

    _pin_fsspec_http_stub()

    def run_bucket(job: tuple[str, str]) -> None:
        bdir, dest = job
        shutil.rmtree(dest, ignore_errors=True)  # partial output of a crashed run
        ray.data.read_parquet(bdir, columns=["url", "html"]).map_batches(
            apply_scraper_task,
            fn_kwargs={"plan_json": plan_json},
            batch_format="pyarrow",
            batch_size=128,
        ).write_parquet(dest)
        with open(os.path.join(dest, "_SUCCESS"), "w") as f:
            f.write("")

    if todo:
        with ThreadPoolExecutor(max_workers=max(1, window)) as pool:
            list(pool.map(run_bucket, todo))
    return {"written": len(todo), "skipped": skipped}


def extract_all_query(sf_dir: str):
    """Driver-contract twin of :func:`extract_all_dataset`: same
    pipeline, pulled into one url-sorted table for the oracle
    compare."""
    out = extract_all_dataset(sf_dir).to_pandas().sort_values("url", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def learn_plan_query(sf_dir: str) -> pa.Table:
    """Learned scraper plan as a 1-row table (plan JSON is the
    deterministic learned artifact)."""
    sf = sf_of_dir(sf_dir)
    corpus_dir, spec = corpus_for_sf(sf)
    plan = learn_plan(corpus_dir, spec)
    return pa.table({"plan_json": pa.array([json.dumps(plan, sort_keys=True)], pa.string())})


def learn_plan_parallel_query(sf_dir: str) -> pa.Table:
    """Same learned artifact via the speculative-parallel searcher
    (learn/parallel.py): must equal learn_plan's output exactly."""
    from mlscraper_ray.learn.parallel import train_scraper_parallel
    from mlscraper_ray.sources.corpus import CorpusReader

    sf = sf_of_dir(sf_dir)
    corpus_dir, spec = corpus_for_sf(sf)
    reader = CorpusReader(corpus_dir, spec.n_buckets)
    samples = []
    with open(os.path.join(corpus_dir, "samples.json")) as f:
        for s in json.load(f):
            html = reader.lookup([s["url"]])["html"][0].as_py()
            samples.append((html, json.dumps(s["value"])))
    plan = train_scraper_parallel(samples, complexity=2)
    return pa.table({"plan_json": pa.array([json.dumps(plan, sort_keys=True)], pa.string())})


def extract_from_warc_query(sf_dir: str) -> pa.Table:
    """Source composition: corpus pages -> sharded .warc.gz (cached) ->
    read_warc Dataset -> learned-scraper apply. Demonstrates that the
    extraction stage is source-agnostic (same rows as extract_all)."""
    import ray.data

    from mlscraper_ray.sources.warc import read_warc, write_warc_from_pages
    from mlscraper_ray.stages.apply import apply_scraper_task

    sf = sf_of_dir(sf_dir)
    corpus_dir, spec = corpus_for_sf(sf)
    plan = learn_plan(corpus_dir, spec)
    warc_dir = os.path.join(corpus_dir, "warc")
    if not os.path.isdir(warc_dir) or not os.listdir(warc_dir):
        write_warc_from_pages(os.path.join(corpus_dir, "pages"), warc_dir)
    extracted = read_warc(warc_dir).map_batches(
        apply_scraper_task,
        fn_kwargs={"plan_json": json.dumps(plan, sort_keys=True)},
        batch_format="pyarrow",
        batch_size=128,
    )
    out = extracted.to_pandas().sort_values("url", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def crawl_depth_histogram_query(sf_dir: str) -> pa.Table:
    """Depth census over the crawl's own output partitions: (depth,
    n_urls, n_hosts) — how far from the seeds the fetch budget
    reached, the frontier-shape diagnostic next to the per-round
    metrics. Two slim shuffles — per-batch (depth, count) partials and
    a (depth, host) distinct pass — nothing URL-sized aggregates on
    one task (depth cardinality is tiny, so a naive groupby(depth)
    would melt one worker at scale). Value-pinned by the oracle
    crawler's fetch log (truth_oracles.crawl_depth_histogram_truth_sql)."""
    import pandas as pd

    from mlscraper_ray.frontier.crawler import crawl_order_dataset
    from mlscraper_ray.functions.bucketed import bucketed_aggregate

    out_dir = _plain_crawl_artifacts(sf_dir)
    ds = crawl_order_dataset(out_dir).materialize()

    url_counts = bucketed_aggregate(
        ds.map_batches(
            lambda df: df.groupby("depth", sort=False)
            .size()
            .rename("n_urls")
            .reset_index(),
            batch_format="pandas",
        ),
        ["depth"],
        {"n_urls": ("n_urls", "sum")},
    ).to_pandas()

    host_counts = bucketed_aggregate(
        bucketed_aggregate(
            ds.map_batches(
                lambda df: df[["depth", "host"]].drop_duplicates(),
                batch_format="pandas",
            ),
            ["depth", "host"],
            {"one": ("host", "count")},
        ),
        ["depth"],
        {"n_hosts": ("host", "count")},
    ).to_pandas()

    out = url_counts.merge(host_counts[["depth", "n_hosts"]], on="depth").sort_values(
        "depth", ignore_index=True
    )
    for c in ("depth", "n_urls", "n_hosts"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out[["depth", "n_urls", "n_hosts"]], preserve_index=False)
