"""Crawl engine integration tests: distributed-vs-oracle equality,
checkpoint/resume equivalence, golden extraction.

These use a small corpus so the full BSP loop runs in seconds.
"""
import glob
import json
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mlscraper_ray.frontier.config import CrawlConfig
from mlscraper_ray.frontier.oracle import oracle_crawl
from mlscraper_ray.sources.corpusgen import CorpusSpec, generate_corpus


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    spec = CorpusSpec(n_hosts=5, pages_per_host=4, skew_factors=(2,), n_seeds=2)
    generate_corpus(d, spec)
    return d, spec


@pytest.fixture(scope="module")
def learned_plan(small_corpus):
    d, spec = small_corpus
    from mlscraper_ray.htmlcore.dom import parse_html
    from mlscraper_ray.learn.samples import Sample, TrainingSet
    from mlscraper_ray.learn.training import train_scraper
    from mlscraper_ray.sources.corpus import CorpusReader

    reader = CorpusReader(d, spec.n_buckets)
    ts = TrainingSet()
    for s in json.load(open(f"{d}/samples.json")):
        html = reader.lookup([s["url"]])["html"][0].as_py()
        ts.add_sample(Sample(parse_html(html), s["value"]))
    return train_scraper(ts, complexity=2).to_plan()


def _config(plan):
    return CrawlConfig(
        n_shards=4, tokens_per_round=2, max_rounds=12, max_depth=6, plan=plan
    )


def _results_table(out_dir, columns):
    files = sorted(glob.glob(f"{out_dir}/rounds/round=*/results/*.parquet"))
    return pa.concat_tables([pq.read_table(f, columns=columns) for f in files])


@pytest.fixture(scope="module")
def crawl_run(ray_session, small_corpus, learned_plan, tmp_path_factory):
    from mlscraper_ray.frontier.crawler import RayCrawler

    d, spec = small_corpus
    out = str(tmp_path_factory.mktemp("crawl"))
    cfg = _config(learned_plan)
    stats = RayCrawler(d, out, cfg).run()
    return d, out, cfg, stats


class TestCrawlVsOracle:
    def test_order_and_seen_match(self, crawl_run):
        from mlscraper_ray.frontier.crawler import crawl_order

        corpus, out, cfg, stats = crawl_run
        order = crawl_order(out)
        fetches, seen, _, _ = oracle_crawl(corpus, cfg)
        ray_order = list(
            zip(
                order["round"].to_pylist(),
                order["depth"].to_pylist(),
                order["host"].to_pylist(),
                order["url"].to_pylist(),
            )
        )
        assert ray_order == fetches
        assert stats["seen"] == len(seen)

    def test_extraction_matches_oracle_and_golden(self, crawl_run):
        corpus, out, cfg, _ = crawl_run
        _, _, extracted, _ = oracle_crawl(corpus, cfg)
        res = _results_table(out, ["url", "value_json", "fetch_ok"])
        ray_extracted = dict(
            zip(res["url"].to_pylist(), res["value_json"].to_pylist())
        )
        for url, expected in extracted.items():
            assert ray_extracted.get(url) == expected
        golden = dict(
            zip(
                *[
                    pq.read_table(f"{corpus}/golden.parquet")[c].to_pylist()
                    for c in ("url", "expected_json")
                ]
            )
        )
        checked = 0
        for url, value in extracted.items():
            if url in golden:
                checked += 1
                assert value == golden[url], url
        assert checked > 0

    def test_politeness_budget_respected(self, crawl_run):
        corpus, out, cfg, _ = crawl_run
        res = _results_table(out, ["round", "host", "url"])
        counts = {}
        for r, h in zip(res["round"].to_pylist(), res["host"].to_pylist()):
            counts[(r, h)] = counts.get((r, h), 0) + 1
        assert counts
        assert max(counts.values()) <= cfg.tokens_per_round

    def test_robots_respected(self, crawl_run):
        corpus, out, _, _ = crawl_run
        res = _results_table(out, ["url"])
        # h0000 disallows /private/ in the synthetic corpus
        for url in res["url"].to_pylist():
            assert not url.startswith("http://h0000.example/private/")


class TestResume:
    def test_resume_produces_identical_output(
        self, ray_session, small_corpus, learned_plan, tmp_path_factory
    ):
        from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order

        corpus, spec = small_corpus
        cfg = _config(learned_plan)
        full_out = str(tmp_path_factory.mktemp("full"))
        RayCrawler(corpus, full_out, cfg).run()
        full_order = crawl_order(full_out).to_pylist()

        # interrupted run: replay an uninterrupted prefix, then truncate
        # everything after round 1's checkpoint and resume
        part_out = str(tmp_path_factory.mktemp("part"))
        shutil.copytree(full_out, part_out, dirs_exist_ok=True)
        for rd in glob.glob(f"{part_out}/rounds/round=*"):
            k = int(rd.rsplit("=", 1)[1])
            if k > 1:
                shutil.rmtree(rd)
        for cd in glob.glob(f"{part_out}/checkpoint/round=*"):
            k = int(cd.rsplit("=", 1)[1])
            if k > 1:
                shutil.rmtree(cd)

        crawler, next_round = RayCrawler.resume(corpus, part_out)
        assert next_round == 2
        crawler.run(start_round=next_round)
        assert crawl_order(part_out).to_pylist() == full_order

    def test_keep_checkpoints_prunes_and_resumes(
        self, ray_session, small_corpus, learned_plan, tmp_path_factory
    ):
        """Production retention (keep_checkpoints=2): only the newest
        two COMPLETE checkpoints survive, the crawl order is unchanged
        vs keep-all, and a resume from the latest retained checkpoint
        still reproduces the full run's tail."""
        import dataclasses

        from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order

        corpus, spec = small_corpus
        cfg_all = _config(learned_plan)
        all_out = str(tmp_path_factory.mktemp("keep_all"))
        RayCrawler(corpus, all_out, cfg_all).run()
        want = crawl_order(all_out).to_pylist()
        n_rounds = len(glob.glob(f"{all_out}/checkpoint/round=*"))
        assert n_rounds > 2  # retention must actually have pruned

        cfg = dataclasses.replace(cfg_all, keep_checkpoints=2)
        out = str(tmp_path_factory.mktemp("keep_two"))
        RayCrawler(corpus, out, cfg).run()
        kept = sorted(glob.glob(f"{out}/checkpoint/round=*"))
        assert len(kept) == 2
        assert crawl_order(out).to_pylist() == want

        # resume: kill the NEWEST retained checkpoint + its results
        # (simulating a crash mid-round); resume must pick the older
        # retained one and reproduce the full run's tail exactly
        rounds_kept = sorted(int(d.rsplit("=", 1)[1]) for d in kept)
        prev, last = rounds_kept
        shutil.rmtree(f"{out}/checkpoint/round={last}")
        for rd in glob.glob(f"{out}/rounds/round=*"):
            if int(rd.rsplit("=", 1)[1]) > prev:
                shutil.rmtree(rd)
        crawler, next_round = RayCrawler.resume(corpus, out)
        assert next_round == prev + 1
        crawler.run(start_round=next_round)
        assert crawl_order(out).to_pylist() == want


def test_manifest_records_per_partition_lineage(crawl_run):
    """Every checkpoint manifest lists each results file with rows +
    sha256, and the hashes match the files on disk (resume/audit can
    verify partition completeness without re-reading data)."""
    import glob
    import hashlib
    import json
    import os

    _, out_dir, _, _ = crawl_run
    manifests = sorted(glob.glob(os.path.join(out_dir, "checkpoint", "round=*", "MANIFEST.json")))
    assert manifests
    checked = 0
    for mpath in manifests:
        with open(mpath) as f:
            m = json.load(f)
        k = m["round"]
        for entry in m["lineage"]["results_files"]:
            path = os.path.join(out_dir, "rounds", f"round={k}", "results", entry["file"])
            with open(path, "rb") as f:
                assert hashlib.sha256(f.read()).hexdigest() == entry["sha256"]
            checked += 1
    assert checked > 0


class TestHotHostSalting:
    def test_hot_host_rows_dealt_across_parts(self, small_corpus):
        """A host whose admitted rows would dominate one fetch part is
        salted round-robin across ALL parts; cold hosts stay on their
        bucket-aligned part; the union of parts equals plain admit()."""
        from mlscraper_ray.frontier.shard import FrontierShard
        from mlscraper_ray.sources.corpusgen import host_bucket

        corpus, spec = small_corpus
        cfg = CrawlConfig(
            n_shards=1, tokens_per_round=100, salt_min_rows=8, max_depth=9
        )
        mk = lambda: FrontierShard(0, cfg, corpus)

        def submit_all(shard):
            hot = [f"http://mega.example/p{i:03d}" for i in range(40)]
            cold = [f"http://tiny{j}.example/p{i}" for j in range(3) for i in range(2)]
            shard.submit(hot + cold, [1] * (len(hot) + len(cold)))

        n_parts = 4
        shard = mk()
        submit_all(shard)
        parts = shard.admit_parts(n_parts)
        assert len(parts) == n_parts
        by_part_hosts = [set(p["host"].to_pylist()) for p in parts]
        # the hot host landed in EVERY part ...
        assert all("mega.example" in hosts for hosts in by_part_hosts)
        hot_counts = [
            p.filter(pa.compute.equal(p["host"], "mega.example")).num_rows for p in parts
        ]
        assert max(hot_counts) - min(hot_counts) <= 1  # even deal
        # ... cold hosts stayed bucket-aligned
        for p_idx, hosts in enumerate(by_part_hosts):
            for h in hosts - {"mega.example"}:
                assert host_bucket(h, cfg.n_buckets) % n_parts == p_idx
        assert shard.get_counters()["salted_rows"] == 40
        # the parts are a partition of plain admit()
        shard2 = mk()
        submit_all(shard2)
        plain = shard2.admit()
        merged = sorted(
            row
            for p in parts
            for row in zip(p["url"].to_pylist(), p["depth"].to_pylist())
        )
        assert merged == sorted(zip(plain["url"].to_pylist(), plain["depth"].to_pylist()))

    def test_mega_host_crawl_matches_oracle(
        self, ray_session, tmp_path_factory
    ):
        """End-to-end pathological corpus (one host with ~10x everyone
        else's pages): the salted fetch path must still reproduce the
        single-process oracle's order, seen set, and counters."""
        from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order

        d = str(tmp_path_factory.mktemp("megacorpus"))
        spec = CorpusSpec(
            n_hosts=4, pages_per_host=3, skew_factors=(32,), n_seeds=3
        )
        generate_corpus(d, spec)
        cfg = CrawlConfig(
            n_shards=2,
            tokens_per_round=48,
            max_rounds=8,
            max_depth=6,
            salt_min_rows=4,
            # tiny blocks so the adaptive splitter makes multiple parts
            # at this corpus scale and salting has something to spread
            fetch_rows_per_block=4,
        )
        out = str(tmp_path_factory.mktemp("megaout"))
        stats = RayCrawler(d, out, cfg).run()
        order = crawl_order(out)
        fetches, seen, _, _ = oracle_crawl(d, cfg)
        ray_order = list(
            zip(
                order["round"].to_pylist(),
                order["depth"].to_pylist(),
                order["host"].to_pylist(),
                order["url"].to_pylist(),
            )
        )
        assert ray_order == fetches
        assert stats["seen"] == len(seen)
        assert stats["counters"].get("salted_rows", 0) > 0  # salting did engage


class TestTieredCrawl:
    def test_budget_for_rule(self):
        from mlscraper_ray.frontier.config import CrawlConfig

        cfg = CrawlConfig(tokens_per_round=8)
        assert cfg.budget_for("any.host") == 8  # no tiers -> uniform
        assert cfg.max_budget() == 8
        cfg.host_tiers = {"big.host": 0, "tiny.host": 2}
        cfg.tier_budgets = [16, 8, 1]
        assert cfg.budget_for("big.host") == 16
        assert cfg.budget_for("torso.host") == 8  # default_tier = 1
        assert cfg.budget_for("tiny.host") == 1
        assert cfg.max_budget() == 16
        # out-of-range tiers clamp instead of crashing
        cfg.host_tiers["weird.host"] = 9
        assert cfg.budget_for("weird.host") == 1
        # json checkpoint round trip keeps the tier policy
        import json

        back = CrawlConfig.from_dict(json.loads(json.dumps(cfg.to_dict())))
        assert back.host_tiers == cfg.host_tiers
        assert back.tier_budgets == cfg.tier_budgets

    def test_tiered_resume_identical(
        self, ray_session, small_corpus, learned_plan, tmp_path_factory
    ):
        """The tier policy rides the checkpoint manifest: a run
        truncated after round 1 and resumed must reproduce the full
        tiered crawl byte for byte."""
        from mlscraper_ray.frontier.config import CrawlConfig
        from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order
        from mlscraper_ray.pipelines.crawl_pipeline import tiers_from_counts
        from mlscraper_ray.pipelines.truth_oracles import _host_page_counts_local

        corpus, spec = small_corpus
        cfg = CrawlConfig(
            n_shards=4,
            n_buckets=spec.n_buckets,
            tokens_per_round=2,
            max_rounds=20,
            max_depth=24,
            plan=learned_plan,
            host_tiers=tiers_from_counts(_host_page_counts_local(corpus)),
            tier_budgets=[4, 2, 1],
        )
        full_out = str(tmp_path_factory.mktemp("tier_full"))
        RayCrawler(corpus, full_out, cfg).run()
        full_order = crawl_order(full_out).to_pylist()

        part_out = str(tmp_path_factory.mktemp("tier_part"))
        shutil.copytree(full_out, part_out, dirs_exist_ok=True)
        for rd in glob.glob(f"{part_out}/rounds/round=*") + glob.glob(
            f"{part_out}/checkpoint/round=*"
        ):
            if int(rd.rsplit("=", 1)[1]) > 1:
                shutil.rmtree(rd)

        crawler, next_round = RayCrawler.resume(corpus, part_out)
        assert next_round == 2
        assert crawler.cfg.host_tiers == cfg.host_tiers  # policy restored
        assert crawler.cfg.tier_budgets == cfg.tier_budgets
        crawler.run(start_round=next_round)
        assert crawl_order(part_out).to_pylist() == full_order

    def test_salt_threshold_per_host_under_tiers(self):
        """The salting floor clamps below each host's OWN tier budget
        — a torso/tail host that saturates its smaller budget must
        still trigger (regression: a single max_budget()-1 floor made
        salting unreachable for every non-head tier)."""
        from mlscraper_ray.frontier.config import CrawlConfig
        from mlscraper_ray.frontier.shard import salt_threshold

        cfg = CrawlConfig(
            tokens_per_round=128,
            salt_min_rows=256,
            host_tiers={"head.host": 0, "tail.host": 2},
            tier_budgets=[256, 128, 16],
        )
        fair = 1
        # torso host saturating its 128 budget exceeds its 127 floor
        assert salt_threshold(cfg, "torso.host", fair) == 127
        assert salt_threshold(cfg, "head.host", fair) == 255
        assert salt_threshold(cfg, "tail.host", fair) == 15
        # uniform config unchanged
        uni = CrawlConfig(tokens_per_round=128, salt_min_rows=256)
        assert salt_threshold(uni, "any.host", fair) == 127
        # fair share still dominates when larger
        assert salt_threshold(cfg, "tail.host", 40) == 40

    def test_tiered_crawl_matches_oracle_and_budgets(
        self, ray_session, small_corpus, learned_plan, tmp_path_factory
    ):
        """Distributed tiered crawl == single-process oracle under the
        same tier config, and per-(round, host) fetch counts respect
        each host's TIER budget (not the uniform token cap)."""
        from mlscraper_ray.frontier.config import CrawlConfig
        from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order
        from mlscraper_ray.frontier.oracle import oracle_crawl
        from mlscraper_ray.pipelines.crawl_pipeline import tiers_from_counts
        from mlscraper_ray.pipelines.truth_oracles import _host_page_counts_local

        corpus, spec = small_corpus
        counts = _host_page_counts_local(corpus)
        cfg = CrawlConfig(
            n_shards=4,
            n_buckets=spec.n_buckets,
            tokens_per_round=2,
            max_rounds=20,
            max_depth=24,
            plan=learned_plan,
            host_tiers=tiers_from_counts(counts),
            tier_budgets=[4, 2, 1],
        )
        out = str(tmp_path_factory.mktemp("tiered_out"))
        RayCrawler(corpus, out, cfg).run()
        got = crawl_order(out).to_pandas()

        fetches, _, _, _ = oracle_crawl(corpus, cfg)
        want = [(r, d, h, u) for (r, d, h, u) in fetches]
        assert list(zip(got["round"], got["depth"], got["host"], got["url"])) == want

        per = got.groupby(["round", "host"]).size()
        for (_, host), n in per.items():
            assert n <= cfg.budget_for(host), (host, n)
        # non-vacuous: some host actually used a budget above the
        # uniform tokens_per_round, and some tail host was clamped to 1
        assert (got.groupby(["round", "host"]).size() > cfg.tokens_per_round).any()
        assert any(cfg.budget_for(h) == 1 for h in got["host"].unique())

    def test_rank_driven_tiers_differ_from_count_tiers(self, ray_session):
        """The rank-driven tier map must actually CHANGE the crawl:
        among the equal-page-count torso hosts the count proxy ties
        (tier by host name) while PageRank mass does not — so the two
        tier maps, and the resulting orders, differ (both separately
        oracle-pinned)."""
        from mlscraper_ray.pipelines.crawl_pipeline import (
            crawl_order_ranked_query,
            crawl_order_tiered_query,
        )

        ranked = crawl_order_ranked_query("/root/testdata/sf0.001").to_pandas()
        tiered = crawl_order_tiered_query("/root/testdata/sf0.001").to_pandas()
        assert not ranked.equals(tiered)
        assert len(ranked) > 0 and len(tiered) > 0


class TestRecrawlTTL:
    """The delete-capable (cuckoo) seen-set path: urls expire after
    recrawl_after_rounds rounds and are re-fetched on rediscovery."""

    def test_shard_evicts_and_readmits(self, small_corpus):
        from mlscraper_ray.frontier.shard import FrontierShard
        from mlscraper_ray.state.cuckoo import CuckooFilter

        corpus, _ = small_corpus
        cfg = CrawlConfig(n_shards=1, tokens_per_round=4, recrawl_after_rounds=2)
        shard = FrontierShard(0, cfg, corpus)
        assert isinstance(shard.seen, CuckooFilter)
        url = "http://ttl.example/page"

        shard.submit([url], [1])
        assert shard.admit()["url"].to_pylist() == [url]  # round 0: fetched
        shard.submit([url], [1])
        assert shard.admit()["url"].to_pylist() == []  # round 1: still seen
        assert shard.get_counters()["dropped_seen"] == 1
        shard.submit([url], [1])
        # round 2: round-0 admission expired (ttl=2) -> re-admitted
        assert shard.admit()["url"].to_pylist() == [url]
        assert shard.get_counters()["recrawl_evicted"] == 1
        assert shard.get_counters()["admitted"] == 2

    def test_recrawl_crawl_matches_oracle(self, ray_session, small_corpus, tmp_path_factory):
        from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order

        corpus, _ = small_corpus
        cfg = CrawlConfig(
            n_shards=4, tokens_per_round=2, max_rounds=10, max_depth=6,
            recrawl_after_rounds=3,
        )
        out = str(tmp_path_factory.mktemp("recrawl"))
        stats = RayCrawler(corpus, out, cfg).run()
        order = crawl_order(out)
        fetches, seen, _, counters = oracle_crawl(corpus, cfg)
        ray_order = list(
            zip(
                order["round"].to_pylist(),
                order["depth"].to_pylist(),
                order["host"].to_pylist(),
                order["url"].to_pylist(),
            )
        )
        assert ray_order == fetches
        assert stats["seen"] == len(seen)
        assert stats["counters"]["recrawl_evicted"] == counters["recrawl_evicted"] > 0
        # some url really was fetched more than once
        from collections import Counter as C

        url_counts = C(u for _, _, _, u in fetches)
        assert max(url_counts.values()) > 1

    def test_recrawl_resume_identical(self, ray_session, small_corpus, tmp_path_factory):
        """Checkpoint carries the cuckoo filter + expiry ring: a resumed
        recrawl run reproduces the uninterrupted one byte-for-byte."""
        from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order

        corpus, _ = small_corpus
        cfg = CrawlConfig(
            n_shards=4, tokens_per_round=2, max_rounds=8, max_depth=6,
            recrawl_after_rounds=3,
        )
        full_out = str(tmp_path_factory.mktemp("rc_full"))
        RayCrawler(corpus, full_out, cfg).run()
        full_order = crawl_order(full_out).to_pylist()

        part_out = str(tmp_path_factory.mktemp("rc_part"))
        shutil.copytree(full_out, part_out, dirs_exist_ok=True)
        for pat in ("rounds/round=*", "checkpoint/round=*"):
            for rd in glob.glob(f"{part_out}/{pat}"):
                if int(rd.rsplit("=", 1)[1]) > 3:
                    shutil.rmtree(rd)
        crawler, next_round = RayCrawler.resume(corpus, part_out)
        assert next_round == 4
        crawler.run(start_round=next_round)
        assert crawl_order(part_out).to_pylist() == full_order


def test_recrawl_query_matches_oracle(ray_session):
    """The driver-visible crawl_order_recrawl query reproduces the
    single-process oracle under the same recrawl config."""
    from mlscraper_ray.pipelines.crawl_pipeline import (
        corpus_for_sf,
        crawl_config_for,
        crawl_order_recrawl_query,
        learn_plan,
    )

    order = crawl_order_recrawl_query("/root/testdata/sf0.001")
    corpus_dir, spec = corpus_for_sf(0.001)
    cfg = crawl_config_for(spec, learn_plan(corpus_dir, spec), tokens_per_round=8, max_rounds=10)
    cfg.recrawl_after_rounds = 3
    fetches, _, _, _ = oracle_crawl(corpus_dir, cfg)
    ray_order = list(
        zip(
            order["round"].to_pylist(),
            order["depth"].to_pylist(),
            order["host"].to_pylist(),
            order["url"].to_pylist(),
        )
    )
    assert ray_order == fetches


def test_crawl_order_dataset_write_parquet_roundtrip(crawl_run, tmp_path):
    """The scale-path consumer: crawl_order_dataset -> write_parquet
    reproduces the driver-contract table exactly (rank assignment is
    value-deterministic, not block-layout-dependent)."""
    from mlscraper_ray.frontier.crawler import crawl_order, crawl_order_dataset

    _, out_dir, _, _ = crawl_run
    dest = str(tmp_path / "order_parquet")
    crawl_order_dataset(out_dir).write_parquet(dest)
    back = (
        pq.read_table(dest)
        .to_pandas()
        .sort_values("rank", ignore_index=True)
    )
    direct = crawl_order(out_dir).to_pandas()
    assert back[direct.columns.tolist()].equals(direct)


def test_extract_all_dataset_twin_matches_contract_table(ray_session, tmp_path):
    """Production-path twin: the resumable partitioned sink
    round-trips to exactly the driver-contract extract_all table, and
    a re-run skips every committed bucket (resume contract)."""
    import os

    from mlscraper_ray.pipelines.crawl_pipeline import (
        extract_all_query,
        extract_all_to_parquet,
    )

    sf_dir = "/root/testdata/sf0.001"
    dest = str(tmp_path / "extracted")
    first = extract_all_to_parquet(sf_dir, dest)
    assert first["written"] > 1 and first["skipped"] == 0
    back = (
        pq.read_table(dest, columns=["url", "value_json"])
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    direct = extract_all_query(sf_dir).to_pandas()
    assert back[direct.columns.tolist()].equals(direct)
    # resume: everything committed -> all skipped, nothing rewritten
    again = extract_all_to_parquet(sf_dir, dest)
    assert again == {"written": 0, "skipped": first["written"]}
    # a bucket whose marker is missing (crashed mid-write) is redone
    victim = sorted(p for p in os.listdir(dest))[0]
    os.remove(os.path.join(dest, victim, "_SUCCESS"))
    third = extract_all_to_parquet(sf_dir, dest)
    assert third == {"written": 1, "skipped": first["written"] - 1}
