"""CLI entry point for the crawl engine.

Usage (this process owns the Ray session; the driver-facing
__ray_entry__ module never inits Ray):

  # generate a corpus, learn the plan, crawl it
  python -m mlscraper_ray.pipelines.crawl_cli \\
      --corpus /tmp/corpus --out /tmp/crawlout --sf 0.01 \\
      [--tokens 8] [--max-rounds 40] [--num-cpus 8] [--resume]

On a real cluster the same module runs under ``ray job submit`` with
``--address auto`` semantics; here it is pinned to local mode.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="mlscraper_ray crawler")
    parser.add_argument("--corpus", required=True, help="corpus dir (generated if missing)")
    parser.add_argument("--out", required=True, help="output/checkpoint dir")
    parser.add_argument("--sf", type=float, default=0.001, help="corpus scale if generating")
    parser.add_argument("--tokens", type=int, default=8, help="politeness tokens per host per round")
    parser.add_argument("--max-rounds", type=int, default=40)
    parser.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    parser.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from mlscraper_ray.frontier.crawler import RayCrawler, crawl_order
    from mlscraper_ray.pipelines.crawl_pipeline import crawl_config_for, learn_plan
    from mlscraper_ray.sources.corpusgen import generate_corpus, spec_for_scale

    spec = spec_for_scale(args.sf)
    summary = generate_corpus(args.corpus, spec)
    plan = learn_plan(args.corpus, spec)

    t0 = time.time()
    if args.resume:
        crawler, start_round = RayCrawler.resume(args.corpus, args.out)
        stats = crawler.run(start_round=start_round)
    else:
        cfg = crawl_config_for(spec, plan, args.tokens, args.max_rounds)
        stats = RayCrawler(args.corpus, args.out, cfg).run()
    dt = time.time() - t0

    order = crawl_order(args.out)
    order_path = os.path.join(args.out, "crawl_order.parquet")
    import pyarrow.parquet as pq

    pq.write_table(order, order_path)

    print(
        json.dumps(
            {
                "corpus_pages": summary["n_pages"],
                "fetched": order.num_rows,
                "rounds": len(stats.get("rounds", [])),
                "seen": stats.get("seen"),
                "seconds": round(dt, 2),
                "urls_per_sec": round(order.num_rows / dt, 1) if dt else None,
                "crawl_order": order_path,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
