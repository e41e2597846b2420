"""Speculative-parallel training must return the exact plan the
sequential searcher returns (lowest-index success), just faster."""
import json
import os

import pytest

from mlscraper_ray.htmlcore.dom import parse_html
from mlscraper_ray.learn.samples import Sample, TrainingSet
from mlscraper_ray.learn.training import train_scraper

STATIC = "/root/reference/tests/static"


def _seq_plan(samples, complexity):
    ts = TrainingSet()
    for html, value_json in samples:
        ts.add_sample(Sample(parse_html(html), json.loads(value_json)))
    return train_scraper(ts, complexity=complexity).to_plan()


def test_parallel_equals_sequential_small(ray_session):
    from mlscraper_ray.learn.parallel import train_scraper_parallel

    html = (
        b"<html><body><div class='x'><p class='t'>alpha</p><span class='v'>1</span></div>"
        b"<div class='x'><p class='t'>beta</p><span class='v'>2</span></div></body></html>"
    )
    value = json.dumps([{"t": "alpha", "v": "1"}, {"t": "beta", "v": "2"}])
    samples = [(html, value)]
    assert train_scraper_parallel(samples, window=2) == _seq_plan(samples, 100)


@pytest.mark.skipif(not os.path.isdir(STATIC), reason="reference fixtures absent")
def test_parallel_equals_sequential_github(ray_session):
    from mlscraper_ray.learn.parallel import train_scraper_parallel
    from tests.test_reference_golden import GITHUB_PROFILES

    samples = []
    for login in ["lorey", "siboehm"]:
        with open(os.path.join(STATIC, f"github/{login}.html"), "rb") as f:
            samples.append((f.read(), json.dumps(GITHUB_PROFILES[login])))
    par = train_scraper_parallel(samples, complexity=2, window=4, max_inflight=4)
    assert par == _seq_plan(samples, 2)
