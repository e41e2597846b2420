"""Profile-page training analog of the reference's github suite
(/root/reference/tests/test_training.py:98-158): train a 7-field dict
scraper on two profile pages, predict a third unseen one, with
complexity=2 and mixed text/attribute extractors."""
import pytest

from mlscraper_ray.htmlcore.dom import parse_html
from mlscraper_ray.learn.samples import Sample, TrainingSet
from mlscraper_ray.learn.training import train_scraper
from mlscraper_ray.scrape.model import (
    TextValueExtractor,
    register_extractor,
    register_selector,
    scraper_from_plan,
    selector_from_plan,
)

PROFILES = {
    "karl": {
        "name": "Karl Example",
        "username": "karl",
        "location": "Berlin, Germany",
        "url": "https://karl.example.com",
        "company": "@exampleventures",
        "followers": "197",
        "following": "243",
    },
    "jona": {
        "name": "Jona Sample",
        "username": "jona",
        "location": "Karlsruhe, Germany",
        "url": "https://jona.example.net",
        "company": "@quantsample",
        "followers": "329",
        "following": "20",
    },
    "simo": {
        "name": "Simo Tester",
        "username": "simo",
        "location": "Erlangen, Germany",
        "url": "http://simo.example.org",
        "company": "ExampleCorp",
        "followers": "87",
        "following": "27",
    },
}


def render_profile(p: dict, extra_noise: str) -> bytes:
    # followers/following live in same-class spans: only :nth-child or
    # a path through the labeled <li> disambiguates -> needs complexity 2
    html = f"""
    <html><body>
    <div class="sidebar">
      <h1 class="fullname" itemprop="name">{p['name']}</h1>
      <span class="nick" itemprop="additionalName">{p['username']}</span>
      <ul class="meta">
        <li class="m-org"><span class="val">{p['company']}</span></li>
        <li class="m-loc"><span class="val">{p['location']}</span></li>
        <li class="m-url"><a class="val" href="{p['url']}" rel="me">{p['url']}</a></li>
      </ul>
      <div class="counts">
        <span class="count-num">{p['followers']}</span>
        <span class="count-num">{p['following']}</span>
      </div>
    </div>
    <div class="main"><p>{extra_noise}</p><p>irrelevant 197 noise</p></div>
    </body></html>
    """
    return html.encode()


NOISE = {"karl": "alpha beta", "jona": "gamma delta", "simo": "epsilon zeta"}


class TestProfileTraining:
    def test_train_on_two_predict_third(self):
        ts = TrainingSet()
        for login in ("karl", "jona"):
            ts.add_sample(Sample(parse_html(render_profile(PROFILES[login], NOISE[login])), PROFILES[login]))
        scraper = train_scraper(ts, complexity=2)
        target = "simo"
        page = parse_html(render_profile(PROFILES[target], NOISE[target]))
        assert scraper.get(page) == PROFILES[target]

    def test_plan_roundtrips_and_applies_identically(self):
        ts = TrainingSet()
        for login in ("karl", "jona"):
            ts.add_sample(Sample(parse_html(render_profile(PROFILES[login], NOISE[login])), PROFILES[login]))
        scraper = train_scraper(ts, complexity=2)
        clone = scraper_from_plan(scraper.to_plan())
        page = parse_html(render_profile(PROFILES["simo"], NOISE["simo"]))
        assert clone.get(page) == scraper.get(page)


class TestRegistry:
    def test_custom_extractor_kind(self):
        class UpperTextExtractor(TextValueExtractor):
            def extract(self, node):
                return node.text.strip().upper()

            def to_plan(self):
                return {"kind": "upper_text"}

        register_extractor("upper_text", lambda plan: UpperTextExtractor())
        plan = {
            "kind": "value",
            "selector": {"kind": "css", "rule": "p"},
            "extractor": {"kind": "upper_text"},
        }
        page = parse_html(b"<html><body><p>hello</p></body></html>")
        assert scraper_from_plan(plan).get(page) == "HELLO"

    def test_unknown_kind_raises(self):
        with pytest.raises(ValueError):
            selector_from_plan({"kind": "nope"})
