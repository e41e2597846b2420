"""Property-based learner test: for ANY generated page where each
target value appears exactly once in its own element, training must
find a scraper whose application reproduces the sample exactly (the
train->apply round-trip invariant behind the byte-identical contract)."""
import hypothesis.strategies as st
from hypothesis import given, settings

from mlscraper_ray.htmlcore.dom import parse_html
from mlscraper_ray.learn.samples import Sample, TrainingSet
from mlscraper_ray.learn.training import train_scraper
from mlscraper_ray.scrape.model import scraper_from_plan

KEYS = ["name", "city", "score", "note"]


@st.composite
def labeled_page(draw):
    n_keys = draw(st.integers(1, 4))
    keys = KEYS[:n_keys]
    # unique values so matches are unambiguous by construction
    values = {k: f"v{i}_{draw(st.integers(0, 999))}" for i, k in enumerate(keys)}
    noise = draw(st.integers(0, 3))
    parts = ["<html><body>"]
    for i in range(noise):
        parts.append(f"<p>noise {i}</p>")
    wrapper = draw(st.sampled_from(["div", "section", "ul"]))
    parts.append(f"<{wrapper}>")
    for k in keys:
        tag = draw(st.sampled_from(["span", "p", "li", "b"]))
        parts.append(f'<{tag} class="f-{k}">{values[k]}</{tag}>')
    parts.append(f"</{wrapper}>")
    parts.append("</body></html>")
    return "".join(parts).encode(), values


@settings(max_examples=40, deadline=None)
@given(labeled_page())
def test_train_apply_roundtrip(page_and_values):
    html, values = page_and_values
    ts = TrainingSet()
    ts.add_sample(Sample(parse_html(html), values))
    scraper = train_scraper(ts)
    # through the JSON plan, as the Ray apply stage would
    out = scraper_from_plan(scraper.to_plan()).get(parse_html(html))
    assert out == values
