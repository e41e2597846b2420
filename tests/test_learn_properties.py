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


@st.composite
def templated_site(draw):
    """A 3-page site from one template with per-page values: train on
    two pages, hold out the third (the reference's core use case)."""
    n_keys = draw(st.integers(1, 3))
    keys = KEYS[:n_keys]
    wrapper = draw(st.sampled_from(["div", "section"]))
    tags = {k: draw(st.sampled_from(["span", "p", "b"])) for k in keys}
    noise = draw(st.integers(0, 2))
    pages = []
    for p in range(3):
        values = {k: f"pg{p}_{k}_{draw(st.integers(0, 999))}" for k in keys}
        parts = ["<html><body>"]
        for i in range(noise):
            parts.append(f"<p>noise {i}</p>")
        parts.append(f"<{wrapper}>")
        for k in keys:
            parts.append(f'<{tags[k]} class="f-{k}">{values[k]}</{tags[k]}>')
        parts.append(f"</{wrapper}></body></html>")
        pages.append(("".join(parts).encode(), values))
    return pages


@settings(max_examples=30, deadline=None)
@given(templated_site())
def test_train_on_two_pages_generalizes_to_third(pages):
    ts = TrainingSet()
    for html, values in pages[:2]:
        ts.add_sample(Sample(parse_html(html), values))
    scraper = scraper_from_plan(train_scraper(ts).to_plan())
    held_html, held_values = pages[2]
    assert scraper.get(parse_html(held_html)) == held_values


@st.composite
def list_page(draw):
    """Entries rendered as a uniform list — the ListScraper path."""
    n = draw(st.integers(2, 5))
    vals = [f"item_{i}_{draw(st.integers(0, 999))}" for i in range(n)]
    tag = draw(st.sampled_from(["li", "p", "span"]))
    inner = "".join(f'<{tag} class="entry">{v}</{tag}>' for v in vals)
    return f"<html><body><ul>{inner}</ul></body></html>".encode(), vals


@settings(max_examples=30, deadline=None)
@given(list_page())
def test_train_apply_roundtrip_list_values(page):
    html, vals = page
    ts = TrainingSet()
    ts.add_sample(Sample(parse_html(html), vals))
    scraper = scraper_from_plan(train_scraper(ts).to_plan())
    assert scraper.get(parse_html(html)) == vals


@settings(max_examples=15, deadline=None)
@given(st.integers(10, 60), st.integers(0, 999))
def test_train_apply_wide_document(width, salt):
    """Wide sibling runs force multi-digit :nth-child positions: the
    target is one undistinguished <td> among `width` identical ones, so
    only a position-based selector can pin it."""
    idx = width // 2
    cells = "".join(
        f"<td>{'target_' + str(salt) if i == idx else f'cell{i}'}</td>"
        for i in range(width)
    )
    html = f"<html><body><table><tr>{cells}</tr></table></body></html>".encode()
    values = {"v": f"target_{salt}"}
    ts = TrainingSet()
    ts.add_sample(Sample(parse_html(html), values))
    scraper = scraper_from_plan(train_scraper(ts).to_plan())
    assert scraper.get(parse_html(html)) == values
