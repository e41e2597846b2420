"""Deterministic synthetic web-page corpus (Common-Crawl-style).

Produces the engine's primary input table with the authoritative shape
from BASELINE.json ``input_hint``:

    url: string, warc_ts: timestamp[us], html: binary,
    text: string, lang: string

Layout: ``out_dir/pages/hb=NNNN/part-0.parquet`` — one parquet file per
host-hash bucket (``crc32(host) % n_buckets``). The bucket is the unit
of the fetch-stage lookup join and stays stable across scales, so a
frontier row can be routed to its page bytes without a corpus-wide
shuffle. At 100 TB each bucket would be a directory of row-group-sized
files; the layout contract (prefix by host bucket) is the same.

Also writes:

- ``out_dir/seeds.parquet``: (url, depth=0) crawl seeds
- ``out_dir/samples.json``: labeled training samples (url -> value)
  for the extraction learner
- ``out_dir/golden.parquet``: (url, expected_json) — generator-computed
  expected extraction output for EVERY page (the byte-identical oracle)

Everything is a pure function of (spec, seed): page content, link
graph, robots rules, timestamps. No external data, no wall clock.

Page families mirror the reference's fixture cases (FIXTURES.md):
entry lists with text + attribute values (the stackoverflow-answer
analog, /root/reference/tests/conftest.py:11-27 shape).
"""
from __future__ import annotations

import json
import os
import random
import zlib
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_BASE_TS_US = 1609459200_000_000  # 2021-01-01T00:00:00Z in microseconds

_WORDS = (
    "data web crawl engine ray arrow batch stream shard host page link "
    "index frontier parse extract select learn match value scale block"
).split()


def host_bucket(host: str, n_buckets: int) -> int:
    return zlib.crc32(host.encode()) % n_buckets


def url_host(url: str) -> str:
    return url.split("/", 3)[2]


@dataclass
class CorpusSpec:
    version: int = 5  # bump to invalidate cached corpora on format change
    n_hosts: int = 12
    pages_per_host: int = 10
    n_buckets: int = 16
    seed: int = 42
    entries_per_page: int = 6
    n_seeds: int = 4
    # hosts 0..2 get 8x/4x/2x pages: deterministic skew for salting tests
    skew_factors: tuple = (8, 4, 2)
    # every 5th host disallows /private/; every 7th page is private
    robots_every: int = 5
    private_every: int = 7
    filler_words: int = 40  # page body padding; ~1200 gives CC-ish ~8KB pages

    def host(self, h: int) -> str:
        return f"h{h:04d}.example"

    def n_pages(self, h: int) -> int:
        factor = self.skew_factors[h] if h < len(self.skew_factors) else 1
        return self.pages_per_host * factor

    def page_path(self, h: int, i: int) -> str:
        if i % self.private_every == 0 and i > 0:
            return f"/private/{i}"
        return f"/p/{i}"

    def page_url(self, h: int, i: int) -> str:
        return f"http://{self.host(h)}{self.page_path(h, i)}"

    def robots_url(self, h: int) -> str:
        return f"http://{self.host(h)}/robots.txt"

    def host_disallows_private(self, h: int) -> bool:
        return h % self.robots_every == 0


def _page_rng(spec: CorpusSpec, h: int, i: int) -> random.Random:
    return random.Random(f"{spec.seed}:{h}:{i}")


def page_entries(spec: CorpusSpec, h: int, i: int) -> list[dict]:
    """The golden extraction value for page (h, i): the entry list the
    generated html embeds (all leaves strings, reference value model)."""
    rng = _page_rng(spec, h, i)
    n = 1 + rng.randrange(spec.entries_per_page)
    entries = []
    for k in range(n):
        uid = rng.randrange(100000)
        day = 1 + rng.randrange(28)
        # urn: scheme on purpose — profile refs are extracted as
        # attribute values but are not crawlable links (extract_links
        # drops non-http schemes), so they don't flood the frontier
        # votes offset by entry index: unique within a page, which keeps
        # the training match search linear (no cross-entry ambiguity)
        entries.append(
            {
                "user": f"urn:u:{uid}:user{uid}",
                "votes": str(k * 1000 + rng.randrange(500)),
                "when": f"2021-{1 + rng.randrange(12):02d}-{day:02d} "
                f"{rng.randrange(24):02d}:{rng.randrange(60):02d}:00Z",
            }
        )
    return entries


def page_links(spec: CorpusSpec, h: int, i: int) -> list[str]:
    """Deterministic out-links, shaped for a small graph diameter so
    BFS coverage doesn't need pathological depth:

    - intra-host: a 3-ary tree (page i -> 3i+1..3i+3) covering every
      page in ~log3(n) hops, plus one affine cross-link for richness;
    - cross-host: exponential hop (h + 2^(i%7)) so any host is within
      ~log2(H) host hops of a seed;
    - a deterministic dangling link on every 10th page (fetch-miss
      handling stays covered).
    """
    n = spec.n_pages(h)
    targets = []
    for child in range(3 * i + 1, 3 * i + 4):
        if child < n:
            targets.append(spec.page_url(h, child))
    j = (i * 7 + 2) % n
    if j != i:
        targets.append(spec.page_url(h, j))
    nh = (h + (1 << (i % 7))) % spec.n_hosts
    targets.append(spec.page_url(nh, (i * 5 + 3) % spec.n_pages(nh)))
    if i % 10 == 7:
        targets.append(f"http://{spec.host(h)}/missing/{i}")
    # dedup, stable order
    seen, out = set(), []
    for t in targets:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def render_page(spec: CorpusSpec, h: int, i: int) -> tuple[str, str]:
    """Returns (html, text) where ``text`` is exactly what
    ``parse_html(html).text`` yields (pinned by a test), so the corpus
    text column is computed without a parse per page."""
    rng = _page_rng(spec, h, i)
    entries = page_entries(spec, h, i)
    links = page_links(spec, h, i)
    filler = " ".join(rng.choice(_WORDS) for _ in range(spec.filler_words))
    html_parts = ["<html><head><title>page</title></head><body>"]
    text_parts = ["page"]

    title = f"{spec.host(h)} page {i}"
    html_parts.append(f'<div class="header"><h1>{title}</h1></div>')
    text_parts.append(title)

    html_parts.append('<div class="content">')
    for e in entries:
        body = " ".join(rng.choice(_WORDS) for _ in range(12))
        html_parts.append(
            f'<div class="entry"><span class="votes">{e["votes"]}</span>'
            f'<div class="who"><a href="{e["user"]}">user</a></div>'
            f'<span class="when" title="{e["when"]}">some time ago</span>'
            f'<p class="body">{body}</p></div>'
        )
        text_parts += [e["votes"], "user", "some time ago", body]
    html_parts.append("</div>")

    html_parts.append('<ul class="links">')
    for u in links:
        anchor = u.rsplit("/", 1)[-1]
        html_parts.append(f'<li><a href="{u}">{anchor}</a></li>')
        text_parts.append(anchor)
    html_parts.append("</ul>")

    html_parts.append(f'<div class="footer"><p>{filler}</p></div>')
    text_parts.append(filler)
    html_parts.append("</body></html>")
    return "".join(html_parts), "".join(text_parts)


# the per-entry element template render_page emits, as (tag, class)
# pairs — the synthesis-time structure expected_plan derives from
_ENTRY_TEMPLATE: tuple[tuple[str, str | None], ...] = (
    ("span", "votes"),
    ("div", "who"),
    ("a", None),
    ("span", "when"),
    ("p", "body"),
)
# page-level element inventory (one row per template POSITION; the
# entry block repeats but is structurally identical, so uniqueness
# over kinds equals uniqueness over the rendered page)
_PAGE_TEMPLATE: tuple[tuple[str, str | None], ...] = (
    ("html", None),
    ("head", None),
    ("title", None),
    ("body", None),
    ("div", "header"),
    ("h1", None),
    ("div", "content"),
    ("div", "entry"),
    *_ENTRY_TEMPLATE,
    ("ul", "links"),
    ("li", None),
    ("a", None),  # nav links — a second <a> kind at page level
    ("div", "footer"),
    ("p", None),
)
# which template element carries each sample key, and how the golden
# value is embedded there (text content vs an attribute)
_FIELD_TEMPLATE: dict[str, tuple[tuple[str, str | None], dict]] = {
    "user": (("a", None), {"kind": "attr", "attr": "href"}),
    "votes": (("span", "votes"), {"kind": "text"}),
    "when": (("span", "when"), {"kind": "attr", "attr": "title"}),
}


def _template_selector(
    target: tuple[str, str | None], inventory: tuple[tuple[str, str | None], ...]
) -> str:
    """Shortest-first unique selector for a template element kind —
    the synthesis-time mirror of the learner's deterministic search:
    candidates ordered by (len, lex) exactly like
    learn/selectors.py's ordering upgrade, kept iff they match ONLY
    the target kind in the inventory (the learner's ordered-equality
    uniqueness check, reduced to the template's element kinds)."""
    tag, cls = target
    cands = sorted(
        [tag] + ([f".{cls}"] if cls else []), key=lambda s: (len(s), s)
    )
    for cand in cands:
        if cand.startswith("."):
            hits = [e for e in inventory if e[1] == cand[1:]]
        else:
            hits = [e for e in inventory if e[0] == cand]
        if hits and all(e == target for e in hits):
            return cand
    raise AssertionError(f"template has no unique selector for {target}")


def expected_plan() -> dict:
    """The plan the reference-semantics learner MUST produce on this
    corpus's labeled samples, derived from the SYNTHESIS-TIME template
    (render_page's structure) — never by running the learner. This is
    the independent truth source that upgrades the ``learn_plan``
    queries from rows-only to a full value pin: a behavior change in
    the match search / selector generation / training orchestration
    shows up as a plan-JSON mismatch against this constant.

    Derivation: sample values are entry LISTS of {user, votes, when}
    dicts, so the plan is list(dict(...)). The list selector is the
    (len, lex)-first selector unique to the entry root among the
    page-level element kinds; each field's selector is the
    (len, lex)-first selector unique to its carrier among the ENTRY
    subtree's kinds (value selectors are rooted at the matched item),
    with the extractor read straight from how render_page embeds the
    golden value (text node vs attribute). Spec-independent: every
    scale renders the same template."""
    keys = {}
    for field, (target, extractor) in _FIELD_TEMPLATE.items():
        keys[field] = {
            "kind": "value",
            "selector": {
                "kind": "css",
                "rule": _template_selector(target, _ENTRY_TEMPLATE),
            },
            "extractor": extractor,
        }
    return {
        "kind": "list",
        "selector": {
            "kind": "css",
            "rule": _template_selector(("div", "entry"), _PAGE_TEMPLATE),
        },
        "item": {"kind": "dict", "keys": keys},
    }


def render_robots(spec: CorpusSpec, h: int) -> str:
    if spec.host_disallows_private(h):
        return "User-agent: *\nDisallow: /private/\n"
    return "User-agent: *\nDisallow:\n"


def page_warc_ts(spec: CorpusSpec, h: int, i: int) -> int:
    """Deterministic microsecond timestamp."""
    return _BASE_TS_US + (h * 86400 + i * 61) * 1_000_000


def generate_corpus(out_dir: str, spec: CorpusSpec | None = None) -> dict:
    """Write the corpus; returns summary counts. Idempotent: skips work
    if a matching _SPEC.json already exists (cache for tests/bench)."""
    spec = spec or CorpusSpec()
    spec_json = json.dumps(spec.__dict__, sort_keys=True, default=list)
    marker = os.path.join(out_dir, "_SPEC.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == spec_json:
                with open(os.path.join(out_dir, "_SUMMARY.json")) as f:
                    return json.load(f)

    buckets: dict[int, dict[str, list]] = {}

    def add_row(url, ts, html, text):
        hb = host_bucket(url_host(url), spec.n_buckets)
        cols = buckets.setdefault(
            hb, {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
        )
        cols["url"].append(url)
        cols["warc_ts"].append(ts)
        cols["html"].append(html.encode())
        cols["text"].append(text)
        cols["lang"].append("en")

    golden_urls, golden_json = [], []
    n_pages = 0
    for h in range(spec.n_hosts):
        robots_body = render_robots(spec, h)
        add_row(spec.robots_url(h), page_warc_ts(spec, h, 0) - 1_000_000, robots_body, robots_body)
        for i in range(spec.n_pages(h)):
            html, text = render_page(spec, h, i)
            add_row(spec.page_url(h, i), page_warc_ts(spec, h, i), html, text)
            golden_urls.append(spec.page_url(h, i))
            golden_json.append(json.dumps(page_entries(spec, h, i), sort_keys=True))
            n_pages += 1

    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    for hb, cols in sorted(buckets.items()):
        bdir = os.path.join(pages_dir, f"hb={hb:04d}")
        os.makedirs(bdir, exist_ok=True)
        table = pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
                "html": pa.array(cols["html"], pa.binary()),
                "text": pa.array(cols["text"], pa.string()),
                "lang": pa.array(cols["lang"], pa.string()),
            }
        )
        # url-sorted with small row groups: the fetch lookup reads with
        # an url predicate and row-group min/max stats prune everything
        # but the touched groups (cold lookup cost ~ hits, not bucket
        # size — the property that matters at 100 TB)
        table = table.sort_by("url")
        pq.write_table(table, os.path.join(bdir, "part-0.parquet"), row_group_size=256)

    # seeds: first page of the first n_seeds hosts
    seed_urls = [spec.page_url(h, 1) for h in range(min(spec.n_seeds, spec.n_hosts))]
    pq.write_table(
        pa.table({"url": pa.array(seed_urls), "depth": pa.array([0] * len(seed_urls), pa.int32())}),
        os.path.join(out_dir, "seeds.parquet"),
    )

    # training samples: two labeled pages (entry-list extraction)
    samples = [
        {"url": spec.page_url(0, 1), "value": page_entries(spec, 0, 1)},
        {"url": spec.page_url(1, 1), "value": page_entries(spec, 1, 1)},
    ]
    with open(os.path.join(out_dir, "samples.json"), "w") as f:
        json.dump(samples, f, sort_keys=True)

    pq.write_table(
        pa.table({"url": pa.array(golden_urls), "expected_json": pa.array(golden_json)}),
        os.path.join(out_dir, "golden.parquet"),
    )

    summary = {
        "n_pages": n_pages,
        "n_hosts": spec.n_hosts,
        "n_buckets": spec.n_buckets,
        "n_seeds": len(seed_urls),
    }
    with open(os.path.join(out_dir, "_SUMMARY.json"), "w") as f:
        json.dump(summary, f)
    with open(marker, "w") as f:
        f.write(spec_json)
    return summary


def spec_for_scale(sf: float, seed: int = 42) -> CorpusSpec:
    """Map a testdata-style scale factor to a corpus size.

    sf=0.001 -> ~200 pages, sf=0.01 -> ~2k, sf=0.1 -> ~20k.
    """
    n_hosts = max(6, int(40 * (sf / 0.01) ** 0.5))
    pages_per_host = max(6, int(1300 * sf))
    # bench-scale pages carry Common-Crawl-ish weight — and crucially
    # ELEMENT count (parse cost scales with tags, not text bytes):
    # ~24 entry blocks x 5 elements + filler ~= a few-KB real page
    if sf >= 0.05:
        entries, filler = 40, 600
    else:
        entries, filler = 6, 120
    return CorpusSpec(
        n_hosts=n_hosts,
        pages_per_host=pages_per_host,
        seed=seed,
        entries_per_page=entries,
        filler_words=filler,
    )
