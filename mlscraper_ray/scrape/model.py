"""Scraper model: extractors, selectors, and the scraper tree.

Semantic port of the reference's applied artifacts —
``/root/reference/mlscraper/matches.py:61-112`` (extractors),
``selectors.py:16-56`` (selectors), ``scrapers.py:6-53`` (scraper
tree) — over our stdlib DOM, plus a JSON plan format so a learned
scraper can be broadcast to Ray workers (the reference keeps scrapers
as in-process object graphs; ours must cross process boundaries).

Plan format (JSON-serializable dict):

- selector: ``{"kind": "css", "rule": "p.x"}`` | ``{"kind": "pass"}``
- extractor: ``{"kind": "text"}`` | ``{"kind": "attr", "attr": "href"}``
- scraper: ``{"kind": "value", "selector": S, "extractor": E}``
         | ``{"kind": "list", "selector": S, "item": P}``
         | ``{"kind": "dict", "keys": {k: P, ...}}``
"""
from __future__ import annotations

from typing import Optional


class Extractor:
    """Pulls a string out of a node (reference ``matches.py:61-67``)."""

    def extract(self, node):
        raise NotImplementedError()

    def to_plan(self) -> dict:
        raise NotImplementedError()


class TextValueExtractor(Extractor):
    """``node.soup.text.strip()`` (reference ``matches.py:70-76``)."""

    def extract(self, node):
        return node.text.strip()

    def to_plan(self):
        return {"kind": "text"}

    def __repr__(self):
        return "<TextValueExtractor>"

    def __hash__(self):
        return 0

    def __eq__(self, other):
        return isinstance(other, TextValueExtractor)


class AttributeValueExtractor(Extractor):
    """``node.soup[attr]`` if present else ``None``
    (reference ``matches.py:91-103``)."""

    def __init__(self, attr: str):
        self.attr = attr

    def extract(self, node):
        if self.attr in node.attrs:
            return node.attrs[self.attr]
        return None

    def to_plan(self):
        return {"kind": "attr", "attr": self.attr}

    def __repr__(self):
        return f"<AttributeValueExtractor {self.attr=}>"

    def __hash__(self):
        return hash(self.attr)

    def __eq__(self, other):
        return isinstance(other, AttributeValueExtractor) and self.attr == other.attr


class Selector:
    def select_one(self, node):
        raise NotImplementedError()

    def select_all(self, node):
        raise NotImplementedError()

    def to_plan(self) -> dict:
        raise NotImplementedError()


class PassThroughSelector(Selector):
    """Identity select (reference ``selectors.py:28-34``)."""

    def select_one(self, node):
        return node

    def select_all(self, node):
        raise RuntimeError("cannot apply select_all to PassThroughSelector")

    def to_plan(self):
        return {"kind": "pass"}

    def __repr__(self):
        return "<PassThroughSelector>"


class SelectorMissException(AssertionError):
    """Raised when a css rule matches nothing (the reference raises a
    bare AssertionError, ``selectors.py:43-46``)."""


class CssRuleSelector(Selector):
    """First-hit / all-hits css select (reference ``selectors.py:37-56``)."""

    def __init__(self, css_rule: str):
        self.css_rule = css_rule

    def select_one(self, node):
        selection = node.select(self.css_rule, limit=1)
        if not selection:
            raise SelectorMissException(
                f"css rule does not match any node ({self.css_rule=}, {node=})"
            )
        return selection[0]

    def select_all(self, node):
        return node.select(self.css_rule)

    def uniquely_selects(self, root, nodes) -> bool:
        # limit len+1 ensures a mismatch when the selection is a strict
        # superset prefix (reference ``selectors.py:59-70``)
        nodes = list(nodes)
        sel = root.select(self.css_rule, limit=len(nodes) + 1)
        return len(sel) == len(nodes) and all(a is b for a, b in zip(sel, nodes))

    def to_plan(self):
        return {"kind": "css", "rule": self.css_rule}

    def __repr__(self):
        return f"<CssRuleSelector {self.css_rule=}>"


# -- plan-node registries ------------------------------------------------
# The reference's extension points are the abstract bases Extractor
# (matches.py:61-67), Selector (selectors.py:16-25) and Scraper
# (scrapers.py:6-8). Here extension is a plan-kind registry: register a
# factory under a kind string and plans carrying that kind deserialize
# to your class on every worker (plans are plain JSON, so a registered
# kind is the only coupling that crosses process boundaries).

SELECTOR_REGISTRY: dict = {
    "css": lambda plan: CssRuleSelector(plan["rule"]),
    "pass": lambda plan: PassThroughSelector(),
}

EXTRACTOR_REGISTRY: dict = {
    "text": lambda plan: TextValueExtractor(),
    "attr": lambda plan: AttributeValueExtractor(plan["attr"]),
}


def register_selector(kind: str, factory) -> None:
    SELECTOR_REGISTRY[kind] = factory


def register_extractor(kind: str, factory) -> None:
    EXTRACTOR_REGISTRY[kind] = factory


def selector_from_plan(plan: dict) -> Selector:
    try:
        return SELECTOR_REGISTRY[plan["kind"]](plan)
    except KeyError:
        raise ValueError(f"unknown selector plan {plan!r}") from None


def extractor_from_plan(plan: dict) -> Extractor:
    try:
        return EXTRACTOR_REGISTRY[plan["kind"]](plan)
    except KeyError:
        raise ValueError(f"unknown extractor plan {plan!r}") from None


class Scraper:
    def get(self, node):
        raise NotImplementedError()

    def to_plan(self) -> dict:
        raise NotImplementedError()


class ValueScraper(Scraper):
    """selector + extractor (reference ``scrapers.py:41-50``)."""

    def __init__(self, selector: Selector, extractor: Extractor):
        self.selector = selector
        self.extractor = extractor

    def get(self, node):
        return self.extractor.extract(self.selector.select_one(node))

    def to_plan(self):
        return {
            "kind": "value",
            "selector": self.selector.to_plan(),
            "extractor": self.extractor.to_plan(),
        }

    def __repr__(self):
        return f"<ValueScraper {self.selector=}, {self.extractor=}>"


class ListScraper(Scraper):
    """selector for item nodes + per-item scraper
    (reference ``scrapers.py:24-38``)."""

    def __init__(self, selector: Selector, scraper: Scraper):
        self.selector = selector
        self.scraper = scraper

    def get(self, node):
        return [self.scraper.get(n) for n in self.selector.select_all(node)]

    def to_plan(self):
        return {
            "kind": "list",
            "selector": self.selector.to_plan(),
            "item": self.scraper.to_plan(),
        }

    def __repr__(self):
        return f"<ListScraper {self.selector=} {self.scraper=}>"


class DictScraper(Scraper):
    """key -> scraper fan-out on the same node
    (reference ``scrapers.py:11-21``)."""

    def __init__(self, scraper_per_key: dict):
        self.scraper_per_key = scraper_per_key

    def get(self, node):
        return {k: s.get(node) for k, s in self.scraper_per_key.items()}

    def to_plan(self):
        return {
            "kind": "dict",
            "keys": {k: s.to_plan() for k, s in self.scraper_per_key.items()},
        }

    def __repr__(self):
        return f"<DictScraper {self.scraper_per_key=}>"


def scraper_from_plan(plan: dict) -> Scraper:
    kind = plan["kind"]
    if kind == "value":
        return ValueScraper(
            selector_from_plan(plan["selector"]),
            extractor_from_plan(plan["extractor"]),
        )
    if kind == "list":
        return ListScraper(
            selector_from_plan(plan["selector"]), scraper_from_plan(plan["item"])
        )
    if kind == "dict":
        return DictScraper({k: scraper_from_plan(p) for k, p in plan["keys"].items()})
    raise ValueError(f"unknown scraper plan {plan!r}")
