"""Candidate matches: occurrences of sample values in a page's DOM.

Semantic port of ``/root/reference/mlscraper/html.py:45-57,84-104``
(HTMLMatch / find_all) and ``matches.py:19-234`` (the Match tree) over
our stdlib DOM. Training-only code: runs driver-side (or in a single
Ray task) on a handful of pages; the hot path at scale is the learned
plan's apply stage, not this search.
"""
from __future__ import annotations

import html as html_mod
import re
from itertools import combinations, product
from statistics import mean

from mlscraper_ray.htmlcore.dom import (
    Document,
    Element,
    get_relative_depth,
    get_root_node,
)
from mlscraper_ray.scrape.model import (
    AttributeValueExtractor,
    Extractor,
    TextValueExtractor,
)


class HTMLMatch:
    __slots__ = ("node",)

    def __init__(self, node):
        self.node = node


class HTMLExactTextMatch(HTMLMatch):
    pass


class HTMLAttributeMatch(HTMLMatch):
    __slots__ = ("attr",)

    def __init__(self, node, attr):
        super().__init__(node)
        self.attr = attr


def find_all(scope, item: str):
    """All raw hits of ``item`` under ``scope`` (a Document or Element).

    Port of ``Node._generate_find_all`` (reference ``html.py:84-104``),
    including its quirks:

    - the needle is ``html.escape``d but NOT ``re.escape``d, so regex
      metacharacters in values act as wildcards and values containing
      ``&<>"'`` can never text-match (parsed text is unescaped);
    - a text hit yields the text node's parent element plus every
      ancestor whose stripped text equals the parent's stripped text,
      excluding the document (``html.py:93-97``);
    - the attribute arm compares raw attribute values, so multi-valued
      attributes (lists) never equal a string (``html.py:99-104``).
    """
    assert isinstance(item, str), "can only search for str"
    out = []
    target_regex = re.compile(r"^\s*%s\s*$" % html_mod.escape(item))
    for text_node in scope.iter_text_nodes():
        if target_regex.search(text_node.data):
            node = text_node.parent
            out.append(HTMLExactTextMatch(node))
            node_text = node.text.strip()
            for p in node.ancestors:
                if not isinstance(p, Document) and p.text.strip() == node_text:
                    out.append(HTMLExactTextMatch(p))
    for elem in scope.iter_elements():
        for attr, value in elem.attrs.items():
            if value == item:
                out.append(HTMLAttributeMatch(elem, attr))
    return out


class Match:
    """Occurrence of a sample value on a page (reference ``matches.py:19-58``)."""

    @property
    def root(self):
        raise NotImplementedError()

    def has_overlap(self, other: "Match") -> bool:
        return (
            self.root is other.root
            or self.root.has_ancestor(other.root)
            or other.root.has_ancestor(self.root)
        )

    @property
    def span(self):
        raise NotImplementedError()

    def get_similarity_to(self, match: "Match") -> float:
        raise NotImplementedError()


class ValueMatch(Match):
    __slots__ = ("node", "extractor")

    def __init__(self, node, extractor: Extractor):
        self.node = node
        self.extractor = extractor

    @property
    def root(self):
        return self.node

    @property
    def span(self):
        return 0

    def get_similarity_to(self, match: "Match") -> float:
        assert isinstance(match, ValueMatch)
        if self.extractor != match.extractor:
            return 0
        return get_node_similarity(self.node, match.node)

    def __repr__(self):
        return f"<ValueMatch {self.node=}, {self.extractor=}>"


class DictMatch(Match):
    __slots__ = ("match_by_key", "_root", "_span")

    def __init__(self, match_by_key: dict):
        self.match_by_key = match_by_key
        self._root = None
        self._span = None

    @property
    def root(self):
        if self._root is None:
            self._root = get_root_node([m.root for m in self.match_by_key.values()])
        return self._root

    @property
    def span(self):
        if self._span is None:
            self._span = sum(
                m.span + get_relative_depth(m.root, self.root)
                for m in self.match_by_key.values()
            )
        return self._span

    def get_similarity_to(self, match: "Match") -> float:
        assert isinstance(match, DictMatch)
        keys = set(self.match_by_key).intersection(match.match_by_key)
        return mean(
            self.match_by_key[k].get_similarity_to(match.match_by_key[k])
            for k in keys
        )

    def __repr__(self):
        return f"<DictMatch {self.match_by_key=}>"


class ListMatch(Match):
    __slots__ = ("matches", "_root", "_span")

    def __init__(self, matches: tuple):
        self.matches = matches
        self._root = None
        self._span = None

    @property
    def root(self):
        if self._root is None:
            self._root = get_root_node([m.root for m in self.matches])
        return self._root

    @property
    def span(self):
        if self._span is None:
            self._span = sum(
                get_relative_depth(m.root, self.root) + m.span for m in self.matches
            )
        return self._span

    def get_similarity_to(self, match: "Match") -> float:
        assert isinstance(match, ListMatch)
        return mean(
            a.get_similarity_to(b) for a, b in product(self.matches, match.matches)
        )

    def __repr__(self):
        return f"<ListMatch {self.matches=}>"


def get_node_similarity(node1, node2, depth: int = 3) -> float:
    """Recursive class-set Jaccard similarity, tag-gated
    (reference ``html.py:252-271`` ``get_similarity``)."""
    if depth < 1:
        return 0
    if node1.tag_name != node2.tag_name:
        return 0
    c1, c2 = set(node1.classes), set(node2.classes)
    jaccard_top = len(c1.intersection(c2))
    jaccard_bottom = len(c1.union(c2))
    if jaccard_top == jaccard_bottom:
        return 1  # includes 0/0
    jaccard = jaccard_top / jaccard_bottom
    p1 = node1.parent if isinstance(node1, Element) else None
    p2 = node2.parent if isinstance(node2, Element) else None
    if p1 is not None and p2 is not None:
        jaccard = 0.8 * jaccard + 0.2 * get_node_similarity(p1, p2, depth=depth - 1)
    return jaccard


def generate_all_value_matches(node, item: str):
    """Raw hits -> ValueMatch candidates (reference ``matches.py:201-217``)."""
    for html_match in find_all(node, item):
        if isinstance(html_match, HTMLExactTextMatch):
            yield ValueMatch(html_match.node, TextValueExtractor())
        elif isinstance(html_match, HTMLAttributeMatch):
            yield ValueMatch(html_match.node, AttributeValueExtractor(html_match.attr))


def is_disjoint_match_combination(matches) -> bool:
    """No pairwise overlap (reference ``matches.py:220-224``)."""
    return all(not m1.has_overlap(m2) for m1, m2 in combinations(matches, 2))


def is_dimensions_match(m: Match) -> bool:
    """width/height attribute hits are noise (reference ``matches.py:227-234``)."""
    return (
        isinstance(m, ValueMatch)
        and isinstance(m.extractor, AttributeValueExtractor)
        and m.extractor.attr in ("width", "height")
    )
