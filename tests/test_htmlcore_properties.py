"""Property-based tests (hypothesis) for the stdlib DOM + CSS engine —
invariants that must hold on ANY generated document, beyond the golden
cases (the reference suite has no property tests; SURVEY.md §5)."""
import hypothesis.strategies as st
from hypothesis import given, settings

from mlscraper_ray.htmlcore.dom import get_root_node, parse_html

TAGS = ["div", "p", "span", "ul", "li", "a", "section", "b"]
CLASSES = ["alpha", "beta", "gamma", "delta"]
WORDS = ["lorem", "ipsum", "dolor", "sit", "amet", "42", "x"]


@st.composite
def html_tree(draw, depth=0):
    tag = draw(st.sampled_from(TAGS))
    classes = draw(st.lists(st.sampled_from(CLASSES), max_size=2, unique=True))
    attr = f' class="{" ".join(classes)}"' if classes else ""
    if depth >= 3:
        body = draw(st.sampled_from(WORDS))
    else:
        n_children = draw(st.integers(0, 3))
        parts = []
        for _ in range(n_children):
            if draw(st.booleans()):
                parts.append(draw(html_tree(depth=depth + 1)))
            else:
                parts.append(draw(st.sampled_from(WORDS)))
        body = " ".join(parts)
    return f"<{tag}{attr}>{body}</{tag}>"


def _doc(inner: str):
    return parse_html(f"<html><body>{inner}</body></html>".encode())


@settings(max_examples=60, deadline=None)
@given(html_tree())
def test_select_results_in_document_order_and_complete(inner):
    doc = _doc(inner)
    for tag in TAGS:
        hits = doc.select(tag)
        walked = [e for e in doc.iter_elements() if e.tag_name == tag]
        assert hits == walked  # same nodes, same (document) order


@settings(max_examples=60, deadline=None)
@given(html_tree())
def test_select_limit_is_a_prefix(inner):
    doc = _doc(inner)
    hits = doc.select("div")
    # limit=0 means "no limit" (bs4/find_all convention), so start at 1
    for k in range(1, len(hits) + 2):
        assert doc.select("div", limit=k) == hits[:k]


@settings(max_examples=60, deadline=None)
@given(html_tree())
def test_class_selector_equivalence(inner):
    doc = _doc(inner)
    for cl in CLASSES:
        by_css = doc.select(f".{cl}")
        by_walk = [e for e in doc.iter_elements() if cl in e.classes]
        assert by_css == by_walk


@settings(max_examples=60, deadline=None)
@given(html_tree())
def test_text_is_concat_of_descendant_text_nodes(inner):
    doc = _doc(inner)
    for e in doc.iter_elements():
        assert e.text == "".join(t.data for t in e.iter_text_nodes())


@settings(max_examples=60, deadline=None)
@given(html_tree())
def test_root_node_is_common_ancestor(inner):
    doc = _doc(inner)
    elems = list(doc.iter_elements())
    if len(elems) < 2:
        return
    nodes = [elems[0], elems[-1]]
    root = get_root_node(nodes)
    for n in nodes:
        assert n is root or n.has_ancestor(root)


@settings(max_examples=40, deadline=None)
@given(html_tree())
def test_descendant_combinator_subset_of_child(inner):
    doc = _doc(inner)
    child_hits = set(id(e) for e in doc.select("div > p"))
    desc_hits = set(id(e) for e in doc.select("div p"))
    assert child_hits <= desc_hits


@settings(max_examples=40, deadline=None)
@given(html_tree())
def test_tag_class_selector_is_intersection(inner):
    doc = _doc(inner)
    for tag in ("div", "p"):
        for cl in CLASSES:
            combined = doc.select(f"{tag}.{cl}")
            manual = [e for e in doc.select(tag) if cl in e.classes]
            assert combined == manual


@settings(max_examples=40, deadline=None)
@given(html_tree())
def test_multi_class_order_irrelevant(inner):
    doc = _doc(inner)
    a, b = CLASSES[0], CLASSES[1]
    assert doc.select(f".{a}.{b}") == doc.select(f".{b}.{a}")


@settings(max_examples=40, deadline=None)
@given(html_tree())
def test_select_is_scoped_to_subtree(inner):
    # selecting from a child scope returns only that subtree's matches
    doc = _doc(inner)
    for scope in doc.select("div")[:3]:
        inside = set(id(e) for e in scope.select("span"))
        walked = set(
            id(e) for e in doc.iter_elements()
            if e.tag_name == "span" and (e is not scope and e.has_ancestor(scope))
        )
        assert inside == walked


# -- attribute selectors + :nth-child (the selector generator's full
# grammar: tag/class/[attr]/[attr="v"]/:nth-child compositions) -------

ATTRS = ["data-k", "title", "href"]
VALS = ["v1", "v2", "a b"]  # incl. a space-containing value


@st.composite
def html_tree_attrs(draw, depth=0):
    tag = draw(st.sampled_from(TAGS))
    classes = draw(st.lists(st.sampled_from(CLASSES), max_size=2, unique=True))
    parts = [f' class="{" ".join(classes)}"'] if classes else []
    for a in ATTRS:
        if draw(st.booleans()):
            parts.append(f' {a}="{draw(st.sampled_from(VALS))}"')
    attr_str = "".join(parts)
    if depth >= 3:
        body = draw(st.sampled_from(WORDS))
    else:
        body = " ".join(
            draw(html_tree_attrs(depth=depth + 1)) if draw(st.booleans()) else draw(st.sampled_from(WORDS))
            for _ in range(draw(st.integers(0, 3)))
        )
    return f"<{tag}{attr_str}>{body}</{tag}>"


@settings(max_examples=60, deadline=None)
@given(html_tree_attrs())
def test_attr_presence_selector_equivalence(inner):
    doc = _doc(inner)
    for a in ATTRS:
        by_css = doc.select(f"[{a}]")
        by_walk = [e for e in doc.iter_elements() if a in e.attrs]
        assert by_css == by_walk


@settings(max_examples=60, deadline=None)
@given(html_tree_attrs())
def test_attr_value_selector_equivalence(inner):
    doc = _doc(inner)
    for a in ATTRS:
        for v in VALS:
            by_css = doc.select(f'[{a}="{v}"]')
            by_walk = [e for e in doc.iter_elements() if e.attrs.get(a) == v]
            assert by_css == by_walk


@settings(max_examples=60, deadline=None)
@given(html_tree_attrs())
def test_tag_attr_composition_is_intersection(inner):
    doc = _doc(inner)
    for tag in ("div", "p"):
        for a in ATTRS:
            assert doc.select(f"{tag}[{a}]") == [
                e for e in doc.select(tag) if a in e.attrs
            ]


@settings(max_examples=60, deadline=None)
@given(html_tree_attrs())
def test_nth_child_equivalence(inner):
    """:nth-child(n) == 1-based position among ELEMENT siblings (the
    generator's sibling-position quirk, htmlcore/dom.py _finalize)."""
    doc = _doc(inner)
    for n in (1, 2, 3):
        by_css = doc.select(f"div:nth-child({n})")
        by_walk = [
            e for e in doc.iter_elements()
            if e.tag_name == "div" and e.child_index == n
        ]
        assert by_css == by_walk


@settings(max_examples=60, deadline=None)
@given(html_tree_attrs())
def test_class_nth_child_composition(inner):
    doc = _doc(inner)
    for cl in CLASSES[:2]:
        for n in (1, 2):
            combined = doc.select(f".{cl}:nth-child({n})")
            manual = [
                e for e in doc.iter_elements()
                if cl in e.classes and e.child_index == n
            ]
            assert combined == manual


@settings(max_examples=40, deadline=None)
@given(html_tree_attrs())
def test_generated_selectors_roundtrip(inner):
    """Generator contracts on arbitrary documents: every non-nth node
    selector's result set contains the node; every ``:nth-child``
    variant's BASE selector, run from the parent, has the node at
    position n-1 (the generator's sibling-position quirk indexes into
    the parent's select() hits, not css nth-child semantics)."""
    from mlscraper_ray.learn.selectors import SelectorContext

    doc = _doc(inner)
    elems = [e for e in doc.iter_elements() if e.tag_name not in ("html", "body")][:6]
    ctx = SelectorContext()
    for e in elems:
        for sel in ctx.get_node_selectors(e)[:24]:
            if ":nth-child(" in sel:
                base, _, n_part = sel.rpartition(":nth-child(")
                n = int(n_part.rstrip(")"))
                parent = e.parent if e.parent is not None else e.doc
                hits = parent.select(base)
                assert len(hits) >= n and hits[n - 1] is e, sel
            else:
                assert any(h is e for h in doc.select(sel)), sel


@settings(max_examples=60, deadline=None)
@given(html_tree_attrs())
def test_preorder_fast_path_equals_walk(inner):
    """iter_elements' preorder-slice fast path must equal the
    generator walk for every element and the document root."""
    doc = _doc(inner)
    assert list(doc.iter_elements()) == list(doc._iter_elements_walk())
    for e in doc.iter_elements():
        assert list(e.iter_elements()) == list(e._iter_elements_walk())
