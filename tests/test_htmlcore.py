"""DOM + CSS engine tests.

Golden expectations mirror the reference suite's hard-coded literals
(/root/reference/tests/test_html.py, test_matches.py) so our stdlib
DOM is pinned to the same observable semantics as bs4-on-lxml.
"""
import pytest

from mlscraper_ray.htmlcore.dom import (
    Document,
    get_relative_depth,
    get_root_node,
    parse_html,
)
from mlscraper_ray.learn.matches import (
    HTMLAttributeMatch,
    HTMLExactTextMatch,
    find_all,
    generate_all_value_matches,
    is_dimensions_match,
)
from mlscraper_ray.scrape.model import AttributeValueExtractor

NESTED = b'<html><body><div><p id="one"></p><p><span id="two"></span></p></div></body></html>'


class TestDom:
    def test_lca_of_two_nodes_is_their_div(self):
        page = parse_html(NESTED)
        one, two = page.select("#one")[0], page.select("#two")[0]
        assert get_root_node([one, two]) is page.select("div")[0]

    def test_html_parent_is_document(self):
        page = parse_html(NESTED)
        root = page.select("html")[0]
        assert root.ancestors == [page]
        assert isinstance(root.ancestors[-1], Document)

    def test_ancestor_chain(self):
        page = parse_html(NESTED)
        el = page.select("#one")[0]
        assert el.ancestors[0] is el.parent
        assert isinstance(el.ancestors[-1], Document)

    def test_node_identity_is_stable(self):
        page = parse_html(b"<html><body><p>test</p></body></html>")
        n1 = page.select("p")[0]
        n2 = n1.parent.select("p")[0]
        assert n1 is n2
        assert n1.parent is n2.parent

    def test_same_html_different_documents(self):
        html = b"<html><body><div><p></p></div></body></html>"
        d1, d2 = parse_html(html), parse_html(html)
        assert d1 is not d2
        assert not d1.select("p")[0].has_ancestor(d2)

    def test_tag_name_and_classes(self):
        page = parse_html(b'<html><body><p class="box bordered">bla</p></body></html>')
        node = page.select("p")[0]
        assert node.tag_name == "p"
        assert node.classes == ("box", "bordered")

    def test_classes_filter_blacklisted_chars(self):
        page = parse_html(b'<html><body><p class="a b:c d/e">x</p></body></html>')
        assert page.select("p")[0].classes == ("a",)

    def test_relative_depth(self):
        page = parse_html(b"<html><body><p>bla karl bla</p></body></html>")
        p = page.select("p")[0]
        assert get_relative_depth(p, p) == 0
        assert get_relative_depth(p, p.parent) == 1
        assert get_relative_depth(p, p.parent.parent) == 2

    def test_text_concatenates_descendants(self):
        page = parse_html(b"<html><body><div>a<span>b</span>c</div></body></html>")
        assert page.select("div")[0].text == "abc"
        assert page.text == "abc"

    def test_entities_unescaped(self):
        page = parse_html(b"<html><body><p>a &amp; b</p></body></html>")
        assert page.select("p")[0].text == "a & b"

    def test_empty_document(self):
        page = parse_html("")
        assert page.select("p") == []
        assert page.text == ""

    def test_unclosed_tags_at_eof(self):
        page = parse_html(b"<html><body><div id='target'><p>test</p></div><div><p></p></div>")
        assert len(page.select("div")) == 2
        assert page.select("#target")[0].select("p")[0].text == "test"

    def test_multivalued_attrs_are_lists(self):
        page = parse_html(b'<html><body><a rel="nofollow noopener" href="x">l</a></body></html>')
        a = page.select("a")[0]
        assert a.attrs["rel"] == ["nofollow", "noopener"]
        assert a.attrs["href"] == "x"


class TestFindAll:
    def test_whitespace_padded_text_matches_p_body_html(self):
        # reference test_html.py:96-103: p, body, html but not the page
        page = parse_html(b"<html><body><p>    whitespace  \n\t </p></body></html>")
        matches = find_all(page, "whitespace")
        assert len(matches) == 3
        assert all(isinstance(m, HTMLExactTextMatch) for m in matches)
        assert [m.node.tag_name for m in matches] == ["p", "body", "html"]

    def test_substring_does_not_match(self):
        # reference test_html.py:51-57
        page = parse_html(b"<html><body><p>bla karl bla</p></body></html>")
        assert not any(
            isinstance(m, HTMLExactTextMatch) for m in find_all(page, "karl")
        )

    def test_attribute_match(self):
        page = parse_html(b'<html><body><a href="/users/1">x</a></body></html>')
        matches = find_all(page, "/users/1")
        assert len(matches) == 1
        assert isinstance(matches[0], HTMLAttributeMatch)
        assert matches[0].attr == "href"

    def test_class_attr_never_string_matches(self):
        page = parse_html(b'<html><body><p class="needle">x</p></body></html>')
        assert not any(
            isinstance(m, HTMLAttributeMatch) for m in find_all(page, "needle")
        )

    def test_ampersand_value_never_text_matches(self):
        # quirk: needle is html-escaped, parsed text is unescaped
        page = parse_html(b"<html><body><p>a &amp; b</p></body></html>")
        assert not any(
            isinstance(m, HTMLExactTextMatch) for m in find_all(page, "a & b")
        )

    def test_regex_metachars_act_as_wildcards(self):
        # quirk: needle is not re.escaped, "." matches any char
        page = parse_html(b"<html><body><p>2x4</p></body></html>")
        assert any(isinstance(m, HTMLExactTextMatch) for m in find_all(page, "2.4"))


class TestDimensionsAndExtractors:
    def test_dimensions_match_filtered(self):
        extractor = AttributeValueExtractor("height")
        from mlscraper_ray.learn.matches import ValueMatch

        assert is_dimensions_match(ValueMatch(None, extractor))

    def test_dimensions_generation_all_filtered(self):
        page = parse_html(b'<html><body><img height="20" width="20"/></body></html>')
        unfiltered = list(generate_all_value_matches(page, "20"))
        assert unfiltered
        assert not [m for m in unfiltered if not is_dimensions_match(m)]

    def test_attribute_extractor_roundtrip(self):
        page = parse_html(
            b'<html><body><a href="https://karllorey.com"></a><a>no link</a></body></html>'
        )
        ex = AttributeValueExtractor("href")
        a_tags = page.select("a")
        assert ex.extract(a_tags[0]) == "https://karllorey.com"
        assert ex.extract(a_tags[1]) is None

    def test_extractor_equality(self):
        e1, e2 = AttributeValueExtractor("href"), AttributeValueExtractor("href")
        assert e1 == e2
        assert len({e1, e2}) == 1


class TestCss:
    def test_select_all_in_document_order(self):
        page = parse_html(b"<html><body><p>1</p><div><p>2</p></div><p>3</p></body></html>")
        assert [n.text for n in page.select("p")] == ["1", "2", "3"]

    def test_select_limit(self):
        page = parse_html(b"<html><body><p></p><p></p><p></p></body></html>")
        assert len(page.select("p", limit=2)) == 2

    def test_scope_excludes_self(self):
        page = parse_html(b"<html><body><div><div><p></p></div></div></body></html>")
        outer = page.select("div")[0]
        assert len(outer.select("div")) == 1

    def test_child_combinator(self):
        page = parse_html(b"<html><body><div><p>a</p><span><p>b</p></span></div></body></html>")
        assert [n.text for n in page.select("div > p")] == ["a"]

    def test_descendant_may_climb_above_scope(self):
        # soupsieve semantics: ancestor parts of a path can match above
        # the scope node
        page = parse_html(b'<html><body><div class="x"><ul><li>a</li></ul></div></body></html>')
        ul = page.select("ul")[0]
        assert [n.text for n in ul.select(".x li")] == ["a"]

    def test_nth_child_true_semantics(self):
        page = parse_html(
            b"<html><body><ul><li>a</li><li>b</li></ul><ul><li>c</li><li>d</li></ul></body></html>"
        )
        assert [n.text for n in page.select("li:nth-child(1)")] == ["a", "c"]
        assert [n.text for n in page.select("li:nth-child(2)")] == ["b", "d"]

    def test_attr_selectors(self):
        page = parse_html(
            b'<html><body><div itemprop="user">a</div><div itemprop="org">b</div><div>c</div></body></html>'
        )
        assert len(page.select("div[itemprop]")) == 2
        assert [n.text for n in page.select('div[itemprop="user"]')] == ["a"]

    def test_attr_value_with_spaces(self):
        page = parse_html(b'<html><body><span title="Berlin, Germany">x</span></body></html>')
        assert len(page.select('span[title="Berlin, Germany"]')) == 1

    def test_compound_class_tag(self):
        page = parse_html(
            b'<html><body><p class="a b">1</p><div class="a b">2</div><p class="a">3</p></body></html>'
        )
        assert [n.text for n in page.select("p.a.b")] == ["1"]
        assert [n.text for n in page.select(".a.b")] == ["1", "2"]

    def test_id_selector_and_path(self):
        page = parse_html(
            b'<html><body><div id="t"><p>in</p></div><div><p>out</p></div></body></html>'
        )
        assert [n.text for n in page.select("#t p")] == ["in"]
