"""Selector learning + training tests.

Golden expectations are the reference suite's hard-coded literals
(/root/reference/tests/test_selectors.py, test_samples.py,
test_scrapers.py, test_training.py) asserted against our engine.
"""
import pytest

from mlscraper_ray.htmlcore.dom import parse_html
from mlscraper_ray.learn.matches import DictMatch, ListMatch
from mlscraper_ray.learn.samples import (
    ItemStructureException,
    Sample,
    TrainingSet,
    make_training_set,
)
from mlscraper_ray.learn.selectors import (
    SelectorContext,
    generate_unique_selectors_for_nodes,
)
from mlscraper_ray.learn.training import NoScraperFoundException, train_scraper
from mlscraper_ray.scrape.model import (
    AttributeValueExtractor,
    CssRuleSelector,
    DictScraper,
    ListScraper,
    PassThroughSelector,
    TextValueExtractor,
    ValueScraper,
    scraper_from_plan,
)


def unique_rules(nodes, roots=None, complexity=100):
    gen = generate_unique_selectors_for_nodes(SelectorContext(), nodes, roots, complexity)
    return [s.css_rule for s in gen]


class TestUniqueSelectors:
    def test_class_selector_preferred_over_ambiguous_tag(self):
        # reference test_selectors.py:18-33
        p1 = parse_html('<html><body><p class="test">test</p><p>bla</p></body></html>')
        p2 = parse_html('<html><body><div></div><p class="test">hallo</p></body></html>')
        nodes = [p.select("p.test")[0] for p in (p1, p2)]
        rules = unique_rules(nodes)
        assert "p" not in rules, "p matches but is not unique on page 1"
        assert "div" not in rules, "div is not common"
        assert "body > p.test" not in rules, "body prefix adds nothing"
        assert ".test" in rules
        assert "p.test" in rules

    def test_nth_child_generated(self):
        # reference test_selectors.py:35-43
        page = parse_html(
            b"<html><body><ul><li>target</li><li>noise</li></ul>"
            b"<ul><li>target</li><li>noise</li></ul></body></html>"
        )
        first_lis = [ul.select("li")[0] for ul in page.select("ul")]
        assert "li:nth-child(1)" in unique_rules(first_lis)

    def test_id_selector(self):
        # reference test_selectors.py:45-55
        page = parse_html(
            b'<html><body><div id="target">test</div><div>irrelevant</div></body></html>'
        )
        assert "#target" in unique_rules([page.select("#target")[0]])

    def test_id_path_pinpoints_parent(self):
        # reference test_selectors.py:57-62
        page = parse_html(
            b'<html><body><div id="target"><p>test</p></div><div><p></p></div>'
        )
        node = page.select("#target")[0].select("p")[0]
        assert "#target p" in unique_rules([node])

    def test_itemprop_attribute_selectors(self):
        # reference test_selectors.py:64-74
        page = parse_html(
            b'<html><body><div itemprop="user">lorey</div>'
            b'<div itemprop="user">jonashaag</div></body></html>'
        )
        rules = unique_rules(page.select("div"))
        assert "div[itemprop]" in rules
        assert 'div[itemprop="user"]' in rules

    def test_generation_is_deterministic(self):
        page = parse_html(
            b'<html><body><div class="a b c" itemprop="user">x</div>'
            b'<div class="a c">y</div></body></html>'
        )
        runs = [unique_rules([page.select("div")[0]]) for _ in range(3)]
        assert runs[0] == runs[1] == runs[2]


class TestSamples:
    def test_training_set_accepts_uniform_dicts(self):
        pages = [parse_html(""), parse_html("")]
        make_training_set(pages, [{"a": "1", "b": "2"}, {"a": "3", "b": "4"}])

    def test_training_set_rejects_mixed_shapes(self):
        pages = [parse_html(""), parse_html("")]
        with pytest.raises(ItemStructureException):
            make_training_set(pages, [{"a": "1", "b": "2"}, {"a": "3", "b": []}])

    def test_dict_matches_two_footer_variants(self):
        # reference test_samples.py:24-33: year appears twice -> 2 combos
        page = parse_html(
            "<html><body><h1>test</h1><p>2010</p>"
            "<div class='footer'>2010</div></body></html>"
        )
        matches = Sample(page, {"h": "test", "year": "2010"}).get_matches()
        assert len(matches) == 2
        assert all(isinstance(m, DictMatch) for m in matches)

    def test_list_matches_are_list_matches(self):
        # reference test_samples.py:35-45
        lis = "".join(f"<li>{i}</li>" for i in [1, 2, 2, 4])
        page = parse_html(f"<html><body><ul>{lis}</ul></body></html>")
        matches = Sample(page, ["1", "2", "2", "4"]).get_matches()
        assert matches
        assert all(isinstance(m, ListMatch) for m in matches)

    def test_list_of_dicts_single_disjoint_combination(self):
        # reference test_samples.py:47-69
        page = parse_html(
            "<html><body>"
            '<div><p class="title">Herr</p><p class="name">Lorey</p></div>'
            '<div><p class="title">Frau</p><p class="name">Müller</p></div>'
            "</body></html>"
        )
        matches = Sample(
            page,
            [{"title": "Herr", "name": "Lorey"}, {"title": "Frau", "name": "Müller"}],
        ).get_matches()
        assert len(matches) == 1
        match = matches[0]
        assert isinstance(match, ListMatch)
        assert len(match.matches) == 2
        assert all(isinstance(m, DictMatch) for m in match.matches)


class TestScraperApply:
    def test_dict_scraper(self):
        # reference test_scrapers.py:36-51
        item = {"h": "no 1", "t": "the first one"}
        page = parse_html(
            f"<html><body><div><h1>{item['h']}</h1><p>{item['t']}</p></div></body></html>"
        )
        ds = DictScraper(
            {
                "h": ValueScraper(CssRuleSelector("h1"), TextValueExtractor()),
                "t": ValueScraper(CssRuleSelector("p"), TextValueExtractor()),
            }
        )
        assert ds.get(page) == item

    def test_value_scraper_across_structures(self):
        # reference test_scrapers.py:54-64 (str and bytes input)
        p1 = parse_html('<html><body><p class="test">test</p><p>bla</p></body></html>')
        p2 = parse_html(b'<html><body><div></div><p class="test">hallo</p></body></html>')
        vs = ValueScraper(CssRuleSelector(".test"), TextValueExtractor())
        assert vs.get(p1) == "test"
        assert vs.get(p2) == "hallo"

    def test_list_of_values_scraper(self):
        # reference test_scrapers.py:67-75
        page = parse_html(b"<html><body><p>a</p><i>noise</i><p>b</p><p>c</p></body></html>")
        scraper = ListScraper(
            CssRuleSelector("p"),
            ValueScraper(PassThroughSelector(), TextValueExtractor()),
        )
        assert scraper.get(page) == ["a", "b", "c"]

    def test_plan_roundtrip(self):
        plan = {
            "kind": "list",
            "selector": {"kind": "css", "rule": ".answer"},
            "item": {
                "kind": "dict",
                "keys": {
                    "user": {
                        "kind": "value",
                        "selector": {"kind": "css", "rule": ".user-details a"},
                        "extractor": {"kind": "attr", "attr": "href"},
                    },
                    "upvotes": {
                        "kind": "value",
                        "selector": {"kind": "css", "rule": ".js-vote-count"},
                        "extractor": {"kind": "text"},
                    },
                },
            },
        }
        assert scraper_from_plan(plan).to_plan() == plan


class TestTraining:
    def test_simple_list(self):
        # reference test_training.py:12-31
        page = parse_html(b"<html><body><p>a</p><i>noise</i><p>b</p><p>c</p></body></html>")
        ts = TrainingSet()
        ts.add_sample(Sample(page, ["a", "b", "c"]))
        scraper = train_scraper(ts)
        assert isinstance(scraper, ListScraper)
        assert isinstance(scraper.selector, CssRuleSelector)
        assert scraper.selector.css_rule == "p"
        assert isinstance(scraper.scraper, ValueScraper)
        assert isinstance(scraper.scraper.selector, PassThroughSelector)
        assert isinstance(scraper.scraper.extractor, TextValueExtractor)

    def test_list_of_lists(self):
        # reference test_training.py:34-60 (note the reference page ends
        # with a malformed `</html` — semantics must survive that)
        page = parse_html(
            b"<html>\n<body>\n<div><p>a</p><p>b</p></div>\n"
            b"<div><p>c</p><p>d</p></div>\n</body>\n</html"
        )
        ts = TrainingSet()
        ts.add_sample(Sample(page, [["a", "b"], ["c", "d"]]))
        scraper = train_scraper(ts)
        assert scraper.selector.css_rule == "div"
        inner = scraper.scraper
        assert isinstance(inner, ListScraper)
        assert inner.selector.css_rule == "p"
        assert isinstance(inner.scraper.selector, PassThroughSelector)

    def test_multipage_generalizes_to_unseen_page(self):
        # reference test_training.py:63-81
        ts = TrainingSet()
        for items in ["ab", "cd"]:
            html = (
                b'<html><body><div class="target"><ul><li>%s</li><li>%s</li></ul>'
                b"</div></body></html>" % (items[0].encode(), items[1].encode())
            )
            ts.add_sample(Sample(parse_html(html), [items[0], items[1]]))
        scraper = train_scraper(ts)
        assert scraper.selector.css_rule == "li"
        unseen = parse_html(b"<html><body><ul><li>first</li><li>second</li></body></html>")
        assert scraper.get(unseen) == ["first", "second"]

    def test_dict_training_roundtrip(self):
        page = parse_html(
            b'<html><body><h1 class="t">Title</h1><span class="y">1999</span>'
            b"<p>noise 1999 here not exact</p></body></html>"
        )
        ts = TrainingSet()
        ts.add_sample(Sample(page, {"h": "Title", "year": "1999"}))
        scraper = train_scraper(ts)
        assert scraper.get(page) == {"h": "Title", "year": "1999"}

    def test_no_scraper_raises(self):
        p1 = parse_html(b"<html><body><p>a</p><span>b</span></body></html>")
        p2 = parse_html(b"<html><body><p>b</p><span>a</span></body></html>")
        ts = TrainingSet()
        ts.add_sample(Sample(p1, "a"))
        ts.add_sample(Sample(p2, "a"))
        # "a" is in <p> on page1 but <span> on page2; no common unique rule
        with pytest.raises(NoScraperFoundException):
            train_scraper(ts, complexity=1)

    def test_attribute_value_training(self):
        # sample value that only exists as an attribute -> attr extractor
        p = parse_html(
            b'<html><body><a class="u" href="/users/1/karl">profile</a>'
            b'<a href="/other">x</a></body></html>'
        )
        ts = TrainingSet()
        ts.add_sample(Sample(p, "/users/1/karl"))
        scraper = train_scraper(ts)
        assert isinstance(scraper.extractor, AttributeValueExtractor)
        assert scraper.extractor.attr == "href"
        assert scraper.get(p) == "/users/1/karl"
