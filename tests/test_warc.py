"""WARC source/sink round-trip: pages parquet -> sharded .warc.gz ->
Dataset, byte-identical html per url."""
import os

import pyarrow.parquet as pq


def test_warc_roundtrip(ray_session, tmp_path):
    from mlscraper_ray.pipelines.crawl_pipeline import corpus_for_sf
    from mlscraper_ray.sources.warc import read_warc, write_warc_from_pages

    corpus_dir, _ = corpus_for_sf(0.001)
    pages_dir = os.path.join(corpus_dir, "pages")
    warc_dir = str(tmp_path / "warc")

    n = write_warc_from_pages(pages_dir, warc_dir)
    orig = pq.read_table(pages_dir, columns=["url", "warc_ts", "html"])
    assert n == orig.num_rows

    back = read_warc(warc_dir).to_pandas().sort_values("url", ignore_index=True)
    odf = orig.to_pandas().sort_values("url", ignore_index=True)
    assert back["url"].tolist() == odf["url"].tolist()
    assert [bytes(b) for b in back["html"]] == [bytes(b) for b in odf["html"]]
    assert back["warc_ts"].tolist() == odf["warc_ts"].tolist()


def test_extract_from_warc_equals_extract_all(ray_session):
    """The learned-scraper apply stage is source-agnostic: parquet
    pages and the WARC round-trip yield identical extraction rows."""
    import __ray_entry__ as E

    qs = E.queries()
    a = qs["extract_all"]("/root/testdata/sf0.001").to_pandas()
    b = qs["extract_from_warc"]("/root/testdata/sf0.001").to_pandas()
    assert a.equals(b[a.columns])


def test_warc_roundtrip_query_is_sha256_pinned(ray_session):
    """The driver-facing warc_roundtrip query reports per-url sha256;
    it must equal hashes computed directly from the source pages."""
    import hashlib

    import __ray_entry__ as E
    from mlscraper_ray.pipelines.crawl_pipeline import corpus_for_sf

    out = E.queries()["warc_roundtrip"]("/root/testdata/sf0.001").to_pandas()
    corpus_dir, _ = corpus_for_sf(0.001)
    pages = (
        pq.read_table(os.path.join(corpus_dir, "pages"), columns=["url", "html"])
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert out["url"].tolist() == pages["url"].tolist()
    expected = [hashlib.sha256(bytes(h)).hexdigest() for h in pages["html"]]
    assert out["html_sha256"].tolist() == expected
