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


def test_warc_roundtrip_adversarial_payloads(ray_session, tmp_path):
    """Fuzz the WARC sink/source with payloads that would break a
    delimiter-scanning parser (embedded record headers, CRLF runs,
    null bytes, empty body) and microsecond timestamps (WARC 1.1
    fractional seconds)."""
    import datetime as dt

    import pyarrow as pa

    from mlscraper_ray.sources.warc import parse_warc_bytes, write_warc_shard

    payloads = [
        b"",                                        # empty body
        b"\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n",  # embedded fake record
        b"\x00\x01\xff" * 100,                      # binary junk
        b"\r\n" * 50,                               # CRLF runs
        "unicode é中".encode(),            # multibyte
    ]
    ts = [
        dt.datetime(2021, 1, 1, 0, 0, 0),
        dt.datetime(2021, 6, 15, 12, 30, 45, 123456),  # microseconds
        dt.datetime(2021, 6, 15, 12, 30, 45, 1),
        dt.datetime(2038, 1, 19, 3, 14, 7),
        dt.datetime(1999, 12, 31, 23, 59, 59, 999999),
    ]
    urls = [f"http://fuzz.example/p{i}" for i in range(len(payloads))]
    t = pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
        }
    )
    path = str(tmp_path / "fuzz.warc.gz")
    assert write_warc_shard(t, path) == len(payloads)
    back = parse_warc_bytes(open(path, "rb").read())
    assert [u for u, _, _ in back] == urls
    assert [b for _, _, b in back] == payloads
    assert [s for _, s, _ in back] == ts  # microsecond-exact roundtrip
