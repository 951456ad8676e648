"""URL/domain blocklist filter (training-data operator)."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.urlfilter import (
    _host_blocked,
    extract_hosts,
    filter_urls,
)


def test_host_extraction():
    hosts = extract_hosts(pa.array([
        "https://Sub1.Dom3.com/p", "http://h.x:8080/a?b#c",
        "ftp://user:pw@Host.Example.org/f", "not a url", None,
        "https://bare"]))
    assert hosts.to_pylist() == [
        "sub1.dom3.com", "h.x", "host.example.org", None, None, "bare"]


def test_suffix_matching():
    blocked = {"dom.com", "exact.only.net"}
    assert _host_blocked("dom.com", blocked)
    assert _host_blocked("a.dom.com", blocked)
    assert _host_blocked("x.y.dom.com", blocked)
    assert not _host_blocked("notdom.com", blocked)      # no substring
    assert not _host_blocked("dom.com.evil.io", blocked)
    assert _host_blocked("exact.only.net", blocked)
    assert not _host_blocked("only.net", blocked)        # no parents


def test_filter_modes(ray_session):
    import ray

    t = pa.table({"url": pa.array([
        "https://a.dom.com/x", "https://ok.org/y", "junk"],
        pa.string())})
    ds = ray.data.from_arrow(t)
    dropped = filter_urls(ds, "url", blocklist=["dom.com"]).to_pandas()
    assert list(dropped["url"]) == ["https://ok.org/y", "junk"]
    kept = filter_urls(ds, "url", blocklist=["dom.com"],
                       mode="keep").to_pandas()
    assert list(kept["url"]) == ["https://a.dom.com/x"]
    tagged = filter_urls(ds, "url", blocklist=["dom.com"],
                         mode="tag").to_pandas()
    assert list(tagged["url_blocked"]) == [True, False, False]
    with pytest.raises(ValueError):
        filter_urls(ds, "url", blocklist=[], mode="bogus")
