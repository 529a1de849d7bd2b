"""URL hygiene pins: golden normalization vectors, registrable-domain
heuristic, domain census == pandas brute, blocklist filtering."""

import numpy as np
import pandas as pd
import pyarrow as pa


GOLDEN = [
    # (url, domain, norm_url)
    ("HTTPS://Example.COM:443/Path/?b=2&a=1&utm_source=x#frag",
     "example.com", "https://example.com/Path?a=1&b=2"),
    ("http://www.bbc.co.uk/news/", "bbc.co.uk",
     "http://www.bbc.co.uk/news"),
    ("sub.a.example.org/x", "example.org",
     "http://sub.a.example.org/x"),
    ("http://192.168.0.1:8080/a", "192.168.0.1",
     "http://192.168.0.1:8080/a"),
    ("http://example.com:80/", "example.com", "http://example.com/"),
    ("https://shop.com.au/item?gclid=zz&q=1", "shop.com.au",
     "https://shop.com.au/item?q=1"),
    ("", "", ""),
]


def test_parse_urls_golden(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.weburl import parse_urls

    ds = rd.from_items([{"rid": i, "url": u}
                        for i, (u, _, _) in enumerate(GOLDEN)])
    rows = sorted(parse_urls(ds).take_all(), key=lambda r: r["rid"])
    for r, (u, dom, norm) in zip(rows, GOLDEN):
        assert r["domain"] == dom, (u, r["domain"])
        assert r["norm_url"] == norm, (u, r["norm_url"])


def test_norm_url_dedup_key_collapses_variants(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.weburl import parse_urls

    variants = [
        "https://News.Site.com/story/?utm_campaign=a",
        "https://news.site.com:443/story",
        "https://news.site.com/story/#top",
    ]
    ds = rd.from_items([{"rid": i, "url": u}
                        for i, u in enumerate(variants)])
    norms = {r["norm_url"] for r in parse_urls(ds).take_all()}
    assert norms == {"https://news.site.com/story"}


def test_domain_stats_match_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.weburl import (parse_urls, domain_stats,
                                           registrable_domain)

    rng = np.random.default_rng(6)
    hosts = ["a.example.com", "b.example.com", "shop.co.uk",
             "x.shop.co.uk", "solo.net"]
    urls = [f"http://{hosts[i]}/p{i}" for i in
            rng.integers(0, len(hosts), 500)]
    ds = rd.from_items([{"rid": i, "url": u}
                        for i, u in enumerate(urls)]).repartition(7)
    got = {r["domain"]: r["n_docs"]
           for r in domain_stats(ds).take_all()}
    exp = registrable_domain(
        pd.Series([u.split("//")[1].split("/")[0] for u in urls])) \
        .value_counts().to_dict()
    assert got == exp


def test_blocklist_drop_and_keep(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.weburl import filter_blocked_domains

    urls = ["http://spam.biz/a", "http://ok.org/b",
            "http://www.spam.biz/c", "http://fine.co.uk/d"]
    ds = rd.from_items([{"rid": i, "url": u}
                        for i, u in enumerate(urls)])
    dropped = filter_blocked_domains(ds, ["Spam.biz"], mode="drop")
    assert sorted(r["rid"] for r in dropped.take_all()) == [1, 3]
    kept = filter_blocked_domains(ds, ["spam.biz"], mode="keep")
    assert sorted(r["rid"] for r in kept.take_all()) == [0, 2]
    # original schema preserved
    assert set(dropped.schema().base_schema.names) == {"rid", "url"}
