"""URL/domain parsing + domain rollup (stages/urlstats.py) and the
deterministic train/val/test hash split (stages/curation.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _url_ds(urls):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(urls)), pa.int64()),
                  "url": pa.array(urls, pa.string())})
    )


def test_url_features_parses_suffixes_and_depth(ray_session):
    from xlink_ray.stages.urlstats import url_features

    urls = [
        "https://www.news.example.co.uk/a/b/page.html",  # multi-part suffix
        "http://site.com/x",                             # plain com, http
        "https://example.org/",                          # root path
        "https://a.b.c.example.com/d1/d2/d3/f",          # deep subdomains
    ]
    out = url_features(_url_ds(urls)).to_pandas().sort_values("doc_id")
    assert out["https"].tolist() == [True, False, True, True]
    assert out["host"].tolist() == [
        "www.news.example.co.uk", "site.com", "example.org", "a.b.c.example.com"]
    assert out["domain"].tolist() == [
        "example.co.uk", "site.com", "example.org", "example.com"]
    assert out["tld"].tolist() == ["co.uk", "com", "org", "com"]
    assert out["path_depth"].tolist() == [2, 0, 0, 3]


def test_url_features_rejects_junk(ray_session):
    from xlink_ray.stages.urlstats import url_features

    with pytest.raises(Exception, match="unparseable"):
        url_features(_url_ds(["ftp://no.http/here"])).take_all()


def test_domain_filter_block_and_keep(ray_session):
    from xlink_ray.stages.urlstats import domain_filter

    urls = [
        "https://a.spam.com/1", "https://b.spam.com/2",
        "https://ok.org/3", "https://fine.co.uk/4",
    ]
    dropped = domain_filter(_url_ds(urls), {"spam.com"}).to_pandas()
    assert sorted(dropped["url"]) == ["https://fine.co.uk/4", "https://ok.org/3"]
    kept = domain_filter(_url_ds(urls), {"spam.com"}, keep=True).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1]


def test_domain_stats_partial_agg_matches_pandas(ray_session):
    from xlink_ray.stages.urlstats import domain_stats

    rng = np.random.default_rng(5)
    hosts = [f"h{int(rng.integers(3))}.dom{int(rng.integers(4))}.com" for _ in range(200)]
    w = rng.integers(1, 50, size=200).astype(np.int64)
    t = pa.table({
        "url": pa.array([f"https://{h}/p" for h in hosts], pa.string()),
        "n_chars": pa.array(w),
    })
    got = domain_stats(rd.from_arrow(t).repartition(7), weight_col="n_chars").to_pandas()
    import pandas as pd

    df = pd.DataFrame({"domain": [".".join(h.split(".")[-2:]) for h in hosts], "w": w})
    want = df.groupby("domain").agg(n_docs=("w", "size"), weight=("w", "sum")).reset_index()
    got = got.sort_values("domain").reset_index(drop=True)
    want = want.sort_values("domain").reset_index(drop=True)
    assert got["domain"].tolist() == want["domain"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert got["weight"].tolist() == want["weight"].tolist()


def test_hash_split_disjoint_exhaustive_and_stable(ray_session):
    from xlink_ray.stages.curation import hash_split

    t = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
    a = hash_split(rd.from_arrow(t), {"train": 90, "val": 5, "test": 5}).to_pandas()
    b = hash_split(rd.from_arrow(t).repartition(13), {"train": 90, "val": 5, "test": 5}).to_pandas()
    # every row labeled, labels stable under repartitioning
    assert len(a) == 1000 and set(a["split"]) == {"train", "val", "test"}
    ma = dict(zip(a["doc_id"], a["split"]))
    mb = dict(zip(b["doc_id"], b["split"]))
    assert ma == mb
    # roughly the requested proportions
    frac = (a["split"] == "train").mean()
    assert 0.85 < frac < 0.95


def test_hash_split_rest_label_and_rate_check(ray_session):
    from xlink_ray.stages.curation import hash_split

    t = pa.table({"doc_id": pa.array(range(200), pa.int64())})
    out = hash_split(rd.from_arrow(t), {"train": 50}, mod=100).to_pandas()
    assert set(out["split"]) == {"train", "rest"}
    with pytest.raises(Exception, match="sum"):
        hash_split(rd.from_arrow(t), {"a": 80, "b": 30}).take_all()
