"""URL/domain analysis for Common-Crawl-style page tables: parse urls
into (scheme, host, registered domain, public suffix, path depth),
aggregate per-domain corpus statistics, and filter by a domain
blocklist — the standard first curation pass over a web crawl.

Scale shape: parsing is one streaming ``map_batches`` pass; the
label-logic for registered domains runs once per DISTINCT host in a
batch (``np.unique`` + inverse mapping — hosts repeat heavily in a
crawl, so the python-level suffix check is amortized across rows).
``domain_stats`` pre-aggregates per batch before the one small
``groupby`` shuffle (domain cardinality ≪ row count).  The blocklist
is config-sized and rides the task closure.

The public-suffix handling is deliberately a tiny fixed set
(``MULTI_SUFFIXES``) rather than the full Mozilla PSL — the list is an
input, not an algorithm; swap in the real PSL table at deployment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["MULTI_SUFFIXES", "url_features", "domain_stats", "domain_filter"]

# two-label public suffixes recognized by the registered-domain rule;
# mirrored verbatim in the DuckDB oracle (a CASE ... IN list)
MULTI_SUFFIXES = frozenset({"co.uk", "com.au", "co.jp", "org.uk"})

_URL_RE = r"^(?P<scheme>https?)://(?P<host>[^/]+)(?P<path>/.*)?$"


def _domain_of_hosts(hosts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """registered domain + public suffix for an array of UNIQUE hosts."""
    doms = np.empty(len(hosts), dtype=object)
    tlds = np.empty(len(hosts), dtype=object)
    for i, h in enumerate(hosts):
        parts = h.split(".")
        if len(parts) >= 3 and ".".join(parts[-2:]) in MULTI_SUFFIXES:
            doms[i] = ".".join(parts[-3:])
            tlds[i] = ".".join(parts[-2:])
        elif len(parts) >= 2:
            doms[i] = ".".join(parts[-2:])
            tlds[i] = parts[-1]
        else:
            doms[i] = h
            tlds[i] = h
    return doms, tlds


class _ParseBatch:
    """One vectorized regex pass + per-unique-host suffix logic."""

    def __init__(self, url_col: str):
        self.url_col = url_col

    def __call__(self, t: pa.Table) -> pa.Table:
        groups = pc.extract_regex(t[self.url_col], _URL_RE)
        if groups.null_count:
            bad = t[self.url_col].filter(pc.is_null(groups))[0].as_py()
            raise ValueError(f"unparseable url: {bad!r}")
        scheme = pc.struct_field(groups, "scheme")
        host = pc.struct_field(groups, "host")
        path = pc.struct_field(groups, "path").combine_chunks() if isinstance(
            groups, pa.ChunkedArray
        ) else pc.struct_field(groups, "path")
        https = pc.equal(scheme, "https")
        # path depth = directory segments before the final component
        slashes = pc.count_substring(pc.coalesce(path, pa.scalar("/")), "/")
        depth = pc.subtract(slashes, 1)
        hosts = np.asarray(host.to_pylist(), dtype=object)
        uniq, inv = np.unique(hosts, return_inverse=True)
        doms, tlds = _domain_of_hosts(uniq)
        return t.append_column("https", https.cast(pa.bool_())).append_column(
            "host", host
        ).append_column(
            "domain", pa.array(doms[inv], pa.string())
        ).append_column(
            "tld", pa.array(tlds[inv], pa.string())
        ).append_column(
            "path_depth", depth.cast(pa.int64())
        )


def url_features(ds: Dataset, url_col: str = "url") -> Dataset:
    """Append (https, host, domain, tld, path_depth) parsed from
    ``url_col``. Raises on a non-http(s)/unparseable url — a crawl
    table with junk urls should be validated first, not silently
    nulled."""
    return ds.map_batches(_ParseBatch(url_col), batch_format="pyarrow")


def domain_filter(
    ds: Dataset,
    blocklist: "set[str] | frozenset[str]",
    url_col: str = "url",
    keep: bool = False,
) -> Dataset:
    """Drop (or with ``keep=True``, retain only) rows whose registered
    domain is in ``blocklist``. The list rides the closure — it is
    config, not data."""
    block = frozenset(blocklist)

    def fn(t: pa.Table) -> pa.Table:
        parsed = _ParseBatch(url_col)(t)
        inb = pc.is_in(parsed["domain"], value_set=pa.array(sorted(block), pa.string()))
        mask = inb if keep else pc.invert(inb)
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def domain_stats(
    ds: Dataset, url_col: str = "url", weight_col: str | None = None
) -> Dataset:
    """Per-registered-domain corpus stats: document count (+ summed
    ``weight_col``, e.g. chars or tokens). Per-batch partial aggregation
    first, so the shuffle moves domain-cardinality rows, not the
    corpus."""

    def partial(t: pa.Table) -> pa.Table:
        parsed = _ParseBatch(url_col)(t)
        doms = np.asarray(parsed["domain"].to_pylist(), dtype=object)
        uniq, inv = np.unique(doms, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        cols = {
            "domain": pa.array(uniq, pa.string()),
            "n_docs": pa.array(n),
        }
        if weight_col is not None:
            w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
            ws = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(ws, inv, w)
            cols["weight"] = pa.array(ws)
        return pa.table(cols)

    from ray.data.aggregate import Sum

    aggs = [Sum("n_docs", alias_name="n_docs")]
    if weight_col is not None:
        aggs.append(Sum("weight", alias_name="weight"))
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(*aggs)
    )
