"""Flagship web-pages entity-resolution pipeline — the north-star
composition (BASELINE.json north_star / north_rule):

pages (url, warc_ts, html, text, lang)
  → [extract]    markup-strip → corpus; explode → mentions (gold)
  → [dictbuild]  mention_anchors + e_given_m + link_prob (from corpus)
  → [candidates] actor-pool dictionary scan + disambiguation →
                 resolved occurrence links (doc_id, offset, mention,
                 entity_id, believe)
  → [blocking]   explicit groupby shuffle on the normalized blocking
                 key (mention, resolved entity)
  → [edges]      sorted-neighborhood within block: occurrences ordered
                 by (doc_id, offset); adjacent pairs scored by context
                 cosine; O(n) edges per block instead of the n² grid
  → [clusters]   transitive closure (connected components) →
                 (member_id, cluster_id)

Spec decisions (the transcription oracle in tests/oracle_flagship.py
implements the same spec single-process and must agree exactly —
pairwise F1 == 1.0 ≥ the 0.99 gate):

* occurrence record id = ``url#offset`` (string, unique, stable),
* blocking key = (mention surface, resolved entity id, salt) — the
  mention key of the north rule refined by the disambiguation output,
  plus a deterministic doc-range salt (``doc_num // DOCS_PER_SALT``)
  that splits hot aliases so no block spans more than a bounded doc
  range (skew handling; see DOCS_PER_SALT note below),
* within a block, edges connect occurrences adjacent in
  (doc_id, offset) order — the sorted-neighborhood method (public
  record-linkage technique) that bounds per-block pair count linearly;
  range (not hash) salting keeps that order contiguous within each
  salt partition, forgoing only the range-boundary pair,
* edge kept iff context cosine ≥ EDGE_TH (contexts from the same
  deterministic embedding table both sides),
* cluster id = min member id (lexicographic).

Divergence from the reference linker, documented: the v2 believe score
drops the seed-entity term P(e|N) (reference xlink.py:328-336) — the
seed-coupling makes scores order-dependent within a document and is
exercised separately by the fidelity linker stage (stages/linking.py).
"""

from __future__ import annotations

from xlink_ray.util import heavy_cpus, pool_size

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from xlink_ray.stages.candidates import CandidateGenActor
from xlink_ray.stages.clustering import connected_components
from xlink_ray.state.broadcast import broadcast_table

__all__ = ["links", "clusters", "attach_new_crawl", "golden_clusters", "EDGE_TH", "DOCS_PER_SALT"]

EDGE_TH = 0.0  # context-cosine threshold for sorted-neighborhood edges

# hot-key skew splitting: a block (mention, entity) spans the whole
# corpus — at scale that is one giant group per alias. Blocks are
# salted by contiguous doc-id RANGES (not hashes), so the
# sorted-neighborhood order inside each salt partition is a contiguous
# slice of the unsalted order and only the S-1 range-boundary pairs
# are forgone. Deterministic: salt = doc_num // DOCS_PER_SALT (fixed
# constant, defined next to the synth so the fused pipeline can align
# physical blocks to salt ranges).
from xlink_ray.synth import DOCS_PER_SALT  # noqa: E402


def _add_salt(t: pa.Table) -> pa.Table:
    from xlink_ray.synth import doc_id_of_url

    num = doc_id_of_url(t["doc_id"])
    return t.append_column(
        "salt", pc.divide(num, pa.scalar(DOCS_PER_SALT, pa.int64()))
    )


# Collected dictionary state (mention anchors + derived tables) is
# broadcast to every scan task. It is dictionary-sized, not
# corpus-sized — but at the reference's production scale (~5.13 M
# entities, align.c:986) it reaches multi-GB, where a driver collect
# stops being free. Guard: refuse past XLINK_DICT_MAX_MB (default
# 8192). Migration path at that scale (unchanged semantics):
# ``links_partitioned`` below — the anchor table stays a Dataset and
# e_given_m / link_prob / entity vectors attach via co-partitioned
# ``Dataset.join`` on mention/entity_id instead of broadcast lookups;
# the scan keeps only the vocab automaton per worker. Equality with
# this broadcast path is test-pinned.
def _collect(ds: Dataset) -> pa.Table:
    from xlink_ray.util import guard_dict_bytes

    tbls = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    out = pa.concat_tables(tbls) if tbls else pa.table({})
    guard_dict_bytes(
        out.nbytes,
        "dictionary-side collect (switch to the partitioned-join path "
        "documented above _collect())",
    )
    return out


def _dict_phase(sf_dir: str, repeat: int, align_salt: bool = False):
    """Corpus + mention-anchor statistics (the two overlapped
    executions): returns (materialized corpus, ma table with e_given_m,
    link_m table, vocab_ref, emb_ref)."""
    import ray as _ray

    from xlink_ray import synth
    from xlink_ray.stages import aggregates
    from xlink_ray.stages.extract import ExtractCorpusBatch, ExtractMentionsBatch

    def pages_slim():
        return synth.synth_pages(sf_dir, repeat, align_salt=align_salt, slim=True)

    # one fused synth→strip execution; the mention-anchor pass re-runs
    # the (cheap, fully parallel) synth instead of materializing the
    # marked pages. The two executions are independent → overlapped in
    # driver threads (Ray executions release the GIL while waiting).
    from concurrent.futures import ThreadPoolExecutor

    from xlink_ray.util import ensure_fsspec_http_stub

    ensure_fsspec_http_stub()  # concurrent executions trip the lazy import

    with ThreadPoolExecutor(max_workers=2) as ex:
        hcpu = heavy_cpus()
        corpus_f = ex.submit(
            lambda: pages_slim()
            .map_batches(
                ExtractCorpusBatch(),
                batch_format="pyarrow",
                batch_size=None,
                num_cpus=hcpu,
            )
            .materialize()
        )
        ma_f = ex.submit(
            lambda: _collect(
                aggregates.mention_anchors(
                    pages_slim().map_batches(
                        ExtractMentionsBatch(), batch_format="pyarrow", num_cpus=hcpu
                    )
                )
            )
        )
        corpus = corpus_f.result()
        ma_tbl = ma_f.result()

    vocab_ref = _ray.put(sorted(set(ma_tbl["mention"].to_pylist())))
    link_m = (
        ma_tbl.group_by("mention").aggregate([("link_count", "sum")])
        .rename_columns(["mention", "link_m"])
    )
    ma = ma_tbl.join(link_m, keys="mention", join_type="inner")
    ma = ma.append_column(
        "e_given_m",
        pc.divide(
            pc.cast(ma["link_count"], pa.float64()), pc.cast(ma["link_m"], pa.float64())
        ),
    ).select(["mention", "entity_id", "e_given_m"])

    from xlink_ray import synth as _synth

    return corpus, ma, link_m, vocab_ref, broadcast_table(_synth.synth_embeddings())


def _lp_table(link_m: pa.Table, freq_tbl: pa.Table) -> pa.Table:
    lp = link_m.join(freq_tbl, keys="mention", join_type="inner")
    return lp.append_column(
        "link_prob",
        pc.divide(pc.cast(lp["link_m"], pa.float64()), pc.cast(lp["freq"], pa.float64())),
    ).select(["mention", "link_prob"])


def _prepare(sf_dir: str, repeat: int, align_salt: bool = False):
    """Full dictionary phase (sequential freq): returns
    (materialized corpus, ma_ref, lp_ref, emb_ref)."""
    from xlink_ray.stages.freq import freq_m as freq_m_stage

    corpus, ma, link_m, vocab_ref, emb_ref = _dict_phase(sf_dir, repeat, align_salt)
    freq_tbl = _collect(freq_m_stage(corpus, vocab_ref))
    return corpus, broadcast_table(ma), broadcast_table(_lp_table(link_m, freq_tbl)), emb_ref


# the standing raw-scan memo: ONE entry, keyed (sf_dir, repeat, ray job
# id). The materialized scan pins object-store blocks, so a second
# distinct key evicts the first; the job-id component guarantees a
# fresh ray.init never sees stale object refs.
_RAW_SCAN_CACHE: "dict[tuple, tuple]" = {}


def _raw_scan(sf_dir: str, repeat: int = 1):
    """Dictionary phase + raw candidate scan, MATERIALIZED and memoized:
    ``links``, ``nil_mentions`` and ``nil_clusters`` all consume the
    same standing scan, so a suite that runs the linker and then
    NIL-clusters its rejects pays the corpus scan ONCE.

    Returns (raw, lp_ref, emb_ref): raw = per-occurrence candidate rows
    before the link-prob keep filter; lp_ref / emb_ref = broadcast
    link-prob table / embedding-table refs."""
    from concurrent.futures import ThreadPoolExecutor

    from xlink_ray.stages.candidates import candidate_gen_raw_fn
    from xlink_ray.stages.freq import freq_m as freq_m_stage

    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    key = (sf_dir, repeat, job)
    hit = _RAW_SCAN_CACHE.get(key)
    if hit is not None:
        return hit
    corpus, ma, link_m, vocab_ref, emb_ref = _dict_phase(sf_dir, repeat)
    ma_ref = broadcast_table(ma)
    with ThreadPoolExecutor(max_workers=2) as ex:
        freq_f = ex.submit(lambda: _collect(freq_m_stage(corpus, vocab_ref)))
        raw_f = ex.submit(
            lambda: corpus.map_batches(
                candidate_gen_raw_fn,
                fn_args=(ma_ref, emb_ref),
                batch_format="pyarrow",
                batch_size=256,
                num_cpus=heavy_cpus(),
            ).materialize()
        )
        freq_tbl = freq_f.result()
        raw = raw_f.result()
    lp_ref = broadcast_table(_lp_table(link_m, freq_tbl))
    _RAW_SCAN_CACHE.clear()
    _RAW_SCAN_CACHE[key] = (raw, lp_ref, emb_ref)
    return raw, lp_ref, emb_ref


def links(sf_dir: str, concurrency: int | tuple[int, int] | None = None, repeat: int = 1) -> Dataset:
    """pages → resolved occurrence links (the XLink `links` table).

    Pass structure: synth→strip→corpus (materialized) overlapped with
    the mention-anchor pass; then the freq scan and the raw candidate
    scan run CONCURRENTLY over the materialized corpus (the scan only
    needs e_given_m; the link-prob keep thresholds are a cheap
    per-mention post-filter — identical final rows, one corpus pass
    less on the critical path). The scan is the memoized ``_raw_scan``,
    shared with the NIL pipeline.
    """
    if concurrency is not None:
        corpus, ma_ref, lp_ref, emb_ref = _prepare(sf_dir, repeat)
        return corpus.map_batches(
            CandidateGenActor,
            fn_constructor_args=(ma_ref, lp_ref, emb_ref),
            batch_format="pyarrow",
            batch_size=256,
            concurrency=concurrency,
            num_cpus=1,
        )

    from xlink_ray.stages.candidates import link_prob_filter

    raw, lp_ref, _ = _raw_scan(sf_dir, repeat)
    return raw.map_batches(link_prob_filter, fn_args=(lp_ref,), batch_format="pyarrow")


_LINKS_EMPTY = pa.table(
    {
        "doc_id": pa.array([], pa.string()),
        "offset": pa.array([], pa.int64()),
        "mention": pa.array([], pa.string()),
        "entity_id": pa.array([], pa.string()),
        "believe": pa.array([], pa.float64()),
        "context": pa.array([], pa.string()),
    }
)


def _argmax_first(doc, off, ent, believe) -> np.ndarray:
    """Indices of the best row per (doc, offset): believe desc, then
    smallest entity_id — the resolve_batch tie rule."""
    _, doc_code = np.unique(doc, return_inverse=True)
    order = np.lexsort((ent, -believe, off, doc_code))
    dc_s, off_s = doc_code[order], off[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (dc_s[1:] != dc_s[:-1]) | (off_s[1:] != off_s[:-1])
    return order[first]


def links_partitioned(
    sf_dir: str,
    repeat: int = 1,
    num_partitions: int | None = None,
    hot_mention_cap: int | None = None,
) -> Dataset:
    """The linking path with NO dictionary broadcast: per-mention and
    per-entity state attaches to the scan output through tagged-union
    HASH-BUCKET exchanges (the repo's `_bucket` pattern: union both
    sides with a side tag, ONE groupby shuffle on the key hash, a
    vectorized in-bucket join task) — the migration path documented at
    ``_collect()`` for dictionaries past ``XLINK_DICT_MAX_MB``
    (reference production scale: ~5.13 M entities, align.c:986, where
    broadcast state reaches multi-GB).

    What still broadcasts (and must, matching the reference's
    per-process state): the distinct mention VOCABULARY (the scan
    automaton's alphabet — strings only, no per-entity stats) and the
    word-vector model for context embedding. Equality with ``links()``
    is test-pinned (same rows; believe equal to float tolerance).

    Cost shape — exactly THREE exchanges and THREE materializations:
    corpus, mention-anchor table, and the per-mention freq table (the
    freq scan output now feeds BOTH the stats exchange and the
    hot-mention detector, so it pins once; still down from five
    sequential Dataset-join barriers — sort-based groupby shuffles
    need no join-aggregator actor pools, so the rest of the chain is
    one streaming DAG):

    1. mention exchange: mention_anchor rows + freq rows meet per
       mention; link_m / e_given_m / link_prob all computed in-bucket
       (one task sees every row of a mention).
    2. entity exchange: candidate rows + entity vectors meet per
       entity_id.
    3. occurrence exchange (the corpus-sized one): scan occurrences +
       finished candidate rows meet per mention; the in-bucket task
       joins, scores (same believe math as ``links()``), and — because
       every candidate of an occurrence shares its mention and
       therefore its bucket — takes the COMPLETE per-(doc, offset)
       argmax and keep thresholds right there. No doc-salt re-shuffle.

    Partitioning assumption (documented per the custom-operator rule):
    a mention bucket must fit one map_groups task — nbuckets scales
    with the corpus block count (4 × nparts), so a bucket holds
    ~corpus/nbuckets occurrence rows; the same group-size shape the
    previous doc-salt groupby had.

    Hot-mention salting (the skew guard for that assumption): the
    per-mention corpus frequencies — already computed for link_prob —
    feed a hot-mention detector. A mention whose occurrence count
    exceeds ``hot_mention_cap`` (default: 4× the average bucket share,
    min 4096; env ``XLINK_HOT_MENTION_CAP`` overrides; a stop-word-like
    alias surviving the anchor filter would otherwise land every
    occurrence in ONE task) is split: its occurrence rows salt into
    ``ceil(freq/cap)`` sub-keys by a deterministic (doc, offset) hash,
    and its candidate rows REPLICATE once per sub-key — so every
    occurrence still meets ALL of its mention's candidates in exactly
    one bucket and the in-bucket per-(doc, offset) argmax stays
    complete with no second-level reduce. The hot set is bounded by
    total_occurrences/cap ≤ nbuckets/4 mentions, so the driver-side
    hot table stays tiny at any corpus scale. Forced-skew equality
    with ``links()`` is test-pinned.
    """
    import ray.data as rd

    from xlink_ray import synth
    from xlink_ray.functions.hashing import md5_low64
    from xlink_ray.stages import aggregates
    from xlink_ray.stages.candidates import occurrence_scan_fn
    from xlink_ray.stages.extract import ExtractCorpusBatch, ExtractMentionsBatch
    from xlink_ray.stages.freq import freq_m as freq_m_stage

    hcpu = heavy_cpus()

    def pages_slim():
        return synth.synth_pages(sf_dir, repeat, slim=True)

    corpus = (
        pages_slim()
        .map_batches(
            ExtractCorpusBatch(), batch_format="pyarrow", batch_size=None, num_cpus=hcpu
        )
        .materialize()
    )
    ma_ds = aggregates.mention_anchors(
        pages_slim().map_batches(
            ExtractMentionsBatch(), batch_format="pyarrow", num_cpus=hcpu
        )
    ).materialize()
    nparts = num_partitions or max(2, min(32, corpus.num_blocks()))
    nbuckets = max(8, 4 * nparts)

    # the scanner alphabet: distinct mention strings (the one
    # dictionary-shaped worker state this path keeps — same per-process
    # trie requirement as the reference)
    vocab = sorted(
        {
            m
            for b in ma_ds.select_columns(["mention"]).iter_batches(
                batch_format="pyarrow"
            )
            for m in b["mention"].to_pylist()
        }
    )
    vocab_ref = ray.put(vocab)
    freq_ds = freq_m_stage(corpus, vocab_ref).materialize()

    # ---- hot-mention detection (skew guard for exchange 3) from the
    # freq table computed above — no extra corpus pass. The hot set is
    # ≤ total/cap mentions, so this collect is tiny by construction.
    import os as _os

    if hot_mention_cap is None:
        _env = _os.environ.get("XLINK_HOT_MENTION_CAP", "")
        hot_mention_cap = int(_env) if _env else 0
    total_occ = int(freq_ds.sum("freq") or 0)
    cap = hot_mention_cap or max(4096, -(-4 * total_occ // nbuckets))
    hot_tbl = _collect(
        freq_ds.map_batches(
            lambda t: t.filter(pc.greater(t["freq"], cap)).select(["mention", "freq"]),
            batch_format="pyarrow",
        )
    )
    hot: "dict[str, int]" = (
        {
            m: int(min(nbuckets, -(-int(f) // cap)))
            for m, f in zip(
                hot_tbl["mention"].to_pylist(), hot_tbl["freq"].to_pylist()
            )
        }
        if hot_tbl.num_rows
        else {}
    )

    def add_bk(col: str):
        def fn(t: pa.Table) -> pa.Table:
            h = md5_low64([str(x) for x in t[col].to_pylist()]) % np.uint64(nbuckets)
            return t.append_column("bk", pa.array(h.astype(np.int64)))

        return fn

    # ---- exchange 1: per-mention stats (link_m, e_given_m, link_prob)
    def tag_ma(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "mention": t["mention"],
                "entity_id": t["entity_id"],
                "link_count": pc.cast(t["link_count"], pa.int64()),
                "freq": pa.array(np.zeros(n, np.int64)),
                "side": pa.array(np.zeros(n, np.int8)),
            }
        )

    def tag_freq(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "mention": t["mention"],
                "entity_id": pa.array([""] * n, pa.string()),
                "link_count": pa.array(np.zeros(n, np.int64)),
                "freq": pc.cast(t["freq"], pa.int64()),
                "side": pa.array(np.ones(n, np.int8)),
            }
        )

    tagged1 = (
        ma_ds.map_batches(tag_ma, batch_format="pyarrow")
        .union(freq_ds.map_batches(tag_freq, batch_format="pyarrow"))
        .map_batches(add_bk("mention"), batch_format="pyarrow")
    )

    _cand_empty = pa.table(
        {
            "mention": pa.array([], pa.string()),
            "entity_id": pa.array([], pa.string()),
            "e_given_m": pa.array([], pa.float64()),
            "link_prob": pa.array([], pa.float64()),
        }
    )

    def mention_stats(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        gma = g.filter(pa.array(side == 0))
        if gma.num_rows == 0:
            return _cand_empty
        gfr = g.filter(pa.array(side == 1))
        ma_m = np.asarray(gma["mention"].to_pylist(), dtype=object)
        lc = gma["link_count"].to_numpy(zero_copy_only=False)
        uniq_m, inv = np.unique(ma_m, return_inverse=True)
        # float64 sums are exact for int counts (< 2^53) — same values
        # the old Sum("link_count") aggregate produced before its cast
        link_m_u = np.bincount(inv, weights=lc.astype(np.float64))
        fm = np.asarray(gfr["mention"].to_pylist(), dtype=object)
        fv = gfr["freq"].to_numpy(zero_copy_only=False).astype(np.float64)
        forder = np.argsort(fm, kind="stable")
        fm_s, fv_s = fm[forder], fv[forder]
        lp_u = np.zeros(len(uniq_m), dtype=np.float64)
        if len(fm_s):
            pos = np.searchsorted(fm_s, uniq_m)
            posc = np.minimum(pos, len(fm_s) - 1)
            has = (pos < len(fm_s)) & (fm_s[posc] == uniq_m)
            # mentions absent from freq keep lp=0 — the old path's
            # left-outer join + coalesce(link_prob, 0) semantics
            lp_u[has] = link_m_u[has] / fv_s[posc[has]]
        return pa.table(
            {
                "mention": gma["mention"],
                "entity_id": gma["entity_id"],
                "e_given_m": pa.array(lc.astype(np.float64) / link_m_u[inv]),
                "link_prob": pa.array(lp_u[inv]),
            }
        )

    cand = (
        tagged1.groupby("bk")
        .map_groups(
            lambda g: mention_stats(g).select(
                ["mention", "entity_id", "e_given_m", "link_prob"]
            ),
            batch_format="pyarrow",
        )
    )

    # ---- exchange 2: entity vectors onto candidate rows
    emb_tbl = synth.synth_embeddings()
    ent_rows = emb_tbl.filter(pc.equal(emb_tbl["kind"], "entity"))
    ent_vecs = np.asarray(ent_rows["vec"].to_pylist(), dtype=np.float64)
    ent_ids = ent_rows["item"].to_pylist()
    # last-wins per entity_id — a duplicate id would otherwise fan out
    # the bucket join (two believe rows per candidate) while the
    # broadcast path's dict keeps only the last vector; same rule here
    last = {e: i for i, e in enumerate(ent_ids)}
    sel = sorted(last.values())
    ent_tbl = pa.table(
        {
            "entity_id": pa.array([ent_ids[i] for i in sel], pa.string()),
            "evec": pa.array([ent_vecs[i].tobytes() for i in sel], pa.binary()),
        }
    )

    def tag_cand(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "mention": t["mention"],
                "entity_id": t["entity_id"],
                "e_given_m": t["e_given_m"],
                "link_prob": t["link_prob"],
                "evec": pa.array([None] * t.num_rows, pa.binary()),
                "side": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        )

    def tag_ent(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "mention": pa.array([""] * n, pa.string()),
                "entity_id": t["entity_id"],
                "e_given_m": pa.array(np.zeros(n, np.float64)),
                "link_prob": pa.array(np.zeros(n, np.float64)),
                "evec": t["evec"],
                "side": pa.array(np.ones(n, np.int8)),
            }
        )

    tagged2 = (
        cand.map_batches(tag_cand, batch_format="pyarrow")
        .union(rd.from_arrow(ent_tbl).map_batches(tag_ent, batch_format="pyarrow"))
        .map_batches(add_bk("entity_id"), batch_format="pyarrow")
    )

    _cand2_empty = _cand_empty.append_column("evec", pa.array([], pa.binary()))

    def attach_vec(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        gc = g.filter(pa.array(side == 0))
        if gc.num_rows == 0:
            return _cand2_empty
        ge = g.filter(pa.array(side == 1))
        eids = np.asarray(gc["entity_id"].to_pylist(), dtype=object)
        out = np.full(len(eids), None, dtype=object)
        if ge.num_rows:
            beids = np.asarray(ge["entity_id"].to_pylist(), dtype=object)
            border = np.argsort(beids, kind="stable")
            b_s = beids[border]
            ev_obj = np.asarray(ge["evec"].to_pylist(), dtype=object)[border]
            pos = np.searchsorted(b_s, eids)
            posc = np.minimum(pos, len(b_s) - 1)
            has = (pos < len(b_s)) & (b_s[posc] == eids)
            out[has] = ev_obj[posc[has]]
        return pa.table(
            {
                "mention": gc["mention"],
                "entity_id": gc["entity_id"],
                "e_given_m": gc["e_given_m"],
                "link_prob": gc["link_prob"],
                "evec": pa.array(out.tolist(), pa.binary()),
            }
        )

    cand2 = tagged2.groupby("bk").map_groups(
        lambda g: attach_vec(g).select(
            ["mention", "entity_id", "e_given_m", "link_prob", "evec"]
        ),
        batch_format="pyarrow",
    )

    # ---- exchange 3: occurrences × candidates, score + argmax in-bucket
    emb_ref = broadcast_table(emb_tbl)

    def ctxvec_fn(t: pa.Table) -> pa.Table:
        # task form with worker-cached embedder (see _AddContextVec);
        # emits the context vector as a binary blob
        from xlink_ray.state.cached import cached_state

        vec = cached_state(
            ("ctxvec", emb_ref.hex()), lambda: _AddContextVec(emb_ref)
        )
        ctx = np.ascontiguousarray(vec.embedder(t["context"]), dtype=np.float64)
        return t.append_column(
            "ctxbin", pa.array([row.tobytes() for row in ctx], pa.binary())
        )

    occ = corpus.map_batches(
        occurrence_scan_fn, fn_args=(vocab_ref,), batch_format="pyarrow", num_cpus=hcpu
    ).map_batches(ctxvec_fn, batch_format="pyarrow")

    def tag_occ(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ms = t["mention"].to_pylist()
        mkey = ms
        if hot:
            hidx = [i for i, m in enumerate(ms) if m in hot]
            if hidx:
                doc = t["doc_id"].to_pylist()
                off = t["offset"].to_numpy(zero_copy_only=False)
                # deterministic per-occurrence salt — independent of
                # batching/partitioning, so results are bit-stable
                hsalt = md5_low64([f"{doc[i]}#{off[i]}" for i in hidx])
                mkey = list(ms)
                for j, i in enumerate(hidx):
                    mkey[i] = f"{ms[i]}\x1f{int(hsalt[j] % np.uint64(hot[ms[i]]))}"
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "offset": pc.cast(t["offset"], pa.int64()),
                "mention": t["mention"],
                "mkey": pa.array(mkey, pa.string()),
                "context": t["context"],
                "ctxbin": t["ctxbin"],
                "entity_id": pa.array([""] * n, pa.string()),
                "e_given_m": pa.array(np.zeros(n, np.float64)),
                "link_prob": pa.array(np.zeros(n, np.float64)),
                "evec": pa.array([None] * n, pa.binary()),
                "side": pa.array(np.zeros(n, np.int8)),
            }
        )

    def tag_cand2(t: pa.Table) -> pa.Table:
        mkey = None
        if hot and t.num_rows:
            ms0 = t["mention"].to_pylist()
            nrep = np.array([hot.get(m, 1) for m in ms0], np.int64)
            if (nrep > 1).any():
                # replicate each hot mention's candidate rows once per
                # salt sub-key: every salted occurrence bucket sees the
                # mention's FULL candidate set exactly once
                idx = np.repeat(np.arange(len(ms0), dtype=np.int64), nrep)
                ends = np.cumsum(nrep)
                salt = (
                    np.arange(int(nrep.sum()), dtype=np.int64)
                    - np.repeat(ends - nrep, nrep)
                )
                t = t.take(pa.array(idx))
                mkey = [
                    ms0[i] if n == 1 else f"{ms0[i]}\x1f{int(s)}"
                    for i, n, s in zip(idx, nrep[idx], salt)
                ]
        n = t.num_rows
        if mkey is None:
            mkey = t["mention"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array([""] * n, pa.string()),
                "offset": pa.array(np.full(n, -1, np.int64)),
                "mention": t["mention"],
                "mkey": pa.array(mkey, pa.string()),
                "context": pa.array([""] * n, pa.string()),
                "ctxbin": pa.array([None] * n, pa.binary()),
                "entity_id": t["entity_id"],
                "e_given_m": t["e_given_m"],
                "link_prob": t["link_prob"],
                "evec": t["evec"],
                "side": pa.array(np.ones(n, np.int8)),
            }
        )

    tagged3 = (
        occ.map_batches(tag_occ, batch_format="pyarrow")
        .union(cand2.map_batches(tag_cand2, batch_format="pyarrow"))
        .map_batches(add_bk("mkey"), batch_format="pyarrow")
    )

    def score_bucket(g: pa.Table) -> pa.Table:
        from xlink_ray.stages.candidates import BELIEVE_TH, LINK_PROB_TH, POWER

        side = g["side"].to_numpy(zero_copy_only=False)
        go = g.filter(pa.array(side == 0))
        gc = g.filter(pa.array(side == 1))
        if go.num_rows == 0 or gc.num_rows == 0:
            return _LINKS_EMPTY
        # join on the SALTED key: a hot mention's occurrence meets the
        # replicated candidate set of its own salt sub-key only
        om = np.asarray(go["mkey"].to_pylist(), dtype=object)
        cm = np.asarray(gc["mkey"].to_pylist(), dtype=object)
        corder = np.argsort(cm, kind="stable")
        cm_s = cm[corder]
        lo = np.searchsorted(cm_s, om, side="left")
        hi = np.searchsorted(cm_s, om, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return _LINKS_EMPTY
        # expanded (occurrence, candidate) index pairs — the same rows
        # the old hash join emitted, built by offset arithmetic
        ends = np.cumsum(cnt)
        flatpos = np.arange(total, dtype=np.int64) - np.repeat(ends - cnt, cnt) + np.repeat(lo, cnt)
        oidx = np.repeat(np.arange(len(om), dtype=np.int64), cnt)
        cidx = corder[flatpos]

        n_occ = go.num_rows
        ctx = np.frombuffer(
            b"".join(go["ctxbin"].to_pylist()), dtype=np.float64
        ).reshape(n_occ, -1)
        dim = ctx.shape[1]
        ev = np.zeros((gc.num_rows, dim), dtype=np.float64)
        for i, v in enumerate(gc["evec"].to_pylist()):
            if v is not None:
                ev[i] = np.frombuffer(v, dtype=np.float64)

        a = ctx[oidx]
        b = ev[cidx]
        num = np.einsum("ij,ij->i", a, b)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        cos = np.zeros(total, dtype=np.float64)
        nz = den > 0
        cos[nz] = num[nz] / den[nz]
        egm = gc["e_given_m"].to_numpy(zero_copy_only=False)[cidx]
        believe = (egm**POWER) * cos
        lp = gc["link_prob"].to_numpy(zero_copy_only=False)[cidx]

        doc = np.asarray(go["doc_id"].to_pylist())[oidx]
        off = go["offset"].to_numpy(zero_copy_only=False)[oidx]
        ent = np.asarray(gc["entity_id"].to_pylist())[cidx]
        # complete per-(doc, offset) argmax: every candidate of an
        # occurrence shares its mention, hence this bucket
        win = _argmax_first(doc, off, ent, believe)
        keep = (lp[win] > LINK_PROB_TH) & ((believe[win] + lp[win]) / 2.0 > BELIEVE_TH)
        win = win[keep]
        if len(win) == 0:
            return _LINKS_EMPTY
        occpick = pa.array(oidx[win])
        return pa.table(
            {
                "doc_id": pa.array(doc[win], pa.string()),
                "offset": pa.array(off[win]),
                "mention": go["mention"].take(occpick),
                "entity_id": pa.array(ent[win], pa.string()),
                "believe": pa.array(believe[win]),
                "context": go["context"].take(occpick),
            }
        )

    return tagged3.groupby("bk").map_groups(
        lambda g: score_bucket(g).select(
            ["doc_id", "offset", "mention", "entity_id", "believe", "context"]
        ),
        batch_format="pyarrow",
    )


class _AddContextVec:
    """Parallel pre-stage: context string → mean-word-vector column
    (fixed_size_list<double>), so the per-block group task does no
    token work at all."""

    def __init__(self, emb_ref: "ray.ObjectRef"):
        from xlink_ray.functions.context import ContextEmbedder

        emb = ray.get(emb_ref)
        items = emb["item"].to_pylist()
        kinds = emb["kind"].to_pylist()
        vecs = np.asarray(emb["vec"].to_pylist(), dtype=np.float32)
        words = [it for it, k in zip(items, kinds) if k == "word"]
        rows = [i for i, k in enumerate(kinds) if k == "word"]
        self.embedder = ContextEmbedder(words, vecs[rows])
        self.dim = self.embedder.dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ctx = self.embedder(batch["context"])
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(ctx.ravel(), pa.float64()), self.dim
        )
        return batch.append_column("ctxvec", col)


class _NeighborhoodEdges:
    """Per-block sorted-neighborhood edge generation over precomputed
    context vectors. Runs inside groupby((mention, entity_id)).map_groups;
    pure numpy — sort + adjacent-pair cosine."""

    def __call__(self, group: pa.Table) -> pa.Table:
        g = group.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
        n = g.num_rows
        if n < 2:
            return pa.table(
                {
                    "id_a": pa.array([], pa.string()),
                    "id_b": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        member = pc.binary_join_element_wise(
            pc.cast(g["doc_id"], pa.string()),
            pc.cast(g["offset"], pa.string()),
            "#",
        ).to_numpy(zero_copy_only=False)
        vec_col = g["ctxvec"].combine_chunks()
        dim = vec_col.type.list_size
        # zero-copy: fixed_size_list values buffer → (n, dim) matrix
        ctx = vec_col.flatten().to_numpy(zero_copy_only=False).reshape(n, dim)
        a, b = ctx[:-1], ctx[1:]
        num = np.einsum("ij,ij->i", a, b)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        cos = np.zeros(n - 1)
        nz = den > 0
        cos[nz] = num[nz] / den[nz]
        keep = cos >= EDGE_TH
        ia = np.nonzero(keep)[0]
        mem = np.asarray(member, dtype=object)
        lo = np.minimum(mem[ia], mem[ia + 1])
        hi = np.maximum(mem[ia], mem[ia + 1])
        return pa.table(
            {
                "id_a": pa.array(lo.tolist(), pa.string()),
                "id_b": pa.array(hi.tolist(), pa.string()),
                "score": pa.array(cos[ia], pa.float64()),
            }
        )


def edges_from_links(lkc: Dataset) -> Dataset:
    """links (+context) → sorted-neighborhood context-cosine edges.

    Context vectors are computed in a fully parallel ``map_batches``
    BEFORE the blocking groupby; the per-block task (few, large groups)
    then only sorts and scores adjacent pairs with numpy."""
    from xlink_ray.synth import synth_embeddings

    emb_ref = broadcast_table(synth_embeddings())
    with_vec = lkc.map_batches(
        _AddContextVec,
        fn_constructor_args=(emb_ref,),
        batch_format="pyarrow",
        concurrency=pool_size(),
        num_cpus=1,
    ).map_batches(_add_salt, batch_format="pyarrow")
    return with_vec.groupby(["mention", "entity_id", "salt"]).map_groups(
        _NeighborhoodEdges, batch_format="pyarrow", concurrency=pool_size()
    )


def members_from_links(lkc: Dataset) -> Dataset:
    return lkc.map_batches(
        lambda t: pa.table(
            {
                "m": pc.binary_join_element_wise(
                    t["doc_id"], pc.cast(t["offset"], pa.string()), "#"
                )
            }
        ),
        batch_format="pyarrow",
    )


def _adjacent_cos(ctx: np.ndarray) -> np.ndarray:
    """Cosine of each adjacent context-vector pair (n-1 values)."""
    a, b = ctx[:-1], ctx[1:]
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    cos = np.zeros(len(ctx) - 1)
    nz = den > 0
    cos[nz] = num[nz] / den[nz]
    return cos


def _run_labels(member: np.ndarray, ctx: np.ndarray) -> np.ndarray:
    """Run labels for rows ALREADY sorted in block order: break where
    the adjacent context cosine fails EDGE_TH; cluster id = min member
    string within the run (runs are contiguous ascending → groupby.min
    + repeat, no transform)."""
    import pandas as pd

    n = len(member)
    cos = _adjacent_cos(ctx)
    brk = np.ones(n, dtype=np.int64)
    brk[1:] = (cos < EDGE_TH).astype(np.int64)
    run = np.cumsum(brk) - 1
    run_min = pd.Series(member).groupby(run, sort=True).min().to_numpy()
    counts = np.bincount(run, minlength=len(run_min))
    return np.repeat(run_min, counts)


def _salted_run_labels(
    member: np.ndarray, ctx: np.ndarray, salt: np.ndarray
) -> np.ndarray:
    """Run labels the STANDING clustering would assign: the standing
    pipeline groups by (mention, entity, salt) and sorts WITHIN each
    salt group, so the labels for one salt come from ``_run_labels``
    over that salt's SUBSEQUENCE of the globally sorted block (urls
    sort source-major, so rows of different salts interleave — an
    adjacent-row salt break is NOT equivalent). Loops over the few
    distinct salts present in the block."""
    out = np.empty(len(member), dtype=object)
    for s in np.unique(salt):
        idx = np.nonzero(salt == s)[0]
        out[idx] = (
            _run_labels(member[idx], ctx[idx])
            if len(idx) > 1
            else member[idx].copy()
        )
    return out


class _BlockClusters:
    """Per-block transitive clustering fused into the block task.

    Flagship edges connect only occurrences adjacent within a block
    (sorted-neighborhood), so components NEVER span blocks — the
    transitive closure of chain edges is exactly the maximal runs of
    consecutive passing edges. Clustering therefore runs inside the
    same groupby((mention, entity_id)) task: no global CC stage, no
    driver-side edge collection, fully parallel across blocks. Context
    vectors are computed in-task from the ~100-byte context strings
    (vectorized embedder) — shuffling precomputed 512-byte vectors
    costs more than recomputing them after the shuffle. The generic
    connected_components operator (used by ``method != 'block'`` and
    the customer-ER pipeline) produces identical output — tests pin
    the equivalence.
    """

    def __init__(self, emb_ref: "ray.ObjectRef"):
        from xlink_ray.functions.context import ContextEmbedder

        emb = ray.get(emb_ref)
        items = emb["item"].to_pylist()
        kinds = emb["kind"].to_pylist()
        vecs = np.asarray(emb["vec"].to_pylist(), dtype=np.float32)
        words = [it for it, k in zip(items, kinds) if k == "word"]
        rows = [i for i, k in enumerate(kinds) if k == "word"]
        self.embedder = ContextEmbedder(words, vecs[rows])

    def __call__(self, group: pa.Table) -> pa.Table:
        g = group.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
        n = g.num_rows
        member = pc.binary_join_element_wise(
            pc.cast(g["doc_id"], pa.string()),
            pc.cast(g["offset"], pa.string()),
            "#",
        ).to_numpy(zero_copy_only=False)
        if n == 0:
            return pa.table(
                {"member_id": pa.array([], pa.string()),
                 "cluster_id": pa.array([], pa.string())}
            )
        if n == 1:
            return pa.table(
                {"member_id": pa.array(member, pa.string()),
                 "cluster_id": pa.array(member, pa.string())}
            )
        ctx = self.embedder(g["context"])
        labels = _run_labels(member, ctx)
        return pa.table(
            {
                "member_id": pa.array(member, pa.string()),
                "cluster_id": pa.array(labels, pa.string()),
            }
        )


def clusters_from(lkc: Dataset, method: str = "block") -> Dataset:
    if method == "block":
        from xlink_ray.synth import synth_embeddings

        emb_ref = broadcast_table(synth_embeddings())
        slim = lkc.select_columns(
            ["doc_id", "offset", "mention", "entity_id", "context"]
        ).map_batches(_add_salt, batch_format="pyarrow")

        def block_fn(group: pa.Table) -> pa.Table:
            from xlink_ray.state.cached import cached_state

            worker = cached_state(
                ("block_clusters", emb_ref.hex()), lambda: _BlockClusters(emb_ref)
            )
            return worker(group)

        return slim.groupby(["mention", "entity_id", "salt"]).map_groups(
            block_fn, batch_format="pyarrow"
        )
    return connected_components(
        edges_from_links(lkc),
        a="id_a",
        b="id_b",
        nodes=members_from_links(lkc),
        node_col="m",
        method=method,
    )


def _fused_cluster_fn(batch: pa.Table, ma_ref, lp_ref, emb_ref) -> pa.Table:
    """One salt-aligned corpus block → links → per-block clusters,
    all in-task and fully vectorized over the WHOLE batch: one Arrow
    sort on the blocking key stands in for the groupby, edges are
    scored straight from the distinct-context vector matrix
    (``resolve_batch(return_ctx=True)``), and run labelling is one
    grouped min — no pandas per-group loop, no context re-embedding.
    Output is identical to the ``block`` path's ``_BlockClusters``
    (tests pin equality). Asserts the block really is whole salt
    ranges."""
    import pandas as pd
    import pyarrow.compute as _pc

    from xlink_ray.stages.candidates import build_link_state, resolve_batch
    from xlink_ray.state.cached import cached_state

    state = cached_state(
        ("link_state", ma_ref.hex(), lp_ref.hex(), emb_ref.hex()),
        lambda: build_link_state(ray.get(ma_ref), ray.get(lp_ref), ray.get(emb_ref)),
    )

    urls = batch["doc_id"].to_pylist()
    nums = np.sort(np.asarray([int(u.rsplit("/", 1)[1]) for u in urls], dtype=np.int64))
    assert len(nums) > 0
    # every salt range present must be COMPLETE in this batch (Ray only
    # coalesces whole upstream blocks, and upstream blocks are exact
    # salt ranges — so containment holds; contiguity need not)
    salts, counts = np.unique(nums // DOCS_PER_SALT, return_counts=True)
    assert (counts == DOCS_PER_SALT).all(), (
        "fused path requires whole salt ranges per batch",
        salts[counts != DOCS_PER_SALT][:5].tolist(),
    )

    empty = pa.table(
        {"member_id": pa.array([], pa.string()), "cluster_id": pa.array([], pa.string())}
    )
    lk, ctx_codes, ctx_uniq = resolve_batch(
        state, urls, batch["text"].to_pylist(), return_ctx=True
    )
    if lk.num_rows == 0:
        return empty
    lk = _add_salt(lk).append_column("ctx_code", pa.array(ctx_codes, pa.int64()))
    # the blocking groupby, expressed as one in-task Arrow sort — the
    # same (mention, entity_id, salt) grouping + the same within-group
    # (doc_id, offset) order as _BlockClusters.sort_by
    g = lk.sort_by(
        [("mention", "ascending"), ("entity_id", "ascending"), ("salt", "ascending"),
         ("doc_id", "ascending"), ("offset", "ascending")]
    ).combine_chunks()
    n = g.num_rows
    m_codes = _pc.dictionary_encode(g["mention"]).combine_chunks().indices.to_numpy(zero_copy_only=False)
    e_codes = _pc.dictionary_encode(g["entity_id"]).combine_chunks().indices.to_numpy(zero_copy_only=False)
    s_vals = g["salt"].to_numpy(zero_copy_only=False)
    codes = g["ctx_code"].to_numpy(zero_copy_only=False)

    # adjacent-pair context cosine, exactly as _BlockClusters computes
    # it (same vectors, same num/den formula), chunked to stay
    # cache-resident
    brk = np.ones(n, dtype=bool)  # True = this row starts a new run
    if n > 1:
        new_grp = (
            (m_codes[1:] != m_codes[:-1])
            | (e_codes[1:] != e_codes[:-1])
            | (s_vals[1:] != s_vals[:-1])
        )
        cos = np.empty(n - 1, dtype=np.float64)
        CH = 8192
        for c0 in range(0, n - 1, CH):
            c1 = min(c0 + CH, n - 1)
            a = ctx_uniq[codes[c0:c1]]
            b = ctx_uniq[codes[c0 + 1 : c1 + 1]]
            num = np.einsum("ij,ij->i", a, b)
            den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
            cc = np.zeros(c1 - c0)
            nz = den > 0
            cc[nz] = num[nz] / den[nz]
            cos[c0:c1] = cc
        brk[1:] = new_grp | (cos < EDGE_TH)
    run = np.cumsum(brk) - 1
    member = pc.binary_join_element_wise(
        pc.cast(g["doc_id"], pa.string()), pc.cast(g["offset"], pa.string()), "#"
    ).to_numpy(zero_copy_only=False)
    run_min = pd.Series(member).groupby(run, sort=True).min().to_numpy()
    counts_r = np.bincount(run, minlength=len(run_min))
    labels = np.repeat(run_min, counts_r)
    return pa.table(
        {
            "member_id": pa.array(member, pa.string()),
            "cluster_id": pa.array(labels, pa.string()),
        }
    )


def clusters(sf_dir: str, method: str = "fused", repeat: int = 1) -> Dataset:
    """Full flagship pipeline → (member_id, cluster_id).

    Methods (all produce IDENTICAL output — tests pin equality):
      * "fused" (default): salt-range-aligned input blocks → candidate
        scan and clustering in one task, zero shuffle after the
        dictionary phase — the scale configuration (a block can never
        contribute to another block's clusters because the salt IS the
        partition),
      * "block": explicit groupby shuffle on the salted blocking key,
        per-block clustering in the group task,
      * "local"/"distributed": edges + the generic connected-components
        operator (driver union-find / star rounds).
    """
    if method == "fused":
        from xlink_ray import synth
        from xlink_ray.stages.extract import ExtractCorpusBatch

        # dictionary phase over the ordinary (coalesced-block) corpus;
        # the fused stage consumes a FRESH salt-aligned stream — every
        # physical block is whole salt ranges by construction, so no
        # repartition/realignment is needed and the scan→cluster path
        # has ZERO shuffles and ZERO materializations after the
        # (dictionary-sized) broadcast tables
        _corpus, ma_ref, lp_ref, emb_ref = _prepare(sf_dir, repeat)
        aligned = synth.synth_pages(
            sf_dir, repeat, align_salt=True, slim=True
        ).map_batches(
            ExtractCorpusBatch(),
            batch_format="pyarrow",
            batch_size=None,
            num_cpus=heavy_cpus(),
        )
        return aligned.map_batches(
            _fused_cluster_fn,
            fn_args=(ma_ref, lp_ref, emb_ref),
            batch_format="pyarrow",
            batch_size=None,
            num_cpus=heavy_cpus(),
        )
    lk = links(sf_dir, repeat=repeat)
    if method == "block":
        # single consumer → stream links straight into the blocking
        # shuffle, no materialization barrier
        return clusters_from(lk, method=method)
    # the generic-CC paths consume links twice (edges + members)
    return clusters_from(lk.materialize(), method=method)


def clusters_checkpointed(
    sf_dir: str, ckpt_root: str, method: str = "auto"
) -> tuple[Dataset, "object"]:
    """Flagship with per-stage Parquet checkpoints + lineage manifests.

    Stages: links → edges → clusters. A rerun with the same inputs
    skips every complete stage (manifest fingerprint match); returns
    (clusters Dataset, CheckpointManager) so callers can inspect
    skipped/computed lineage.
    """
    from xlink_ray.state.checkpoint import CheckpointManager, fingerprint

    cm = CheckpointManager(ckpt_root)
    # fold input-content signals into the fingerprint so a changed
    # source table invalidates the stage checkpoints (not just the path)
    import os as _os

    src = f"{sf_dir}/documents.parquet"
    st = _os.stat(src)
    base = fingerprint(
        "flagship-v1", sf_dir, EDGE_TH, st.st_size, int(st.st_mtime_ns)
    )

    lkc = cm.run_stage("links", fingerprint(base, "links"), lambda: links(sf_dir))
    edges = cm.run_stage(
        "edges", fingerprint(base, "edges"), lambda: edges_from_links(lkc)
    )
    members = members_from_links(lkc)
    out = cm.run_stage(
        "clusters",
        fingerprint(base, "clusters", method),
        lambda: connected_components(
            edges, a="id_a", b="id_b", nodes=members, node_col="m", method=method
        ),
    )
    return out, cm


class _AttachBlock:
    """Per-(mention, entity) attach task for an incremental crawl:
    recompute the BASE rows' run labels locally (identical math to
    ``_BlockClusters``, computed per-salt over each salt's subsequence
    of the sorted block — see ``_salted_run_labels`` — so the
    recomputed labels equal the standing (mention, entity, salt)
    clustering's labels on multi-salt corpora), then place each NEW
    occurrence at its sorted
    position and test the context cosine against its adjacent base
    neighbors — adopt the better neighbor's cluster when the edge
    passes EDGE_TH (ties → the left/earlier neighbor, the
    sorted-neighborhood convention), else the new rows of the block
    cluster among THEMSELVES with the standard run rule (a brand-new
    entity's occurrences still form clusters).

    Semantic contract vs a FULL re-cluster of both crawls (inherent to
    attach under sorted-neighborhood chain semantics; measured at
    sf0.001: pairwise F1 0.65 between the two results):
    * attach never MERGES two standing clusters (a bridging new row
      adopts one side only);
    * attach never SPLITS a standing cluster — a full re-cluster DOES
      whenever an inserted row fails the edge to both neighbors,
      breaking the chain between previously-adjacent members.
    Standing cluster ids staying stable is exactly the property an
    incremental deployment buys with attach."""

    def __init__(self, emb_ref: "ray.ObjectRef"):
        self._inner = _BlockClusters(emb_ref)
        self.embedder = self._inner.embedder

    def __call__(self, group: pa.Table) -> pa.Table:
        from xlink_ray.synth import doc_id_of_url

        g = group.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
        side = g["side"].to_numpy(zero_copy_only=False)
        member = pc.binary_join_element_wise(
            pc.cast(g["doc_id"], pa.string()),
            pc.cast(g["offset"], pa.string()),
            "#",
        ).to_numpy(zero_copy_only=False)
        # standing clusters are computed per (mention, entity, SALT) —
        # recomputed run labels must break at salt boundaries or a
        # multi-salt base block merges runs the standing clustering
        # keeps apart, and a matched new row adopts a label that is not
        # its neighbor's standing cluster id.
        salt = (
            doc_id_of_url(g["doc_id"]).to_numpy(zero_copy_only=False)
            // DOCS_PER_SALT
        )
        new_rows = np.nonzero(side == 1)[0]
        empty = pa.table(
            {
                "member_id": pa.array([], pa.string()),
                "cluster_id": pa.array([], pa.string()),
                "matched": pa.array([], pa.int64()),
                "cos_bp": pa.array([], pa.int64()),
            }
        )
        if len(new_rows) == 0:
            return empty
        base_rows = np.nonzero(side == 0)[0]
        ctx = self.embedder(g["context"])
        if len(base_rows) == 0:
            # new-only block: standard run clustering among the new
            # rows, per-salt (matching the standing convention)
            labels = _salted_run_labels(
                member[new_rows], ctx[new_rows], salt[new_rows]
            )
            return pa.table(
                {
                    "member_id": pa.array(member[new_rows], pa.string()),
                    "cluster_id": pa.array(labels, pa.string()),
                    "matched": pa.array(np.zeros(len(new_rows), np.int64)),
                    "cos_bp": pa.array(np.full(len(new_rows), -1, np.int64)),
                }
            )
        b_member, b_ctx = member[base_rows], ctx[base_rows]
        b_labels = _salted_run_labels(b_member, b_ctx, salt[base_rows])
        # position of each new row among the base rows (rows are in
        # global block order, so counting preceding base rows gives the
        # insertion point directly — no key re-comparison needed)
        ins = np.cumsum(side == 0)[new_rows]  # #base rows before each new row
        n_ctx = ctx[new_rows]
        nb = len(base_rows)

        def cos_to(base_idx: np.ndarray, valid: np.ndarray) -> np.ndarray:
            out = np.full(len(new_rows), -1.0)
            if valid.any():
                a = n_ctx[valid]
                b = b_ctx[np.clip(base_idx[valid], 0, nb - 1)]
                num = np.einsum("ij,ij->i", a, b)
                den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
                c = np.zeros(len(a))
                nz = den > 0
                c[nz] = num[nz] / den[nz]
                out[valid] = c
            return out

        cos_l = cos_to(ins - 1, ins - 1 >= 0)
        cos_r = cos_to(ins, ins <= nb - 1)
        take_left = cos_l >= cos_r  # tie → left/earlier neighbor
        best_cos = np.where(take_left, cos_l, cos_r)
        best_idx = np.where(take_left, np.clip(ins - 1, 0, nb - 1), np.clip(ins, 0, nb - 1))
        matched = best_cos >= EDGE_TH
        labels = np.where(matched, b_labels[best_idx], member[new_rows])
        return pa.table(
            {
                "member_id": pa.array(member[new_rows], pa.string()),
                "cluster_id": pa.array(labels.astype(object), pa.string()),
                "matched": pa.array(matched.astype(np.int64)),
                "cos_bp": pa.array(
                    # half-up rounding (floor(x·1e4 + 0.5)): identical
                    # contexts give cos = 1 ± ulp depending on the
                    # engine's summation order — a plain floor would
                    # flip 10000/9999 across engines, half-up is stable
                    # there (and at every non-boundary value)
                    np.where(
                        best_cos < 0, -1, np.floor(best_cos * 10000.0 + 0.5)
                    ).astype(np.int64)
                ),
            }
        )


def attach_new_crawl(sf_dir: str, new_repeat: int = 2, base_repeat: int = 1) -> Dataset:
    """Incremental flagship run: the standing crawl is ``sf_dir``'s
    pages (repeat=base_repeat); copies base_repeat..new_repeat-1 of the
    deterministic synth are the NEW crawl. The dictionary, link-prob tables and embeddings
    are REUSED from the standing run (no rebuild); new pages stream
    through the same candidate scan; each new occurrence attaches to a
    standing cluster via the sorted-neighborhood context edge, or
    founds/joins a new-rows-only cluster.

    → (member_id, cluster_id, matched, cos_bp), one row per NEW
    occurrence. One blocking groupby — the same exchange shape as the
    standing pipeline's cluster stage.

    Scale/partitioning assumptions (documented per the custom-operator
    rule): the groupby key is (mention, entity) WITHOUT the doc-range
    salt, because a new crawl's doc numbers all sort AFTER the standing
    corpus — every new occurrence inserts at the END of the base rows,
    so its only base neighbor is the block's LAST base member. A block
    task therefore holds the standing block plus the new crawl's rows;
    at true scale the base side reduces to O(1) per-block state (the
    tail member, its context vector and its run label), which can be
    precomputed per block and attached reduce-side, bounding the task
    by the NEW crawl's block size only. The salted variant is not
    needed precisely because of the append ordering.

    Doc-id bound: in-block rows sort lexicographically on the url
    string (same convention as the standing ``_BlockClusters``), and
    synth urls zero-pad doc ids to 8 digits — so the append-ordering
    argument above holds for doc_id < 1e8. Past that, sort blocks by
    ``doc_id_of_url`` (numeric) in BOTH the standing and attach paths;
    the code handles mid-insertion correctly either way, only the
    O(1)-base-tail scale claim depends on the ordering.
    """
    from xlink_ray import synth

    tagged = _attach_tagged(sf_dir, new_repeat, base_repeat)
    return tagged.groupby(["mention", "entity_id"]).map_groups(
        _AttachBlock,
        fn_constructor_args=(broadcast_table(synth.synth_embeddings()),),
        batch_format="pyarrow",
        concurrency=pool_size(),
    )


def _attach_tagged(
    sf_dir: str, new_repeat: int = 2, base_repeat: int = 1
) -> Dataset:
    """The attach pipeline's pre-groupby input: standing-crawl links
    tagged side=0 unioned with new-crawl links tagged side=1 (columns
    mention, entity_id, doc_id, offset, context, side). Split out so
    tests can drive a driver-side oracle over the same link set."""
    from xlink_ray import synth
    from xlink_ray.stages.candidates import CandidateGenActor
    from xlink_ray.stages.extract import ExtractCorpusBatch

    corpus, ma_ref, lp_ref, emb_ref = _prepare(sf_dir, base_repeat)
    n_base = corpus.count()

    def links_of(c: Dataset) -> Dataset:
        return c.map_batches(
            CandidateGenActor,
            fn_constructor_args=(ma_ref, lp_ref, emb_ref),
            batch_format="pyarrow",
            batch_size=256,
            concurrency=pool_size(),
            num_cpus=1,
        )

    def only_new(t: pa.Table) -> pa.Table:
        from xlink_ray.synth import doc_id_of_url

        keep = pc.greater_equal(doc_id_of_url(t["doc_id"]), n_base)
        return t.filter(keep)

    new_corpus = (
        synth.synth_pages(sf_dir, new_repeat, slim=True)
        .map_batches(ExtractCorpusBatch(), batch_format="pyarrow", batch_size=None,
                     num_cpus=heavy_cpus())
        .map_batches(only_new, batch_format="pyarrow")
    )

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "mention": t["mention"],
                    "entity_id": t["entity_id"],
                    "doc_id": t["doc_id"],
                    "offset": t["offset"],
                    "context": t["context"],
                    "side": pa.array(np.full(t.num_rows, side, dtype=np.int8)),
                }
            )

        return fn

    return links_of(corpus).map_batches(tag(0), batch_format="pyarrow").union(
        links_of(new_corpus).map_batches(tag(1), batch_format="pyarrow")
    )


def golden_clusters(sf_dir: str, repeat: int = 1) -> Dataset:
    """Webtext golden records: each flagship cluster collapsed to one
    canonical row — (cluster_id, n_members, mention, entity_id,
    believe) with mention/entity from the min-member representative and
    believe = the strongest member's disambiguation score. String-id
    survivorship (stages/survivor.golden_records with pa.string() keys);
    links are materialized ONCE and feed both the cluster labels and
    the per-member record side."""
    from xlink_ray.stages.survivor import golden_records

    lkc = links(sf_dir, repeat=repeat).materialize()  # two consumers
    members = clusters_from(lkc, method="block")

    def member_records(t: pa.Table) -> pa.Table:
        member = pc.binary_join_element_wise(
            pc.cast(t["doc_id"], pa.string()),
            pc.cast(t["offset"], pa.string()),
            "#",
        )
        return pa.table(
            {
                "member": member,
                "mention": t["mention"],
                "entity_id": t["entity_id"],
                "believe": t["believe"],
            }
        )

    records = lkc.map_batches(member_records, batch_format="pyarrow")
    return golden_records(
        members,
        records,
        id_col="member",
        carry_min_id=["mention", "entity_id"],
        argmax_col="believe",
        id_type=pa.string(),
        cluster_type=pa.string(),
    )


def nil_mentions(
    sf_dir: str, repeat: int = 1, believe_th: "float | None" = None
) -> Dataset:
    """The TAC-KBP 'NIL' set: mention occurrences whose BEST candidate
    fails the acceptance thresholds (the linker's rejects) →
    (doc_id, offset, mention, entity_id, believe, context). Identical
    pipeline to :func:`links` with the final keep filter inverted;
    ``believe_th`` overrides the P8 constant (the synth corpus links
    everything at the reference bar, so exercising the NIL path takes
    a stricter review threshold). Rides the memoized ``_raw_scan`` —
    after a ``links()`` run the corpus is NOT re-scanned."""
    from xlink_ray.stages.candidates import link_prob_filter

    raw, lp_ref, _ = _raw_scan(sf_dir, repeat)
    kw = {"invert": True}
    if believe_th is not None:
        kw["believe_th"] = believe_th
    return raw.map_batches(
        link_prob_filter, fn_args=(lp_ref,), fn_kwargs=kw,
        batch_format="pyarrow",
    )


def nil_attach(
    nil: Dataset,
    emb_ref: "ray.ObjectRef",
    cos_th_e6: int = 800000,
    nsalt: int = 16,
) -> Dataset:
    """NIL-coreference clustering over a STANDING rejected-occurrence
    Dataset (the post-filter form: attach to any existing `links`-style
    scan instead of re-running it) → (member_id, cluster_id),
    member_id = docnum·10⁶ + offset.

    Two-stage blocking — no hot-surface assumption:

    1. groupby (mention, context-salt), salt = hash(context) % nsalt:
       equal context strings share a salt, so each CONTEXT CLASS is
       whole in one sub-group. Members star-connect to their class rep
       (min node; in-class cosine is exactly 1) — per-task load is
       ~surface_members/nsalt even for a boilerplate surface that
       dominates the NIL set. Zero-norm contexts stay singletons
       (cos ≔ 0 convention).
    2. groupby (mention) over the class REPS only (≤ distinct contexts
       of the surface): the rep grid is scored with chunked matmul,
       cosine quantized half-up to the 1e-6 grid (the links-oracle
       float convention). Connectivity equals the full pairwise graph:
       any qualifying cross pair's class pair qualifies identically.

    Residual assumption (documented per the custom-operator rule): one
    surface's distinct-context rep SET fits a group task — far weaker
    than the old all-members-in-one-task shape; the rep grid itself is
    chunked."""
    import numpy as np

    from xlink_ray.functions.hashing import md5_low64
    from xlink_ray.stages.clustering import connected_components
    from xlink_ray.synth import doc_id_of_url
    from xlink_ray.util import pool_size

    def prep(t: pa.Table) -> pa.Table:
        docnum = doc_id_of_url(t["doc_id"])
        off = t["offset"].to_numpy(zero_copy_only=False)
        ctx = t["context"].to_pylist()
        csalt = md5_low64(ctx) % np.uint64(nsalt)
        return t.append_column(
            "node", pa.array(np.asarray(docnum, dtype=np.int64) * 1_000_000 + off)
        ).append_column("csalt", pa.array(csalt.astype(np.int64)))

    with_vec = (
        nil.map_batches(prep, batch_format="pyarrow")
        .map_batches(
            _AddContextVec,
            fn_constructor_args=(emb_ref,),
            batch_format="pyarrow",
            concurrency=pool_size(),
            num_cpus=1,
        )
        .select_columns(["node", "mention", "csalt", "context", "ctxvec"])
        .materialize()  # two consumers: edges + CC node universe
    )

    _stage1_empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "mention": pa.array([], pa.string()),
            "vec": pa.array([], pa.binary()),
            "kind": pa.array([], pa.int8()),
        }
    )

    def collapse_classes(g: pa.Table) -> pa.Table:
        """Stage 1: star edges (kind 0) + one rep row per context class
        (kind 1, vector as a binary blob for the stage-2 grid)."""
        from xlink_ray.util import vecs_to_numpy

        node = g["node"].to_numpy(zero_copy_only=False)
        if len(node) == 0:
            return _stage1_empty
        ctx = np.asarray(g["context"].to_pandas(), dtype=object)
        v = vecs_to_numpy(g["ctxvec"])
        mention = g["mention"].to_pylist()[0]
        o = np.lexsort((node, ctx))
        node, ctx, v = node[o], ctx[o], v[o]
        first = np.r_[True, ctx[1:] != ctx[:-1]]
        reps = node[first]
        rv = v[first]
        cls_of = np.cumsum(first) - 1
        nn = np.sqrt((rv * rv).sum(axis=1))
        nz = nn > 0
        # star edges: member -> its class rep (skip reps themselves and
        # zero-norm classes, whose members stay singletons)
        member_m = nz[cls_of] & ~first
        ea = reps[cls_of[member_m]]
        eb = node[member_m]
        k = len(reps)
        return pa.table(
            {
                "id_a": pa.array(np.r_[ea, reps]),
                "id_b": pa.array(np.r_[eb, np.full(k, -1, np.int64)]),
                "mention": pa.array(
                    [""] * len(ea) + [mention] * k, pa.string()
                ),
                "vec": pa.array(
                    [None] * len(ea) + [row.tobytes() for row in rv], pa.binary()
                ),
                "kind": pa.array(
                    np.r_[np.zeros(len(ea), np.int8), np.ones(k, np.int8)]
                ),
            }
        )

    stage1 = with_vec.groupby(["mention", "csalt"]).map_groups(
        lambda g: collapse_classes(g).select(
            ["id_a", "id_b", "mention", "vec", "kind"]
        ),
        batch_format="pyarrow",
    ).materialize()  # two consumers: star edges + rep rows

    star_edges = stage1.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(["id_a", "id_b"]),
        batch_format="pyarrow",
    )

    _edges_empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    def rep_grid(g: pa.Table) -> pa.Table:
        reps = g["id_a"].to_numpy(zero_copy_only=False)
        k = len(reps)
        if k < 2:
            return _edges_empty
        rv = np.frombuffer(b"".join(g["vec"].to_pylist()), np.float64).reshape(k, -1)
        nn = np.sqrt((rv * rv).sum(axis=1))
        out_a, out_b = [], []
        step = 2048
        for i0 in range(0, k, step):
            vi = rv[i0 : i0 + step]
            num = vi @ rv.T
            den = nn[i0 : i0 + step][:, None] * nn[None, :]
            cos = np.where(den > 0, num / den, 0.0)
            q = np.floor(cos * 1e6 + 0.5).astype(np.int64)
            ii, jj = np.nonzero(q >= cos_th_e6)
            gi = ii + i0
            keep = gi < jj
            out_a.append(reps[gi[keep]])
            out_b.append(reps[jj[keep]])
        a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    grid_edges = (
        stage1.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], 1)).select(
                ["id_a", "mention", "vec"]
            ),
            batch_format="pyarrow",
        )
        .groupby("mention")
        .map_groups(
            lambda g: rep_grid(g).select(["id_a", "id_b"]),
            batch_format="pyarrow",
        )
    )

    return connected_components(
        star_edges.union(grid_edges),
        nodes=with_vec.select_columns(["node"]),
        node_col="node",
    )


def nil_clusters(
    sf_dir: str, cos_th_e6: int = 800000, believe_th: "float | None" = 0.5
) -> Dataset:
    """NIL-mention clustering (the TAC-KBP NIL-coreference step): the
    linker's rejected occurrences cluster among themselves — same
    normalized surface AND context cosine ≥ the threshold — via
    connected components → (member_id, cluster_id).

    Composition: ``nil_mentions`` (the inverted keep filter over the
    memoized ``_raw_scan`` — a preceding ``links()`` run's scan is
    REUSED, not re-run) → :func:`nil_attach` (two-stage salted
    context-class blocking; see its docstring for the scale shape)."""
    nil = nil_mentions(sf_dir, believe_th=believe_th)
    _, _, emb_ref = _raw_scan(sf_dir, 1)
    return nil_attach(nil, emb_ref, cos_th_e6=cos_th_e6)
