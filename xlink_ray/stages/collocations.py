"""PMI collocation mining over the corpus (the phrase-detection
preprocessing step of embedding pipelines — gensim ``Phrases`` /
Mikolov et al. 2013 §4 do the same with a variant score; this emits
the textbook pointwise mutual information):

    pmi(a,b) = ln( (B(a,b)/TB) / ((U(a)/T) · (U(b)/T)) )

with B = adjacent within-doc bigram count, U = unigram count,
T = total tokens, TB = total bigrams (= T − n_docs, exact, since every
doc of length L contributes L−1 bigrams).

Scale shape: bigram and unigram counts are per-batch partial
``group_by`` tables combined by ONE grouped-sum shuffle each (the
exchange carries distinct keys per block, not the token stream); the
unigram table (vocabulary-sized, min-count trimmed upstream of the
join by construction of the bigram filter) is broadcast once via
``ray.put`` and attached with a vectorized ``index_in`` — no corpus
reshuffle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

__all__ = ["pmi_bigrams"]


def pmi_bigrams(
    docs: Dataset, text_col: str = "text", min_count: int = 5
) -> Dataset:
    """(w1, w2, n, pmi) for every adjacent bigram with n >= min_count."""

    def uni_partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        return (
            pa.table({"tk": flat})
            .group_by("tk")
            .aggregate([([], "count_all")])
            .rename_columns(["tk", "n"])
        )

    def big_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        nw = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks).combine_chunks()
        doc = np.repeat(np.arange(t.num_rows, dtype=np.int64), nw)
        n = len(doc)
        same = doc[1:] == doc[:-1] if n else np.zeros(0, dtype=bool)
        sel = np.nonzero(same)[0]
        w1 = flat.take(pa.array(sel))
        w2 = flat.take(pa.array(sel + 1))
        return (
            pa.table({"w1": w1, "w2": w2})
            .group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
            .rename_columns(["w1", "w2", "n"])
        )

    # tiny scalar pass: T and N (TB = T - N, exact)
    def len_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        return pa.table(
            {
                "t": pa.array([int(pc.sum(pc.list_value_length(toks)).as_py() or 0)], pa.int64()),
                "d": pa.array([t.num_rows], pa.int64()),
            }
        )

    sizes = docs.map_batches(len_partial, batch_format="pyarrow").take_all()
    total_t = float(sum(s["t"] for s in sizes))
    total_b = float(total_t - sum(s["d"] for s in sizes))

    uni = (
        docs.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("tk")
        .aggregate(Sum("n", alias_name="n"))
    )
    # vocabulary-sized broadcast: put once, read per task
    uni_tbl = pa.concat_tables(
        b for b in uni.iter_batches(batch_format="pyarrow")
    ).combine_chunks()
    uni_ref = ray.put(uni_tbl)

    big = (
        docs.map_batches(big_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
    )

    class AttachPMI:
        def __init__(self, ref, t: float, tb: float, mc: int):
            tbl = ray.get(ref)
            self.vocab = tbl["tk"].combine_chunks()
            self.counts = tbl["n"].to_numpy(zero_copy_only=False).astype(np.float64)
            self.t, self.tb, self.mc = t, tb, mc

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater_equal(t["n"], self.mc))
            if t.num_rows == 0:
                return pa.table(
                    {
                        "w1": pa.array([], pa.string()),
                        "w2": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                        "pmi": pa.array([], pa.float64()),
                    }
                )
            i1 = pc.index_in(t["w1"], value_set=self.vocab).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            i2 = pc.index_in(t["w2"], value_set=self.vocab).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
            ua, ub = self.counts[i1], self.counts[i2]
            pmi = np.log((n / self.tb) / ((ua / self.t) * (ub / self.t)))
            return pa.table(
                {
                    "w1": t["w1"],
                    "w2": t["w2"],
                    "n": pc.cast(t["n"], pa.int64()),
                    "pmi": pa.array(pmi),
                }
            )

    return big.map_batches(
        AttachPMI,
        fn_constructor_args=(uni_ref, total_t, total_b, min_count),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
