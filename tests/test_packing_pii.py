"""pack_sequences (stages/packing.py) and pii_scrub (stages/pii.py):
Python oracles over synthetic fixtures, plus boundary/edge behavior."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from xlink_ray.stages.packing import pack_sequences
from xlink_ray.stages.pii import pii_scrub


def _docs(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


# ---------------------------------------------------------------- packing

def _pack_oracle(texts, ids, capacity):
    rows = sorted(zip(ids, texts))
    acc = 0
    out = {}
    for did, t in rows:
        n = len(t.split(" "))
        out[did] = (n, acc, acc // capacity)
        acc += n
    return out


def test_pack_sequences_matches_serial_scan(ray_session):
    rng = np.random.default_rng(4)
    texts = [" ".join(f"w{j}" for j in range(int(rng.integers(1, 40)))) for _ in range(300)]
    # non-contiguous, shuffled ids: the scan must order by doc_id, not
    # by arrival
    ids = list(rng.permutation(np.arange(0, 900, 3))[:300])
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_tok"], r["chunk_id"])
        for r in pack_sequences(_docs(texts, ids), capacity=64, nbuckets=7).take_all()
    }
    assert got == _pack_oracle(texts, ids, 64)


def test_pack_sequences_chunk_boundary(ray_session):
    # 4 docs x 5 tokens, capacity 10: doc 2 starts exactly at token 10
    texts = ["a b c d e"] * 4
    got = {
        r["doc_id"]: (r["start_tok"], r["chunk_id"])
        for r in pack_sequences(_docs(texts), capacity=10, nbuckets=2).take_all()
    }
    assert got == {0: (0, 0), 1: (5, 0), 2: (10, 1), 3: (15, 1)}


def test_pack_sequences_empty(ray_session):
    out = pack_sequences(_docs([]), capacity=8)
    assert out.take_all() == []


# -------------------------------------------------------------------- pii

def test_pii_scrub_patterns(ray_session):
    texts = [
        "contact john.doe+spam@mail.example.co for info",
        "server at 192.168.0.1 and 10.0.0.255 replied",
        "call +1 555-1234 today",
        "no pii here at all",
        "mixed a@b.io 8.8.8.8 +44 2071-2345 end",
    ]
    rows = {r["doc_id"]: r for r in pii_scrub(_docs(texts)).take_all()}
    assert rows[0]["text"] == "contact <EMAIL> for info"
    assert (rows[0]["n_email"], rows[0]["n_ip"], rows[0]["n_phone"]) == (1, 0, 0)
    assert rows[1]["text"] == "server at <IP> and <IP> replied"
    assert rows[1]["n_ip"] == 2
    assert rows[2]["text"] == "call <PHONE> today"
    assert rows[2]["n_phone"] == 1
    assert rows[3]["text"] == "no pii here at all"
    assert (rows[3]["n_email"], rows[3]["n_ip"], rows[3]["n_phone"]) == (0, 0, 0)
    assert rows[4]["text"] == "mixed <EMAIL> <IP> <PHONE> end"


def test_pii_scrub_sequential_counting(ray_session):
    # the IP-like digits inside the email must NOT be counted as an IP:
    # emails are scrubbed before the IP pass
    t = ["x 1.2.3.4@host.example.com y"]
    r = pii_scrub(_docs(t)).take_all()[0]
    assert r["n_email"] == 1 and r["n_ip"] == 0
    assert r["text"] == "x <EMAIL> y"
