

def test_pack_by_length_col_matches_cumsum(ray_session):
    import pyarrow as pa

    import ray.data as rd
    from xlink_ray.stages.packing import pack_sequences

    rows = [{"doc_id": i, "n_toks": (i * 7) % 11 + 1} for i in range(40)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_tok"], r["chunk_id"])
        for r in pack_sequences(ds, capacity=16, length_col="n_toks").take_all()
    }
    start = 0
    for r in rows:
        assert got[r["doc_id"]] == (r["n_toks"], start, start // 16)
        start += r["n_toks"]
