"""E6 gensim-shaped Word2Vec surface (pipelines/word2vec.py)."""


def test_word2vec_learns_shared_contexts(ray_session):
    from xlink_ray.pipelines.word2vec import Word2Vec

    # two groups of words distinguished by shared contexts (in-vector
    # similarity comes from shared contexts, not direct co-occurrence)
    sents = (
        [["a1", "ka", "kb"]] * 100
        + [["a2", "ka", "kb"]] * 100
        + [["b1", "kc", "kd"]] * 100
        + [["b2", "kc", "kd"]] * 100
    )
    m = Word2Vec(
        sents,
        vector_size=16,
        window=2,
        min_count=1,
        negative=3,
        epochs=8,
        sample=0.0,
        seed=5,
        n_shards=2,
    )
    assert m.total_pairs > 0
    kv = m.wv
    assert {"a1", "a2", "b1", "b2"} <= set(kv.key_to_index)
    assert kv.similarity("a1", "a2") > kv.similarity("a1", "b1") + 0.3
    assert kv.similarity("b1", "b2") > kv.similarity("b1", "a2") + 0.3
    assert kv.most_similar("a1", topn=1)[0][0] == "a2"
    assert kv.most_similar("b1", topn=1)[0][0] == "b2"
    assert kv["a1"].shape == (16,)
    assert "a1" in kv and "zebra" not in kv
