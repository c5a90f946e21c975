"""Dedup family, ANN search, text analysis, multimodal plumbing tests."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _docs_with_dups(ray_session):
    import ray.data as rd

    base = [
        "the quick brown fox jumps over the lazy dog in the morning light",
        "a completely different document about ray data pipelines and arrow",
        "numerical computing with numpy is fast when you stay vectorized",
        "el rápido zorro marrón salta sobre el perro perezoso cada mañana",
    ]
    rows = []
    for i in range(40):
        b = base[i % 4]
        if i < 36:
            text = b
        else:
            text = b + " extra tail words"  # near-dup of its base
        rows.append({"doc_id": i, "text": text})
    return rd.from_pandas(pd.DataFrame(rows))


def test_exact_dedup(ray_session):
    from mercury_graph_ray.stages.dedup import exact_dedup

    ds = _docs_with_dups(ray_session)
    out = exact_dedup(ds).to_pandas().sort_values("keeper").reset_index(drop=True)
    assert len(out) == 8  # 4 bases + 4 tailed variants
    assert out.n_copies.sum() == 40
    assert out.keeper.iloc[0] == 0


def test_minhash_lsh_finds_near_dups(ray_session):
    from mercury_graph_ray.stages.dedup import minhash_lsh_pairs, ngram_jaccard

    ds = _docs_with_dups(ray_session)
    pairs = minhash_lsh_pairs(ds, threshold=0.5, bands=32, concurrency=2).to_pandas()
    # every exact-duplicate pair of doc 0's group must be found
    group0 = [i for i in range(36) if i % 4 == 0]
    found = {(a, b) for a, b in zip(pairs.a, pairs.b)}
    for i in group0:
        for j in group0:
            if i < j:
                assert (i, j) in found
    # near-dup (36 vs 0) should surface: high real jaccard
    assert ngram_jaccard(
        "the quick brown fox jumps over the lazy dog in the morning light",
        "the quick brown fox jumps over the lazy dog in the morning light extra tail words",
    ) > 0.6
    assert (0, 36) in found
    # no cross-content false positives at threshold 0.5
    for a, b in found:
        assert a % 4 == b % 4


def test_minhash_deterministic_across_partitioning(ray_session):
    from mercury_graph_ray.stages.dedup import minhash_lsh_pairs

    ds = _docs_with_dups(ray_session)
    p1 = minhash_lsh_pairs(ds, threshold=0.5, bands=32, concurrency=2).to_pandas()
    p2 = minhash_lsh_pairs(ds.repartition(7), threshold=0.5, bands=32, concurrency=3).to_pandas()
    k1 = sorted(zip(p1.a, p1.b, p1.est_jaccard))
    k2 = sorted(zip(p2.a, p2.b, p2.est_jaccard))
    assert k1 == k2


def test_simhash_pairs(ray_session):
    from mercury_graph_ray.stages.dedup import simhash_pairs

    ds = _docs_with_dups(ray_session)
    out = simhash_pairs(ds, max_hamming=3).to_pandas()
    found = {(a, b) for a, b in zip(out.a, out.b)}
    assert (0, 4) in found  # identical docs -> hamming 0
    assert all(h <= 3 for h in out.hamming)


def test_embedding_dup_pairs(ray_session):
    import ray.data as rd

    from mercury_graph_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal((10, 16))
    vecs = np.concatenate([base, base[:3] + rng.standard_normal((3, 16)) * 1e-3])
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(13), "embedding": list(vecs)})
    )
    out = embedding_dup_pairs(ds, threshold=0.99).to_pandas()
    found = {(a, b) for a, b in zip(out.a, out.b)}
    for i in range(3):
        assert (i, 10 + i) in found
    assert all(c >= 0.99 for c in out.cosine)


def test_brute_force_knn_matches_numpy(ray_session):
    import ray.data as rd

    from mercury_graph_ray.stages.knn import brute_force_topk

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 32))
    ds = rd.from_pandas(pd.DataFrame({"vec_id": np.arange(200), "embedding": list(vecs)}))
    q = vecs[:3]
    out = brute_force_topk(ds, q, k=5, query_ids=np.arange(3))
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = unit @ unit[:3].T
    for qi in range(3):
        want = np.argsort(-sims[:, qi], kind="stable")[:5]
        got = out.loc[out["query"] == qi].sort_values("rank")["vec_id"].to_numpy()
        assert set(got) == set(want)
        assert got[0] == qi  # self is the nearest


def test_ivf_recall(ray_session):
    from mercury_graph_ray.pipelines.training_data import knn_ivf_vs_brute

    rec = knn_ivf_vs_brute(SF, k=10, n_queries=4)
    assert rec.recall.mean() >= 0.6  # nprobe=3 of nlist=8


def test_ivf_partition_pruning(ray_session):
    """A probe must read ONLY the nprobe lists' parquet partitions, not
    the full table (VERDICT round 1 #7)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from mercury_graph_ray.stages.knn import IvfIndex

    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = IvfIndex.build(ds, nlist=8)
    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas()
    q = np.stack(tbl["embedding"].to_numpy()[:2]).astype(np.float64)
    idx.search(q, k=5, nprobe=2, query_ids=np.array([0, 1]))
    probed_lists = {p.split("list_id=")[1].split("/")[0] for p in idx.last_probe_paths_}
    assert 0 < len(probed_lists) <= 4  # union of 2 queries x nprobe=2
    import os

    all_lists = [d for d in os.listdir(idx.index_dir) if d.startswith("list_id=")]
    assert len(all_lists) > len(probed_lists)  # strictly pruned


def test_text_stats(ray_session):
    import ray.data as rd

    from mercury_graph_ray.functions.text import TextStats, lang_id, token_count

    assert token_count(pd.Series(["a b  c", "", "  x "])).tolist() == [3, 0, 1]
    assert lang_id("the cat and the dog went to the house of things") == "en"
    assert lang_id("la casa de la montaña que se ve desde aquí") == "es"
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["hello world!", "hola de la casa"]})
    )
    out = ds.map_batches(TextStats, batch_format="pandas", concurrency=1).to_pandas()
    assert set(out.columns) >= {
        "n_chars", "n_tokens", "alpha_ratio", "punct_ratio",
        "stopword_ratio", "lang_pred", "fingerprint",
    }
    # fingerprints deterministic
    out2 = ds.map_batches(TextStats, batch_format="pandas", concurrency=1).to_pandas()
    assert out.fingerprint.tolist() == out2.fingerprint.tolist()


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from mercury_graph_ray.stages.multimodal import (
        FrameSample,
        ImageDecode,
        ImageResize,
        fake_image_decoder,
        synth_media_table,
    )

    tbl = synth_media_table(24, seed=42)
    ds = rd.from_arrow(tbl)
    dec = ds.map_batches(
        ImageDecode,
        fn_constructor_kwargs={"decoder": fake_image_decoder},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    ).to_pandas()
    assert len(dec) == 24
    assert (dec.height >= 8).all() and (dec.width >= 8).all()
    assert len(dec.channel_mean.iloc[0]) == 3
    assert "data" not in dec.columns  # payload dropped after decode

    rs = rd.from_arrow(tbl).map_batches(
        ImageResize,
        fn_constructor_kwargs={"decoder": fake_image_decoder, "size": 4},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    ).to_pandas()
    assert len(rs.thumb.iloc[0]) == 4 * 4 * 3

    fs = rd.from_arrow(tbl).map_batches(
        FrameSample, batch_format="pyarrow", batch_size=8, concurrency=1
    ).to_pandas()
    offs = np.stack(fs.frame_offsets.to_numpy())
    assert offs.shape == (24, 4)
    assert (offs[:, 0] < offs[:, 1]).all()

    # stub contract: no decoder -> NotImplementedError naming the library
    with pytest.raises(Exception, match="PIL|decoder"):
        rd.from_arrow(synth_media_table(2)).map_batches(
            ImageDecode, batch_format="pyarrow", concurrency=1
        ).materialize()


def test_hash_function_goldens():
    """Pin fingerprint64 (FNV-1a) and simhash64 values so vectorization
    rewrites can't silently change the hash definitions (both feed dedup
    bucketing, so a drift would invalidate persisted fingerprints)."""
    import pandas as pd

    from mercury_graph_ray.functions.text import fingerprint64
    from mercury_graph_ray.stages.dedup import simhash64

    s = pd.Series(["the quick brown fox", "The Quick Brown Fox", "", None, "日本語 text mixed"])
    assert fingerprint64(s).tolist() == [
        6462304499243991330,
        16476063329361101538,
        14695981039346656037,  # FNV offset basis (empty doc)
        14695981039346656037,  # None -> ""
        7470513040478400245,
    ]
    # simhash is case-insensitive (lower() before tokenize): rows 0/1 equal.
    # Values re-pinned in round 3: the token hash moved from blake2b to the
    # SQL-expressible two-lane polynomial (_poly_hash_tokens) so the
    # simhash_dedup_pairs driver query carries an exact DuckDB oracle.
    assert simhash64(s).tolist() == [
        11699788955238006793,
        11699788955238006793,
        0,
        0,
        15986681569326662535,
    ]


def test_duplicate_doc_id_rows_produce_no_self_pairs(ray_session):
    """Duplicate doc_id rows in the input must not yield a == b self-pairs
    (est_jaccard 1.0 / hamming 0) from the bucketed pair explode — the
    vectorized rewrite had dropped the per-bucket np.unique(doc) that
    filtered them (ADVICE r2, stages/dedup._segment_pair_positions)."""
    import pandas as pd
    import ray.data as rd

    from mercury_graph_ray.stages.dedup import minhash_lsh_pairs, simhash_pairs

    df = pd.DataFrame(
        {
            "doc_id": [1, 1, 2, 3, 3, 3],
            "text": ["alpha beta gamma delta epsilon zeta"] * 6,
        }
    )
    ds = rd.from_pandas(df)
    mh = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    assert (mh["a"] != mh["b"]).all()
    assert {(1, 2), (1, 3), (2, 3)} <= set(zip(mh["a"], mh["b"]))
    sh = simhash_pairs(ds, max_hamming=3).to_pandas()
    assert (sh["a"] != sh["b"]).all()
    assert {(1, 2), (1, 3), (2, 3)} <= set(zip(sh["a"], sh["b"]))


def test_ngram_jaccard_consecutive_bucketed(ray_session):
    """The int-bucketed rewrite (one task per bucket, vectorized
    intersections) matches a brute-force per-pair reference exactly."""
    from mercury_graph_ray.pipelines.training_data import (
        docs_ngram_jaccard_consecutive,
    )
    from mercury_graph_ray.stages.dedup import shingle_hashes

    sf = "/root/testdata/sf0.001"
    got = docs_ngram_jaccard_consecutive(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    hs = {int(r.doc_id): shingle_hashes(r.text or "", 5) for r in docs.itertuples()}
    ids = sorted(hs)
    assert len(got) == len(ids) - 1
    for a, b in zip(ids, ids[1:]):
        row = got[(got.doc_a == a) & (got.doc_b == b)]
        assert len(row) == 1, (a, b)
        inter = len(np.intersect1d(hs[a], hs[b], assume_unique=True))
        assert int(row.n_a.iloc[0]) == len(hs[a])
        assert int(row.n_b.iloc[0]) == len(hs[b])
        assert int(row.n_inter.iloc[0]) == inter, (a, b)


def test_exact_cosine_pairs_blocked_matches_broadcast(ray_session):
    """Forcing the blocked (partitioned-parquet, block-pair-task) path with
    a tiny block_rows must reproduce the broadcast path exactly: same
    (a, b) set, cosines equal to 1e-12."""
    import ray.data as rd

    from mercury_graph_ray.stages.knn import exact_cosine_pairs

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = (
        exact_cosine_pairs(ds, threshold=0.4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert ds.count() > 40  # the forced path must actually block-split
    got = (
        exact_cosine_pairs(ds, threshold=0.4, block_rows=20)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["a"].to_numpy() == want["a"].to_numpy()).all()
    assert (got["b"].to_numpy() == want["b"].to_numpy()).all()
    np.testing.assert_allclose(
        got["cosine"].to_numpy(), want["cosine"].to_numpy(), atol=1e-12, rtol=0
    )
