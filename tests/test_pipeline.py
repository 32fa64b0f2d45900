"""Training-data pipeline operator tests (dedup/similarity/text/multimodal)."""

import math

import pytest
from pyspark.sql import functions as F

from opentsdb_spark.pipeline.dedup import (
    embedding_dup_pairs, exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, simhash,
    simhash_pairs,
)
from opentsdb_spark.pipeline.multimodal import docs_as_media, extract_features, resize_images
from opentsdb_spark.pipeline.similarity import brute_force_topk, embedding_stats, lsh_topk
from opentsdb_spark.pipeline.text import (
    detect_language, fingerprint_docs, quality_scores, repetition_signals, token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat", "en"),  # near dup
        (3, "der hund ist und die katze ist da", "de"),
        (4, "completely different words about spark engines here", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.999, 0.01, 0.0, 0.0], 0),  # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [-1.0, 0.0, 0.0, 0.0], 1),
        (4, [0.7, 0.7, 0.0, 0.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    return df


def test_exact_dedup(docs):
    out = exact_dedup(docs)
    assert out.count() == 4
    kept = {r["doc_id"]: r["dup_count"] for r in out.collect()}
    assert kept[0] == 2 and 1 not in kept


def test_ngram_jaccard(docs):
    out = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=10).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 4) not in pairs


def test_minhash_lsh(docs):
    out = minhash_lsh_pairs(docs, num_hashes=32, bands=16, threshold=0.4).collect()
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out}
    assert pairs[(0, 1)] == 1.0  # identical docs always collide
    assert (0, 3) not in pairs and (0, 4) not in pairs


def test_decontaminate(spark):
    """GPT-3-style n-gram decontamination: train docs sharing >= min_shared
    distinct n-grams with any benchmark doc are flagged."""
    from opentsdb_spark.pipeline.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (0, "news report the quick brown fox jumps over a fence"),  # 3 shared 4-grams
            (1, "completely unrelated sentence about spark engines"),
            (2, "tiny"),  # shorter than n
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(train, bench, n=4, min_shared=2).collect()}
    assert out[0]["contaminated"] and out[0]["shared_grams"] == 3
    assert not out[1]["contaminated"] and out[1]["shared_grams"] == 0
    assert not out[2]["contaminated"] and out[2]["shared_grams"] == 0
    # threshold honored
    strict = {r["doc_id"]: r["contaminated"]
              for r in decontaminate(train, bench, n=4, min_shared=4).collect()}
    assert not strict[0]


def test_ngram_dedup_survives_short_docs(spark, docs):
    """A real corpus always contains docs shorter than the shingle width;
    they have no n-gram identity and must be dropped, not crash the job
    (F.sequence descends when size < n and slice(_, 0, _) aborts)."""
    short = spark.createDataFrame(
        [(90, "tiny"), (91, "two words"), (92, "")], "doc_id long, text string"
    )
    mixed = docs.select("doc_id", "text").unionByName(short)
    pairs = {(r["id_a"], r["id_b"]) for r in
             ngram_jaccard_pairs(mixed, n=3, threshold=0.5, max_df=10).collect()}
    assert (0, 1) in pairs
    assert not any(90 <= a <= 92 or 90 <= b <= 92 for a, b in pairs)
    out = minhash_lsh_pairs(mixed, num_hashes=32, bands=16, threshold=0.4).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} >= {(0, 1)}


def test_simhash(docs):
    from opentsdb_spark.pipeline.dedup import (
        _clone_members, expand_class_pairs, simhash_class_pairs)

    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[0] == sh[1]
    out = simhash_pairs(docs, max_hamming=10).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs[(0, 1)] == 0
    # clone-class form: expansion == member pairs, clique {0,1} is a
    # within-class row
    cls = {(r["rep_a"], r["rep_b"]): (r["n_a"], r["n_b"], r["n_pairs"])
           for r in simhash_class_pairs(docs, max_hamming=10).collect()}
    assert cls[(0, 0)][:2] == (2, 2) and cls[(0, 0)][2] == 1
    members = _clone_members(simhash(docs), "doc_id", "simhash",
                             persist=False)
    expanded = {(r["id_a"], r["id_b"]): r["hamming"] for r in
                expand_class_pairs(simhash_class_pairs(docs, max_hamming=10),
                                   members).collect()}
    assert expanded == pairs


def test_embedding_dup(vecs):
    out = embedding_dup_pairs(vecs, threshold=0.95, tables=4, bits=4, dim=4).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in out}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert (0, 3) not in pairs


def test_brute_force_topk(vecs):
    q = vecs.where(F.col("vec_id") == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    out = brute_force_topk(vecs, q, k=3).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [0, 1, 4]
    assert out[0]["cosine"] == pytest.approx(1.0)
    assert out[2]["cosine"] == pytest.approx(math.cos(math.pi / 4), abs=1e-3)


def test_lsh_topk(vecs):
    q = vecs.where(F.col("vec_id") == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    out = lsh_topk(vecs, q, k=3, tables=4, bits=4, dim=4).collect()
    got = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # near-identical vectors collide in some table with overwhelming odds
    assert got[0] == 0 and 1 in got
    assert 3 not in got  # antipodal vector: complement bucket in EVERY table


def _planted_fixture(spark):
    """The driver's 64-dim embeddings fixture + 10 planted near-dup clusters.

    The raw fixture's top-5 neighbors sit at cosine ~0.3 (pure noise) — an
    information-theoretic regime where NO sublinear ANN can reach 0.9 recall
    without scanning most of the corpus (measured: hyperplane LSH 0.48, IVF
    at 50% scan 0.86). The recall CLAIM is therefore pinned in the regime
    ANN indexes exist for: genuinely similar neighbors. Each planted cluster
    is 5 members + 1 query at exact cosine 0.95 to a real fixture vector."""
    import os

    import numpy as np

    from opentsdb_spark.sources.points import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = load_table(spark, sf_dir, "embeddings")
    base = np.array(
        [r["embedding"] for r in emb.select("embedding").orderBy("vec_id").collect()],
        dtype=float,
    )
    rng = np.random.RandomState(7)
    cos_t, sin_t = 0.95, math.sqrt(1 - 0.95**2)
    extra, queries = [], []
    for qi in range(10):
        u = base[qi] / np.linalg.norm(base[qi])
        for j in range(6):
            r = rng.randn(64)
            r -= (r @ u) * u
            r /= np.linalg.norm(r)
            w = (cos_t * u + sin_t * r) * np.linalg.norm(base[qi])
            if j < 5:
                extra.append((10_000 + qi * 10 + j, [float(x) for x in w], 99))
            else:
                queries.append((qi, [float(x) for x in w]))
    extra_df = spark.createDataFrame(extra, "vec_id long, embedding array<float>, label int")
    corpus = emb.select("vec_id", "embedding", "label").union(extra_df)
    qdf = spark.createDataFrame(queries, "query_id long, embedding array<float>")
    return corpus, qdf


def test_lsh_topk_recall_vs_bruteforce(spark):
    """Recall@5 of multi-table hyperplane LSH vs the exact baseline: >= 0.9
    on near-dup neighbors (the single sign-bucket variant this replaced
    measured ~0.5 even there)."""
    corpus, qdf = _planted_fixture(spark)
    exact = brute_force_topk(corpus, qdf, k=5).collect()
    approx = lsh_topk(corpus, qdf, k=5, tables=10, bits=6, dim=64).collect()
    truth = {(r["query_id"], r["vec_id"]) for r in exact}
    got = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"recall@5 = {recall}"


def test_lsh_fast_path_matches_bit_exact(spark):
    """The matmul bucket/cosine fast path (the default) must agree with the
    fold-order-exact path on real-margin data: identical buckets, identical
    top-k membership and ranks, cosines within 1e-12 (FP-order noise only —
    absorbed by the catalog's 4-decimal rounding)."""
    from opentsdb_spark.pipeline.similarity import with_hyperplane_buckets

    corpus, qdf = _planted_fixture(spark)
    fast_b = with_hyperplane_buckets(
        corpus.select("vec_id", "embedding"), "embedding", 10, 6, 64
    ).select("vec_id", "tb").collect()
    exact_b = with_hyperplane_buckets(
        corpus.select("vec_id", "embedding"), "embedding", 10, 6, 64,
        bit_exact=True,
    ).select("vec_id", "tb").collect()
    assert {(r["vec_id"], tuple(r["tb"])) for r in fast_b} == \
        {(r["vec_id"], tuple(r["tb"])) for r in exact_b}

    fast = lsh_topk(corpus, qdf, k=5, tables=10, bits=6, dim=64).collect()
    exact = lsh_topk(corpus, qdf, k=5, tables=10, bits=6, dim=64,
                     bit_exact=True).collect()
    fk = {(r["query_id"], r["vec_id"]): (r["rank"], r["cosine"]) for r in fast}
    ek = {(r["query_id"], r["vec_id"]): (r["rank"], r["cosine"]) for r in exact}
    assert fk.keys() == ek.keys()
    for key, (rank, cos) in fk.items():
        erank, ecos = ek[key]
        assert rank == erank and abs(cos - ecos) < 1e-12


def test_ivf_topk_recall(spark):
    """IVF multi-probe: >= 0.9 recall on near-dup neighbors, and the honest
    noise-regime floor on the raw fixture (probing 8/16 cells ~= half the
    corpus; 0.9 is unreachable there for ANY sublinear index — see
    _planted_fixture docstring)."""
    from opentsdb_spark.pipeline.similarity import ivf_topk

    corpus, qdf = _planted_fixture(spark)
    exact = brute_force_topk(corpus, qdf, k=5).collect()
    approx = ivf_topk(corpus, qdf, k=5, n_centroids=16, n_probe=8).collect()
    truth = {(r["query_id"], r["vec_id"]) for r in exact}
    got = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"planted recall@5 = {recall}"

    raw_q = corpus.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact_r = brute_force_topk(corpus, raw_q, k=5).collect()
    approx_r = ivf_topk(corpus, raw_q, k=5, n_centroids=16, n_probe=8).collect()
    truth_r = {(r["query_id"], r["vec_id"]) for r in exact_r}
    got_r = {(r["query_id"], r["vec_id"]) for r in approx_r}
    recall_r = len(truth_r & got_r) / len(truth_r)
    assert recall_r >= 0.6, f"noise-regime recall@5 = {recall_r}"


def test_embedding_stats(vecs):
    out = {r["label"]: r["n"] for r in embedding_stats(vecs).collect()}
    assert out == {0: 2, 1: 2, 2: 1}


def test_detect_language(docs):
    out = {r["doc_id"]: r for r in detect_language(docs).collect()}
    assert out[0]["predicted_lang"] == "en" and out[0]["score_en"] == 2
    assert out[3]["predicted_lang"] == "de"


def test_quality_scores(docs):
    out = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    r = out[0]
    assert r["n_words"] == 9
    assert r["stopword_ratio"] == pytest.approx(2 / 9)  # 'the' x2
    assert r["distinct_ratio"] == pytest.approx(8 / 9)


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "hello world, it's 42!")], "doc_id long, text string")
    r = token_counts(df).collect()[0]
    assert r["ws_tokens"] == 4
    # pieces: hello world , it ' s 42 ! -> 8
    assert r["bpe_pieces"] == 8


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [
            # 4 lines, 'spam spam' twice: 2 dup-line occurrences of 4
            (0, "spam spam\nok line\nspam spam\nother"),
            # 'buy now buy now buy now': bigrams [buy now, now buy, buy now,
            # now buy, buy now] -> top 'buy now' 3/5; trigrams 4, 2 dups
            (1, "buy now buy now buy now"),
            (2, "all words unique here today"),
            (3, "x"),  # 1 word: no bigrams/trigrams -> all zero
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[0]["dup_line_frac"] == pytest.approx(1 / 4)
    # chars: all lines 9+7+9+5=30, distinct 9+7+5=21
    assert out[0]["dup_line_char_frac"] == pytest.approx(9 / 30)
    assert out[1]["top_bigram_frac"] == pytest.approx(3 / 5)
    assert out[1]["dup_trigram_frac"] == pytest.approx(2 / 4)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == pytest.approx(1 / 4)  # all unique -> max count 1
    assert out[3]["dup_line_frac"] == 0.0
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[3]["dup_trigram_frac"] == 0.0


def test_xxh64_sql_replica_bit_exact(spark):
    """The DuckDB-SQL XXH64 replica (oracle side of the production hash
    pipelines) must be bit-exact vs Spark's F.xxhash64 for strings of every
    length class (empty / <8 / <32 / stripe / stripe+tail) and for the
    ARRAY<LONG> fold used by minhash band keys."""
    import random

    duckdb = pytest.importorskip("duckdb")
    from opentsdb_spark.pipeline.xxh64_sql import (
        SEED, hash_long_ctes, py_xxh64, py_xxh64_longs, xxh64_str_ctes,
    )

    rng = random.Random(11)
    strs = ["", "a", "abc", "1234567", "12345678", "x" * 31, "y" * 32,
            "z" * 33, "w" * 64, "v" * 71, "héllo wörld ünicode " * 4]
    strs += ["".join(rng.choice("abcdef gh") for _ in range(rng.randint(0, 90)))
             for _ in range(30)]
    df = spark.createDataFrame(list(enumerate(strs)), "i int, s string")
    spark_h = {r["i"]: r["h"] for r in df.select("i", F.xxhash64("s").alias("h")).collect()}
    assert spark_h == {i: py_xxh64(s.encode()) for i, s in enumerate(strs)}

    con = duckdb.connect()
    con.execute("CREATE TABLE strs (i INT, s VARCHAR)")
    con.executemany("INSERT INTO strs VALUES (?, ?)", list(enumerate(strs)))
    sql = "WITH RECURSIVE " + xxh64_str_ctes("strs", ("i",), "s") + \
          " SELECT i, h FROM xxh"
    assert dict(con.execute(sql).fetchall()) == spark_h

    arrs = [[rng.randint(-2**63, 2**63 - 1) for _ in range(4)] for _ in range(12)]
    adf = spark.createDataFrame(list(enumerate(arrs)), "i int, a array<bigint>")
    spark_a = {r["i"]: r["h"] for r in adf.select("i", F.xxhash64("a").alias("h")).collect()}
    assert spark_a == {i: py_xxh64_longs(a) for i, a in enumerate(arrs)}

    con.execute("CREATE TABLE la (i INT, v0 BIGINT, v1 BIGINT, v2 BIGINT, v3 BIGINT)")
    con.executemany("INSERT INTO la VALUES (?,?,?,?,?)", [(i, *a) for i, a in enumerate(arrs)])
    ids = ("i", "v0", "v1", "v2", "v3")
    ctes = [f"f0src AS (SELECT *, CAST({SEED} AS UBIGINT) AS h FROM la)"]
    src = "f0src"
    for j in range(4):
        ctes.append(hash_long_ctes(src, ids, f"v{j}", "h", f"f{j}", f"p{j}"))
        src = f"f{j}"
    fold_sql = ("WITH " + ",".join(ctes) +
                " SELECT i, CAST(CAST(h AS HUGEINT) - CASE WHEN h >= 9223372036854775808"
                " THEN CAST(18446744073709551616 AS HUGEINT) ELSE 0 END AS BIGINT)"
                f" FROM {src}")
    assert dict(con.execute(fold_sql).fetchall()) == spark_a


def test_fingerprint(docs):
    out = {r["doc_id"]: r for r in fingerprint_docs(docs, k=3, num_mins=4).collect()}
    assert out[0]["fingerprint"] == out[1]["fingerprint"]
    assert out[0]["fingerprint"] != out[4]["fingerprint"]
    assert out[0]["distinct_grams"] == 7  # 9 words -> 7 3-grams, all distinct


def test_multimodal(docs):
    media = docs_as_media(docs)
    feats = {r["media_id"]: r for r in extract_features(media, "fake").collect()}
    assert feats[0]["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert feats[0]["byte_entropy"] > 0
    assert feats[0]["byte_mean"] == feats[1]["byte_mean"]
    with pytest.raises(NotImplementedError):
        extract_features(media, "real")
    with pytest.raises(NotImplementedError):
        resize_images(media, 100, 100, codec="real")
    # raw-codec resize is implemented; docs_as_media sets no dims, so blobs
    # pass through as NULL media rather than raising
    assert resize_images(media, 100, 100).where("media IS NOT NULL").count() == 0


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id in component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(m) for r, m in comp.items() for x in m}


def test_connected_components_vs_union_find(spark):
    from opentsdb_spark.pipeline.cluster import connected_components

    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
        edges = [(a, b) for a, b in edges if a != b]
        expected = _uf_components(n, edges)
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(df).collect()
        }
        touched = {x for e in edges for x in e}
        assert got.keys() == touched
        for x in touched:
            assert got[x] == expected[x], (trial, x)


def test_connected_components_chain_and_clusters(spark):
    from opentsdb_spark.pipeline.cluster import (
        connected_components, dedup_assign_clusters,
    )

    # a 6-node path (worst case for label propagation), a triangle, a singleton
    edges = [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert all(got[x] == 0 for x in range(6))
    assert all(got[x] == 10 for x in (10, 11, 12))
    docs = spark.createDataFrame([(i,) for i in [*range(6), 10, 11, 12, 99]],
                                 "doc_id long")
    out = {r["doc_id"]: r for r in dedup_assign_clusters(docs, df).collect()}
    assert out[99]["component"] == 99 and out[99]["is_canonical"]
    assert sum(r["is_canonical"] for r in out.values()) == 3  # 0, 10, 99
    kept = {r["doc_id"] for r in out.values() if r["is_canonical"]}
    assert kept == {0, 10, 99}


def test_ivf_custom_id_col_trains(spark):
    """ivf_topk's trained path must honor a custom id_col — the hash-ordered
    training sample keys on the id column, so a frame without 'vec_id' has
    to work when id_col names its real id."""
    from opentsdb_spark.pipeline.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    renamed = emb.withColumnRenamed("vec_id", "doc_id")
    q = renamed.where(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), "embedding")
    out = ivf_topk(renamed, q, k=3, n_centroids=4, n_probe=4,
                   id_col="doc_id").collect()
    assert len(out) == 6 and all(r["rank"] <= 3 for r in out)


def test_dsir_importance_weights(spark):
    """DSIR (Xie et al. 2023): documents written in the target slice's
    vocabulary must out-weigh documents written in the off-target
    vocabulary, and weights are symmetric evidence — a doc mixing both
    sits between them."""
    from opentsdb_spark.pipeline.sampling import dsir_importance_weights

    rows = []
    for i in range(20):
        rows.append((i, "law court judge ruling appeal " * 4, "legal"))
        rows.append((100 + i, "goal match striker penalty corner " * 4, "sport"))
    rows.append((500, "law court judge ruling appeal law court", "web"))
    rows.append((501, "goal match striker penalty corner goal", "web"))
    rows.append((502, "law court goal match judge striker", "web"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r["log_weight"]
           for r in dsir_importance_weights(
               docs, F.col("source") == "legal").collect()}
    assert out[500] > out[502] > out[501]
    assert out[500] > 0 > out[501]  # target-like up, off-target down
    # n_feats = unigrams + bigrams per doc
    nf = {r["doc_id"]: r["n_feats"]
          for r in dsir_importance_weights(
              docs, F.col("source") == "legal").collect()}
    assert nf[501] == 6 + 5


def test_pii_scrub(spark):
    from opentsdb_spark.pipeline.text import pii_scrub

    df = spark.createDataFrame(
        [(0, "mail a@b.com and c.d+x@e.org, ip 10.0.0.1, ssn 123-45-6789, "
             "call +1 (555) 123-4567 now")],
        "doc_id long, text string",
    )
    r = pii_scrub(df).collect()[0]
    assert r["n_email"] == 2 and r["n_ipv4"] == 1 and r["n_ssn"] == 1
    assert r["n_phone"] == 1
    s = r["scrubbed"]
    assert "<EMAIL>" in s and "<IP>" in s and "<SSN>" in s and "<PHONE>" in s
    assert "a@b.com" not in s and "6789" not in s and "555" not in s
    # the FULL number must be gone — a char-bounded pattern used to leave
    # '<PHONE>67'-style trailing-digit leaks
    assert "67" not in s and "+1" not in s and "123" not in s


def test_boilerplate_flags(spark):
    from opentsdb_spark.pipeline.text import boilerplate_flags

    df = spark.createDataFrame(
        [(0, "ALL CAPS SHOUTING!!! Copyright 2024. subscribe NOW"),
         (1, "a calm lowercase sentence")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in boilerplate_flags(df).collect()}
    assert out[0]["has_boilerplate"] and not out[1]["has_boilerplate"]
    assert out[0]["upper_ratio"] > 0.3 > out[1]["upper_ratio"]
    assert out[0]["digit_ratio"] > 0 == out[1]["digit_ratio"]
    assert out[0]["symbol_ratio"] > 0 == out[1]["symbol_ratio"]


def test_hash_split_and_stratified(spark):
    from opentsdb_spark.pipeline.sampling import hash_split, stratified_sample

    df = spark.createDataFrame([(i, i % 4) for i in range(2000)],
                               "doc_id long, label int")
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert counts["train"] + counts.get("val", 0) + counts.get("test", 0) == 2000
    assert 1500 < counts["train"] < 1700  # ~80% within hash tolerance
    # deterministic: identical on re-run
    again = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(again).count() == 0
    # different seed moves documents
    moved = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=1)
    assert out.exceptAll(moved).count() > 0
    with pytest.raises(ValueError):
        hash_split(df, {"train": 0.5})
    # stratified: label 0 kept fully, label 1 ~half, labels 2/3 dropped
    samp = stratified_sample(df, {0: 1.0, 1: 0.5}, strata_col="label")
    by = {r["label"]: r["count"] for r in samp.groupBy("label").count().collect()}
    assert by[0] == 500 and 200 < by[1] < 300 and 2 not in by and 3 not in by


def test_temperature_mixture(spark):
    from opentsdb_spark.pipeline.sampling import temperature_mixture

    # skewed corpus: big source 1600 docs, small source 400
    df = spark.createDataFrame(
        [(i, "big" if i < 1600 else "small") for i in range(2000)],
        "doc_id long, source string",
    )
    out = temperature_mixture(df, alpha=0.5, target_frac=0.5)
    by = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    # kept counts ~ n^0.5: 40:20 ratio -> 2:1, not the natural 4:1
    assert 1.6 < by["big"] / by["small"] < 2.5
    # expected total ~ 1000
    assert 800 < by["big"] + by["small"] < 1200
    # alpha=1 preserves the natural mix
    nat = temperature_mixture(df, alpha=1.0, target_frac=0.5)
    byn = {r["source"]: r["count"] for r in nat.groupBy("source").count().collect()}
    assert 3.0 < byn["big"] / byn["small"] < 5.5
    # deterministic
    assert out.exceptAll(
        temperature_mixture(df, alpha=0.5, target_frac=0.5)
    ).count() == 0
    # rate cap: tiny source at extreme alpha keeps everything, never >100%
    cap = temperature_mixture(df, alpha=0.0, target_frac=0.9)
    byc = {r["source"]: r["count"] for r in cap.groupBy("source").count().collect()}
    assert byc["small"] <= 400


def test_pack_sequences(spark):
    from opentsdb_spark.pipeline.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, "w " * (i % 50 + 1)) for i in range(500)], "doc_id long, text string"
    )
    out = pack_sequences(df, max_tokens=100, shards=4).collect()
    assert len(out) == 500
    assert {r["shard"] for r in out} <= set(range(4))
    # within a shard, bins are non-decreasing in doc order and cumulative
    # token totals per bin stay near the cap
    from collections import defaultdict

    per_shard = defaultdict(list)
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        per_shard[r["shard"]].append(r)
    for rows in per_shard.values():
        bins = [r["bin"] for r in rows]
        assert bins == sorted(bins)
        cum = 0
        for r in rows:
            assert r["bin"] == cum // 100  # bin = floor(pre-sum / cap)
            cum += r["n_tokens"]


def test_resize_images_raw(spark):
    import numpy as np

    from opentsdb_spark.pipeline.multimodal import MEDIA_SCHEMA, resize_images

    gray = bytes(range(16))  # 4x4 gradient
    rgb = bytes(np.arange(4 * 4 * 3, dtype=np.uint8))  # 4x4x3 interleaved
    rows = [
        (0, "image", bytearray(gray), ("image/x-raw-gray8", 4, 4, None)),
        (1, "image", bytearray(rgb), ("image/x-raw-rgb24", 4, 4, None)),
        (2, "image", bytearray(b"\x00" * 7), ("image/x-raw-gray8", 4, 4, None)),  # bad len
        (3, "image", bytearray(gray), (None, None, None, None)),  # no dims
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(media, 2, 2).collect()}
    # nearest-neighbor floor indexing: rows/cols 0,2 of the 4x4 source
    src = np.frombuffer(gray, np.uint8).reshape(4, 4)
    assert bytes(out[0]["media"]) == src[[0, 2]][:, [0, 2]].tobytes()
    src3 = np.frombuffer(rgb, np.uint8).reshape(4, 4, 3)
    assert bytes(out[1]["media"]) == src3[[0, 2]][:, [0, 2]].tobytes()
    assert out[0]["meta"]["width"] == 2 and out[0]["meta"]["height"] == 2
    assert out[0]["meta"]["mime"] == "image/x-raw-gray8"  # preserved
    # malformed rows visible, not dropped
    assert out[2]["media"] is None and out[3]["media"] is None
    # 'real' codec is honestly stubbed
    with pytest.raises(NotImplementedError):
        resize_images(media, 2, 2, codec="real")


def test_sample_frames_raw(spark):
    from opentsdb_spark.pipeline.multimodal import MEDIA_SCHEMA, sample_frames

    # 3 frames of 2x2, 100ms each -> duration 300ms
    blob = bytes([1] * 4 + [2] * 4 + [3] * 4)
    media = spark.createDataFrame(
        [(7, "video", bytearray(blob), ("video/x-raw-gray8", 2, 2, 300))], MEDIA_SCHEMA
    )
    out = sorted(sample_frames(media, 120).collect(), key=lambda r: r["frame_ts_ms"])
    # t=0 -> frame 0, t=120 -> 120*3//300 = frame 1, t=240 -> frame 2
    assert [(r["frame_idx"], r["frame_ts_ms"], bytes(r["frame"])[0]) for r in out] == [
        (0, 0, 1), (1, 120, 2), (2, 240, 3)
    ]
    assert all(r["width"] == 2 and r["height"] == 2 for r in out)
    # sampling interval longer than the video -> just t=0
    assert sample_frames(media, 1000).count() == 1
    with pytest.raises(NotImplementedError):
        sample_frames(media, 120, codec="real")


def test_repeat_upweight(spark):
    from opentsdb_spark.pipeline.sampling import repeat_upweight

    docs = spark.createDataFrame(
        [(i, f"doc {i}", ["drop", "keep2", "frac", "unlisted"][i % 4])
         for i in range(80)],
        "doc_id long, text string, source string",
    )
    out = repeat_upweight(docs, {"drop": 0.0, "keep2": 2.0, "frac": 0.5})
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert "drop" not in by_src                       # weight 0 removes the group
    assert len(by_src["keep2"]) == 40                  # 20 docs x exactly 2 copies
    assert {r["copy_idx"] for r in by_src["keep2"]} == {0, 1}
    assert len(by_src["unlisted"]) == 20               # absent group defaults to 1.0
    assert all(r["copy_idx"] == 0 for r in by_src["unlisted"])
    # fractional: between 0 and 20, deterministic across runs
    n_frac = len(by_src.get("frac", []))
    assert 0 < n_frac < 20
    again = repeat_upweight(docs, {"drop": 0.0, "keep2": 2.0, "frac": 0.5})
    assert again.where("source = 'frac'").count() == n_frac
    # original columns survive
    assert set(rows[0].asDict()) == {"doc_id", "text", "source", "copy_idx"}
    with pytest.raises(ValueError):
        repeat_upweight(docs, {"frac": -1.0})


def test_shard_assign_and_writer(spark, tmp_path):
    import pytest

    from opentsdb_spark.pipeline.sampling import shard_assign, write_token_shards

    docs = spark.createDataFrame(
        [(i, ("tok " * (i % 7 + 1)).strip()) for i in range(200)],
        "doc_id long, text string",
    )
    # invalid budgets fail fast instead of emitting NULL shards silently
    with pytest.raises(ValueError, match="shard_tokens"):
        shard_assign(docs, shard_tokens=0)
    with pytest.raises(ValueError, match="n_buckets"):
        shard_assign(docs, shard_tokens=50, n_buckets=0)
    out = shard_assign(docs, shard_tokens=50, n_buckets=8).collect()
    assert len(out) == 200
    # the exact running sum is pinned by the sample_shard_assign oracle;
    # here assert the order-independent invariants: shard token totals
    # stay within one straddling doc of the budget
    per_shard = {}
    for r in out:
        per_shard.setdefault(r["shard"], []).append(r["n_tokens"])
    sizes = {s: sum(v) for s, v in sorted(per_shard.items())}
    # every shard except the last holds >= budget only via its straddling
    # doc: size < budget + max_doc_tokens; all non-final shards >= budget
    last = max(sizes)
    for s, tot in sizes.items():
        assert tot < 50 + 7
        if s != last:
            assert tot >= 50 - 7  # boundary doc counted in the earlier shard
    assert sum(sizes.values()) == sum(r["n_tokens"] for r in out)
    # shards are contiguous 0..last
    assert sorted(sizes) == list(range(last + 1))

    # writer sink round-trip: partitioned parquet + manifest agree
    path = str(tmp_path / "shards")
    manifest = {r["shard"]: (r["n_docs"], r["n_tokens"])
                for r in write_token_shards(docs, path, 50, n_buckets=8).collect()}
    back = spark.read.parquet(path)
    got = {r["shard"]: r["n"] for r in back.groupBy("shard").agg(
        F.count("*").alias("n")).collect()}
    assert {s: n for s, (n, _) in manifest.items()} == got
    assert back.count() == 200 and set(back.columns) == {"doc_id", "text", "shard"}


def test_incremental_dedup_minhash(spark):
    from opentsdb_spark.pipeline.dedup import (
        incremental_dedup_minhash, minhash_signature,
    )

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    corpus = spark.createDataFrame(
        [(100, base), (101, base + " tail tweak"), (102, "utterly different corpus words " * 5)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (5, base),                                # dup of corpus (best match 100)
            (10, base),                               # dup of corpus too (not chained to 5)
            (20, "fresh unseen content nothing alike " * 6),
            (25, "fresh unseen content nothing alike " * 6),  # batch-dup of 20
            (30, "one two"),                          # too short to shingle -> keep
        ],
        "doc_id long, text string",
    )
    sigs = minhash_signature(corpus)
    out = {r["doc_id"]: r for r in
           incremental_dedup_minhash(batch, sigs, threshold=0.5).collect()}
    assert len(out) == 5
    assert out[5]["dup_kind"] == "corpus" and out[5]["dup_of"] == 100
    assert out[5]["est_jaccard"] == 1.0 and not out[5]["keep"]
    # corpus match wins over the batch match with doc 5
    assert out[10]["dup_kind"] == "corpus" and out[10]["dup_of"] == 100
    assert out[20]["keep"] and out[20]["dup_kind"] is None and out[20]["dup_of"] is None
    assert out[25]["dup_kind"] == "batch" and out[25]["dup_of"] == 20
    assert out[25]["est_jaccard"] is None  # est only reported for corpus matches
    assert out[30]["keep"]  # no signature -> never a candidate


def test_incremental_dedup_collapse_bitexact(spark):
    """Two-sided clone collapse must reproduce the direct verdicts on a
    clone-heavy batch/corpus mix (clique reps, tie-breaks, keep-first)."""
    from opentsdb_spark.pipeline.dedup import (
        incremental_dedup_minhash, minhash_signature,
    )

    t1 = "alpha beta gamma delta epsilon zeta eta theta " * 3
    t2 = "one two three four five six seven eight nine ten " * 3
    t3 = "unrelated corpus content entirely different words " * 3
    corpus = spark.createDataFrame(
        [(100, t1), (101, t1), (102, t1), (103, t3), (104, t3)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1, t1), (2, t1), (3, t2), (4, t2), (5, t2), (6, "zz qq")],
        "doc_id long, text string",
    )
    sigs = minhash_signature(corpus)
    kw = dict(threshold=0.5)

    def snap(collapse):
        return {r["doc_id"]: (r["keep"], r["dup_kind"], r["dup_of"], r["est_jaccard"])
                for r in incremental_dedup_minhash(
                    batch, sigs, collapse_identical=collapse, **kw).collect()}

    direct, coll = snap(False), snap("force")
    assert coll == direct
    # adaptive default: the union probe sees 3+2 clone cliques and collapses
    assert snap(True) == direct
    # clique facts: corpus clones tie-break to clique min 100; batch clique
    # {3,4,5} keeps 3, drops 4/5 onto 3; short doc keeps
    assert coll[1] == (False, "corpus", 100, 1.0)
    assert coll[2] == (False, "corpus", 100, 1.0)
    assert coll[3][0] is True
    assert coll[4] == (False, "batch", 3, None)
    assert coll[5] == (False, "batch", 3, None)
    assert coll[6][0] is True


def test_incremental_dedup_index_roundtrip(spark, tmp_path):
    """The corpus index really is just the (id, signature) parquet: saving
    and reloading it yields identical verdicts."""
    from opentsdb_spark.pipeline.dedup import (
        incremental_dedup_minhash, minhash_signature,
    )

    corpus = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog " * 4)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 4),
         (2, "completely different words here entirely " * 4)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sig_index")
    minhash_signature(corpus).write.parquet(path)
    loaded = spark.read.parquet(path)
    got = {r["doc_id"]: (r["keep"], r["dup_kind"], r["dup_of"]) for r in
           incremental_dedup_minhash(batch, loaded, threshold=0.5).collect()}
    assert got == {1: (False, "corpus", 100), 2: (True, None, None)}


def test_dhash_images_raw(spark):
    import numpy as np

    from opentsdb_spark.pipeline.multimodal import MEDIA_SCHEMA, dhash_images

    # 9x8 source == the dHash grid itself: resize is identity, so the
    # expected bits are directly readable from the source gradient signs.
    w, h = 9, 8
    rng = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    rng[:, ::2] = 255 - rng[:, ::2]  # alternate so bits aren't all-ones
    blob = rng.tobytes()
    rows = [
        (0, "image", bytearray(blob), ("image/x-raw-gray8", w, h, None)),
        (1, "image", bytearray(b"\x01" * 5), ("image/x-raw-gray8", w, h, None)),  # bad len
        (2, "image", bytearray(blob), (None, None, None, None)),  # no dims
        (3, "image", None, ("image/x-raw-gray8", w, h, None)),  # null blob
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r["dhash"] for r in dhash_images(media).collect()}
    bits = (rng[:, :-1] < rng[:, 1:]).reshape(-1)
    want = int(
        (bits.astype(np.uint64) * (np.uint64(1) << np.arange(64, dtype=np.uint64)))
        .sum(dtype=np.uint64).astype(np.int64)
    )
    assert out[0] == want
    # malformed rows come back NULL-hashed, visible, never silently dropped
    assert out[1] is None and out[2] is None and out[3] is None
    assert len(out) == 4
    with pytest.raises(NotImplementedError):
        dhash_images(media, codec="real")


def test_dhash_dup_pairs(spark):
    from opentsdb_spark.pipeline.multimodal import MEDIA_SCHEMA, dhash_dup_pairs

    w, h = 9, 8
    base = bytes(([0, 255] * 40)[: w * h])  # strong alternating gradient
    flip = bytearray(base)
    # flips bit 0 only (255<0 F vs 0<255 T; bit 1 compares px1<px2 = F both
    # before and after) -> hamming 1
    flip[0], flip[1] = 255, 0
    far = bytes(([255, 0] * 40)[: w * h])  # inverse pattern: far from base
    rows = [
        (0, "image", bytearray(base), ("image/x-raw-gray8", w, h, None)),
        (1, "image", bytearray(flip), ("image/x-raw-gray8", w, h, None)),
        (2, "image", bytearray(far), ("image/x-raw-gray8", w, h, None)),
        (3, "image", None, ("image/x-raw-gray8", w, h, None)),  # null never pairs
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dhash_dup_pairs(media, max_hamming=3).collect()}
    assert got == {(0, 1): 1}


def test_frame_dup_pairs(spark):
    from opentsdb_spark.pipeline.multimodal import MEDIA_SCHEMA, frame_dup_pairs

    # 2x2 frames, 100ms each; sample every 100ms -> every frame sampled.
    # busy/other have rising gradients (nonzero dhash); flat hashes to 0.
    busy = bytes([10, 200, 30, 90])
    other = bytes([200, 10, 90, 250])
    flat = bytes([9] * 4)
    rows = [
        (0, "video", bytearray(busy + flat + busy), ("video/x-raw-gray8", 2, 2, 300)),
        (1, "video", bytearray(busy + flat + other), ("video/x-raw-gray8", 2, 2, 300)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {((r["media_a"], r["frame_a"]), (r["media_b"], r["frame_b"])): r["hamming"]
           for r in frame_dup_pairs(media, 100, max_hamming=0).collect()}
    # the repeated still pairs across and within videos; flat frames
    # (dhash == 0) never pair despite being byte-identical
    expect_keys = {((0, 0), (0, 2)), ((0, 0), (1, 0)), ((0, 2), (1, 0))}
    assert set(got) == expect_keys and all(v == 0 for v in got.values())


def test_frame_dup_pairs_oversampled(spark):
    """every_ms below the frame interval samples frames repeatedly; pairs
    must still come out once each (duplicate fids would multiply the
    clone-collapse expansion)."""
    from opentsdb_spark.pipeline.multimodal import MEDIA_SCHEMA, frame_dup_pairs

    busy = bytes([10, 200, 30, 90])
    rows = [
        (0, "video", bytearray(busy * 3), ("video/x-raw-gray8", 2, 2, 300)),
        (1, "video", bytearray(busy * 3), ("video/x-raw-gray8", 2, 2, 300)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    # 50ms sampling of 100ms frames -> each frame sampled twice
    over = frame_dup_pairs(media, 50, max_hamming=0).collect()
    exact = frame_dup_pairs(media, 100, max_hamming=0).collect()
    key = lambda r: (r["media_a"], r["frame_a"], r["media_b"], r["frame_b"])  # noqa: E731
    assert sorted(map(key, over)) == sorted(map(key, exact))
    assert len(over) == len(set(map(key, over)))  # no duplicated rows


def test_frame_dup_pairs_pack_guard(spark):
    """Rows outside the packing domain (negative media_id / frame_idx >=
    65536) must abort loudly — silent id collisions corrupt attribution."""
    import pytest

    from opentsdb_spark.pipeline.multimodal import MEDIA_SCHEMA, frame_dup_pairs

    busy = bytes([10, 200, 30, 90])
    rows = [(-1, "video", bytearray(busy * 3), ("video/x-raw-gray8", 2, 2, 300)),
            (1, "video", bytearray(busy * 3), ("video/x-raw-gray8", 2, 2, 300))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    with pytest.raises(Exception, match="unpackable"):
        frame_dup_pairs(media, 100, max_hamming=0).collect()


def test_ngram_max_df_collapse_bitexact(spark):
    """max_df must keep member-level doc-frequency semantics under clone
    collapse: a clone cluster larger than the cap stays fully pruned."""
    from opentsdb_spark.pipeline.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, base) for i in range(6)] + [
        (10, "completely different words about spark analytics engines here now"),
        (11, "completely different words about spark analytics engines here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for max_df in (None, 3, 7):
        direct = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                  ngram_jaccard_pairs(docs, threshold=0.5, max_df=max_df,
                                      collapse_identical=False).collect()}
        coll = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                ngram_jaccard_pairs(docs, threshold=0.5, max_df=max_df,
                                    collapse_identical="force").collect()}
        assert coll == direct, f"max_df={max_df}"
    # sanity on the semantics themselves: cap 3 prunes the 6-clone cluster's
    # grams everywhere (df=6), so only the 2-clone pair survives
    capped = {(r["id_a"], r["id_b"]) for r in
              ngram_jaccard_pairs(docs, threshold=0.5, max_df=3).collect()}
    assert capped == {(10, 11)}


def test_audio_raw_pcm(spark):
    import numpy as np

    from opentsdb_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, audio_stats, resample_audio,
    )

    sig = np.array([100, -200, 300, -400, 0, 0, 500, -32768], dtype="<i2")
    rows = [
        (0, "audio", bytearray(sig.tobytes()), ("audio/x-raw-s16le", None, None, 1)),
        (1, "audio", bytearray(b"\x01\x02\x03"), ("audio/x-raw-s16le", None, None, 1)),  # odd len
        (2, "audio", None, ("audio/x-raw-s16le", None, None, 1)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in audio_stats(media).collect()}
    s = sig.astype(np.int64)
    assert out[0]["n_samples"] == 8
    assert out[0]["peak"] == 32768  # |-32768| must not wrap int16
    assert out[0]["rms"] == pytest.approx(float(np.sqrt(np.mean(s.astype(float) ** 2))))
    # strict crossings: 100/-200, -200/300, 300/-400, 500/-32768 = 4
    # (-400->0, 0->0, 0->500 are NOT crossings: zero has no sign)
    assert out[0]["zero_crossings"] == 4
    assert out[1]["n_samples"] is None and out[2]["rms"] is None  # malformed visible

    # 2:1 downsample keeps every even-index sample
    res = {r["media_id"]: r["media"] for r in resample_audio(media, 8000, 4000).collect()}
    assert np.array_equal(np.frombuffer(bytes(res[0]), "<i2"), sig[::2])
    assert res[1] is None and res[2] is None
    # meta rides through untouched
    meta = resample_audio(media, 8000, 4000).where("media_id = 0").collect()[0]["meta"]
    assert meta["mime"] == "audio/x-raw-s16le" and meta["duration_ms"] == 1
    with pytest.raises(NotImplementedError):
        resample_audio(media, 8000, 4000, codec="real")
    with pytest.raises(ValueError):
        resample_audio(media, 0, 4000)


def test_audio_fingerprint_dedup(spark):
    import numpy as np

    from opentsdb_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, audio_dup_pairs, audio_fingerprint,
    )

    rng = np.random.RandomState(3)
    sig = rng.randint(-3000, 3000, 130, dtype="<i2")
    # bend the first window's mean DOWN so bit 0 (m0 < m1) flips to True
    near = sig.copy(); near[:2] -= 20000
    flat = np.zeros(130, dtype="<i2")
    rows = [
        (0, "audio", bytearray(sig.tobytes()), ("audio/x-raw-s16le", None, None, 1)),
        (1, "audio", bytearray(sig.tobytes()), ("audio/x-raw-s16le", None, None, 1)),
        (2, "audio", bytearray(near.tobytes()), ("audio/x-raw-s16le", None, None, 1)),
        (3, "audio", bytearray(flat.tobytes()), ("audio/x-raw-s16le", None, None, 1)),
        (4, "audio", bytearray(b"\x00\x00" * 10), ("audio/x-raw-s16le", None, None, 1)),  # < 65 samples
        (5, "audio", None, ("audio/x-raw-s16le", None, None, 1)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fp = {r["media_id"]: r["afp"] for r in audio_fingerprint(media).collect()}
    assert fp[0] == fp[1] and fp[0] != 0          # clones agree, non-flat
    assert fp[3] == 0                              # flat envelope -> 0
    assert fp[4] is None and fp[5] is None         # too short / NULL visible
    # numpy replica of doc 0's fingerprint
    s = sig.astype(np.int64); n = len(s)
    w = (np.arange(n) * 65) // n
    sums = np.bincount(w, weights=s, minlength=65).astype(np.int64)
    cnts = np.bincount(w, minlength=65).astype(np.int64)
    bits = sums[:-1] * cnts[1:] < sums[1:] * cnts[:-1]
    want = int((bits.astype(np.uint64) * (np.uint64(1) << np.arange(64, dtype=np.uint64)))
               .sum(dtype=np.uint64).astype(np.int64))
    assert fp[0] == want
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in audio_dup_pairs(media, max_hamming=3).collect()}
    assert got[(0, 1)] == 0 and not any(3 in p or 4 in p or 5 in p for p in got)
    assert (0, 2) in got and 0 < got[(0, 2)] <= 3  # near-dup at small hamming


def test_vocab_topk(spark):
    from opentsdb_spark.pipeline.text import vocab_topk

    df = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana  cherry"), (2, "apple")],
        "doc_id long, text string",
    )
    out = vocab_topk(df, k=2).collect()
    # apple tf=3 df=2; banana tf=2 df=2; double space must not create '' token
    assert [(r["token"], r["tf"], r["df"]) for r in out] == [
        ("apple", 3, 2), ("banana", 2, 2)
    ]
    # deterministic tie-break: alphabetical among equal tf
    tie = vocab_topk(spark.createDataFrame([(0, "b a")], "doc_id long, text string"), k=1)
    assert tie.collect()[0]["token"] == "a"


def test_quantize_embeddings(spark):
    from opentsdb_spark.pipeline.similarity import dequantized_view, quantize_embeddings

    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25]), (1, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    # scale = 1.0/127; codes = round-half-up(v/scale): [127, -63, 32]
    # (-0.5/scale = -63.5 -> floor(-63.0) = -63: floor(x+0.5) half-up, not away-from-zero)
    assert out[0]["q"] == [127, -63, 32]
    assert out[0]["scale"] == pytest.approx(1.0 / 127)
    # zero vector: scale 0, all-zero codes, no division blowup
    assert out[1]["scale"] == 0.0 and out[1]["q"] == [0, 0, 0]
    # dequantized view reconstructs within one quantization step
    deq = {r["vec_id"]: r["embedding"] for r in dequantized_view(quantize_embeddings(df)).collect()}
    assert deq[0] == pytest.approx([1.0, -0.5, 0.25], abs=1.0 / 254 + 1e-12)


def test_lm_score(spark):
    from opentsdb_spark.pipeline.text import lm_score

    df = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the cat sat on the mat"),
         (2, "zq xv qq pp zz yy"), (3, "a")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_score(df, n=2).collect()}
    # typical text scores strictly higher than garble under the corpus LM
    assert out[0]["avg_logp"] > out[2]["avg_logp"]
    # identical documents score identically
    assert out[0]["avg_logp"] == out[1]["avg_logp"]
    # sub-n documents have no n-gram identity
    assert out[3]["n_grams"] == 0 and out[3]["avg_logp"] is None
    # unigram degenerate mode runs and keeps ordering
    u = {r["doc_id"]: r for r in lm_score(df, n=1).collect()}
    assert u[0]["avg_logp"] > u[2]["avg_logp"]


def test_tfidf_keywords(spark):
    from opentsdb_spark.pipeline.text import tfidf_keywords

    df = spark.createDataFrame(
        [(0, "apple apple banana shared"), (1, "cherry shared"), (2, "shared")],
        "doc_id long, text string",
    )
    out = tfidf_keywords(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["token"], r["tfidf"]))
    # doc 0: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=1 -> ln(3);
    # 'shared' df=3 -> idf 0, never outranks them
    assert [t for _, t, _ in sorted(by_doc[0])] == ["apple", "banana"]
    assert by_doc[0][0][2] == pytest.approx(2 * math.log(3))
    # doc 2 has only the idf-0 token: still emitted, score exactly 0
    assert [(t, s) for _, t, s in by_doc[2]] == [("shared", 0.0)]


def test_bpe_pair_counts(spark):
    from opentsdb_spark.pipeline.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(0, "abab ab"), (1, "abab x")],  # 'x' too short for any pair
        "doc_id long, text string",
    )
    out = [(r["pair"], r["n"]) for r in bpe_pair_counts(df, k=10).collect()]
    # 'abab' (freq 2) yields pairs ab, ba, ab; 'ab' (freq 1) yields ab:
    # ab = 2*2 + 1 = 5, ba = 2; single-char 'x' yields nothing
    assert out == [("ab", 5), ("ba", 2)]


def test_semdedup(spark):
    from opentsdb_spark.pipeline.similarity import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near dup of 0 (cos ~ 0.9999)
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),     # opposite of 0 — never a dup
        (4, [0.998, 0.02, 0.0, 0.0]),   # near dup of 0 and 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # one cell -> pure pairwise semantics; centroid along +x
    out = {r["vec_id"]: r for r in semdedup(
        emb, threshold=0.95, centroids=[[1.0, 0.0, 0.0, 0.0]]
    ).collect()}
    assert len(out) == 5  # one row per input vector
    # keep-lowest-id: 0 survives, 1 and 4 are removed against it
    assert out[0]["kept"] and out[0]["dup_cosine"] is None
    assert not out[1]["kept"] and out[1]["dup_cosine"] == pytest.approx(1.0, abs=1e-3)
    assert not out[4]["kept"]
    assert out[2]["kept"] and out[3]["kept"]
    # trained-kmeans path (centroids=None) runs and keeps the row contract
    trained = semdedup(emb, threshold=0.95, n_centroids=2, train_size=5, iters=2)
    assert trained.count() == 5


def test_gopher_filter_and_source_mix(spark):
    from opentsdb_spark.pipeline.text import gopher_filter, source_mix_report

    rows = [
        (0, "the cat sat on the mat and then the dog sat too", "web"),   # ok
        (1, "x", "web"),                                                  # too short
        (2, "spam spam spam spam spam spam spam spam spam spam", "spamnet"),  # repetitive, no stopwords
        (3, " ".join(f"w{i}" for i in range(200)), "web"),                # too long
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in gopher_filter(
        docs, min_words=5, max_words=50, min_distinct_ratio=0.4
    ).collect()}
    assert out[0]["kept"]
    assert not out[1]["kept"] and not out[1]["flag_word_count"]
    assert not out[2]["kept"] and not out[2]["flag_stopwords"] \
        and not out[2]["flag_repetition"]
    assert not out[3]["kept"] and not out[3]["flag_word_count"]

    mix = {r["source"]: r for r in source_mix_report(
        docs, min_words=5, max_words=50, min_distinct_ratio=0.4
    ).collect()}
    assert mix["web"]["n_docs"] == 3 and mix["web"]["n_kept"] == 1
    assert mix["web"]["kept_words"] == out[0]["n_words"]
    assert mix["spamnet"]["n_kept"] == 0


def test_chunk_and_paragraph_dedup(spark):
    from opentsdb_spark.pipeline.text import chunk_docs, paragraph_dedup

    rows = [
        (0, "a b c d e f"),        # chunks (w=3): "a b c", "d e f"
        (1, "a b c x y z"),        # "a b c" repeats doc 0's first chunk
        (2, "a b"),                # shorter than one chunk -> dropped entirely
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ch = chunk_docs(docs, chunk_words=3).collect()
    assert {(r["doc_id"], r["chunk_pos"], r["chunk"]) for r in ch} == {
        (0, 0, "a b c"), (0, 1, "d e f"), (1, 0, "a b c"), (1, 1, "x y z"),
    }
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, chunk_words=3).collect()}
    # keep-first: doc 0 keeps both chunks; doc 1 loses its copy of "a b c"
    assert out[0]["text"] == "a b c d e f" and out[0]["n_kept"] == 2
    assert out[1]["text"] == "x y z" and out[1]["n_kept"] == 1
    assert 2 not in out  # no full chunk -> no surviving row


def test_select_canonical(spark):
    from opentsdb_spark.pipeline.cluster import select_canonical

    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (5, 5), (7, 7)],
        "doc_id long, component long",
    )
    scores = spark.createDataFrame(
        [(0, 0.2), (1, 0.9), (2, 0.9), (5, 0.5)],  # doc 7 has NO score
        "doc_id long, score double",
    )
    out = {r["doc_id"]: r for r in select_canonical(clusters, scores).collect()}
    # component 0: 1 and 2 tie on 0.9 -> lowest id 1 wins; 0 loses
    assert out[1]["is_canonical"] and not out[2]["is_canonical"] and not out[0]["is_canonical"]
    assert out[5]["is_canonical"]          # singleton
    assert out[7]["is_canonical"] and out[7]["score"] is None  # null-score singleton


def test_temperature_mixture_null_source(spark):
    from opentsdb_spark.pipeline.sampling import temperature_mixture

    rows = [(i, "s1" if i < 50 else None) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture(docs, alpha=1.0, target_frac=1.0)
    # alpha=1, target=1 -> every source (incl. the NULL group) keeps rate 1
    assert out.count() == 100
    assert out.where("source is null").count() == 50


def test_tokenizer_boundary_whitespace(spark):
    """\\S+ extraction: trailing/leading whitespace and empty docs must not
    produce phantom tokens anywhere word counts are built."""
    from opentsdb_spark.pipeline.dedup import ngram_jaccard_pairs
    from opentsdb_spark.pipeline.text import quality_scores, token_counts

    rows = [(0, "the cat sat\n"), (1, " the cat sat"), (2, ""), (3, "   \n ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert q[0]["n_words"] == 3 and q[1]["n_words"] == 3
    assert q[2]["n_words"] == 0 and q[3]["n_words"] == 0
    t = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert t[0]["ws_tokens"] == 3 and t[2]["ws_tokens"] == 0 and t[3]["ws_tokens"] == 0
    # empty docs never pair, even at n=1
    pairs = ngram_jaccard_pairs(docs, n=1, threshold=0.1)
    ids = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (2, 3) not in ids and all(2 not in p and 3 not in p for p in ids)


def test_corpus_funnel(spark):
    from opentsdb_spark.pipeline.text import corpus_funnel

    rows = [
        (0, "the cat sat on the mat and then the dog sat too"),
        (1, "the cat sat on the mat and then the dog sat too"),  # exact dup
        (2, "x"),  # survives dedup, fails the gate
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    [r] = corpus_funnel(docs, min_words=5, max_words=50,
                        min_distinct_ratio=0.4).collect()
    assert r["n_input"] == 3 and r["n_after_exact"] == 2
    assert r["n_after_quality"] == 1 and r["kept_words"] == 12


def test_minhash_max_bucket_cap(spark):
    from opentsdb_spark.pipeline.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, base) for i in range(6)] + [
        (10, "completely different words about spark analytics engines here now"),
        (11, "completely different words about spark analytics engines here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped: the 6-clone cluster pairs all-to-all (15 pairs) + 1 pair
    full = minhash_lsh_pairs(docs, threshold=0.9)
    assert full.count() == 16
    # cap below the clone-cluster size, collapse OFF: its buckets are
    # skipped in every band, the small pair survives
    capped = minhash_lsh_pairs(docs, threshold=0.9, max_bucket=4,
                               collapse_identical=False)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(10, 11)}
    # with the default clone collapse the cluster is ONE representative, so
    # the same cap never trips and the full pair set survives — exact-clone
    # mass no longer needs (or is affected by) the recall-lossy cap
    collapsed_capped = minhash_lsh_pairs(docs, threshold=0.9, max_bucket=4)
    assert collapsed_capped.count() == 16


def test_embedding_collapse_bitexact(spark):
    """Embedding clone collapse must match the direct path bit for bit —
    incl. the float self-cosine (not assumed 1.0) and zero-norm clones
    whose NaN score drops their pairs on both paths."""
    from opentsdb_spark.pipeline.dedup import embedding_dup_pairs

    base = [1.0, 2.0, 3.0, 4.0]
    nearby = [1.0, 2.0, 3.0, 4.2]
    rows = [(0, base), (1, base), (2, base), (3, nearby),
            (4, [0.0, 0.0, 0.0, 0.0]), (5, [0.0, 0.0, 0.0, 0.0]),
            (6, [-4.0, 3.0, -2.0, 1.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(threshold=0.9, tables=4, bits=4, dim=4)
    direct = {(r["id_a"], r["id_b"]): r["cosine"]
              for r in embedding_dup_pairs(vecs, collapse_identical=False, **kw).collect()}
    coll = {(r["id_a"], r["id_b"]): r["cosine"]
            for r in embedding_dup_pairs(vecs, collapse_identical="force",
                                         **kw).collect()}
    assert coll == direct
    assert (0, 1) in coll and (0, 3) in coll   # clones + near-dup found
    assert not any(4 in p or 5 in p for p in coll)  # zero vectors never pair


def test_minhash_collapse_bitexact(spark):
    """collapse_identical=True must emit the exact pair set and estimates
    of the direct path on a corpus mixing exact clones and near-dups."""
    from opentsdb_spark.pipeline.dedup import minhash_lsh_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2
    near = base + "lambda mu"
    rows = [(0, base), (1, base), (2, base), (3, near),
            (4, "totally different text about nothing shared at all " * 2),
            (5, "one two")]  # too short to shingle at n=3? (has 2 words)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(num_hashes=32, bands=8, threshold=0.3)
    direct = {(r["id_a"], r["id_b"]): r["est_jaccard"]
              for r in minhash_lsh_pairs(docs, collapse_identical=False, **kw).collect()}
    coll = {(r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in minhash_lsh_pairs(docs, collapse_identical="force",
                                       **kw).collect()}
    assert coll == direct
    assert coll[(0, 1)] == 1.0 and (0, 3) in coll  # clones + near-dup found
    # adaptive default: clone mass (3-clique of 5 sigs) trips the probe and
    # still matches bit for bit
    adaptive = {(r["id_a"], r["id_b"]): r["est_jaccard"]
                for r in minhash_lsh_pairs(docs, **kw).collect()}
    assert adaptive == direct


def test_remove_duplicate_spans(spark):
    """Cross-doc duplicated k-token spans are struck from EVERY doc; unique
    remainders survive in order; sub-k docs pass through whole; fully
    duplicated docs vanish."""
    from opentsdb_spark.pipeline.dedup import remove_duplicate_spans

    shared = "one two three four five six"  # 6 tokens -> two 5-windows
    docs = spark.createDataFrame(
        [(0, f"{shared} alpha beta gamma delta epsilon"),
         (1, f"intro {shared} tail words here now"),
         (2, shared),           # fully covered -> vanishes
         (3, "tiny doc")],      # < k tokens -> passes whole
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, k=5).collect()}
    assert set(out) == {0, 1, 3}
    assert out[0]["text"] == "alpha beta gamma delta epsilon"
    assert out[0]["n_kept_tokens"] == 5 and out[0]["n_cut_tokens"] == 6
    # doc 1: 'intro' and the tail survive, the shared run is cut
    assert out[1]["text"] == "intro tail words here now"
    assert out[3]["text"] == "tiny doc" and out[3]["n_cut_tokens"] == 0


def test_remove_duplicate_spans_keep_first(spark):
    """Keep-first policy: the globally FIRST (doc, pos) occurrence of each
    duplicated window survives, later copies are struck — including
    repeats WITHIN one doc; sub-k docs pass through whole."""
    from opentsdb_spark.pipeline.dedup import remove_duplicate_spans_keep_first

    shared = "one two three four five six"  # 6 tokens -> two 5-windows
    docs = spark.createDataFrame(
        [(0, f"{shared} alpha beta gamma delta epsilon"),
         (1, f"intro {shared} tail words here now"),
         (2, shared),            # later copy -> fully struck -> vanishes
         (3, "tiny doc"),        # < k tokens -> passes whole
         # within-doc repeat: the SECOND 'p q r s t' run is struck
         (4, "p q r s t filler p q r s t")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans_keep_first(docs, k=5).collect()}
    assert set(out) == {0, 1, 3, 4}
    # doc 0 holds the first occurrence of the shared run: kept WHOLE
    assert out[0]["text"] == f"{shared} alpha beta gamma delta epsilon"
    assert out[0]["n_cut_tokens"] == 0
    # doc 1's copy is a later occurrence: struck
    assert out[1]["text"] == "intro tail words here now"
    assert out[1]["n_cut_tokens"] == 6
    assert out[3]["text"] == "tiny doc" and out[3]["n_cut_tokens"] == 0
    assert out[4]["text"] == "p q r s t filler"
    assert out[4]["n_cut_tokens"] == 5


def test_interleave_sources(spark):
    """Proportional mixing: a weight-2 source emits ~2x as often as a
    weight-1 source in every prefix of the interleave order; ranks are
    dense per source; unknown sources default to weight 1; weights
    validate."""
    import pytest

    from opentsdb_spark.pipeline.sampling import interleave_sources

    rows = [(i, "a") for i in range(200)] + \
           [(1000 + i, "b") for i in range(200)] + \
           [(5000 + i, "c") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = interleave_sources(docs, {"a": 2.0, "b": 1.0}, n_buckets=8,
                             group_col="source").collect()
    assert len(out) == 450
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # dense 1..n ranks per source
    for s, rs in by_src.items():
        assert sorted(r["n_rank"] for r in rs) == list(range(1, len(rs) + 1))
    # weight-2 'a': key(rank r) = r*2^20 // (2*2^20) = r//2 -> in any key
    # prefix 'a' has ~2x the docs of weight-1 'b'
    ordered = sorted(out, key=lambda r: (r["interleave_key"], r["source"],
                                         r["doc_id"]))
    prefix = ordered[:150]
    na = sum(1 for r in prefix if r["source"] == "a")
    nb = sum(1 for r in prefix if r["source"] == "b")
    assert 1.7 <= na / nb <= 2.3, (na, nb)
    # unknown source 'c' got default weight 1: key == rank for every doc
    for r in by_src["c"]:
        assert r["interleave_key"] == r["n_rank"]
    # determinism across recomputation
    again = interleave_sources(docs, {"a": 2.0, "b": 1.0}, n_buckets=8,
                               group_col="source").collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}
    with pytest.raises(ValueError, match="> 0"):
        interleave_sources(docs, {"a": 0.0})
    with pytest.raises(ValueError, match="at least one"):
        interleave_sources(docs, {})


def test_strip_boilerplate_chunks(spark):
    """A chunk in more than max_df docs is struck from EVERY doc (including
    the first); docs losing all chunks vanish; counts are right."""
    from opentsdb_spark.pipeline.text import strip_boilerplate_chunks

    boiler = "all rights reserved by us"  # 5 words = 1 chunk
    uniq = ["alpha beta gamma delta epsilon", "one two three four five",
            "red green blue cyan magenta"]
    docs = spark.createDataFrame(
        [(0, f"{boiler} {uniq[0]}"), (1, f"{boiler} {uniq[1]}"),
         (2, f"{boiler} {uniq[2]}"), (3, boiler)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           strip_boilerplate_chunks(docs, max_df=2, chunk_words=5).collect()}
    # boiler chunk df=4 > 2: removed everywhere; doc 3 (all boiler) vanishes
    assert set(out) == {0, 1, 2}
    for i in range(3):
        assert out[i]["text"] == uniq[i]
        assert out[i]["n_kept"] == 1 and out[i]["n_dropped"] == 1
    # df <= max_df chunks survive untouched
    ok = {r["doc_id"]: r for r in
          strip_boilerplate_chunks(docs, max_df=4, chunk_words=5).collect()}
    assert ok[3]["text"] == boiler and ok[0]["n_dropped"] == 0
    import pytest

    with pytest.raises(ValueError, match="max_df"):
        strip_boilerplate_chunks(docs, max_df=0)


def test_clone_probe_gate(spark):
    """The adaptive clone gate: clone-free frames bypass collapse, clone
    mass triggers it, and False/'force' never run the probe."""
    from opentsdb_spark.pipeline.dedup import (
        _should_collapse, ngram_jaccard_pairs,
    )

    unique = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(200)], "id long, t string")
    cloned = spark.createDataFrame(
        [(i, f"doc number {i % 4}") for i in range(200)], "id long, t string")
    assert _should_collapse(True, unique, F.col("t")) is False
    assert _should_collapse(True, cloned, F.col("t")) is True
    # no-probe fast paths (frame contents irrelevant)
    assert _should_collapse(False, unique, F.col("t")) is False
    assert _should_collapse("force", unique, F.col("t")) is True
    # end-to-end: a clone-free corpus takes the direct path under the
    # default and the output still matches collapse_identical=False
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon word{i} zeta eta theta")
         for i in range(12)],
        "doc_id long, text string",
    )
    kw = dict(n=3, threshold=0.5)
    direct = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
              ngram_jaccard_pairs(docs, collapse_identical=False, **kw).collect()}
    adaptive = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                ngram_jaccard_pairs(docs, **kw).collect()}
    assert adaptive == direct


def test_substring_dup_spans(spark):
    from opentsdb_spark.pipeline.dedup import substring_dup_spans

    # docs 0/1 share the verbatim 6-token run "a b c d e f" (two 5-token
    # windows); doc 2 is disjoint; doc 3 is shorter than k
    df = spark.createDataFrame(
        [(0, "a b c d e f x y z w"), (1, "q q q a b c d e f"),
         (2, "m n o p r s t u v"), (3, "a b c")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in substring_dup_spans(df, k=5).collect()}
    assert len(out) == 4
    # doc0: windows at pos 0 ("a b c d e") and 1 ("b c d e f") also occur
    # in doc1 -> 2 dup windows covering token positions 0..5 (6 tokens)
    assert out[0]["n_windows"] == 6 and out[0]["n_dup_windows"] == 2
    assert out[0]["dup_tokens"] == 6
    assert abs(out[0]["dup_frac"] - 0.6) < 1e-12
    # doc1: same shared windows at pos 3/4 -> covers tokens 3..8
    assert out[1]["n_dup_windows"] == 2 and out[1]["dup_tokens"] == 6
    # doc2: nothing shared
    assert out[2]["n_dup_windows"] == 0 and out[2]["dup_frac"] == 0.0
    # doc3: too short for any window; frac is 0/3 = 0
    assert out[3]["n_windows"] == 0 and out[3]["dup_frac"] == 0.0


def test_lm_score_grouped(spark):
    from opentsdb_spark.pipeline.text import lm_score

    base = [(0, "en", "the cat sat on the mat"),
            (1, "en", "the cat sat on the mat"),
            (2, "en", "zq xv qq pp zz yy")]
    df = spark.createDataFrame(base, "doc_id long, lang string, text string")
    solo = {r["doc_id"]: r["avg_logp"] for r in
            lm_score(df, n=2, group_col="lang").collect()}
    # per-group fit: adding a big disjoint-language corpus must NOT change
    # the en scores (a global fit would shift V and every count)
    noisy = base + [(i, "xx", f"tok{i} tok{i+1} tok{i+2} tok{i}") for i in range(10, 40)]
    df2 = spark.createDataFrame(noisy, "doc_id long, lang string, text string")
    grouped = {r["doc_id"]: r["avg_logp"] for r in
               lm_score(df2, n=2, group_col="lang").collect()}
    for d in (0, 1, 2):
        assert grouped[d] == solo[d]
    assert solo[0] > solo[2]


def test_ccnet_buckets(spark):
    from opentsdb_spark.pipeline.text import ccnet_buckets

    rows = [(i, "en", " ".join(["the cat sat on the mat"] * (1 + i % 3)))
            for i in range(9)]
    rows += [(100 + i, "de", "der hund " + " ".join(f"w{j}" for j in range(i + 2)))
             for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = ccnet_buckets(df, n=2, n_buckets=3).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # equal-count bands per language (9 en -> 3/3/3, 6 de -> 2/2/2)
    for lang, rs in by_lang.items():
        from collections import Counter

        c = Counter(r["bucket"] for r in rs)
        assert set(c) == {1, 2, 3}
        assert max(c.values()) - min(c.values()) <= 1
    names = {r["bucket"]: r["bucket_name"] for r in out}
    assert names == {1: "head", 2: "middle", 3: "tail"}
    # head scores >= tail scores within a language
    for lang, rs in by_lang.items():
        heads = [r["score_r"] for r in rs if r["bucket"] == 1]
        tails = [r["score_r"] for r in rs if r["bucket"] == 3]
        assert min(heads) >= max(tails)


def test_prototypicality(spark):
    from opentsdb_spark.pipeline.similarity import prototypicality, seeded_centroids

    cents = seeded_centroids(4, 4)
    # vectors exactly on two centroids plus one off-axis
    rows = [(0, [float(x) for x in cents[0]]),
            (1, [float(x) * 2.0 for x in cents[0]]),
            (2, [float(x) for x in cents[1]]),
            (3, [1.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           prototypicality(df, n_centroids=4, dim=4, centroids=cents).collect()}
    # scaled copies land in the same cell with identical (cosine) score
    assert out[0]["cell"] == out[1]["cell"]
    assert abs(out[0]["proto"] - 1.0) < 1e-12 and abs(out[1]["proto"] - 1.0) < 1e-12
    assert abs(out[2]["proto"] - 1.0) < 1e-12
    # ranks within a cell are 1..n, most prototypical first
    cellmates = [r for r in out.values() if r["cell"] == out[0]["cell"]]
    assert sorted(r["cell_rank"] for r in cellmates) == list(range(1, len(cellmates) + 1))


def test_covariance_and_pca(spark):
    import numpy as np

    from opentsdb_spark.pipeline.similarity import (
        covariance_matrix, pca_components, pca_project,
    )

    rng = np.random.RandomState(7)
    # anisotropic cloud: dominant variance along a known axis
    base = rng.randn(200, 4) * np.array([5.0, 1.0, 0.5, 0.1])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cov = covariance_matrix(df, dim=4)
    got = {(r["i"], r["j"]): r["cov"] for r in cov.collect()}
    ref = np.cov(base, rowvar=False, bias=True)
    assert len(got) == 10  # upper triangle of 4x4
    for (i, j), v in got.items():
        assert abs(v - ref[i][j]) < 1e-9
    comps, ev = pca_components(cov, dim=4, q=2)
    # first principal axis is the dominant coordinate, variance ~25
    assert abs(abs(comps[0][0]) - 1.0) < 0.05
    assert abs(ev[0] - ref[0][0]) < 2.0
    # components orthonormal
    C = np.asarray(comps)
    assert np.allclose(C @ C.T, np.eye(2), atol=1e-9)
    # projection matches numpy matmul
    proj = {r["vec_id"]: r["proj"] for r in pca_project(df, comps).collect()}
    want = base @ C.T
    for i in range(0, 200, 50):
        assert np.allclose(proj[i], want[i], atol=1e-9)


def test_pca_replica_matches_distributed(spark):
    """The Spark-free oracle replica (pca_replica) reproduces the
    distributed covariance -> pca_components axes to summation-order FP
    noise — the contract the embed_pca_project catalog oracle rests on."""
    import numpy as np

    from opentsdb_spark.pipeline.similarity import (
        covariance_matrix, pca_components, pca_replica,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(path)
    comps, ev = pca_components(covariance_matrix(emb, dim=64), dim=64, q=4)
    rcomps, rev = pca_replica(path, dim=64, q=4)
    assert np.allclose(ev, rev, rtol=1e-9)
    assert np.allclose(np.asarray(comps), np.asarray(rcomps), atol=1e-8)


def test_quality_classifier(spark):
    from opentsdb_spark.pipeline.classifier import (
        score_quality, train_quality_classifier,
    )

    # two separable populations: fluent English-ish vs junk token soup
    good = [(i, " ".join(["the cat sat on the mat and the dog ran"] * 3), 1)
            for i in range(20)]
    junk = [(100 + i, " ".join(f"zx{j}q" for j in range(25)), 0)
            for i in range(20)]
    labeled = spark.createDataFrame(good + junk,
                                    "doc_id long, text string, label int")
    model = train_quality_classifier(labeled, n_features=256, max_iter=25)
    scored = {r["doc_id"]: r for r in
              score_quality(labeled, model, n_features=256).collect()}
    assert len(scored) == 40
    for i in range(20):
        assert scored[i]["quality_prob"] > 0.5 and scored[i]["keep"]
        assert not scored[100 + i]["keep"]
    # probabilities are probabilities
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in scored.values())
    # generalizes to unseen docs from the same populations
    unseen = spark.createDataFrame(
        [(500, "the cat and the dog sat on the mat the cat ran"),
         (501, " ".join(f"qq{j}z" for j in range(30)))],
        "doc_id long, text string")
    u = {r["doc_id"]: r for r in score_quality(unseen, model, n_features=256).collect()}
    assert u[500]["quality_prob"] > u[501]["quality_prob"]


def test_train_bpe(spark):
    from collections import Counter

    from opentsdb_spark.pipeline.text import train_bpe

    corpus = ["low low low lower lower newest newest newest newest widest",
              "widest widest newest low"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)],
                               "doc_id long, text string")
    merges, vocab = train_bpe(df, n_merges=8, checkpoint_every=3)

    # pure-Python reference: Sennrich-style BPE on word frequencies
    wf = Counter(w for t in corpus for w in t.lower().split())
    segs = {w: list(w) + ["</w>"] for w in wf}
    ref_merges = []
    for _ in range(8):
        pc = Counter()
        for w, s in segs.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += wf[w]
        if not pc:
            break
        # deterministic tie-break: max count, then lexicographically SMALLEST
        top_n = max(pc.values())
        cands = sorted([p for p, n in pc.items() if n == top_n])
        best = cands[0]
        if pc[best] < 2:
            break
        ref_merges.append(best)
        a, b = best
        for w, s in segs.items():
            r, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    r.append(a + b)
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            segs[w] = r
    assert merges == ref_merges
    # final segmentations agree with the reference
    got = {r["word"]: list(r["symbols"]) for r in vocab.collect()}
    assert got == segs


def test_hash_embed_docs(spark):
    import math

    from opentsdb_spark.pipeline.text import hash_embed_docs

    df = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the cat sat on the mat"),
         (2, "completely different words here entirely"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["embedding"] for r in
           hash_embed_docs(df, dim=8, n_buckets=256).collect()}
    # empty doc has no grams -> no row
    assert set(out) == {0, 1, 2}
    # identical docs embed identically; all vectors unit-norm
    assert out[0] == out[1]
    for v in out.values():
        assert len(v) == 8
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-12
    # different content embeds differently
    assert out[0] != out[2]
    # unpacked form agrees with packed
    rows = hash_embed_docs(df, dim=8, n_buckets=256, packed=False).collect()
    for r in rows:
        assert abs(out[r["doc_id"]][r["d"]] - r["val"]) < 1e-15


def test_bpe_encode_roundtrip(spark):
    from opentsdb_spark.pipeline.text import bpe_encode, train_bpe

    corpus = ["low low low lower lower newest newest newest newest widest",
              "widest widest newest low"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)],
                               "doc_id long, text string")
    merges, vocab = train_bpe(df, n_merges=8, checkpoint_every=3)
    segs = {r["word"]: list(r["symbols"]) for r in vocab.collect()}
    enc = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    # greedy lowest-rank encode reproduces the trainer's final segmentation
    for i, t in enumerate(corpus):
        want = [tok for w in t.lower().split() for tok in segs[w]]
        assert list(enc[i]["tokens"]) == want
        assert enc[i]["n_tokens"] == len(want)
    # unseen word degrades to characters + terminal (plus any applicable merge)
    u = spark.createDataFrame([(9, "zzq")], "doc_id long, text string")
    [row] = bpe_encode(u, merges).collect()
    assert "".join(row["tokens"]) == "zzq</w>"


def test_semdedup_fast_matches_bit_exact(spark):
    """The BLAS gram-matrix kernel must produce identical kept flags and
    1e-4-rounded dup cosines to the dim-sequential fold on the driver
    fixture — plus an adversarial-margin check that no cosine sits close
    enough to the threshold for FP reassociation (~1e-15) to flip it."""
    from pyspark.sql import functions as F

    from opentsdb_spark.pipeline.similarity import (
        _cell_cosines_udf, seeded_centroids, semdedup,
    )
    from opentsdb_spark.sources.points import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = seeded_centroids(8, 64)

    def norm(df):
        return sorted(
            (r["vec_id"], r["cell"], r["kept"],
             None if r["dup_cosine"] is None else round(r["dup_cosine"], 4))
            for r in df.collect()
        )

    fast = norm(semdedup(emb, threshold=0.3, centroids=cents))
    exact = norm(semdedup(emb, threshold=0.3, centroids=cents, bit_exact=True))
    assert fast == exact
    # margin: the closest pairwise cosine to the 0.3 threshold must clear
    # FP-noise scale by orders of magnitude
    from opentsdb_spark.pipeline.similarity import brute_force_topk

    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    pairs = brute_force_topk(v, v.limit(50).select(
        F.col("vec_id").alias("query_id"), "embedding"), k=200)
    margin = (
        pairs.where(F.col("query_id") != F.col("vec_id"))
        .select(F.min(F.abs(F.col("cosine") - 0.3)).alias("m"))
        .first()["m"]
    )
    assert margin > 1e-9


def test_bm25_search(spark, docs):
    """BM25 ranks the doc containing more/rarer query terms first; scores
    match a hand-computed Okapi formula on the tiny fixture."""
    from opentsdb_spark.pipeline.text import bm25_search

    out = bm25_search(docs.select("doc_id", "text"),
                      [("q", "fox engines")], k=10)
    rows = sorted(
        ((r["rank"], r["doc_id"], r["matched_terms"], r["score"])
         for r in out.collect())
    )
    # 'fox' appears in docs 0,1,2 (df=3); 'engines' only in doc 4 (df=1):
    # doc 4's single rare term outweighs any single common-term doc.
    assert [r[1] for r in rows] == [4, 0, 1, 2]
    assert rows[0][2] == 1  # doc 4 matched only 'engines'
    # hand-check doc 4: N=5, df=1, tf=1, dl=7, avgdl=(9*3+8+7)/5=8.4
    idf = math.log(1 + (5 - 1 + 0.5) / 1.5)
    exp = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 7 / 8.4))
    assert abs(rows[0][3] - exp) < 1e-9
    # docs 0 and 1 are identical -> identical scores, tie broken by id
    assert rows[1][3] == rows[2][3]


def test_bm25_broadcast_fallback_identical_above_term_threshold(spark, docs):
    """Above literal_map_max_terms the plan falls back from literal maps
    to broadcast joins (bounding plan size for 10k-term batch query sets);
    scores must be BIT-identical between the two plans, the fallback plan
    must carry broadcast joins and no literal map, and the literal plan
    must stay join-free."""
    from opentsdb_spark.pipeline.text import bm25_search

    queries = [("q1", "fox engines"), ("q2", "quick brown fox"),
               ("q3", "maintenance steam")]
    d = docs.select("doc_id", "text")
    lit = bm25_search(d, queries, k=10, persist=False)
    fb = bm25_search(d, queries, k=10, persist=False,
                     literal_map_max_terms=0)  # force the fallback
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    lit_rows = sorted(map(tuple, lit.collect()))
    fb_rows = sorted(map(tuple, fb.collect()))
    assert lit_rows == fb_rows and lit_rows  # bit-identical incl. doubles
    lit_plan = lit._jdf.queryExecution().executedPlan().toString()
    fb_plan = fb._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in lit_plan and "map(keys" in lit_plan
    assert "BroadcastHashJoin" in fb_plan and "map(keys" not in fb_plan
    # no corpus-sized shuffle joins: every join in the fallback broadcasts
    assert "SortMergeJoin" not in fb_plan and "ShuffledHashJoin" not in fb_plan


def test_bm25_fallback_bloom_false_positive_dropped(spark):
    """The fallback's Bloom bitmap is its ONLY per-token gate (no semi-
    probe), so a non-term token whose two hash slices land on set bits
    reaches the postings stage — the (token, query_id) inner join must
    drop it exactly: it never scores, never counts as a matched term, and
    the fallback stays bit-identical to the literal plan on the same
    corpus. The FP token is FOUND, not assumed: we search candidate
    strings until one passes the bitmap without being a term."""
    from opentsdb_spark.pipeline.text import bm25_search
    from opentsdb_spark.pipeline.xxh64_sql import py_xxh64

    terms = [f"term{i}" for i in range(600)]
    m_bits, k_hashes, wbits = 1 << 17, 2, 17
    mask = m_bits - 1
    bits = set()
    for t in terms:
        h = py_xxh64(t.encode()) & ((1 << 64) - 1)
        for i in range(k_hashes):
            bits.add((h >> (wbits * i)) & mask)

    fp = None
    for j in range(3_000_000):
        cand = f"fp{j}"
        if cand in terms:
            continue
        h = py_xxh64(cand.encode()) & ((1 << 64) - 1)
        if all(((h >> (wbits * i)) & mask) in bits for i in range(k_hashes)):
            fp = cand
            break
    assert fp is not None, "no bloom false positive found in 3M candidates"

    docs = spark.createDataFrame(
        [(0, f"term1 term2 {fp} {fp}"), (1, f"term1 {fp} other words"),
         (2, "unrelated text entirely")],
        "doc_id long, text string")
    queries = [("q1", " ".join(terms))]
    fb = sorted(map(tuple, bm25_search(
        docs, queries, k=10, persist=False,
        literal_map_max_terms=0).collect()))
    lit = sorted(map(tuple, bm25_search(
        docs, queries, k=10, persist=False).collect()))
    assert fb == lit and fb
    by_id = {r[2]: r for r in fb}  # (query_id, rank, doc_id, matched, score)
    assert set(by_id) == {0, 1}  # doc 2 matches nothing
    assert by_id[0][3] == 2 and by_id[1][3] == 1  # FP never a matched term


def test_token_budget_select(spark):
    """Greedy budget contract: keep in priority order while tokens BEFORE
    the doc are under budget — each group overshoots by at most one doc."""
    from opentsdb_spark.pipeline.sampling import token_budget_select

    docs = spark.createDataFrame(
        [
            (0, "a " * 10, "s1"),   # 10 tokens
            (1, "b " * 8, "s1"),    # 8
            (2, "c " * 6, "s1"),    # 6
            (3, "d " * 4, "s2"),    # 4
            (4, "", "s2"),          # 0 tokens, still under budget
        ],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r for r in
           token_budget_select(docs, budget_tokens=15).collect()}
    # s1 priority order 0(10), 1(8), 2(6): doc 1 starts at 10 < 15 (kept,
    # overshooting to 18); doc 2 starts at 18 >= 15 (dropped)
    assert set(out) == {0, 1, 3, 4}
    assert out[1]["cum_tokens"] == 18
    # s2: zero-token doc sorts last but stays under budget
    assert out[4]["cum_tokens"] == 4


def test_bloom_decontaminate_superset_of_exact(spark):
    """Bloom hygiene is one-sided: every doc the exact gram-set pass flags
    is flagged by the Bloom pass too (false negatives impossible), and the
    bloom gram count never undercounts the exact shared-gram count."""
    from opentsdb_spark.pipeline.dedup import bloom_decontaminate, decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (0, "news report the quick brown fox jumps over a fence"),
            (1, "completely unrelated sentence about spark engines"),
            (2, "tiny"),
        ],
        "doc_id long, text string",
    )
    exact = {r["doc_id"]: r for r in
             decontaminate(train, bench, n=4).collect()}
    bloom = {r["doc_id"]: r for r in
             bloom_decontaminate(train, bench, n=4).collect()}
    assert set(exact) == set(bloom)
    for did in exact:
        assert bloom[did]["bloom_grams"] >= exact[did]["shared_grams"]
        if exact[did]["contaminated"]:
            assert bloom[did]["contaminated"]
    # on this fixture (tiny gram sets in a 2^20-bit array) no false
    # positives are plausible either: the clean docs stay clean
    assert not bloom[1]["contaminated"] and not bloom[2]["contaminated"]


def test_bloom_m_bits_validation(spark):
    """The partition-the-hash construction is only uniform for a
    power-of-two m_bits, and the k slices must fit 64 bits — both
    misuses raise instead of silently degrading the filter."""
    import pytest

    from opentsdb_spark.pipeline.dedup import bloom_decontaminate

    docs = spark.createDataFrame([(0, "a b c d e")],
                                 "doc_id long, text string")
    with pytest.raises(ValueError, match="power of two"):
        bloom_decontaminate(docs, docs, m_bits=1_000_000)
    with pytest.raises(ValueError, match="64-bit"):
        bloom_decontaminate(docs, docs, m_bits=1 << 22, k_hashes=3)
    # wider-than-default power of two with fitting slices is legal
    assert bloom_decontaminate(
        docs, docs, m_bits=1 << 21, k_hashes=3).count() == 1


def test_persist_small_registers_scratch(spark):
    """Pipeline persists must register with the per-thread scratch registry
    so a long-lived serving process can release a request's working set —
    one leaked cached frame per request otherwise."""
    from opentsdb_spark.operators.groupby import release_scratch
    from opentsdb_spark.pipeline.dedup import minhash_lsh_pairs

    release_scratch()  # drop anything earlier tests pinned on this thread
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(10)],
        "doc_id long, text string",
    )
    minhash_lsh_pairs(docs, num_hashes=8, bands=4).count()
    assert release_scratch() >= 1


def test_hard_negatives(spark):
    """The top negative is the most-similar different-label vector; own
    class never appears."""
    from opentsdb_spark.pipeline.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),   # same label as 0 — never 0's negative
        (2, [0.8, 0.2, 0.0], 1),   # closest different-label to 0
        (3, [0.0, 1.0, 0.0], 1),
        (4, [0.0, 0.0, 1.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = hard_negatives(emb, k=2).collect()
    mine = {r["rank"]: r for r in out if r["query_id"] == 0}
    assert mine[1]["vec_id"] == 2 and mine[1]["neg_label"] == 1
    assert all(r["neg_label"] != 0 for r in out if r["query_id"] == 0)
    # every query got negatives only from other classes
    labels = {r[0]: r[2] for r in rows}
    for r in out:
        assert r["neg_label"] != labels[r["query_id"]]


def test_vocab_topk_grouped(spark, docs):
    from opentsdb_spark.pipeline.text import vocab_topk_grouped

    out = vocab_topk_grouped(docs, k=2, group_col="lang").collect()
    en = {r["rank"]: r for r in out if r["lang"] == "en"}
    # 'the' dominates the three en dup docs (2 each) + none in doc 4
    assert en[1]["token"] == "the" and en[1]["tf"] == 6 and en[1]["df"] == 3
    de = [r for r in out if r["lang"] == "de"]
    assert len(de) == 2 and de[0]["rank"] == 1


def test_class_balance(spark):
    from opentsdb_spark.pipeline.sampling import class_balance

    rows = [(i, [float(i)], 0) for i in range(10)] + \
           [(100 + i, [float(i)], 1) for i in range(3)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = class_balance(df).groupBy("label").count().collect()
    sizes = {r["label"]: r["count"] for r in out}
    # both classes cut to the minority size; selection is deterministic
    assert sizes == {0: 3, 1: 3}
    a = sorted(r["vec_id"] for r in class_balance(df).collect())
    b = sorted(r["vec_id"] for r in class_balance(df).collect())
    assert a == b and len(a) == 6


def test_dedup_pipeline_funnel(spark, docs):
    """Exact dups drop at stage 1; near-dups cluster and keep exactly one
    representative; singletons survive untouched."""
    from opentsdb_spark.pipeline.cluster import dedup_pipeline

    out = {r["doc_id"]: r for r in
           dedup_pipeline(docs.select("doc_id", "text"), threshold=0.3).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    # doc 1 is an exact copy of doc 0 -> dropped at the exact stage
    assert out[0]["exact_kept"] and not out[1]["exact_kept"]
    assert out[1]["component"] == -1 and not out[1]["final_kept"]
    # docs 0 and 2 are near-dups -> same cluster, exactly one survivor
    assert out[0]["component"] == out[2]["component"]
    assert out[0]["final_kept"] != out[2]["final_kept"]
    # unrelated docs survive as their own component
    for i in (3, 4):
        assert out[i]["exact_kept"] and out[i]["final_kept"]
        assert out[i]["component"] == i


# ------------------------------------------------------------- sketches ----


def test_hll_estimate_accuracy_and_idempotence(spark):
    """HLL estimate within ~3 sigma (sigma = 1.04/sqrt(m)) of the true
    cardinality, and duplicate values leave the registers untouched."""
    from opentsdb_spark.pipeline.sketch import hll_estimate, hll_registers

    n = 5000
    rows = [("g", f"value-{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "g string, v string")
    regs = hll_registers(df, ("g",), "v", p=10)
    # sparse: only occupied buckets, every row rank >= 1
    assert regs.count() <= 1024
    assert regs.where("r < 1").count() == 0
    [r] = hll_estimate(regs, ("g",), p=10).collect()
    assert abs(r["est"] - n) / n < 3 * 1.04 / (1024 ** 0.5)
    # feeding every value 3x changes nothing (max is idempotent)
    df3 = df.union(df).union(df)
    [r3] = hll_estimate(
        hll_registers(df3, ("g",), "v", p=10), ("g",), p=10).collect()
    assert r3["est"] == r["est"]
    assert r3["reg_sum"] == r["reg_sum"]


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities route through the m*ln(m/V) correction and land
    very close to exact."""
    from opentsdb_spark.pipeline.sketch import hll_estimate, hll_registers

    df = spark.createDataFrame(
        [("g", f"t{i % 40}") for i in range(400)], "g string, v string")
    [r] = hll_estimate(
        hll_registers(df, ("g",), "v", p=10), ("g",), p=10).collect()
    assert r["v_zero"] > 0
    # deterministic hashing: these 40 fixed strings happen to collide in 5
    # buckets, so the correction lands at 35.6 — the estimator is unbiased
    # over random inputs, not any one fixture; pin the deterministic value
    assert abs(r["est"] - 40) / 40 < 0.2
    assert r["est"] == pytest.approx(35.61213335218281)


def test_cms_one_sided_and_probe_positions(spark):
    """CMS point estimates are one-sided (est >= exact) and the driver-side
    probe-position chain is bit-identical to Spark's multi-arg xxhash64."""
    from pyspark.sql import functions as F

    from opentsdb_spark.pipeline.sketch import (
        cms_cells, cms_estimate, cms_probe_positions,
    )

    rows = [(f"tok{i % 97}",) for i in range(3000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "v string")
    cells = cms_cells(df, "v", d=4, w=256)
    probes = ["hot", "tok0", "tok96", "absent-token"]
    est = {r["token"]: r["est"] for r in
           cms_estimate(cells, probes, d=4, w=256).collect()}
    exact = {"hot": 500, "tok0": 31, "tok96": 30, "absent-token": 0}
    n_total = 3500
    for t, e in exact.items():
        assert est[t] >= e, (t, est[t], e)
        # generous deterministic bound: 4 collisions' worth of mass
        assert est[t] - e <= 4 * n_total * 4 / 256, (t, est[t], e)
    # probe positions == Spark's chained hash
    for tok in probes:
        got = cms_probe_positions(tok, d=4, w=256)
        want = df.sparkSession.range(1).select(*[
            F.xxhash64(F.lit(tok), F.lit(i).cast("long"))
            .bitwiseAND(F.lit(255)).alias(f"c{i}")
            for i in range(4)
        ]).first()
        assert got == [(i, want[f"c{i}"]) for i in range(4)]


def test_sketch_validation(spark):
    import pytest as _pytest

    from opentsdb_spark.pipeline.sketch import cms_cells, hll_registers

    df = spark.createDataFrame([("a",)], "v string")
    with _pytest.raises(ValueError):
        hll_registers(df, (), "v", p=2)
    with _pytest.raises(ValueError):
        cms_cells(df, "v", d=0)
    with _pytest.raises(ValueError):
        cms_cells(df, "v", w=1000)  # not a power of two


def test_sketch_bounded_shuffle_plan(spark):
    """Scale posture: the only aggregates key on (group, bucket) / (r, c)
    — never on the raw value column (that would be the vocabulary-sized
    shuffle sketches exist to avoid)."""
    from opentsdb_spark.pipeline.sketch import cms_cells, hll_registers

    df = spark.createDataFrame([("g", "tok")], "g string, v string")
    plan = hll_registers(df, ("g",), "v", p=10)._jdf.queryExecution().executedPlan().toString()
    import re
    for m in re.finditer(r"HashAggregate\(keys=\[([^\]]*)\]", plan):
        assert "v#" not in m.group(1), plan
        assert "bucket" in m.group(1) or "g#" in m.group(1)
    plan2 = cms_cells(df, "v")._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"HashAggregate\(keys=\[([^\]]*)\]", plan2):
        assert "v#" not in m.group(1), plan2


def test_global_shuffle_dense_and_seeded(spark):
    """Positions are a dense 1..N permutation, reproducible across calls,
    and a different seed yields a different (but also dense) order."""
    import pytest

    from opentsdb_spark.pipeline.sampling import global_shuffle

    docs = spark.createDataFrame([(i,) for i in range(97)], "doc_id long")
    a = {r["doc_id"]: r["pos"] for r in
         global_shuffle(docs, seed=1, n_buckets=8).collect()}
    assert sorted(a.values()) == list(range(1, 98))
    again = {r["doc_id"]: r["pos"] for r in
             global_shuffle(docs, seed=1, n_buckets=8).collect()}
    assert again == a  # reproducible
    b = {r["doc_id"]: r["pos"] for r in
         global_shuffle(docs, seed=2, n_buckets=8).collect()}
    assert sorted(b.values()) == list(range(1, 98))
    assert b != a  # an independent permutation
    # bucket count must not change the ORDER, only the plan shape
    c = {r["doc_id"]: r["pos"] for r in
         global_shuffle(docs, seed=1, n_buckets=1).collect()}
    assert sorted(c.values()) == list(range(1, 98))
    with pytest.raises(ValueError):
        global_shuffle(docs, n_buckets=0)


def test_cap_per_group_deterministic_and_quality_order(spark):
    """Default cap keeps a reproducible hash-selected subset per group;
    a custom quality order keeps the top-quality docs instead."""
    import pytest

    from pyspark.sql import functions as F

    from opentsdb_spark.pipeline.sampling import cap_per_group

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", float(i)) for i in range(30)],
        "doc_id long, source string, quality double",
    )
    out = cap_per_group(docs, max_per_group=4).collect()
    assert len(out) == 12  # 3 groups x 4
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r["group_rank"])
    assert all(sorted(v) == [1, 2, 3, 4] for v in per.values())
    # reproducible
    assert sorted(map(tuple, out)) == sorted(
        map(tuple, cap_per_group(docs, max_per_group=4).collect()))
    # quality order: keep the 2 HIGHEST-quality docs per group
    q = cap_per_group(docs, 2, order_by=[F.desc("quality"), F.asc("doc_id")])
    kept = {r["doc_id"] for r in q.collect()}
    assert kept == {29, 26, 28, 25, 27, 24}
    # a group smaller than the cap survives whole
    small = cap_per_group(docs.where("doc_id < 2"), max_per_group=4)
    assert small.count() == 2
    with pytest.raises(ValueError):
        cap_per_group(docs, 0)


def test_cap_per_group_quality_path_scale_safe(spark):
    """The quality_col path must be BIT-EQUAL to a sequential per-group
    (quality, id) sort — in both directions, with NULL scores ranked last
    and NULL groups kept — while its plan contains NO whole-group window
    (every Window node carries the quantized bucket __b, either as a
    partition key or, for the bounded offsets cumsum, as the order key)."""
    from pyspark.sql import Window

    from opentsdb_spark.pipeline.sampling import cap_per_group

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}" if i % 7 else None,
          None if i % 5 == 0 else float((i * 37) % 11)) for i in range(60)],
        "doc_id long, source string, quality double")

    def seq(desc, cap):
        o = (F.col("quality").desc_nulls_last() if desc
             else F.col("quality").asc_nulls_last())
        w = Window.partitionBy("source").orderBy(o, F.asc("doc_id"))
        return sorted(map(tuple, docs.withColumn(
            "group_rank", F.row_number().over(w))
            .where(F.col("group_rank") <= cap)
            .select("doc_id", "group_rank").collect()))

    got_d = cap_per_group(docs, 4, quality_col="quality")
    assert sorted(map(tuple, got_d.select("doc_id", "group_rank").collect())) \
        == seq(True, 4)
    got_a = cap_per_group(docs, 4, quality_col="quality", quality_desc=False)
    assert sorted(map(tuple, got_a.select("doc_id", "group_rank").collect())) \
        == seq(False, 4)
    # null-group rows rank in their own group instead of vanishing in the
    # offsets equi-join (null != null — the null-key join trap)
    n_null = docs.where("source is null").count()
    assert got_d.where("source is null").count() > 0
    assert cap_per_group(docs, 100, quality_col="quality") \
        .where("source is null").count() == n_null
    assert cap_per_group(docs, 100).where("source is null").count() == n_null
    # plan pin: no whole-group window — a mega-domain never lands in one
    # task; the only windows are (group, __b)-partitioned ranks and the
    # bounded offsets cumsum ORDERED by __b
    plan = got_d._jdf.queryExecution().executedPlan().toString()
    wins = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert wins and all("__b" in ln for ln in wins), plan[:3000]
    # constant quality degenerates to one bucket but still caps correctly
    const = cap_per_group(docs.withColumn("quality", F.lit(1.0)), 2,
                          quality_col="quality")
    assert const.count() == 2 * 4  # 3 named groups + the null group


def test_cap_per_group_quantization_bounds_are_per_group(spark):
    """A mega-group whose scores cluster in a SLIVER of the global score
    range must still spread across its own quantization buckets — the
    round-9 finding: global min/max bounds would land the whole group in
    ~one bucket and degenerate its rank to a single task. The per-group
    bounds cap every (group, __b) rank partition, and the rank stays
    bit-equal to the sequential per-group sort."""
    from pyspark.sql import Window

    from opentsdb_spark.pipeline.sampling import (
        _quality_rank_frame, cap_per_group)

    n_mega, n_buckets = 3000, 64
    rows = [(i, "mega", 0.999 + (i % 997) * 1e-9) for i in range(n_mega)]
    rows += [(10_000 + i, "wide", float(i) * 1000.0) for i in range(50)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, quality double")
    frame = _quality_rank_frame(docs, "source", "doc_id", "quality",
                                True, n_buckets)
    per_bucket = (frame.groupBy("source", "__b").count()
                  .groupBy("source").agg(
                      F.max("count").alias("mx"),
                      F.count("*").alias("nb")).collect())
    stats = {r["source"]: r for r in per_bucket}
    # under GLOBAL bounds the mega sliver maps to one bucket (mx = 3000);
    # per-group bounds keep every rank partition near n/n_buckets
    assert stats["mega"]["nb"] > n_buckets // 2
    assert stats["mega"]["mx"] <= 4 * (n_mega // n_buckets)
    # equality with the sequential per-group sort is retained
    got = sorted(map(tuple, cap_per_group(
        docs, 5, quality_col="quality")
        .select("doc_id", "group_rank").collect()))
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc_nulls_last(), F.asc("doc_id"))
    want = sorted(map(tuple, docs.withColumn(
        "group_rank", F.row_number().over(w))
        .where("group_rank <= 5").select("doc_id", "group_rank").collect()))
    assert got == want


def test_leakage_safe_split_clusters_never_straddle(spark):
    """Every near-dup component lands wholly in one split; singletons key
    on themselves (== plain hash_split); the no-straddle property holds
    by construction on a multi-clique graph."""
    from opentsdb_spark.pipeline.sampling import hash_split, leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(60)], "doc_id long, text string")
    # cliques: {0..4}, {10,11}, chain {20-21-22}; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long")
    out = {r["doc_id"]: r for r in leakage_safe_split(
        docs, {"train": 0.6, "val": 0.4}, pairs).collect()}
    assert len(out) == 60
    for clique in [{0, 1, 2, 3, 4}, {10, 11}, {20, 21, 22}]:
        comps = {out[i]["component"] for i in clique}
        splits = {out[i]["split"] for i in clique}
        assert comps == {min(clique)} and len(splits) == 1, clique
    # singleton docs match the plain hash_split decision exactly
    singles = [i for i in range(60)
               if i not in {0, 1, 2, 3, 4, 10, 11, 20, 21, 22}]
    plain = {r["doc_id"]: r["split"] for r in hash_split(
        docs, {"train": 0.6, "val": 0.4}).collect()}
    for i in singles:
        assert out[i]["split"] == plain[i]
    # both splits actually occur somewhere
    assert {r["split"] for r in out.values()} == {"train", "val"}


def test_quality_percentile_calibration(spark):
    """pct = (rank-1)/(n-1) within each group under (score asc, id asc);
    singles get 0.5; NULL scores keep NULL pct; NULL groups calibrate as
    their own group; ties rank deterministically by id."""
    from opentsdb_spark.pipeline.sampling import quality_percentile

    docs = spark.createDataFrame(
        [(0, "a", 10.0), (1, "a", 30.0), (2, "a", 20.0), (3, "a", 20.0),
         (4, "b", 7.0),                      # single-member group
         (5, None, 1.0), (6, None, 2.0),     # NULL group
         (7, "a", None)],                    # NULL score
        "doc_id long, source string, quality double")
    out = {r["doc_id"]: r for r in quality_percentile(docs).collect()}
    assert len(out) == 8
    # group a non-null order: 10 < 20(id2) < 20(id3) < 30 -> pct /3
    assert out[0]["pct"] == 0.0 and out[1]["pct"] == 1.0
    assert abs(out[2]["pct"] - 1 / 3) < 1e-15
    assert abs(out[3]["pct"] - 2 / 3) < 1e-15
    assert out[4]["pct"] == 0.5                # single
    assert out[5]["pct"] == 0.0 and out[6]["pct"] == 1.0  # null group
    assert out[7]["pct"] is None               # null score
    assert out[7]["group_rank"] == 5           # ranks after scored docs


def test_cap_per_group_order_by_routing_and_warning(spark):
    """A single-column nulls-last order_by routes through the scale-safe
    quality path (same survivors/ranks, plan has NO whole-group window);
    a genuinely arbitrary order warns about the single-task window."""
    import warnings

    from opentsdb_spark.pipeline.sampling import cap_per_group

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", float((i * 37) % 11)) for i in range(60)],
        "doc_id long, source string, quality double")
    routed = cap_per_group(docs, 3, order_by=[F.desc("quality")])
    direct = cap_per_group(docs, 3, quality_col="quality")
    assert sorted(map(tuple, routed.select("doc_id", "group_rank").collect())) \
        == sorted(map(tuple, direct.select("doc_id", "group_rank").collect()))
    plan = routed._jdf.queryExecution().executedPlan().toString()
    wins = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert wins and all("__b" in ln for ln in wins)
    asc_routed = cap_per_group(docs, 3,
                               order_by=[F.col("quality").asc_nulls_last()])
    asc_direct = cap_per_group(docs, 3, quality_col="quality",
                               quality_desc=False)
    assert sorted(map(tuple, asc_routed.select("doc_id", "group_rank").collect())) \
        == sorted(map(tuple, asc_direct.select("doc_id", "group_rank").collect()))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cap_per_group(docs, 3, order_by=[F.desc("quality"), F.asc("doc_id")])
        cap_per_group(docs, 3, order_by=[(F.col("quality") * 2).desc()])
    msgs = [str(c.message) for c in caught]
    assert sum("single-task window" in m for m in msgs) == 2
    # ASC-nulls-first (the bare-column default) keeps its documented
    # window semantics — not routed, warned
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cap_per_group(docs, 3, order_by=[F.asc("quality")])
    assert any("single-task window" in str(c.message) for c in caught)


def test_cap_per_group_order_by_non_numeric_not_routed(spark):
    """A string order column must NOT route into the quality path (its
    cast to double is NULL — every row would land in the sentinel bucket
    and the rank would silently degenerate to id-ASC). It keeps the exact
    window semantics (with the scale warning); numeric and timestamp
    columns route."""
    import itertools
    import warnings

    from opentsdb_spark.pipeline.sampling import (
        _route_order_by_to_quality, cap_per_group)

    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", chr(65 + (i * 7) % 26)) for i in range(20)],
        "doc_id long, source string, name string")
    assert _route_order_by_to_quality(
        [F.desc("name")], schema=docs.schema) is None
    assert _route_order_by_to_quality(
        [F.desc("doc_id")], schema=docs.schema) == ("doc_id", True)
    assert _route_order_by_to_quality(
        [F.desc("missing")], schema=docs.schema) is None
    ts = docs.withColumn("ts", F.timestamp_seconds(F.col("doc_id")))
    assert _route_order_by_to_quality(
        [F.desc("ts")], schema=ts.schema) == ("ts", True)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = sorted(
            (r["doc_id"], r["group_rank"])
            for r in cap_per_group(docs, 3, order_by=[F.desc("name")])
            .select("doc_id", "group_rank").collect())
    assert any("single-task window" in str(c.message) for c in caught)
    want = []
    for _, grp in itertools.groupby(
            sorted(docs.collect(), key=lambda r: r.source),
            key=lambda r: r.source):
        top = sorted(grp, key=lambda r: r.name, reverse=True)[:3]
        want += [(r.doc_id, i + 1) for i, r in enumerate(top)]
    assert got == sorted(want)


def test_route_order_by_jvm_spec_and_repr_assumption(spark):
    """The sort spec comes from the JVM SortOrder node; the repr regex is
    only a fallback. Pin BOTH — the JVM readings and the Column repr
    format the regex assumes — so a PySpark upgrade that changes either
    fails loudly instead of silently re-routing callers."""
    from opentsdb_spark.pipeline.sampling import _sort_spec_from_jvm

    assert _sort_spec_from_jvm(F.desc("q")) == ("q", "DESC", "NULLS LAST")
    assert _sort_spec_from_jvm(F.col("q").asc_nulls_last()) == \
        ("q", "ASC", "NULLS LAST")
    assert _sort_spec_from_jvm(F.col("q")) == ("q", "ASC", "NULLS FIRST")
    assert _sort_spec_from_jvm((F.col("q") * 2).desc()) is None
    assert _sort_spec_from_jvm(F.asc("a.b")) is None
    assert _sort_spec_from_jvm("q DESC") is None  # strings go to the regex
    # the regex fallback's repr assumption
    assert str(F.desc("q")) == "Column<'q DESC NULLS LAST'>"
    assert str(F.col("q").asc_nulls_last()) == "Column<'q ASC NULLS LAST'>"
    assert str(F.col("q")) == "Column<'q'>"


def test_token_entropy_values(spark):
    """Uniform tokens -> log2(n) bits; single repeated token -> 0; empty
    docs vanish."""
    import math

    from opentsdb_spark.pipeline.text import token_entropy

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "x x x x x"), (2, "a a b b"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert set(out) == {0, 1, 2}
    assert abs(out[0]["entropy"] - 2.0) < 1e-12 and out[0]["n_tokens"] == 4
    assert out[1]["entropy"] == 0.0
    assert abs(out[2]["entropy"] - 1.0) < 1e-12
    # mixed case folds through the shared lowercasing tokenizer
    mixed = spark.createDataFrame([(9, "The the THE")], "doc_id long, text string")
    assert token_entropy(mixed).collect()[0]["entropy"] == 0.0
    assert math.isfinite(out[2]["entropy"])


def test_intra_doc_repetition_loop_detection(spark):
    """A block pasted N times counts all its occurrences as repeated; a
    no-repeat doc scores 0; sub-k docs emit no row; cross-doc copies do
    NOT count (intra-doc only)."""
    from opentsdb_spark.pipeline.text import intra_doc_repetition

    loop = ("alpha beta gamma delta epsilon " * 3).strip()  # 15 words
    docs = spark.createDataFrame(
        [(0, loop),                         # every window recurs
         (1, "one two three four five six seven"),  # no repeats
         (2, "one two three four five six seven"),  # cross-doc copy of 1
         (3, "tiny doc")],                  # < 5 words
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in intra_doc_repetition(docs, k=5).collect()}
    assert set(out) == {0, 1, 2}
    # doc 0: 11 windows over 15 words; the 5 distinct rotations each
    # appear 2-3 times -> every occurrence is repeated
    assert out[0]["n_windows"] == 11 and out[0]["rep_frac"] == 1.0
    assert out[1]["rep_frac"] == 0.0 and out[2]["rep_frac"] == 0.0
    assert out[1]["n_windows"] == 3


def test_gram_novelty_fractions(spark):
    """A doc sharing every 3-gram with another scores 0; a fully unique
    doc scores 1; partial overlap gives the exact distinct-gram fraction;
    sub-n docs emit no row."""
    from opentsdb_spark.pipeline.text import gram_novelty

    docs = spark.createDataFrame(
        [(0, "a b c d"),          # grams {abc, bcd}
         (1, "a b c d"),          # exact copy -> both score 0
         (2, "a b c x y"),        # {abc, bcx, cxy}: abc shared -> 2/3
         (3, "p q r s"),          # unique -> 1.0
         (4, "too short")],       # < 3 words: no row
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in gram_novelty(docs, n=3).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["novelty"] == 0.0 and out[1]["novelty"] == 0.0
    assert out[2]["n_grams"] == 3 and out[2]["novel_grams"] == 2
    assert abs(out[2]["novelty"] - 2 / 3) < 1e-15
    assert out[3]["novelty"] == 1.0
    # repeated gram INSIDE one doc is distinct-per-doc: df stays 1
    solo = spark.createDataFrame([(9, "m n o m n o m n o")],
                                 "doc_id long, text string")
    [r] = gram_novelty(solo, n=3).collect()
    assert r["novelty"] == 1.0 and r["n_grams"] == 3  # mno, nom, onm


def test_snapshot_diff_statuses(spark):
    """added/removed/changed/unchanged per id; ids absent from both sides
    emit nothing; text itself never decides via the id join (content
    equality does)."""
    from opentsdb_spark.pipeline.dedup import snapshot_diff

    a = spark.createDataFrame(
        [(1, "same"), (2, "old"), (3, "gone")], "doc_id long, text string")
    b = spark.createDataFrame(
        [(1, "same"), (2, "new"), (4, "fresh")], "doc_id long, text string")
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(a, b).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    # identical snapshots: all unchanged
    same = {r["status"] for r in snapshot_diff(a, a).collect()}
    assert same == {"unchanged"}


def test_snapshot_diff_null_content_is_presence_not_hash(spark):
    """Presence comes from explicit side markers, not hash nullity:
    sha2(NULL text) is NULL, so a present-with-NULL-content document must
    still diff as present (changed vs text, unchanged vs NULL), never as
    added/removed."""
    from opentsdb_spark.pipeline.dedup import snapshot_diff

    a = spark.createDataFrame(
        [(1, None), (2, "txt"), (3, None), (5, None)],
        "doc_id long, text string")
    b = spark.createDataFrame(
        [(1, "txt"), (2, None), (3, None), (4, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(a, b).collect()}
    assert out == {
        1: "changed",    # NULL -> text (present both sides)
        2: "changed",    # text -> NULL
        3: "unchanged",  # NULL on both sides, same (absent) content
        4: "added",      # only in B, even with NULL content
        5: "removed",    # only in A, even with NULL content
    }


def test_doc_length_quantiles_exact(spark):
    """Rank-ceil(q*n) percentiles over integer token counts: exact per
    group, NULL groups kept, q validation; matches a sorted-list replay."""
    import math

    import pytest

    from opentsdb_spark.pipeline.text import doc_length_quantiles

    rows, lens = [], {}
    for i in range(40):
        g = ["s1", "s2", None][i % 3]
        n = (i * 7) % 13 + 1
        rows.append((i, g, "w " * n))
        lens.setdefault(g, []).append(n)
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r["source"], r["q"]): r for r in
           doc_length_quantiles(docs, qs=(0.5, 0.9, 1.0)).collect()}
    for g, ls in lens.items():
        ls = sorted(ls)
        for q in (0.5, 0.9, 1.0):
            r = out[(g, q)]
            assert r["n_docs"] == len(ls)
            assert r["q_len"] == ls[math.ceil(q * len(ls)) - 1], (g, q)
    assert (None, 0.5) in out  # NULL source kept as its own group
    with pytest.raises(ValueError):
        doc_length_quantiles(docs, qs=(0.0,))


def test_vocab_drift_movers_and_jsd(spark):
    """Identical snapshots: all deltas 0 and JSD 0. A vocabulary swap in
    one snapshot surfaces the swapped tokens as the top movers with exact
    shares, and JSD matches the hand-computed divergence."""
    import math

    from opentsdb_spark.pipeline.text import vocab_drift

    a = spark.createDataFrame(
        [(0, "x x x y"), (2, "x y z")], "doc_id long, text string")
    same = vocab_drift(a, a, top_n=10).collect()
    assert len(same) == 3
    for r in same:
        assert r["delta"] == 0.0 and r["jsd"] == 0.0
        assert r["p_a"] == r["p_b"]
    # b drops z, adds w twice: totals a=7, b=8
    b = spark.createDataFrame(
        [(1, "x x x y"), (3, "x y w w")], "doc_id long, text string")
    out = {r["token"]: r for r in vocab_drift(a, b, top_n=10).collect()}
    assert set(out) == {"x", "y", "z", "w"}
    assert out["w"]["cnt_a"] == 0 and out["w"]["cnt_b"] == 2
    assert abs(out["w"]["delta"] - 2 / 8) < 1e-15
    assert abs(out["z"]["delta"] + 1 / 7) < 1e-15
    # movers rank by |delta|: w (0.25) first, z (~0.143) beats x
    ordered = sorted(out.values(), key=lambda r: (-abs(r["delta"]), r["token"]))
    assert [r["token"] for r in ordered][0] == "w"
    want_jsd = 0.0
    for pa, pb in [(4 / 7, 4 / 8), (2 / 7, 2 / 8), (1 / 7, 0.0), (0.0, 2 / 8)]:
        m = (pa + pb) / 2
        want_jsd += (0.5 * pa * math.log(pa / m) if pa else 0.0) \
            + (0.5 * pb * math.log(pb / m) if pb else 0.0)
    assert abs(out["x"]["jsd"] - want_jsd) < 1e-12
    # top_n bounds the output
    assert vocab_drift(a, b, top_n=2).count() == 2


def test_source_ngram_overlap(spark):
    """Identical sources share everything (jaccard 1); disjoint sources
    emit no pair row; counts are distinct-gram counts."""
    from opentsdb_spark.pipeline.text import source_ngram_overlap

    docs = spark.createDataFrame(
        [(0, "a b c d e", "s1"), (1, "a b c d e", "s2"),
         (2, "x y z w v", "s3"), (3, "a b c q r", "s1")],
        "doc_id long, text string, source string",
    )
    rows = {(r["source_a"], r["source_b"]): r for r in
            source_ngram_overlap(docs, n=3).collect()}
    assert set(rows) == {("s1", "s2")}  # s3 shares nothing -> no row
    r = rows[("s1", "s2")]
    # s1 grams: {abc,bcd,cde} U {abc,bcq,cqr} = 5 distinct; s2: 3; shared 3
    assert (r["grams_a"], r["grams_b"], r["shared_grams"]) == (5, 3, 3)
    assert abs(r["jaccard"] - 3 / 5) < 1e-12


def test_sample_fixed_n_exact_and_seeded(spark):
    """Exactly n rows, reproducible, seed-independent permutations, and the
    corpus-smaller-than-n edge; the plan must be a TakeOrderedAndProject
    (bounded per-partition heaps), never a global sort exchange."""
    import pytest

    from opentsdb_spark.pipeline.sampling import sample_fixed_n

    docs = spark.createDataFrame([(i, f"s{i % 3}") for i in range(200)],
                                 "doc_id long, source string")
    out = sample_fixed_n(docs, n=10, seed=1)
    rows = out.collect()
    assert len(rows) == 10
    assert sorted(r["sample_rank"] for r in rows) == list(range(1, 11))
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in rows}
    other = {r["doc_id"] for r in sample_fixed_n(docs, n=10, seed=2).collect()}
    assert other != {r["doc_id"] for r in rows}
    assert sample_fixed_n(docs, n=500).count() == 200  # corpus smaller
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the post-limit rank window must carry a (constant) partition spec —
    # an empty one ("], [], [" in the node text) makes WindowExec log "No
    # Partition Defined" on every bench run, burning the driver's
    # 2000-char stdout tail capture on warnings
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines and all("], [], [" not in ln for ln in win_lines), plan[:2000]
    with pytest.raises(ValueError):
        sample_fixed_n(docs, n=0)


def test_weighted_sample_bias_determinism_and_plan(spark):
    """Sequential Poisson sampling: exact n, reproducible, heavier rows win
    more often than a uniform draw, zero/NULL weights excluded, and the
    plan is a TakeOrderedAndProject (no global sort / corpus shuffle)."""
    import pytest

    from opentsdb_spark.pipeline.sampling import weighted_sample

    # weights: doc 0..99 weight 1, doc 100..199 weight 100
    docs = spark.createDataFrame(
        [(i, 1 if i < 100 else 100) for i in range(200)]
        + [(200, 0), (201, None)],
        "doc_id long, w int",
    )
    out = weighted_sample(docs, n=50, weight_col="w", seed=5)
    rows = out.collect()
    assert len(rows) == 50
    assert sorted(r["sample_rank"] for r in rows) == list(range(1, 51))
    assert all(r["doc_id"] < 200 for r in rows)  # zero/NULL weight excluded
    # replay identical
    assert {tuple(r) for r in weighted_sample(
        docs, n=50, weight_col="w", seed=5).collect()} == {tuple(r) for r in rows}
    # 100x heavier rows should dominate: expect >= 40 of 50 from the heavy
    # half (uniform would give ~25; P[>=40 under uniform] is astronomically
    # small, and the draw is deterministic so this never flakes)
    heavy = sum(1 for r in rows if r["doc_id"] >= 100)
    assert heavy >= 40, heavy
    # a different seed permutes the light-half members it picks up
    other = {r["doc_id"] for r in weighted_sample(docs, n=50, weight_col="w",
                                                  seed=6).collect()}
    assert other != {r["doc_id"] for r in rows}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines and all("], [], [" not in ln for ln in win_lines), plan[:2000]
    with pytest.raises(ValueError):
        weighted_sample(docs, n=0)
    # constant weights degenerate to an unbiased uniform draw: scaling the
    # weight leaves the priority ORDER unchanged (u/w monotone in u), so
    # the member set is weight-scale-invariant
    const7 = spark.createDataFrame([(i, 7) for i in range(100)],
                                   "doc_id long, w int")
    const9 = spark.createDataFrame([(i, 9) for i in range(100)],
                                   "doc_id long, w int")
    w7 = {r["doc_id"] for r in weighted_sample(const7, n=10, weight_col="w",
                                               seed=3).collect()}
    w9 = {r["doc_id"] for r in weighted_sample(const9, n=10, weight_col="w",
                                               seed=3).collect()}
    assert w7 == w9


def test_knn_graph_ranks_self_exclusion_and_edges(spark):
    """Top-k neighbors per vector within its cell: self never appears,
    ranks are (cosine desc, id asc), a vector alone in its cell emits no
    rows, k > cell size degrades to cell size - 1, and the fast BLAS
    kernel matches the bit-exact fold after rounding."""
    import pytest

    from opentsdb_spark.pipeline.similarity import knn_graph

    # two well-separated cells via explicit centroids: e1-ish and e2-ish
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.1, 0.0]),   # cell 0
            (2, [1.0, 0.2, 0.0]),   # cell 0
            (3, [0.9, 0.0, 0.1]),   # cell 0
            (4, [0.0, 1.0, 0.0]),   # cell 1 — alone
        ],
        "vec_id long, embedding array<double>",
    )
    out = knn_graph(emb, k=2, centroids=cents, bit_exact=True)
    rows = {(r["vec_id"], r["nbr_rank"]): r for r in out.collect()}
    # vec 4 alone in cell 1 -> no rows; cell 0 has 3 vectors -> 2 nbrs each
    assert len(rows) == 6
    assert all(vid != rows[(vid, rk)]["nbr_id"] for vid, rk in rows)
    # 1 and 2 are near-parallel; both rank each other first
    assert rows[(1, 1)]["nbr_id"] == 2
    assert rows[(2, 1)]["nbr_id"] == 1
    assert all(r["cell"] == 0 for r in rows.values())
    # rank order is strictly decreasing cosine (ties broken by id asc)
    for vid in (1, 2, 3):
        assert rows[(vid, 1)]["cosine"] >= rows[(vid, 2)]["cosine"]
    # k larger than any cell: every vector still emits cell_size-1 rows
    assert knn_graph(emb, k=10, centroids=cents, bit_exact=True).count() == 6
    # fast kernel == bit-exact kernel after the catalog's 4-decimal round
    fast = {(r["vec_id"], r["nbr_rank"], r["nbr_id"], round(r["cosine"], 4))
            for r in knn_graph(emb, k=2, centroids=cents).collect()}
    exact = {(r["vec_id"], r["nbr_rank"], r["nbr_id"], round(r["cosine"], 4))
             for r in out.collect()}
    assert fast == exact
    with pytest.raises(ValueError):
        knn_graph(emb, k=0, centroids=cents)


def test_knn_graph_clone_collapse_matches_bruteforce(spark):
    """Bit-identical vectors collapse to one kernel row and expand after:
    the output must equal a per-member brute-force (cosine desc, id asc)
    top-k over the whole cell — clique-internal neighbors (diagonal
    cosine), cross-clique ties interleaved by member id, zero-norm NaN
    partners ranking last, and k spilling past a clique boundary."""
    import math

    from opentsdb_spark.pipeline.similarity import knn_graph

    base = [
        [1.0, 0.0, 0.0],
        [1.0, 0.1, 0.0],
        [0.9, 0.0, 0.1],
        [0.0, 0.0, 0.0],   # zero-norm: its own sentinel cell, NaN cosines
    ]
    # 3 exact clones of each vector, interleaved ids so clique ids are
    # NOT contiguous (id tiebreaks must interleave across cliques)
    rows = [(j * 4 + b, v) for b, v in enumerate(base) for j in range(3)]
    emb = spark.createDataFrame(sorted(rows),
                                "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0, 0.0]]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na * nb > 0 else float("nan")

    # candidates are per CELL: zero-norm vectors sit in their own
    # sentinel cell (NaN argmax), everything else in cell 0
    def cell_of(v):
        return 0 if any(v) else -1

    for k in (2, 5, 11):
        got = sorted(
            (r["vec_id"], r["nbr_rank"], r["nbr_id"],
             # NaN cosines surface as NULL through the Arrow batch (pandas
             # float64 NaN = missing) — the operator's long-standing shape
             None if r["cosine"] is None or math.isnan(r["cosine"])
             else round(r["cosine"], 9))
            for r in knn_graph(emb, k=k, centroids=cents,
                               bit_exact=True).collect())
        want = []
        for i, vi in sorted(rows):
            cands = sorted(
                ((j, cos(vi, vj)) for j, vj in sorted(rows)
                 if j != i and cell_of(vj) == cell_of(vi)),
                key=lambda t: (-(t[1] if t[1] == t[1] else float("-inf")),
                               t[0]))
            for rk, (j, c) in enumerate(cands[:k], 1):
                want.append((i, rk, j, None if c != c else round(c, 9)))
        assert got == sorted(want), f"k={k}"


def test_knn_graph_subdivision_bounds_cells(spark):
    """Past max_cell the cell subdivides on hyperplane sign bits: pairs
    never cross a subcell, so every neighbor row's endpoints share a
    subcell — and the graph still covers (almost) every vector."""
    from opentsdb_spark.pipeline.similarity import knn_graph

    # 64 vectors, ONE centroid -> one cell of 64 > max_cell=16 -> subdivide
    import random

    rnd = random.Random(7)
    vecs = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(64)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = [[1.0] + [0.0] * 7]
    out = knn_graph(emb, k=2, centroids=cents, max_cell=16).collect()
    assert out  # graph non-empty
    # k-NN lists are per-subcell: at most 2 rows per vector, all cell 0
    from collections import Counter

    per_vec = Counter(r["vec_id"] for r in out)
    assert all(c <= 2 for c in per_vec.values())
    assert all(r["cell"] == 0 for r in out)


def test_scene_cuts_detects_transitions(spark):
    """Repeated frames give zero delta (no cut); a content flip past the
    threshold starts a new shot; first frame is never a cut; shot ids
    accumulate per video."""
    from opentsdb_spark.pipeline.multimodal import docs_as_raw_video, scene_cuts

    w, h, nf = 12, 8, 4
    # frame A: strong left-to-right ascending gradient per row;
    # frame B: descending — dHash bit patterns are near-complements
    row_a = "".join(chr(32 + c * 7) for c in range(w))
    row_b = "".join(chr(32 + (w - 1 - c) * 7) for c in range(w))
    fa, fb = row_a * h, row_b * h
    text = fa + fa + fb + fa  # A A B A -> cuts at frames 2 and 3
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    media = docs_as_raw_video(docs, w, h, nf, frame_ms=100)
    out = {r["frame_idx"]: r for r in
           scene_cuts(media, every_ms=100, threshold=16).collect()}
    assert len(out) == nf
    assert out[0]["hamming_prev"] is None and out[0]["is_cut"] is False
    assert out[1]["hamming_prev"] == 0 and out[1]["is_cut"] is False
    assert out[2]["hamming_prev"] >= 16 and out[2]["is_cut"] is True
    assert out[3]["is_cut"] is True
    assert [out[i]["shot_id"] for i in range(4)] == [0, 0, 1, 2]


def test_shot_keyframes_argmax_detail_ties_earliest(spark):
    """Each shot reduces to its max-gradient-detail (dHash popcount)
    frame; equal-detail ties break toward the EARLIEST frame; shot spans
    and frame counts are exact."""
    from opentsdb_spark.pipeline.multimodal import (
        docs_as_raw_video, shot_keyframes)

    w, h, nf = 12, 8, 4
    # busy: full ascending gradient (many dhash bits); mild: only the
    # first column steps (few bits); flip: descending (a cut vs both)
    busy = "".join(chr(32 + c * 7) for c in range(w)) * h
    mild = ("".join(chr(40 if c == 0 else 50) for c in range(w))) * h
    flip = "".join(chr(32 + (w - 1 - c) * 7) for c in range(w)) * h
    # shots: [mild, busy] (delta below threshold? no — mild->busy is a
    # big flip too). Use [busy, busy] then [flip, flip]: shot 0 has an
    # exact detail TIE (earliest wins), shot 1 likewise.
    docs = spark.createDataFrame(
        [(1, busy + busy + flip + flip), (2, mild + busy + busy + busy)],
        "doc_id long, text string")
    media = docs_as_raw_video(docs, w, h, nf, frame_ms=100)
    out = {(r["media_id"], r["shot_id"]): r for r in
           shot_keyframes(media, every_ms=100, threshold=16).collect()}
    v1s0, v1s1 = out[(1, 0)], out[(1, 1)]
    assert (v1s0["n_frames"], v1s0["start_frame"], v1s0["end_frame"]) == (2, 0, 1)
    assert v1s0["key_frame"] == 0  # tie -> earliest
    assert (v1s1["n_frames"], v1s1["key_frame"]) == (2, 2)
    # video 2: mild then busy busy busy — mild->busy is a cut, so shot 1
    # holds the three busy frames and its keyframe is the earliest busy
    # frame with max detail
    assert out[(2, 0)]["key_frame"] == 0 and out[(2, 0)]["n_frames"] == 1
    s21 = out[(2, 1)]
    assert s21["n_frames"] == 3 and s21["key_frame"] == 1
    assert s21["key_detail"] > out[(2, 0)]["key_detail"]


def test_audio_keyclips_loudest_window_per_segment(spark):
    """Each activity segment reduces to its max mean-energy window, ties
    to the earliest; spans and counts match audio_activity_segments."""
    import struct as _struct

    from opentsdb_spark.pipeline.multimodal import (
        audio_activity_segments, audio_keyclips)

    # 16 samples -> 8 windows of 2: quiet(1) x2 | loud(100,200) | loud
    # (200,100) | quiet x2 | loud(300) | quiet x2
    samples = [1, 1, 1, 1, 100, 200, 200, 100, 1, 1, 1, 1, 300, 300, 1, 1]
    blob = _struct.pack("<16h", *samples)
    media = spark.createDataFrame(
        [(1, "audio", bytearray(blob))],
        "media_id long, kind string, media binary")
    segs = {r["segment_id"]: r for r in
            audio_activity_segments(media, n_windows=8).collect()}
    keys = {r["segment_id"]: r for r in
            audio_keyclips(media, n_windows=8).collect()}
    assert set(keys) == set(segs)
    for sid, k in keys.items():
        s = segs[sid]
        assert (k["n_win"], k["start_win"], k["end_win"]) == \
            (s["n_win"], s["start_win"], s["end_win"])
        assert s["start_win"] <= k["key_win"] <= s["end_win"]
    # segment over windows 2-3: energies (100^2+200^2)/2 == (200^2+100^2)/2
    # -> exact tie, earliest window (2) wins
    two = [k for k in keys.values() if k["start_win"] == 2]
    assert two and two[0]["key_win"] == 2
    # the lone loud window 6 is its own keyclip
    lone = [k for k in keys.values() if k["start_win"] == 6]
    assert lone and lone[0]["key_win"] == 6 and lone[0]["key_mean_sq"] == 300.0 ** 2


def test_knn_density_mean_of_neighbor_cosines(spark):
    """knn_density = mean cosine over the vector's knn_graph rows; lone
    vectors emit no row; crowded vectors score higher than isolated ones."""
    from opentsdb_spark.pipeline.similarity import knn_density, knn_graph

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.01, 0.0]), (2, [1.0, 0.02, 0.0]),  # tight pair
            (3, [0.6, 0.0, 0.8]),                          # same cell, far
            (4, [0.0, 1.0, 0.0]),                          # alone in cell 1
        ],
        "vec_id long, embedding array<double>",
    )
    dens = {r["vec_id"]: r for r in
            knn_density(emb, k=2, centroids=cents, bit_exact=True).collect()}
    assert set(dens) == {1, 2, 3}
    g = knn_graph(emb, k=2, centroids=cents, bit_exact=True).collect()
    import statistics

    for vid in (1, 2, 3):
        manual = statistics.mean(r["cosine"] for r in g if r["vec_id"] == vid)
        assert abs(dens[vid]["knn_density"] - manual) < 1e-12
        assert dens[vid]["n_neighbors"] == 2
    # the tight pair is denser than the outlier
    assert dens[1]["knn_density"] > dens[3]["knn_density"]


def test_zipf_alpha_fits_known_distribution(spark):
    """A corpus manufactured to follow tf(rank) = C * rank^-alpha recovers
    alpha from the OLS fit; a flat-frequency corpus fits alpha ~ 0; groups
    below 3 ranked tokens yield NULL."""
    import pytest

    from opentsdb_spark.pipeline.text import zipf_alpha

    # exact power law, alpha = 1: token t_r appears round(1200/r) times
    toks = []
    for r in range(1, 21):
        toks.extend([f"t{r:02d}"] * round(1200 / r))
    docs = spark.createDataFrame(
        [(1, "zipf", " ".join(toks)), (2, "flat", "a b c d e f g h"),
         (3, "tiny", "x y")],
        "doc_id long, lang string, text string",
    )
    out = {r["lang"]: r for r in zipf_alpha(docs, k=20).collect()}
    assert out["zipf"]["n_ranks"] == 20
    assert abs(out["zipf"]["alpha"] - 1.0) < 0.02  # rounding of counts only
    assert abs(out["flat"]["alpha"]) < 1e-9
    assert out["tiny"]["alpha"] is None and out["tiny"]["n_ranks"] == 2
    # intercept ~ ln(1200) for the power-law corpus
    import math

    assert abs(out["zipf"]["intercept"] - math.log(1200)) < 0.05
    with pytest.raises(ValueError):
        zipf_alpha(docs, k=2)


def test_embedding_drift_shares_and_direction(spark):
    """Identical snapshots: share_delta 0 and mean_cosine 1 everywhere.
    A direction flip in one cell shows cosine -1 there; one-sided cells
    survive the outer join with NULL cosine; shares sum to 1 per side."""
    from opentsdb_spark.pipeline.similarity import embedding_drift

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    a = spark.createDataFrame(
        [(1, [1.0, 0.1, 0.0]), (2, [1.0, 0.2, 0.0]), (3, [0.1, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    same = {r["cell"]: r for r in
            embedding_drift(a, a, centroids=cents, dim=3).collect()}
    assert set(same) == {0, 1}
    for r in same.values():
        assert abs(r["share_delta"]) < 1e-12
        assert abs(r["mean_cosine"] - 1.0) < 1e-12
    assert abs(sum(r["share_a"] for r in same.values()) - 1.0) < 1e-12
    # b: cell-0 direction rotates (same cell, different mean), cell-1
    # empties, cell-2 appears
    b = spark.createDataFrame(
        [(4, [1.0, -0.1, 0.0]), (5, [1.0, -0.2, 0.0]), (6, [0.0, 0.1, 1.0])],
        "vec_id long, embedding array<double>",
    )
    drift = {r["cell"]: r for r in
             embedding_drift(a, b, centroids=cents, dim=3).collect()}
    assert set(drift) == {0, 1, 2}
    # mean_a = [1, .15, 0], mean_b = [1, -.15, 0] -> cos = .9775/1.0225
    assert abs(drift[0]["mean_cosine"] - 0.9775 / 1.0225) < 1e-12
    assert drift[1]["n_b"] == 0 and drift[1]["mean_cosine"] is None
    assert drift[2]["n_a"] == 0 and drift[2]["mean_cosine"] is None
    assert abs(drift[1]["share_delta"] + 1 / 3) < 1e-12
    assert abs(drift[2]["share_delta"] - 1 / 3) < 1e-12
    # dim derives from the centroid width; an explicit mismatch raises
    # instead of silently truncating / NULL-padding (ADVICE r9)
    derived = {r["cell"]: r for r in
               embedding_drift(a, b, centroids=cents).collect()}
    assert {c: r["mean_cosine"] for c, r in derived.items()} == \
           {c: r["mean_cosine"] for c, r in drift.items()}
    with pytest.raises(ValueError, match="centroid width"):
        embedding_drift(a, b, centroids=cents, dim=64)


def test_pmi_collocations_rank_strong_pairs_first(spark):
    """A bigram that always co-occurs outranks frequent-but-independent
    pairs; min_count filters hapax pairs; ordering and counts are exact."""
    import math

    import pytest

    from opentsdb_spark.pipeline.text import pmi_collocations

    # 'new york' always adjacent (8x); 'the cat'/'the dog' frequent but
    # 'the' is promiscuous; 'rare gem' appears once (dropped by min_count)
    docs = spark.createDataFrame(
        [(i, "new york the cat the dog rare" if i == 0 else "new york the cat the dog")
         for i in range(8)],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, k=10, min_count=2).collect()
    assert out[0]["w1"] == "new" and out[0]["w2"] == "york"
    assert out[0]["n_pair"] == 8 and out[0]["n_w1"] == 8
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("dog", "rare") not in pairs  # hapax pair dropped by min_count
    assert all(out[i]["pmi"] >= out[i + 1]["pmi"] for i in range(len(out) - 1))
    # verify the exact formula on the top row against a python recount
    r = out[0]
    from collections import Counter

    toks = []
    for i in range(8):
        toks.extend(("new york the cat the dog rare" if i == 0
                     else "new york the cat the dog").split())
    U = len(toks)
    c = Counter(toks)
    bigs = Counter()
    docs_toks = [("new york the cat the dog rare" if i == 0
                  else "new york the cat the dog").split() for i in range(8)]
    for dt in docs_toks:
        for a, b in zip(dt, dt[1:]):
            bigs[(a, b)] += 1
    Tm = sum(bigs.values())
    want = math.log((8 / Tm) / ((c["new"] / U) * (c["york"] / U)))
    assert abs(r["pmi"] - want) < 1e-12
    with pytest.raises(ValueError):
        pmi_collocations(docs, k=0)


def test_audio_activity_segments_islands(spark):
    """Loud-quiet-loud clip yields two segments at the right windows; a
    flat clip is one wall-to-wall segment; short/malformed clips emit
    nothing; segment stats are exact."""
    import numpy as np
    import pytest

    from opentsdb_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, audio_activity_segments,
    )

    def clip(vals):
        return bytearray(np.asarray(vals, dtype="<i2").tobytes())

    # 64 samples, 8 windows of 8: windows 0-2 loud (1000), 3-5 quiet (10),
    # 6-7 loud again -> clip mean-square between the two levels
    loud, quiet = [1000] * 8, [10] * 8
    v = loud * 3 + quiet * 3 + loud * 2
    rows = [
        (1, "audio", clip(v), ("audio/x-raw-s16le", None, None, 1)),
        (2, "audio", clip([7] * 64), ("audio/x-raw-s16le", None, None, 1)),
        (3, "audio", clip([1, 2, 3]), ("audio/x-raw-s16le", None, None, 1)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = audio_activity_segments(media, n_windows=8).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    # clip 1: two islands, windows 0-2 and 6-7
    segs = sorted(by_media[1], key=lambda r: r["start_win"])
    assert len(segs) == 2
    assert (segs[0]["start_win"], segs[0]["end_win"], segs[0]["n_win"]) == (0, 2, 3)
    assert (segs[1]["start_win"], segs[1]["end_win"], segs[1]["n_win"]) == (6, 7, 2)
    assert abs(segs[0]["mean_sq"] - 1000.0 ** 2) < 1e-9
    # flat clip: every window equals the mean -> one full-width segment
    flat = by_media[2]
    assert len(flat) == 1 and (flat[0]["start_win"], flat[0]["end_win"]) == (0, 7)
    # clip shorter than n_windows: no rows
    assert 3 not in by_media
    with pytest.raises(ValueError):
        audio_activity_segments(media, n_windows=1)


def test_pq_encode_and_adc_topk_match_bruteforce(spark):
    """PQ codes equal the per-subspace L2 argmin (first-min ties -> the
    LOWEST centroid index, pinned with a duplicate-centroid codebook),
    and ADC top-k equals the brute-force table-lookup ranking (adc asc,
    id asc) computed in plain python."""
    from opentsdb_spark.pipeline.similarity import (
        pq_adc_topk, pq_codebooks, pq_encode)

    # tie pin: both centroids of subspace 1 identical -> code must be 0
    books_tie = [
        [[1.0, 0.0], [0.0, 1.0]],
        [[0.5, 0.5], [0.5, 0.5]],
    ]
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 1.0]), (1, [0.0, 1.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>")
    codes = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(emb, books_tie).collect()}
    assert codes == {0: [0, 0], 1: [1, 0]}

    # randomish corpus vs python replay, seeded books
    import random
    rnd = random.Random(3)
    dim, m, nc = 8, 4, 4
    books = pq_codebooks(m=m, k=nc, dim=dim, seed=7)
    vecs = [(i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(30)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    sub = dim // m

    def enc(v):
        out = []
        for j in range(m):
            dists = []
            for c in range(nc):
                acc = 0.0
                for d in range(sub):
                    diff = v[j * sub + d] - books[j][c][d]
                    acc = acc + diff * diff
                dists.append(acc)
            out.append(dists.index(min(dists)))
        return out

    got_codes = {r["vec_id"]: list(r["codes"])
                 for r in pq_encode(emb, books).collect()}
    assert got_codes == {i: enc(v) for i, v in vecs}

    qs = [(i, v) for i, v in vecs if i < 2]
    q = spark.createDataFrame(qs, "query_id long, embedding array<double>")
    got = sorted((r["query_id"], r["rank"], r["vec_id"], round(r["adc"], 9))
                 for r in pq_adc_topk(pq_encode(emb, books), q, books,
                                      k=3).collect())
    want = []
    for qi, qv in qs:
        dt = [[0.0] * nc for _ in range(m)]
        for j in range(m):
            for c in range(nc):
                acc = 0.0
                for d in range(sub):
                    diff = qv[j * sub + d] - books[j][c][d]
                    acc = acc + diff * diff
                dt[j][c] = acc
        scored = []
        for i, v in vecs:
            cs = enc(v)
            adc = 0.0
            for j in range(m):
                adc = adc + dt[j][cs[j]]
            scored.append((adc, i))
        scored.sort()
        want += [(qi, rk, i, round(adc, 9))
                 for rk, (adc, i) in enumerate(scored[:3], 1)]
    assert got == sorted(want)


def test_incremental_components_untouched_pass_through(spark):
    """Components untouched by the new edges keep their labels verbatim
    (never re-shuffled into the star rounds); a new edge merging two old
    components relabels BOTH to the joint min; brand-new nodes appear."""
    from opentsdb_spark.pipeline.cluster import incremental_components

    prev = spark.createDataFrame(
        # comp {1,2,3} labeled 1; comp {10,11} labeled 10; singleton 20
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
        "id long, component long")
    new_pairs = spark.createDataFrame(
        [(3, 10),    # merges comp 1 and comp 10
         (30, 31)],  # brand-new clique
        "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in incremental_components(prev, new_pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1,   # merged under min 1
                   20: 20,                            # untouched singleton
                   30: 30, 31: 30}                    # new clique


def test_ivf_pq_topk_composes_probe_and_adc(spark):
    """IVF-PQ = probe pruning x ADC ranking: with ALL cells probed it
    must equal plain pq_adc_topk (pruning off, same ADC order); with few
    probes every neighbor still comes from a probed cell, ranks are
    dense per query, and the index never returns self-exclusions it was
    not asked for (self-match allowed, like brute force)."""
    import random

    from opentsdb_spark.pipeline.similarity import (
        ivf_pq_topk, pq_adc_topk, pq_codebooks, pq_encode, seeded_centroids)

    rnd = random.Random(11)
    dim, m, nc, ncent = 8, 4, 4, 4
    books = pq_codebooks(m=m, k=nc, dim=dim, seed=5)
    cents = seeded_centroids(ncent, dim, 5)
    vecs = [(i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(40)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = emb.where("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding")
    # all cells probed == exhaustive ADC
    full = sorted(map(tuple, ivf_pq_topk(
        emb, q, codebooks=books, k=3, n_centroids=ncent, n_probe=ncent,
        centroids=cents, dim=dim).collect()))
    flat = sorted(map(tuple, pq_adc_topk(
        pq_encode(emb, books), q, books, k=3).collect()))
    assert full == flat and full
    # pruned probes: dense ranks, subset-of-probed-cells candidates
    pruned = ivf_pq_topk(emb, q, codebooks=books, k=3, n_centroids=ncent,
                         n_probe=1, centroids=cents, dim=dim).collect()
    by_q = {}
    for r in pruned:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_route_order_by_decimal_precision_gate(spark):
    """DecimalType routes into the quality path only up to precision 15:
    beyond that, distinct decimals can exceed double's 53-bit mantissa
    and collapse under the cast, so the quantized tiebreak could diverge
    from the exact window sort (advisor finding). Low-precision decimals
    still route."""
    from pyspark.sql import types as T

    from opentsdb_spark.pipeline.sampling import (
        _cast_to_double_is_order_faithful, _route_order_by_to_quality)

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lo", T.DecimalType(15, 4)),
        T.StructField("hi", T.DecimalType(38, 0)),
    ])
    assert _cast_to_double_is_order_faithful(schema, "lo")
    assert not _cast_to_double_is_order_faithful(schema, "hi")
    assert _route_order_by_to_quality(
        [F.desc("lo")], schema=schema) == ("lo", True)
    assert _route_order_by_to_quality([F.desc("hi")], schema=schema) is None


def test_band_class_pairs_expand_equals_member_pairs(spark):
    """Clone-class pairs + expansion view == band_pairs_64 member output,
    bit for bit, on a fixture with multi-member clone cliques (the k^2
    case the class form exists to avoid), a near-dup cross pair, a far
    hash and a NULL. Class rows themselves: within rows carry n*(n-1)/2,
    cross rows n_a*n_b."""
    from opentsdb_spark.pipeline.dedup import (
        _clone_members, band_class_pairs_64, band_pairs_64,
        expand_class_pairs)

    rows = [(0, 5), (1, 5), (2, 5), (3, 4), (7, 5 ^ 2), (8, -1),
            (9, None)]
    hs = spark.createDataFrame(rows, "doc_id long, h long")
    classes = band_class_pairs_64(hs, "h", max_hamming=2).collect()
    got = {(r["rep_a"], r["rep_b"]): (r["n_a"], r["n_b"], r["hamming"],
                                      r["n_pairs"]) for r in classes}
    assert got[(0, 0)] == (3, 3, 0, 3)          # clique {0,1,2}: 3 pairs
    assert got[(0, 3)] == (3, 1, 1, 3)          # 5 vs 4 = hamming 1
    assert got[(0, 7)] == (3, 1, 1, 3)          # 5 vs 5^1
    assert got[(3, 7)] == (1, 1, 2, 1)          # 4 vs 4^... = hamming 2
    assert not any(8 in k or 9 in k for k in got)
    members = _clone_members(
        hs.where(F.col("h").isNotNull()).select("doc_id", "h"),
        "doc_id", "h", persist=False)
    expanded = {(r["id_a"], r["id_b"]): r["hamming"] for r in
                expand_class_pairs(
                    band_class_pairs_64(hs, "h", max_hamming=2),
                    members).collect()}
    member = {(r["id_a"], r["id_b"]): r["hamming"] for r in
              band_pairs_64(hs, "h", max_hamming=2).collect()}
    assert expanded == member
    assert sum(v for *_, v in
               [(k, got[k][3]) for k in got]) == len(member)


def test_multimodal_class_pairs_expand_equals_member(spark):
    """dhash_class_pairs / audio_class_pairs expansion == the member-pair
    functions on real media fixtures with byte-identical clones."""
    import numpy as np

    from opentsdb_spark.pipeline.dedup import (
        _clone_members, expand_class_pairs)
    from opentsdb_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, audio_class_pairs, audio_dup_pairs, audio_fingerprint,
        dhash_class_pairs, dhash_dup_pairs, dhash_images,
        docs_as_raw_images)

    w, h = 9, 8
    base = bytes(([0, 255] * 40)[: w * h])
    flip = bytearray(base); flip[0], flip[1] = 255, 0
    rows = [(i, "image", bytearray(base), ("image/x-raw-gray8", w, h, None))
            for i in range(3)]  # 3-clone clique
    rows += [(3, "image", bytearray(flip), ("image/x-raw-gray8", w, h, None)),
             (4, "image", None, ("image/x-raw-gray8", w, h, None))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    cls = {(r["rep_a"], r["rep_b"]): (r["n_a"], r["n_b"], r["n_pairs"])
           for r in dhash_class_pairs(media, max_hamming=3).collect()}
    assert cls[(0, 0)] == (3, 3, 3) and cls[(0, 3)] == (3, 1, 3)
    members = _clone_members(
        dhash_images(media).where(F.col("dhash").isNotNull()),
        "media_id", "dhash", persist=False)
    expanded = {(r["id_a"], r["id_b"]): r["hamming"] for r in
                expand_class_pairs(dhash_class_pairs(media, max_hamming=3),
                                   members, id_col="media_id").collect()}
    member = {(r["id_a"], r["id_b"]): r["hamming"] for r in
              dhash_dup_pairs(media, max_hamming=3).collect()}
    assert expanded == member and (0, 1) in member

    rng = np.random.RandomState(3)
    sig = rng.randint(-3000, 3000, 130, dtype="<i2")
    near = sig.copy(); near[:2] -= 20000
    arows = [(i, "audio", bytearray(sig.tobytes()),
              ("audio/x-raw-s16le", None, None, 1)) for i in range(2)]
    arows += [(2, "audio", bytearray(near.tobytes()),
               ("audio/x-raw-s16le", None, None, 1)),
              (3, "audio", bytearray(np.zeros(130, dtype="<i2").tobytes()),
               ("audio/x-raw-s16le", None, None, 1))]
    amedia = spark.createDataFrame(arows, MEDIA_SCHEMA)
    amembers = _clone_members(
        audio_fingerprint(amedia).where(
            F.col("afp").isNotNull() & (F.col("afp") != 0)),
        "media_id", "afp", persist=False)
    aexp = {(r["id_a"], r["id_b"]): r["hamming"] for r in
            expand_class_pairs(audio_class_pairs(amedia, max_hamming=3),
                               amembers, id_col="media_id").collect()}
    amember = {(r["id_a"], r["id_b"]): r["hamming"] for r in
               audio_dup_pairs(amedia, max_hamming=3).collect()}
    assert aexp == amember and (0, 1) in amember


def test_frame_class_pairs_expand_equals_member(spark):
    """frame_class_pairs: the repeated-still clique {(0,0),(0,2),(1,0)}
    collapses to ONE within-class row carrying its 3 member pairs, and
    expanding the class frame over the packed-fid membership reproduces
    frame_dup_pairs exactly."""
    from opentsdb_spark.pipeline.dedup import (
        _clone_members, expand_class_pairs)
    from opentsdb_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, dhash_frames, frame_class_pairs, frame_dup_pairs,
        sample_frames)

    busy = bytes([10, 200, 30, 90])
    other = bytes([200, 10, 90, 250])
    flat = bytes([9] * 4)
    rows = [
        (0, "video", bytearray(busy + flat + busy), ("video/x-raw-gray8", 2, 2, 300)),
        (1, "video", bytearray(busy + flat + other), ("video/x-raw-gray8", 2, 2, 300)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    cls = {((r["media_a"], r["frame_a"]), (r["media_b"], r["frame_b"])):
           (r["n_a"], r["n_b"], r["hamming"], r["n_pairs"])
           for r in frame_class_pairs(media, 100, max_hamming=0).collect()}
    # one within-class row for the 3-member clique, rep = min fid (0,0)
    assert cls == {((0, 0), (0, 0)): (3, 3, 0, 3)}
    members = _clone_members(
        dhash_frames(sample_frames(media, 100))
        .where(F.col("dhash").isNotNull() & (F.col("dhash") != 0))
        .select((F.col("media_id") * 65536 + F.col("frame_idx")).alias("fid"),
                "dhash").distinct(),
        "fid", "dhash", persist=False)
    packed_cls = frame_class_pairs(media, 100, max_hamming=0).select(
        (F.col("media_a") * 65536 + F.col("frame_a")).alias("rep_a"),
        (F.col("media_b") * 65536 + F.col("frame_b")).alias("rep_b"),
        "hamming")
    expanded = {(r["id_a"] // 65536, r["id_a"] % 65536,
                 r["id_b"] // 65536, r["id_b"] % 65536): r["hamming"]
                for r in expand_class_pairs(packed_cls, members,
                                            id_col="fid").collect()}
    member = {(r["media_a"], r["frame_a"], r["media_b"], r["frame_b"]):
              r["hamming"]
              for r in frame_dup_pairs(media, 100, max_hamming=0).collect()}
    assert expanded == member


def test_candidate_stage_hot_key_state_bounded(spark):
    """Round-14 guard: the max_df / max_bucket candidate stages must never
    materialize an over-cap key's member list. A synthetic hot gram with
    10^6 occurrences under max_df=50 (and a hot band bucket under
    max_bucket=50) must complete with exactly the under-cap pairs, and the
    collect-carrying aggregate must sit ABOVE the anti-join that drops the
    hot key — count first, collect second — so the hot list is never
    gathered into one task's aggregation buffer."""
    from pyspark.sql import functions as F

    from opentsdb_spark.pipeline.dedup import (
        _band_pairs_direct, _gram_index_verify)

    n = 1_000_000
    # every doc carries gram "hot" (df = 10^6 >> 50); docs 0 and 1 also
    # share "pair" (df=2): sets {hot, pair, u0} vs {hot, pair, u1} have
    # jaccard 2/4 = 0.5 — but the only KEPT shared gram is "pair"
    g = spark.range(n).select(
        F.col("id").cast("long").alias("doc_id"),
        F.array(
            F.lit("hot"),
            F.when(F.col("id") < 2, F.lit("pair"))
            .otherwise(F.concat(F.lit("p"), F.col("id"))),
            F.concat(F.lit("u"), F.col("id")),
        ).alias("grams"),
    )
    out = _gram_index_verify(g, threshold=0.4, max_df=50, id_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, "over-cap grams must be dropped by anti-join"
    assert "collect_list" in plan
    rows = out.collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in rows] == [(0, 1, 0.5)]

    m = 60_000
    # hash = id << 16 | 0xFFFF: band 0 (low 16 bits) is one hot bucket of
    # 60k members, bands 2-3 are the all-zero hot bucket, band 1 is unique
    # per id — plus two extra rows sharing band-1 bucket 123 at hamming 2
    hs = spark.range(m).select(
        F.col("id").alias("vid"),
        (F.shiftleft(F.col("id"), 16) + F.lit(0xFFFF)).alias("h"),
    ).unionByName(spark.createDataFrame(
        [(m, (123 << 16) | 0x0001), (m + 1, (123 << 16) | 0x0002)],
        "vid long, h long"))
    pairs = _band_pairs_direct(hs, "h", "vid", max_hamming=2, max_bucket=50)
    plan_b = pairs._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan_b
    assert "collect_list" in plan_b
    got = [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()]
    assert got == [(m, m + 1, 2)]
