"""Edge-case unit tests for the repetition-ratio and decontamination
operators (the oracle-differential gate covers the fixture-scale happy
path; these pin the boundary semantics on hand-built inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fortisiem_clickhouse_monitor_spark.functions import textfns


def _ratio_frame(spark, rows):
    d = spark.createDataFrame(rows, "doc_id long, text string")
    counts = (
        d.repartition("doc_id")
        .select("doc_id", F.explode(textfns.tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_word_ratio"),
        F.round(1.0 - F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias(
            "dup_token_ratio"
        ),
    )


class TestRepetitionRatio:
    def test_all_same_token(self, spark):
        row = _ratio_frame(spark, [(1, "x x x x")]).collect()[0]
        assert row["top_word_ratio"] == 1.0
        assert row["dup_token_ratio"] == 0.75

    def test_all_distinct(self, spark):
        row = _ratio_frame(spark, [(1, "a b c d")]).collect()[0]
        assert row["top_word_ratio"] == 0.25
        assert row["dup_token_ratio"] == 0.0

    def test_single_token_doc(self, spark):
        row = _ratio_frame(spark, [(1, "only")]).collect()[0]
        assert row["top_word_ratio"] == 1.0
        assert row["dup_token_ratio"] == 0.0

    def test_empty_text_yields_no_row(self, spark):
        # tokens("") == [] -> explode drops the doc entirely, matching the
        # oracle's unnest-of-empty-list behavior.
        assert _ratio_frame(spark, [(1, "   ")]).count() == 0


class TestDecontamination:
    def test_shared_shingle_flagged_once_per_distinct(self, spark):
        rows = [
            (1, "src0", "a b c d"),          # eval: shingles {a b c, b c d}
            (2, "src1", "a b c x a b c"),    # train: hits 'a b c' (distinct once)
            (3, "src1", "z z z z"),          # train: no overlap
        ]
        d = spark.createDataFrame(rows, "doc_id long, source string, text string")
        sh = d.select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(textfns.shingles(textfns.tokens("text"), 3))
            ).alias("s"),
        )
        ev = (
            sh.filter(F.col("source") == "src0")
            .select(F.col("s").alias("es"))
            .distinct()
        )
        out = (
            sh.filter(F.col("source") != "src0")
            .join(F.broadcast(ev), F.col("s") == F.col("es"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        got = {r["doc_id"]: r["n"] for r in out}
        assert got == {2: 1}

    def test_short_docs_cannot_contaminate(self, spark):
        rows = [(1, "src0", "a b"), (2, "src1", "a b")]
        d = spark.createDataFrame(rows, "doc_id long, source string, text string")
        sh = d.select(
            "doc_id",
            F.explode(
                F.array_distinct(textfns.shingles(textfns.tokens("text"), 3))
            ).alias("s"),
        )
        assert sh.count() == 0


class TestDsirSelect:
    def test_target_like_docs_outrank_alien_docs(self, spark, monkeypatch):
        """A doc written in the target slice's vocabulary must score a
        higher importance weight than a doc of out-of-distribution
        tokens, regardless of its own label."""
        import fortisiem_clickhouse_monitor_spark.operators.corpus as cp

        en = "the cat sat on the mat and the dog ran in the park"
        rows = [
            (1, en, "en", "s", len(en)),
            (2, "the dog sat on the mat near the park", "en", "s", 36),
            # unlabeled docs: 3 reuses target vocabulary, 4 is alien
            (3, "the cat ran in the park", "xx", "s", 23),
            (4, "zzz qqq vvv kkk jjj www", "xx", "s", 23),
        ]
        docs = spark.createDataFrame(
            rows,
            schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
        )
        monkeypatch.setattr(cp, "table", lambda s, d, n: docs)
        out = {r["doc_id"]: r for r in cp.corpus_dsir_select(spark, "x").collect()}
        assert set(out) == {1, 2, 3, 4}  # K=200 keeps all four
        assert out[3]["weight"] > out[4]["weight"]
        # per-doc feature count = unigrams + bigrams
        assert out[4]["n_feats"] == 6 + 5


class TestBpeMergePairs:
    def test_planted_pair_counts(self, spark, monkeypatch):
        """'abab' x3 + 'cd' x1: pair 'ab' appears twice per 'abab'
        occurrence (positions 1 and 3), 'ba' once, 'cd' once."""
        import fortisiem_clickhouse_monitor_spark.operators.corpus as cp

        rows = [
            (1, "abab abab cd", "en", "s", 12),
            (2, "abab", "en", "s", 4),
        ]
        docs = spark.createDataFrame(
            rows,
            schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
        )
        monkeypatch.setattr(cp, "table", lambda s, d, n: docs)
        out = {r["pair"]: r["n"] for r in cp.vocab_bpe_merge_pairs(spark, "x").collect()}
        # token 'abab' freq 3 -> pairs ab(x2 per token), ba(x1 per token)
        assert out["ab"] == 6
        assert out["ba"] == 3
        assert out["cd"] == 1


class TestCurriculumDeciles:
    def test_deciles_are_deterministic_and_ordered(self, spark, monkeypatch):
        import fortisiem_clickhouse_monitor_spark.operators.curation as cu

        # 20 docs in one lang with strictly increasing stopword density
        rows = [
            (i, " ".join(["the"] * i + ["zz"] * (20 - i)), "en", "s", 40)
            for i in range(1, 21)
        ]
        docs = spark.createDataFrame(
            rows,
            schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
        )
        monkeypatch.setattr(cu, "table", lambda s, d, n: docs)
        out = {r["doc_id"]: r["decile"] for r in
               cu.curriculum_quality_deciles(spark, "x").collect()}
        # 20 docs / 10 deciles -> 2 per decile, ordered by score=doc density
        assert out[1] == 1 and out[2] == 1
        assert out[19] == 10 and out[20] == 10
        assert sorted(out.values()) == [d for d in range(1, 11) for _ in (0, 1)]


def test_train_val_test_split_deterministic_partition(spark):
    """The split is an exhaustive, disjoint, deterministic partition of
    the corpus: one row per doc, split consistent with the hash bucket,
    identical across runs, and all three splits non-degenerate."""
    from fortisiem_clickhouse_monitor_spark.operators.corpus import (
        _SPLIT_TRAIN,
        _SPLIT_VAL,
        corpus_train_val_test_split,
    )
    from conftest import SF_SMALL

    rows = corpus_train_val_test_split(spark, SF_SMALL).collect()
    again = corpus_train_val_test_split(spark, SF_SMALL).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)), "one row per document"
    for r in rows:
        if r["bucket"] < _SPLIT_TRAIN:
            assert r["split"] == "train"
        elif r["bucket"] < _SPLIT_VAL:
            assert r["split"] == "val"
        else:
            assert r["split"] == "test"
    counts = {s: 0 for s in ("train", "val", "test")}
    for r in rows:
        counts[r["split"]] += 1
    assert counts["train"] > counts["val"] > 0 and counts["test"] > 0


def test_split_by_component_is_leak_free(spark):
    """THE invariant corpus_split_by_component exists for: no verified
    near-dup pair may straddle splits once whole components are
    assigned together — and singletons keep the exact split the plain
    content-hash assignment gives them."""
    from conftest import SF_SMALL
    from fortisiem_clickhouse_monitor_spark.operators.corpus import (
        corpus_split_by_component,
        corpus_train_val_test_split,
    )
    from fortisiem_clickhouse_monitor_spark.operators.dedup import (
        dedup_minhash_lsh_pairs,
    )

    comp_split = {
        r["doc_id"]: (r["component"], r["split"])
        for r in corpus_split_by_component(spark, SF_SMALL).collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh_pairs(spark, SF_SMALL).collect()
    ]
    assert pairs, "fixture must contain verified near-dup pairs"
    for a, b in pairs:
        assert comp_split[a][1] == comp_split[b][1], (a, b)

    plain = {
        r["doc_id"]: r["split"]
        for r in corpus_train_val_test_split(spark, SF_SMALL).collect()
    }
    in_pairs = {d for p in pairs for d in p}
    singletons = [d for d, (c, _) in comp_split.items() if c == d and d not in in_pairs]
    assert singletons
    for d in singletons:
        assert comp_split[d][1] == plain[d]


def test_chunk_stitch_detects_planted_split(spark, monkeypatch):
    import fortisiem_clickhouse_monitor_spark.operators.curation as cu

    docs = spark.createDataFrame(
        [
            (1, "a b c d w x y z", "en", "s", 15),      # tail: w x y z
            (2, "w x y z e f g h", "en", "s", 15),      # head: w x y z
            (3, "p q r s t u v m", "en", "s", 15),      # unrelated
            (4, "w x y z e f g h", "en", "s", 15),      # dup of 2
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(cu, "table", lambda s, d, n: docs)
    got = {(r["doc_a"], r["doc_b"]) for r in
           cu.text_chunk_stitch_pairs(spark, "x").collect()}
    assert got == {(1, 2), (1, 4)}


def test_ngram_novelty_first_doc_is_fully_novel(spark, monkeypatch):
    import fortisiem_clickhouse_monitor_spark.operators.text as tx

    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "en", "s", 9),    # 3 shingles, all novel
            (2, "a b c d e", "en", "s", 9),    # exact dup: novelty 0
            (3, "c d e f g", "en", "s", 9),    # 'c d e' seen; 2 of 3 novel
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(tx, "table", lambda s, d, n: docs)
    out = {r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
           for r in tx.text_ngram_novelty_curve(spark, "x").collect()}
    assert out[1] == (3, 3, 1.0)
    assert out[2] == (3, 0, 0.0)
    assert out[3] == (3, 2, round(2 / 3, 4))
