"""Round-8 final-wave operators: C4-style blocklist filtering,
bloom-filter decontamination, content-defined chunking, and the KMV
distinct-count estimator."""

import pytest
from pyspark.sql import functions as F

from earthmover_spark.util import EarthmoverSparkError


# ---------------------------------------------------------------------------
# badwords_filter
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bw_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen LIQUOR jugs"),
            (3, ""),
            (4, "badword here, a second BadWord, and a spam phrase too"),
            (5, "badwords is a different token than badword-free text"),
            (6, None),
        ],
        "doc_id long, text string",
    )


def test_badwords_counts_and_ratio(spark, bw_docs):
    from earthmover_spark.llm.curation import badwords_filter

    out = {
        r.doc_id: r
        for r in badwords_filter(
            bw_docs, words=["badword", "liquor"], phrases=("spam phrase",)
        ).collect()
    }
    assert out[1].n_badwords == 0 and out[1].has_badwords is False
    # case-insensitive whole-token match
    assert out[2].n_badwords == 1 and out[2].badword_ratio == round(1 / 8, 6)
    assert out[3].n_badwords == 0 and out[3].badword_ratio == 0.0
    # two token hits (punctuation-delimited) + one phrase hit
    assert out[4].n_badwords == 3 and out[4].has_badwords is True
    # "badwords" / "badword-free" are different tokens — hyphen splits,
    # so the bare token "badword" DOES appear once in doc 5
    assert out[5].n_badwords == 1
    assert out[6].n_badwords == 0  # NULL text is clean


def test_badwords_drop_mode_and_validation(spark, bw_docs):
    from earthmover_spark.llm.curation import badwords_filter

    kept = badwords_filter(bw_docs, words=["badword"], mode="drop")
    assert kept.columns == bw_docs.columns  # annotations removed
    assert {r.doc_id for r in kept.collect()} == {1, 2, 3, 6}
    with pytest.raises(EarthmoverSparkError, match="mode"):
        badwords_filter(bw_docs, words=["x"], mode="nuke")
    with pytest.raises(EarthmoverSparkError, match="at least one"):
        badwords_filter(bw_docs, words=[])


def test_badwords_phrase_only_and_overlapping_counts(spark):
    from earthmover_spark.llm.curation import badwords_filter

    df = spark.createDataFrame(
        [(1, "aba aba aba"), (2, "clean")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in badwords_filter(df, words=[], phrases=("aba aba",)).collect()
    }
    # substring count is non-overlapping occurrences of the phrase
    assert out[1].n_badwords == 1
    assert out[1].badword_ratio == 0.0  # no word-list tokens hit
    assert out[2].n_badwords == 0


# ---------------------------------------------------------------------------
# decontaminate_bloom
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def decon_corpus(spark):
    leaked = (
        "the benchmark question asks what is the capital of france and "
        "the answer is paris obviously"
    )
    return spark.createDataFrame(
        [
            (1, leaked + " with some extra trailing chatter appended"),
            (2, "a completely unrelated document about growing tomatoes "
                "in a northern greenhouse during winter months"),
            (3, ""),
        ],
        "doc_id long, text string",
    ), spark.createDataFrame(
        [(100, leaked)], "doc_id long, text string"
    )


def test_decon_bloom_flags_planted_overlap(spark, decon_corpus):
    from earthmover_spark.llm.curation import decontaminate_bloom

    corpus, bench = decon_corpus
    out = {
        r.doc_id: r
        for r in decontaminate_bloom(
            corpus, benchmark=bench, shingle_n=8, num_bits=65536, num_hashes=4
        ).collect()
    }
    assert out[1].contaminated is True and out[1].n_flagged_ngrams >= 5
    # no false negatives by construction; FP odds at 65536 bits ~ 0
    assert out[2].contaminated is False and out[2].n_flagged_ngrams == 0
    assert out[3].contaminated is False


def test_decon_bloom_prebuilt_sketch_matches_benchmark_path(spark, decon_corpus):
    from earthmover_spark.llm.curation import decontaminate_bloom
    from earthmover_spark.llm.textstats import shingles
    from earthmover_spark.operators.sketch import bloom_sketch

    corpus, bench = decon_corpus
    grams = bench.select(
        F.explode(F.array_distinct(shingles(F.col("text"), 8))).alias("g")
    )
    sk = bloom_sketch(grams, "g", num_bits=4096, num_hashes=3, salt="decon")
    via_sketch = decontaminate_bloom(
        corpus, sketch=sk, shingle_n=8, num_bits=4096, num_hashes=3
    )
    via_bench = decontaminate_bloom(
        corpus, benchmark=bench, shingle_n=8, num_bits=4096, num_hashes=3
    )
    a = sorted(map(tuple, via_sketch.collect()))
    b = sorted(map(tuple, via_bench.collect()))
    assert a == b


def test_decon_bloom_min_hits_and_validation(spark, decon_corpus):
    from earthmover_spark.llm.curation import decontaminate_bloom

    corpus, bench = decon_corpus
    strict = {
        r.doc_id: r.contaminated
        for r in decontaminate_bloom(
            corpus, benchmark=bench, min_hits=10_000
        ).collect()
    }
    assert strict[1] is False  # threshold not met
    with pytest.raises(EarthmoverSparkError, match="exactly one"):
        decontaminate_bloom(corpus)
    with pytest.raises(EarthmoverSparkError, match="exactly one"):
        decontaminate_bloom(corpus, benchmark=bench, sketch=bench)
    with pytest.raises(EarthmoverSparkError, match="min_hits"):
        decontaminate_bloom(corpus, benchmark=bench, min_hits=0)


# ---------------------------------------------------------------------------
# cdc_chunks
# ---------------------------------------------------------------------------


def test_cdc_chunks_reconstruct_and_offsets(spark):
    from earthmover_spark.llm.sampling import cdc_chunks

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "short"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = cdc_chunks(df, window=4, mask_bits=3)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_id))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # concatenating chunks in chunk_id order reproduces the text
    originals = {r.doc_id: (r.text or "") for r in df.collect()}
    for doc_id, chunks in by_doc.items():
        assert "".join(c.chunk_text for c in chunks) == originals[doc_id]
        # offsets are the running sum of chunk lengths
        off = 0
        for c in chunks:
            assert c.chunk_start == off
            off += len(c.chunk_text)
    # empty / NULL docs yield exactly one empty chunk
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk_text == ""
    assert len(by_doc[4]) == 1 and by_doc[4][0].chunk_text == ""
    # chunk_digest is md5 of the chunk text
    import hashlib

    for c in by_doc[1]:
        assert c.chunk_digest == hashlib.md5(
            c.chunk_text.encode()
        ).hexdigest()


def test_cdc_chunks_shift_resistance(spark):
    from earthmover_spark.llm.sampling import cdc_chunks

    base = (
        "in a hole in the ground there lived a hobbit not a nasty dirty "
        "wet hole filled with the ends of worms and an oozy smell nor yet "
        "a dry bare sandy hole with nothing in it to sit down on or to eat"
    )
    df = spark.createDataFrame(
        [(1, base), (2, "PREFIX INSERTED >>> " + base)],
        "doc_id long, text string",
    )
    out = cdc_chunks(df, window=8, mask_bits=4)
    digs = {1: set(), 2: set()}
    for r in out.collect():
        digs[r.doc_id].add(r.chunk_digest)
    shared = digs[1] & digs[2]
    # fixed-size chunking would share ~nothing after a prefix shift;
    # CDC boundaries re-synchronize, so most chunks survive
    assert len(shared) >= max(1, len(digs[1]) - 2)


def test_cdc_chunks_validation(spark):
    from earthmover_spark.llm.sampling import cdc_chunks

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(EarthmoverSparkError, match="window"):
        cdc_chunks(df, window=0)
    with pytest.raises(EarthmoverSparkError, match="mask_bits"):
        cdc_chunks(df, mask_bits=0)


# ---------------------------------------------------------------------------
# kmv_estimate
# ---------------------------------------------------------------------------


def test_kmv_estimate_exact_below_k(spark):
    from earthmover_spark.operators.sketch import kmv_estimate, kmv_sketch

    df = spark.range(0, 50).select(F.col("id").alias("v"))
    sk = kmv_sketch(df, "v", k=256)
    row = kmv_estimate(sk, k=256).collect()[0]
    assert row.n_sample == 50 and row.n_distinct_est == 50


def test_kmv_estimate_accuracy_when_full(spark):
    from earthmover_spark.operators.sketch import kmv_estimate, kmv_sketch

    true_n = 7777
    df = spark.range(0, 40_000).select((F.col("id") % true_n).alias("v"))
    row = kmv_estimate(kmv_sketch(df, "v", k=512), k=512).collect()[0]
    assert row.n_sample == 512
    # error ~ 1/sqrt(k) ~ 4.4%; allow 3 sigma
    assert abs(row.n_distinct_est - true_n) / true_n < 0.14

    with pytest.raises(ValueError, match="k must be"):
        kmv_estimate(df, k=0)


def test_cdc_chunks_xxhash64_path(spark):
    from earthmover_spark.llm.sampling import cdc_chunks

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again "
             "and once more for good measure to make it longer")],
        "doc_id long, text string",
    )
    out = cdc_chunks(df, window=8, mask_bits=3, hash_fn="xxhash64")
    rows = sorted(out.collect(), key=lambda r: r.chunk_id)
    assert "".join(r.chunk_text for r in rows) == df.collect()[0].text
    with pytest.raises(EarthmoverSparkError, match="hash_fn"):
        cdc_chunks(df, hash_fn="sha1")


def test_badwords_rejects_non_token_words(spark, bw_docs):
    from earthmover_spark.llm.curation import badwords_filter

    with pytest.raises(EarthmoverSparkError, match="single tokens"):
        badwords_filter(bw_docs, words=["two words"])
    with pytest.raises(EarthmoverSparkError, match="single tokens"):
        badwords_filter(bw_docs, words=["semi;colon"])


# ---------------------------------------------------------------------------
# dedup_substrings
# ---------------------------------------------------------------------------


_PASSAGE = (
    "this exact passage of considerable length is syndicated across many "
    "different outlets verbatim and should be detected wherever it appears "
    "in any document regardless of its offset in the text"
)


@pytest.fixture(scope="module")
def dsub_docs(spark):
    return spark.createDataFrame(
        [
            (1, "unique intro A. " + _PASSAGE + " unique tail A."),
            (2, "a very different and much longer beginning for doc two "
                "with plenty of its own words ... " + _PASSAGE),
            (3, _PASSAGE + " trailing content only in doc three."),
            (4, "completely unrelated document about gardening and "
                "tomatoes grown in a greenhouse over winter."),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_dedup_substrings_removes_shifted_copies(spark, dsub_docs):
    from earthmover_spark.llm.curation import dedup_substrings

    out = {
        r.doc_id: r
        for r in dedup_substrings(
            dsub_docs, window=8, mask_bits=4, min_chars=30
        ).collect()
    }
    originals = {r.doc_id: r.text for r in dsub_docs.collect()}
    # keeper (earliest id holding the hot digests) survives intact
    assert out[1].dedup_text == originals[1]
    assert out[1].n_chunks_removed == 0
    # shifted copies lose the interior of the passage (edge chunks
    # within one boundary-resync span survive — documented)
    for i in (2, 3):
        assert out[i].n_chars_removed > 100
        assert _PASSAGE[40:140] not in out[i].dedup_text
        # removed bytes are a contiguous excision of duplicated text:
        # everything kept is a subsequence of the original
        assert len(out[i].dedup_text) == len(originals[i]) - out[i].n_chars_removed
    # unrelated and empty docs pass through byte-identical
    assert out[4].dedup_text == originals[4] and out[4].n_chars_removed == 0
    assert out[5].dedup_text == "" and out[5].n_chunks_removed == 0


def test_dedup_substrings_remove_all_and_run_threshold(spark, dsub_docs):
    from earthmover_spark.llm.curation import dedup_substrings

    # keep_first=False: the paper's remove-all-copies variant — the
    # former keeper loses the passage interior too
    out = {
        r.doc_id: r
        for r in dedup_substrings(
            dsub_docs, window=8, mask_bits=4, min_chars=30, keep_first=False
        ).collect()
    }
    assert out[1].n_chars_removed > 100

    # a run threshold above the passage length restores everything:
    # marked chunks merge into runs shorter than min_chars
    out_hi = {
        r.doc_id: r
        for r in dedup_substrings(
            dsub_docs, window=8, mask_bits=4, min_chars=10_000
        ).collect()
    }
    originals = {r.doc_id: r.text for r in dsub_docs.collect()}
    for i in (1, 2, 3, 4):
        assert out_hi[i].dedup_text == originals[i]
        assert out_hi[i].n_chunks_removed == 0


def test_dedup_substrings_within_doc_repeat_and_validation(spark):
    from earthmover_spark.llm.curation import dedup_substrings

    rep = ("a long repeated refrain that occurs twice inside one single "
           "document and nowhere else in the corpus at all")
    df = spark.createDataFrame(
        [(1, "start. " + rep + " middle filler words here. " + rep + " end.")],
        "doc_id long, text string",
    )
    out = dedup_substrings(df, window=8, mask_bits=4, min_chars=30).collect()[0]
    # the second occurrence is excised, the first (keeper) survives
    assert out.n_chars_removed > 60
    assert out.dedup_text.count("repeated refrain") == 1
    with pytest.raises(EarthmoverSparkError, match="min_chars"):
        dedup_substrings(df, min_chars=0)
    with pytest.raises(EarthmoverSparkError, match="min_count"):
        dedup_substrings(df, min_count=1)


# ---------------------------------------------------------------------------
# impute_missing
# ---------------------------------------------------------------------------


def test_impute_missing_global_strategies(spark):
    from earthmover_spark.operators.column import impute_missing

    df = spark.createDataFrame(
        [
            (1, 10.0, 2, "a"),
            (2, None, 4, "b"),
            (3, 20.0, None, None),
            (4, 30.0, 4, "a"),
            (5, None, 9, "a"),
        ],
        "id long, x double, k long, s string",
    )
    out = {
        r.id: r
        for r in impute_missing(
            df,
            {"x": "mean", "k": "median", "s": "mode"},
        ).collect()
    }
    assert out[2].x == 20.0 and out[5].x == 20.0  # mean of 10,20,30
    assert out[3].k == 4  # median of 2,4,4,9
    assert out[3].s == "a"  # modal value
    assert out[1] == out[1]  # untouched rows intact
    assert (out[1].x, out[1].k, out[1].s) == (10.0, 2, "a")


def test_impute_missing_grouped_and_constant(spark):
    from earthmover_spark.operators.column import impute_missing

    df = spark.createDataFrame(
        [
            ("g1", 10.0, None),
            ("g1", 30.0, "x"),
            ("g1", None, "x"),
            ("g2", 100.0, "y"),
            ("g2", None, None),
            ("g3", None, None),  # group with no non-NULL values
        ],
        "grp string, v double, t string",
    )
    rows = impute_missing(
        df, {"v": "median", "t": "constant:missing"}, group_cols=["grp"]
    ).collect()
    by = {}
    for r in rows:
        by.setdefault(r.grp, []).append(r)
    g1 = sorted((r.v for r in by["g1"]))
    assert g1 == [10.0, 20.0, 30.0]  # group median fills
    assert [r.v for r in by["g2"] if r.v == 100.0]
    assert all(r.v == 100.0 for r in by["g2"])
    assert by["g3"][0].v is None  # no silent global fallback
    assert all(r.t in ("x", "y", "missing") for r in rows)


def test_impute_missing_mode_tie_break_and_validation(spark):
    from earthmover_spark.operators.column import impute_missing
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "b"), (4, "a"), (5, None)],
        "id long, s string",
    )
    out = {r.id: r.s for r in impute_missing(df, {"s": "mode"}).collect()}
    assert out[5] == "a"  # tie between a and b -> smallest value
    # int column mean truncates back to the column type
    di = spark.createDataFrame([(1, 1), (2, 2), (3, None)], "id long, n int")
    got = {r.id: r.n for r in impute_missing(di, {"n": "mean"}).collect()}
    assert got[3] == 1  # mean 1.5 cast back to int
    with pytest.raises(EarthmoverSparkError, match="empty strategy"):
        impute_missing(df, {})
    with pytest.raises(EarthmoverSparkError, match="not in frame"):
        impute_missing(df, {"zz": "mean"})
    with pytest.raises(EarthmoverSparkError, match="unknown strategy"):
        impute_missing(df, {"s": "magic"})
    with pytest.raises(EarthmoverSparkError, match="grouped and imputed"):
        impute_missing(df, {"s": "mode"}, group_cols=["s"])


# ---------------------------------------------------------------------------
# normalize_unicode
# ---------------------------------------------------------------------------


def test_normalize_unicode_forms_and_nulls(spark):
    import unicodedata

    from earthmover_spark.llm.curation import normalize_unicode

    decomposed = "élève"       # é/è via combining marks
    fullwidth = "ＡＢＣ１２３"               # NFKC folds to ASCII
    df = spark.createDataFrame(
        [(1, decomposed), (2, fullwidth), (3, None), (4, "plain")],
        "doc_id long, text string",
    )
    nfc = {r.doc_id: r.text for r in normalize_unicode(df).collect()}
    assert nfc[1] == unicodedata.normalize("NFC", decomposed) == "élève"
    assert nfc[2] == fullwidth  # NFC leaves compatibility chars alone
    assert nfc[3] is None and nfc[4] == "plain"

    nfkc = {
        r.doc_id: r.norm
        for r in normalize_unicode(df, form="NFKC", out_col="norm").collect()
    }
    assert nfkc[2] == "ABC123"
    # exact-dedup motivation: the two spellings hash together after NFC
    pre = spark.createDataFrame(
        [(1, "élève"), (2, decomposed)], "doc_id long, text string"
    )
    out = normalize_unicode(pre)
    assert out.select("text").distinct().count() == 1

    import pytest as _pytest

    from earthmover_spark.util import EarthmoverSparkError

    with _pytest.raises(EarthmoverSparkError, match="unknown form"):
        normalize_unicode(df, form="NFX")


def test_kmv_estimate_rejects_oversized_frame(spark):
    from earthmover_spark.operators.sketch import kmv_estimate

    too_big = spark.range(0, 600).select(F.col("id").alias("h"))
    with pytest.raises(Exception, match="kmv_merge first"):
        kmv_estimate(too_big, k=512).collect()


def test_dedup_substrings_passage_survives_contiguously(spark):
    """The run-level keeper rule: doc A quotes the MIDDLE of a passage
    that docs B and C share in full. The quote's interior chunks have
    their keepers in A, the flanks in B — per-chunk exemption would
    punch a hole in B's copy so the full passage survived nowhere.
    Run-level exemption keeps B's run whole (it shelters the flank
    keepers), keeps A's quote, and removes C's copy."""
    from earthmover_spark.llm.curation import dedup_substrings

    passage = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega "
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen "
        "twenty twentyone twentytwo twentythree twentyfour twentyfive"
    )
    quote = passage[120:280]
    docs = spark.createDataFrame(
        [
            (1, "doc a quotes only the middle: " + quote + " end of a."),
            (2, "doc b carries the whole passage: " + passage + " tail b."),
            (3, "doc c also carries it: " + passage + " tail c."),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup_substrings(
            docs, window=8, mask_bits=4, min_chars=40
        ).collect()
    }
    # B keeps the passage CONTIGUOUSLY (no hole punched by A's keepers)
    assert passage in out[2].dedup_text
    # C loses the bulk of its copy
    assert out[3].n_chars_removed > len(passage) // 2
    assert passage not in out[3].dedup_text
    # A keeps its quote (its run shelters the quote-chunk keepers)
    assert quote in out[1].dedup_text


# ---------------------------------------------------------------------------
# review-fix regressions: sampling type-sensitivity and WARC robustness
# ---------------------------------------------------------------------------


def test_stratified_sample_boolean_and_null_strata(spark):
    from earthmover_spark.llm.sampling import stratified_sample, temperature_mix

    df = spark.createDataFrame(
        [(i, i % 3 == 0) for i in range(300)] + [(900, None)],
        "doc_id long, is_en boolean",
    )
    # boolean strata must match natively: keep all True, none False
    out = stratified_sample(
        df, "is_en", {True: 1.0, False: 0.0}, key_col="doc_id"
    )
    rows = out.collect()
    assert rows and all(r.is_en is True for r in rows)
    assert len(rows) == 100
    # None key targets NULL strata
    out2 = stratified_sample(
        df, "is_en", {None: 1.0}, key_col="doc_id", default_fraction=0.0
    ).collect()
    assert [r.doc_id for r in out2] == [900]
    # temperature_mix on a boolean stratum keeps the corpus (the old
    # str(True) != 'true' bug silently dropped everything)
    mixed = temperature_mix(df.filter("is_en is not null"), "is_en",
                            "doc_id", temperature=1.0)
    assert mixed.count() == 300  # T=1: natural mix, nothing dropped


def test_split_dataset_null_keys_and_negative_weights(spark):
    from earthmover_spark.llm.sampling import split_dataset
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame(
        [(str(i),) for i in range(200)] + [(None,)] * 50,
        "k string",
    )
    out = split_dataset(df, "k", {"train": 0.5, "test": 0.5})
    null_splits = {r.split for r in out.filter("k is null").collect()}
    # NULL keys all hash to ONE deterministic split (same sentinel key),
    # not automatically the last label
    assert len(null_splits) == 1
    with pytest.raises(EarthmoverSparkError, match="negative weights"):
        split_dataset(df, "k", {"train": 1.2, "val": -0.2})


def test_budget_sample_rejects_null_and_negative_sizes(spark):
    from earthmover_spark.llm.sampling import budget_sample

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 20)], "doc_id long, n int"
    )
    with pytest.raises(Exception, match="non-negative"):
        budget_sample(df, "doc_id", "n", budget=100).collect()
    df2 = spark.createDataFrame(
        [(1, 10), (2, -5), (3, 20)], "doc_id long, n int"
    )
    with pytest.raises(Exception, match="non-negative"):
        budget_sample(df2, "doc_id", "n", budget=100).collect()


def test_chunk_documents_rejects_negative_overlap(spark):
    from earthmover_spark.llm.sampling import chunk_documents

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(EarthmoverSparkError, match="overlap"):
        chunk_documents(df, chunk_chars=100, overlap=-10)


def test_warc_corrupt_inputs(spark, tmp_path):
    from earthmover_spark.sources.warc import (
        _gunzip_members,
        iter_warc_records,
    )

    # negative Content-Length must raise, not loop forever
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: -10\r\n\r\nbody\r\n\r\n")
    with pytest.raises(EarthmoverSparkError, match="negative"):
        list(iter_warc_records(bad))
    # truncated tail: the partial final record is DROPPED, the
    # complete one survives
    good = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: 4\r\n\r\nbody\r\n\r\n")
    trunc = good + (b"WARC/1.0\r\nWARC-Type: response\r\n"
                    b"Content-Length: 99999\r\n\r\nshort")
    recs = list(iter_warc_records(trunc))
    assert len(recs) == 1 and recs[0]["payload"] == b"body"
    # a mislabeled .gz (not gzip at all) raises instead of silently
    # vanishing the shard
    with pytest.raises(EarthmoverSparkError, match="mislabeled"):
        _gunzip_members(b"definitely not gzip content")
