"""Distributed BPE tokenizer: learn merges from a corpus, encode with
them — the tokenization step between curation and sequence packing in a
training-data pipeline (byte-pair encoding per Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Scale design (the 100 TB story): the corpus-sized work — word frequency
aggregation and encoding — is fully distributed (hash agg with map-side
combine; Arrow-batched UDF with a per-batch word cache). Merge learning
itself runs driver-side over the compressed ``(word, count)``
vocabulary, exactly like every production BPE trainer: the vocabulary
of even a 100 TB corpus is millions of entries, not billions, and is
explicitly capped by ``max_vocab_words`` (TakeOrdered — never a full
collect of unbounded data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from earthmover_spark.llm.textstats import normalize_text, spread_narrow_scan

#: end-of-word sentinel (kept printable & un-splittable by normalization)
EOW = "</w>"


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    max_vocab_words: int = 100_000,
) -> list[tuple[str, int]]:
    """Distributed (word, count) aggregation, top ``max_vocab_words``
    by count (ties by word for determinism). The one corpus-wide pass
    behind BPE training."""
    counts = (
        spread_narrow_scan(df)
        .select(
            F.explode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = counts.orderBy(F.desc("c"), F.asc("w")).limit(max_vocab_words)
    return [(r.w, r.c) for r in top.collect()]


def learn_bpe_from_counts(
    vocab: list[tuple[str, int]], num_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table (pure
    driver-side; input is vocabulary-sized). Deterministic: best pair by
    (count desc, pair asc). Stops early when no pair reaches
    ``min_pair_count``."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], c) for w, c in vocab
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        next_words = []
        for syms, c in words:
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            next_words.append((out, c))
        words = next_words
    return merges


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_pair_count: int = 2,
    max_vocab_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus: one distributed
    word-count aggregation, then driver-side merge learning on the
    vocabulary (see module docstring for why that split is the right
    one at 100 TB)."""
    return learn_bpe_from_counts(
        word_counts(df, text_col, max_vocab_words),
        num_merges,
        min_pair_count,
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        syms = (
            syms[:best_i]
            + [syms[best_i] + syms[best_i + 1]]
            + syms[best_i + 2 :]
        )
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_pieces",
) -> DataFrame:
    """Encode documents with a learned merge list: lowest-rank merge
    first per word, the standard greedy BPE segmenter. Returns
    (id_col, out_col: array<string>, n_pieces).

    Arrow-batched ``mapInPandas`` with the merge table broadcast via
    closure (a merge list is KBs) and a per-batch word→pieces cache —
    natural-language batches repeat most words, so the per-word walk
    amortizes away. The normalization matches the training pass."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    norm_df = spread_narrow_scan(df).select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("__t__")
    )

    def encode(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            pieces_col, counts = [], []
            for text in pdf["__t__"]:
                pieces: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        cache[w] = got
                    pieces.extend(got)
                pieces_col.append(pieces)
                counts.append(len(pieces))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: pieces_col,
                    "n_pieces": pd.Series(counts, dtype="int64"),
                }
            )

    id_type = dict(norm_df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, {out_col} array<string>, n_pieces long"
    return norm_df.mapInPandas(encode, schema=schema)


def bpe_tokenize(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 200,
    min_pair_count: int = 2,
    max_vocab_words: int = 100_000,
    out_col: str = "bpe_pieces",
) -> DataFrame:
    """One-shot YAML-friendly surface: learn merges from the input
    corpus, then encode it (two corpus passes — the count agg and the
    encode). For a frozen tokenizer across pipelines, call
    :func:`learn_bpe` once and :func:`bpe_encode` per dataset."""
    merges = learn_bpe(df, text_col, num_merges, min_pair_count, max_vocab_words)
    return bpe_encode(df, merges, text_col, id_col, out_col)
