"""Text analysis operators for training-data pipelines.

  detect_language     marker-word n-gram heuristic with per-language scores
  quality_scores      length / punctuation / stopword / repetition signals
  token_counts        whitespace tokens + BPE-ish regex piece count
  fingerprint_docs    Rabin-Karp style rolling k-gram hashes -> winnowed
                      min-hash fingerprint

Everything is native Spark SQL expressions (split/filter/transform/
aggregate) — the hot path stays in whole-stage codegen; nothing collects to
the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentsdb_spark.session import tiny_df

# tiny marker profiles: deterministic, explainable, good enough to route
# obvious cases; swap in real profiles per deployment
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def _words(col):
    # maximal \S+ runs, NOT a \s+ split: split() emits '' boundary tokens
    # for leading/trailing whitespace (ubiquitous on real web text), which
    # silently corrupted every word count and ratio built on it; extract
    # yields [] for empty/whitespace-only text
    return F.regexp_extract_all(F.lower(col), F.lit(r"\S+"), F.lit(0))


def _marker_count(words, markers: tuple[str, ...]):
    # kept for reference/tests: higher-order filter over the split tokens —
    # CodegenFallback, so every token runs an interpreted lambda. Prefer
    # _marker_count_re on corpus paths.
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words, lambda w: F.array_contains(marker_arr, w)))


def _marker_count_re(text_col, markers: tuple[str, ...]):
    """Token-equality marker count as ONE codegen regexp_count over the raw
    lowered text: a whitespace-delimited token equals a marker iff the
    marker is preceded by start/whitespace and followed (lookahead, not
    consumed, so adjacent hits both count) by whitespace/end. Identical
    counts to filtering the \\s+ split — without per-token interpreted
    lambdas on the corpus hot path."""
    import re as _re

    pat = r"(?:^|\s)(?:" + "|".join(_re.escape(m) for m in markers) + r")(?=\s|$)"
    return F.regexp_count(F.lower(text_col), F.lit(pat))


def detect_language(docs: DataFrame, content_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-language marker scores + argmax prediction (ties -> first
    language in alphabetical order, deterministic)."""
    cols = [
        _marker_count_re(F.col(content_col), LANG_MARKERS[lang]).alias(f"score_{lang}")
        for lang in sorted(LANG_MARKERS)
    ]
    scored = docs.select(id_col, *cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return scored.withColumn("predicted_lang", pred)


def quality_scores(docs: DataFrame, content_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Cheap quality signals: sizes, mean word length, stopword ratio,
    distinct-word (repetition) ratio."""
    text = F.col(content_col)
    words = _words(text)
    n_words = F.size(words)
    n_stop = _marker_count_re(text, STOPWORDS)
    n_distinct = F.size(F.array_distinct(words))
    return docs.select(
        id_col,
        F.length(text).alias("n_chars"),
        n_words.alias("n_words"),
        (F.length(F.regexp_replace(text, r"\s+", "")) / n_words).alias("mean_word_len"),
        (n_stop.cast("double") / n_words).alias("stopword_ratio"),
        (n_distinct.cast("double") / n_words).alias("distinct_ratio"),
    )


def gopher_filter(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 90,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_distinct_ratio: float = 0.4,
    min_stop_hits: int = 1,
    keep_cols: tuple = (),
) -> DataFrame:
    """Gopher-style document quality gate (Rae et al., arXiv:2112.11446
    Table A1 — word-count bounds, mean-word-length window, stopword
    presence, repetition): one boolean flag per rule plus the conjunction.
    Default thresholds are tuned to the synthetic corpus (real Gopher uses
    50..100k words); every rule is a pure codegen column expression over
    one scan — the 100 TB shape is a narrow map stage with no shuffle.

    Returns (id, n_words, flag_* per rule, kept)."""
    text = F.col(content_col)
    words = _words(text)
    n_words = F.size(words)
    mwl = F.length(F.regexp_replace(text, r"\s+", "")) / n_words
    n_stop = _marker_count_re(text, STOPWORDS)
    distinct_ratio = F.size(F.array_distinct(words)).cast("double") / n_words
    flags = {
        "flag_word_count": n_words.between(min_words, max_words),
        "flag_mean_word_len": (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len),
        "flag_stopwords": n_stop >= min_stop_hits,
        "flag_repetition": distinct_ratio >= min_distinct_ratio,
    }
    kept = None
    for c in flags.values():
        kept = c if kept is None else (kept & c)
    # keep_cols: passthrough columns for join-free consumers (a
    # STREAMING aggregation cannot join the gate back to the feed by id)
    return docs.select(
        id_col, *keep_cols,
        n_words.alias("n_words"),
        *[c.alias(n) for n, c in flags.items()],
        kept.alias("kept"),
    )


def source_mix_report(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    **gopher_kwargs,
) -> DataFrame:
    """Per-source corpus composition after the quality gate: document and
    surviving-document counts, survival rate, and surviving word volume —
    the report a mixture-weighting step (cf. pipeline.sampling
    .temperature_mixture) consumes. One scan + one groupBy on the
    low-cardinality source key (partial aggregation makes the shuffle a few
    rows per source per task)."""
    gate = gopher_filter(docs, content_col=content_col, id_col=id_col, **gopher_kwargs)
    joined = docs.select(id_col, source_col).join(gate, on=id_col)
    kept_l = F.col("kept").cast("long")
    return joined.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(kept_l).alias("n_kept"),
        F.sum(F.col("n_words") * kept_l).alias("kept_words"),
    )


def chunk_docs(
    docs: DataFrame,
    chunk_words: int = 5,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into consecutive fixed-width word windows —
    the pre-tokenization chunking step of a training pipeline (and the
    pseudo-paragraph splitter for paragraph_dedup on corpora without
    newlines). Emits floor(n_words / chunk_words) chunks per doc; a
    trailing partial window is dropped. Pure codegen array expressions
    (split -> sequence -> slice) over one scan; the explode multiplies rows
    but never shuffles.

    The word split is STAGED through its own projection (round-12
    autopsy, same trap as fingerprint_docs): inlined in the transform()
    lambda the interpreted HOF re-evaluated the split per chunk —
    staging it is a measured 2.9x wall (4.4 -> 1.5 s at 100x sf0.1),
    bit-identical, and flows to every chunk consumer (paragraph_dedup,
    ccnet bands, text_chunks).

    Returns (id, chunk_pos, chunk)."""
    ws = docs.select(id_col, _words(F.col(content_col)).alias("__w"))
    n_chunks = F.floor(F.size("__w") / chunk_words).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(F.col("__w"), i * chunk_words + 1, chunk_words), " "),
    )
    return (
        ws.where(n_chunks > 0)
        .select(id_col, F.posexplode(chunks).alias("chunk_pos", "chunk"))
    )


def paragraph_dedup(
    docs: DataFrame,
    chunk_words: int = 5,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style corpus-wide paragraph deduplication (Wenzek et al.,
    arXiv:1911.00359 §3.1 — hash every paragraph, drop repeats across the
    WHOLE corpus, keep one copy): the canonical boilerplate killer for web
    corpora. Paragraphs here are chunk_docs windows (the synthetic corpus
    has no newlines); swap the splitter for split('\\n') on real text.

    Keep-first is deterministic: the surviving copy is the one with the
    lowest (doc_id, chunk_pos). The winner per paragraph comes from a
    map-side-combinable groupBy-min on the paragraph key — NOT a
    per-paragraph row_number window, so a boilerplate paragraph with 10^9
    copies is a single partial-aggregated key, not a one-task sort.

    Returns one row per doc that keeps >= 1 paragraph: (id, text =
    surviving chunks rejoined in order, n_kept). Text is lower-cased by the
    word splitter (CCNet equally hashes normalized paragraphs); keep the
    original around and re-join on (id, chunk_pos) if the raw casing
    matters."""
    chunks = chunk_docs(docs, chunk_words, content_col, id_col).select(
        id_col, "chunk_pos", "chunk", F.xxhash64("chunk").alias("__ch")
    )
    # winner bookkeeping runs on the 8-byte paragraph hash, not the text —
    # CCNet equally dedups on paragraph hashes; the raw string never enters
    # the winner shuffle or the semi-join keys (at corpus scale the winner
    # table is too big to broadcast and this halves the join's shuffle bytes).
    # min over the (id, pos) STRUCT — lexicographic, no packed-scalar key
    # that a book-length doc (chunk_pos >= 1e6) would overflow into the
    # next doc's range
    winners = (
        chunks.groupBy("__ch")
        .agg(F.min(F.struct(F.col(id_col), F.col("chunk_pos"))).alias("__w"))
        .select(
            "__ch",
            F.col(f"__w.{id_col}").alias(id_col),
            F.col("__w.chunk_pos").alias("chunk_pos"),
        )
    )
    kept = chunks.join(winners, on=["__ch", id_col, "chunk_pos"], how="left_semi")
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_pos", "chunk"))
            ).alias("__kc")
        )
        .select(
            id_col,
            F.array_join(F.transform("__kc", lambda s: s["chunk"]), " ").alias("text"),
            F.size("__kc").alias("n_kept"),
        )
    )


def strip_boilerplate_chunks(
    docs: DataFrame,
    max_df: int = 2,
    chunk_words: int = 5,
    content_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """RefinedWeb-style repetition REMOVAL (Penedo et al., arXiv:2306.01116
    — line-wise filters strike duplicated lines outright; MassiveWeb's
    repetition gates are the doc-level cousin): a chunk appearing in MORE
    than ``max_df`` distinct documents is boilerplate (navbars, cookie
    banners, license blurbs) and EVERY copy is dropped — unlike
    ``paragraph_dedup``'s keep-first, which keeps one canonical copy.
    Chunks are the same ``chunk_docs`` windows (newline-free corpora);
    swap the splitter for split('\\n') on real text.

    Scale shape: doc frequency runs on the 8-byte chunk hash — distinct
    (id, hash) then a map-side-combinable count, so a boilerplate chunk
    with 10^9 copies is one aggregation key; the chunk string never enters
    ANY hash-keyed shuffle (the id/pos key frame drops it before the df
    aggregation and the strike-out semi-join). The strike-out joins the
    SMALL side — the boilerplate keys with df > max_df (the heavy-hitter
    set, broadcastable at any corpus size), not the ~all-distinct keep
    set — folds struck positions to one int-array row per affected doc,
    and rebuilds each document locally (array_except over the chunk
    positions): text shuffles only as the docs side of that final per-doc
    join, and not even there when AQE broadcasts the array side.

    Returns (id, text = surviving chunks rejoined in order, n_kept,
    n_dropped) for docs keeping >= 1 chunk."""
    if max_df < 1:
        raise ValueError(f"max_df must be >= 1, got {max_df}")
    from opentsdb_spark.pipeline.dedup import _persist_small, _strike_rebuild

    # the (id, pos, hash) key frame feeds BOTH the df aggregation and the
    # strike-out semi-join — persist it so the chunk explode (split +
    # slice/join transform over every doc) runs once, not twice. This is
    # one of the two documented CORPUS-cardinality _persist_small sites
    # (see its docstring): one ~20-byte row per chunk (chunk_pos is
    # genuinely needed by the strike-out side, the hash by both), i.e.
    # rows x ~20 B of MEMORY_AND_DISK scratch at scale against re-running
    # the chunk explode over the full text per consumer — measured
    # round 14 at the 100x replica: persist-on beat persist-off on every
    # alternation (best 11.1 vs 13.0 s; 15.8 -> 9.8 s at 30x in the
    # round-13 A/B that introduced it)
    keys = _persist_small(
        chunk_docs(docs, chunk_words, content_col, id_col).select(
            id_col, "chunk_pos", F.xxhash64("chunk").alias("__ch")
        ),
        persist,
    )
    df = (
        keys.select(id_col, "__ch").distinct()
        .groupBy("__ch").agg(F.count("*").alias("__df"))
    )
    drop_keys = df.where(F.col("__df") > max_df).select("__ch")
    # rebuild doc-locally from the same codegen chunk expression chunk_docs
    # scans (one extra narrow pass over the text, no exploded-string joins)
    # — the shared covered-position strike helper of the span-removal ops.
    # The df aggregation dominates; persist the small (id, int) coverage
    # frame so repeated actions pay it once.
    covered = _persist_small(
        keys.join(drop_keys, on="__ch", how="left_semi")
        .select(id_col, F.col("chunk_pos").alias("__t")),
        persist,
    )

    words = _words(F.col(content_col))
    n_chunks = F.floor(F.size(words) / chunk_words).cast("int")
    # guard the sequence: n_chunks == 0 would yield the DESCENDING [0,-1]
    # index list and fabricate two phantom chunks for a sub-window doc
    chunks_arr = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(words, i * chunk_words + 1, chunk_words), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return _strike_rebuild(docs, covered, chunks_arr, id_col,
                           "n_kept", "n_dropped")


def corpus_funnel(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    **gopher_kwargs,
) -> DataFrame:
    """Attrition funnel for the standard cleaning chain: input -> exact
    dedup (keep lowest id per content hash) -> Gopher quality gate. One
    summary row (n_input, n_after_exact, n_after_quality, kept_words) —
    the report every corpus-cleaning run ships with its output.

    Shape: the exact-dedup winner is a map-side-combinable min over the
    32-byte content hash (same key as pipeline.dedup.exact_dedup); the
    gate is pure codegen flags; the final count is one global aggregate.
    Nothing materializes per-doc output — this is the REPORT; run
    exact_dedup/gopher_filter themselves for the cleaned corpus."""
    hashed = docs.select(
        id_col, content_col,
        F.sha2(F.col(content_col).cast("binary"), 256).alias("__h"),
    )
    winners = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    survivors = hashed.join(winners, on=["__h", id_col], how="left_semi")
    gate = gopher_filter(survivors, content_col=content_col, id_col=id_col,
                         **gopher_kwargs)
    kept_l = F.col("kept").cast("long")
    agg = gate.agg(
        F.count("*").alias("n_after_exact"),
        F.sum(kept_l).alias("n_after_quality"),
        F.sum(F.col("n_words") * kept_l).alias("kept_words"),
    )
    return agg.crossJoin(
        F.broadcast(docs.agg(F.count("*").alias("n_input")))
    ).select("n_input", "n_after_exact", "n_after_quality", "kept_words")


def token_counts(docs: DataFrame, content_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + a BPE-ish piece count (letter runs, digit
    runs, and single punctuation as separate pieces)."""
    text = F.col(content_col)
    return docs.select(
        id_col,
        # \S+ extraction, not trim+split: trim() strips only spaces, so a
        # trailing \n made a phantom token, and split('') is [''] not []
        F.size(F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0))).alias("ws_tokens"),
        F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).alias("bpe_pieces"),
    )


# scrub order matters: SSN before phone (an SSN also matches the loose
# phone shape), email before IP (addresses share digit/dot runs). Patterns
# stay in the RE2-compatible subset (explicit classes, no backreferences)
# so the same strings behave identically under Java regex and RE2 engines.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    # phone separators are space/dash/dot/parens ONLY (no \s: a class with
    # \n swallowed digit runs ACROSS LINES into one giant bogus redaction).
    # Bounded by DIGIT count (7-15 digits, E.164's max), not raw chars: a
    # char-count bound made '+1 (555) 123-4567' match only partially and
    # leak trailing digits. At most 2 separators per gap (covers ') 1' in
    # '(555) 123'), so total length stays bounded and never crosses lines.
    ("phone", r"\+?[0-9](?:[()\-\. ]{0,2}[0-9]){6,14}", "<PHONE>"),
)


def pii_scrub(docs: DataFrame, content_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact common PII shapes and count removals per category.

    Sequential regexp_replace chain — each category is counted on the text
    AFTER the previous categories were redacted, so overlapping shapes are
    never double-counted. Pure codegen expressions; at corpus scale this is
    a narrow map over the scan."""
    cur = F.col(content_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return docs.select(id_col, *counts, cur.alias("scrubbed"))


BOILERPLATE_MARKERS = r"(?i)copyright|all rights reserved|terms of service|click here|subscribe now"


def boilerplate_flags(docs: DataFrame, content_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Boilerplate / junk signals: character-class ratios and marker-phrase
    hits — the cheap pre-filter a corpus pass runs before any model-based
    quality scoring.

    The class counts run on ``translate`` deltas, not the regex engine:
    length(text) - length(translate(text, <class chars>, '')) is the same
    integer regexp_count('[<class>]') returns (the classes here are plain
    ASCII sets), but it is a straight codegen character-table pass —
    measured 10x faster at 30x sf0.1 (4.6 -> 0.45 s) and bit-identical on
    the full replica. The symbol class [^A-Za-z0-9\\s] counts as
    total - upper - lower - digit - whitespace (Java regex \\s is exactly
    the six chars translated). Marker phrases are lowercase substring
    scans — same verdict as the (?i) alternation on these plain-ASCII
    phrases, without per-row regex alternation."""
    import string as _string

    text = F.col(content_col)
    ln = F.length(text)
    n = ln.cast("double")
    den = F.greatest(n, F.lit(1.0))

    def cnt(chars: str):
        return ln - F.length(F.translate(text, chars, ""))

    upper = cnt(_string.ascii_uppercase)
    lower = cnt(_string.ascii_lowercase)
    digit = cnt(_string.digits)
    ws = cnt(" \t\n\x0b\f\r")
    low = F.lower(text)
    markers = (low.contains("copyright")
               | low.contains("all rights reserved")
               | low.contains("terms of service")
               | low.contains("click here")
               | low.contains("subscribe now"))
    return docs.select(
        id_col,
        (upper / den).alias("upper_ratio"),
        (digit / den).alias("digit_ratio"),
        ((ln - upper - lower - digit - ws) / den).alias("symbol_ratio"),
        markers.alias("has_boilerplate"),
    )


def _max_run_count(arr):
    """Highest multiplicity of any element in the array: sort, then fold a
    (prev, run, best) state over it — O(n log n), no explode/shuffle."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(F.array_sort(arr), init, step, lambda acc: acc["best"])


def _word_ngrams(words, n: int):
    """Word n-gram array; empty (not a descending-sequence artifact) when the
    document has fewer than n words."""
    idx = F.sequence(F.lit(0), F.size(words) - n)
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")
    )
    return F.when(F.size(words) >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_signals(docs: DataFrame, content_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    documents dominated by repeated lines / n-grams are low-quality almost
    surely. Per-document fractions:

      dup_line_frac       repeated-line occurrences / total lines
      dup_line_char_frac  characters in repeated-line occurrences / all line chars
      top_bigram_frac     occurrences of the most frequent word bigram / all bigrams
      dup_trigram_frac    repeated-trigram occurrences / total trigrams

    ONE Arrow narrow map at corpus scale; nothing shuffles. The previous
    expression form ran transform(slice)+aggregate higher-order functions
    — CodegenFallback INTERPRETED per n-gram, with the split re-evaluated
    inside each lambda element (the _gram_frame O(words²) trap) — and was
    the worst absolute wall in the 30x scale sweep (31.9 s); the kernel
    computes the same counts with Counters in one pass per doc. NULL text
    keeps the old contract (all fractions 0.0)."""
    from collections import Counter
    import re as _re

    @F.pandas_udf(
        "struct<dup_line_frac:double,dup_line_char_frac:double,"
        "top_bigram_frac:double,dup_trigram_frac:double>")
    def _signals(texts: pd.Series) -> pd.DataFrame:
        tok = _re.compile(r"\S+")
        o1, o2, o3, o4 = [], [], [], []
        for t in texts:
            if t is None:
                o1.append(0.0); o2.append(0.0); o3.append(0.0); o4.append(0.0)
                continue
            lines = t.split("\n")
            nl = len(lines)
            dl = set(lines)
            o1.append((nl - len(dl)) / nl if nl > 0 else 0.0)
            ca = sum(len(ln) for ln in lines)
            cd = sum(len(ln) for ln in dl)
            o2.append((ca - cd) / ca if ca > 0 else 0.0)
            w = tok.findall(t.lower())
            nb = len(w) - 1
            if nb > 0:
                bc = Counter(" ".join(w[i:i + 2]) for i in range(nb))
                o3.append(max(bc.values()) / nb)
            else:
                o3.append(0.0)
            nt = len(w) - 2
            if nt > 0:
                tc = Counter(" ".join(w[i:i + 3]) for i in range(nt))
                o4.append((nt - len(tc)) / nt)
            else:
                o4.append(0.0)
        return pd.DataFrame({
            "dup_line_frac": o1, "dup_line_char_frac": o2,
            "top_bigram_frac": o3, "dup_trigram_frac": o4,
        })

    out = docs.select(id_col, _signals(F.col(content_col)).alias("__rs"))
    return out.select(
        id_col,
        F.col("__rs.dup_line_frac").alias("dup_line_frac"),
        F.col("__rs.dup_line_char_frac").alias("dup_line_char_frac"),
        F.col("__rs.top_bigram_frac").alias("top_bigram_frac"),
        F.col("__rs.dup_trigram_frac").alias("dup_trigram_frac"),
    )


def fingerprint_docs(docs: DataFrame, k: int = 5, num_mins: int = 4,
                     content_col: str = "text", id_col: str = "doc_id",
                     hash_fn=None) -> DataFrame:
    """Rolling k-gram fingerprint: hash every word k-gram (the set-based
    equivalent of a Rabin-Karp rolling window), keep the num_mins smallest
    hashes as the document fingerprint (winnowing-style selection).

    Documents shorter than k words hash their FULL text as a single gram
    (the index clamp at 0) — deliberate, so short docs still fingerprint
    and dedup among themselves, unlike the n-gram pair operators which
    drop them (_word_ngrams / _gram_frame return nothing below n). A short
    doc can only collide with an equal short doc, never with a long doc's
    interior window (grams of different word counts hash differently).

    The word split and the hashed-gram array are STAGED through their own
    projections (round-12 autopsy): inlining the split inside the
    transform() lambda made the interpreted HOF re-evaluate it per element
    (O(words^2) per doc), and referencing the gram array from both output
    columns evaluated the whole transform twice per row — together a
    measured 4.3x wall (25.6 -> 5.9 s at 100x sf0.1, bit-identical).
    CollapseProject leaves multi-referenced non-cheap aliases staged, so
    the plan keeps one evaluation of each.
    """
    hash_fn = hash_fn or F.xxhash64
    ws = docs.select(id_col, _words(F.col(content_col)).alias("__w"))
    idx = F.sequence(F.lit(0), F.greatest(F.size("__w") - k, F.lit(0)))
    gram_hashes = F.transform(
        idx, lambda i: hash_fn(F.array_join(F.slice(F.col("__w"), i + 1, k), " "))
    )
    gh = ws.select(id_col, F.array_distinct(gram_hashes).alias("__gh"))
    return gh.select(
        id_col,
        F.slice(F.array_sort(F.col("__gh")), 1, num_mins).alias("fingerprint"),
        F.size(F.col("__gh")).alias("distinct_grams"),
    )


def vocab_topk(docs: DataFrame, k: int = 50, content_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Corpus-global top-k vocabulary: (token, term frequency, document
    frequency), ties broken by token for determinism.

    The 100 TB shape is classic wordcount: explode -> groupBy(token) runs
    with map-side partial aggregation, so the shuffle carries one row per
    distinct token per input partition, not one per token occurrence;
    document frequency rides the same aggregate as count_distinct (planned
    as a two-phase expand, still partial-combined). The final top-k is
    TakeOrderedAndProject — no global sort of the vocabulary."""
    words = docs.select(
        F.col(id_col).alias("__did"),
        F.explode(_words(F.col(content_col))).alias("token"),
    ).where(F.col("token") != "")
    counts = words.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.count_distinct("__did").alias("df"),
    )
    return counts.orderBy(F.desc("tf"), F.asc("token")).limit(k)


def lm_score(
    docs: DataFrame,
    n: int = 2,
    add_k: float = 0.5,
    content_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Corpus-fit n-gram language-model score per document — the classic
    perplexity-proxy quality filter (a document whose token transitions are
    improbable under the corpus LM is likely noise/garble).

    Fit and score are one Spark job, no driver-side model:
      * fit: n-gram and (n-1)-gram counts over the WHOLE corpus (partial
        aggregation, gram-keyed shuffle);
      * score: each document's grams join their corpus counts (sort-merge
        on the same 8-byte-hashable gram keys at scale) and contribute
        log((c_n + k) / (c_ctx + k*V)) — add-k smoothed conditional
        probability with V = the corpus' distinct n-GRAM count (an upper
        bound on the per-context branching factor; the DuckDB oracle
        mirrors exactly this V);
      * output: (id, n_grams, avg_logp) with avg_logp = mean log-prob per
        gram OCCURRENCE (higher = more typical). Docs shorter than n
        words score NULL.

    The probability table is a frame JOIN, never a broadcast of the
    vocabulary (unbounded at corpus scale). n=1 degenerates to unigram
    log-frequency scoring.

    ``group_col`` scopes the WHOLE fit per group — counts, contexts, and
    the smoothing vocabulary V are all per-group, i.e. one independent LM
    per language (what CCNet's per-language KenLM does, Wenzek et al.
    arXiv:1911.00359 §3.3). The per-group V becomes a count aggregate
    joined on the group key instead of a driver scalar.

    Shape (the round-9 warm-CPU rework — ccnet_buckets burned 15.5 CPU-s
    for 1.6 s wall through this path): every LM statistic — gram counts
    (one map-side-combinable groupBy off the scan), context counts (a
    rollup OF the gram counts, never a second occurrence pass), V — and
    the per-gram log-probability table are VOCABULARY-sized; the only
    occurrence-sized operation left is ONE score join against that table
    (the old plan ran two occurrence-sized stat joins plus a per-
    occurrence context regex). The context is the gram minus its last
    word: grams are " "-joined \\S+ tokens, so substring_index(g, ' ',
    n-1) — a plain byte scan per DISTINCT gram — replaces the old
    per-occurrence regexp_replace.
    """
    from opentsdb_spark.pipeline.dedup import _gram_frame, _persist_small

    gcols = [group_col] if group_col else []
    ids = docs.select(id_col, *gcols)
    vocab = None  # ungrouped paths learn it at construction (see below)
    # raw occurrences, NOT per-doc-distinct shingles: a repeated transition
    # must weigh repeatedly in both the fit counts and the score. The gram
    # stream feeds both the fit aggregation and the score join — persisted
    # so tokenize+shingle runs once (Spark shares no common subplans).
    # Round-14 measured and REJECTED moving the persist to the
    # vocabulary-sized count table with a fresh-scan probe: the extra
    # tokenize+shingle pass doubled the ungrouped query at 100x
    # (4.1 -> 8.1 s, every alternation, clean steal) and the hoped-for
    # AQE SMJ->BHJ demotion of the GROUPED score join never materialized
    # — warm replans keep 4 SortMergeJoin with the probe uncached too,
    # i.e. the round-13 cached-probe demotion blocker extends to joins
    # whose BUILD subtree reads an InMemoryRelation.
    grams = _persist_small(
        _gram_frame(docs, content_col, id_col, n, distinct=False,
                    extra_cols=tuple(gcols)).select(
            id_col, *gcols, F.explode("grams").alias("g")),
        True)
    counts = grams.groupBy(*gcols, "g").agg(F.count("*").alias("c_n"))
    if n > 1:
        wctx = counts.withColumn(
            "ctx", F.substring_index(F.col("g"), " ", n - 1))
        ctx_counts = wctx.groupBy(*gcols, "ctx").agg(
            F.sum("c_n").alias("c_ctx"))
        if group_col:
            vgrp = counts.groupBy(group_col).agg(F.count("*").alias("__v"))
            wt = (
                wctx.join(ctx_counts, on=[*gcols, "ctx"])
                .join(vgrp, on=group_col)
                .withColumn(
                    "logp",
                    F.log((F.col("c_n") + add_k)
                          / (F.col("c_ctx") + add_k * F.col("__v"))),
                )
            )
        else:
            vocab = counts.count()
            wt = (
                wctx.join(ctx_counts, on="ctx")
                .withColumn(
                    "logp",
                    F.log((F.col("c_n") + add_k)
                          / (F.col("c_ctx") + add_k * vocab)),
                )
            )
    else:
        if group_col:
            gtot = counts.groupBy(group_col).agg(
                F.sum("c_n").alias("__t"), F.count("*").alias("__v"))
            wt = counts.join(gtot, on=group_col).withColumn(
                "logp",
                F.log((F.col("c_n") + add_k)
                      / (F.col("__t") + add_k * F.col("__v"))),
            )
        else:
            row = counts.agg(F.sum("c_n").alias("t"),
                             F.count("*").alias("v")).first()
            total, vocab = row["t"] or 0, row["v"]
            wt = counts.withColumn(
                "logp", F.log((F.col("c_n") + add_k) / (total + add_k * vocab))
            )
    wt_sel = wt.select(*gcols, "g", "logp")
    # The score join is the only occurrence-sized join; its build side is
    # the vocabulary-granularity probability table, whose Catalyst size
    # ESTIMATE is inflated (aggregates over the cached gram frame carry
    # no stats). On the ungrouped paths the construction-time vocab count
    # is already in hand, so broadcast EXACTLY when the table is provably
    # small — a bounded adaptive hint (static BHJ: the probe never
    # shuffles at all), not a policy of broadcasting the (unbounded at
    # corpus scale) vocabulary. The bound is a BYTE budget, not a row
    # count: a gram row is n space-joined words (~8-16 B/word + row
    # overhead), so gating rows x n under 2^20 keeps the built broadcast
    # relation in the low tens of MB regardless of n (a flat 2^20-row
    # gate let a long-gram table reach hundreds of MB). Grouped paths
    # have no free scalar and keep the frame join — AQE cannot demote it
    # at runtime while either join subtree reads an InMemoryRelation
    # (cached probe measured round 13; cached BUILD measured round 14 on
    # the fresh-probe variant, which stayed 4x SortMergeJoin warm).
    if vocab is not None and vocab * max(n, 1) <= 1 << 20:
        wt_sel = F.broadcast(wt_sel)
    scored = grams.join(wt_sel, on=[*gcols, "g"])
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_grams"), F.avg("logp").alias("avg_logp")
    )
    return ids.join(per_doc, on=id_col, how="left").select(
        id_col,
        *gcols,
        F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
        "avg_logp",
    )


def tfidf_keywords(docs: DataFrame, k: int = 3, content_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document top-k keywords by TF-IDF (idf = ln(N/df), ties broken
    by token asc) — the classic keyword/topic-tagging step of a corpus
    pipeline.

    100 TB shape: term frequencies partial-aggregate map-side before the
    (doc, token) shuffle; the document-frequency table is vocabulary-sized
    and joins on token (a hash join whose build side is the df aggregate,
    not the corpus); N arrives as a broadcast one-row cross join. The
    per-document top-k window partitions by doc_id — millions of small
    partitions, no global sort.
    """
    words = docs.select(
        F.col(id_col).alias(id_col),
        F.explode(_words(F.col(content_col))).alias("token"),
    ).where(F.col("token") != "")
    tf = words.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    # df derived FROM tf (already one row per (doc, token)) instead of a
    # second count_distinct over the raw explode: both branches now share
    # an identical Exchange(doc, token) subtree, so ReuseExchange runs the
    # corpus explode once — count(*) over tf rows == count_distinct(doc)
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("__n"))
    scored = (
        tf.join(df, on="token")
        .join(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("__n") / F.col("df")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "token", "tf", "df", "tfidf")
    )


def bpe_pair_counts(docs: DataFrame, k: int = 50, content_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies — the counting step
    of one BPE merge iteration (what a distributed tokenizer trainer runs
    repeatedly over 100 TB). Returns the top-k pairs by total count, ties
    broken by pair asc.

    Scale trick: count WORD frequencies first (vocabulary-sized partial
    aggregate), then explode character pairs only over DISTINCT words
    weighted by their frequency — the pair explosion is O(vocab x word
    length), not O(corpus tokens), exactly how BPE trainers compress the
    problem before pair counting.
    """
    word_freq = (
        docs.select(F.explode(_words(F.col(content_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    pairs = word_freq.where(F.length("word") >= 2).select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))")
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(F.sum("freq").alias("n")).orderBy(
        F.desc("n"), F.asc("pair")
    ).limit(k)


def ccnet_buckets(
    docs: DataFrame,
    n: int = 2,
    n_buckets: int = 3,
    content_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet quality bucketing (Wenzek et al., arXiv:1911.00359 §3.3): score
    every document under a PER-LANGUAGE corpus-fit n-gram LM (lm_score with
    group_col=lang — CCNet uses per-language KenLM perplexity) and cut each
    language into ``n_buckets`` equal-count bands by score: bucket 1 =
    "head" (most fluent), then "middle", "tail". Downstream mixes sample
    head-heavy (the paper trains on head+middle).

    The banding is ntile over (per-language) windows ordered by the score
    ROUNDED to 1e-4 with the doc id as tie-break — float sums differ in the
    last ulp across engines/partitionings, and an unrounded order would
    make knife-edge bucket boundaries nondeterministic. Unscored docs
    (shorter than n words) order after every scored doc.

    The only post-score shuffle is the per-language ntile window — at 100 TB
    the per-language sort is the honest cost of exact equal-count bands;
    swap rank for fixed PERCENTILE THRESHOLDS (one approx_percentile pass +
    a narrow map) when approximate bands are acceptable.

    Returns (id, lang, n_grams, score_r, bucket, bucket_name)."""
    from pyspark.sql import Window

    scores = lm_score(docs, n=n, content_col=content_col, id_col=id_col,
                      group_col=lang_col)
    score_r = (
        F.floor(F.col("avg_logp") * F.lit(10000.0) + F.lit(0.5000001))
        / F.lit(10000.0)
    ).cast("double")
    scored = scores.select(id_col, lang_col, "n_grams", score_r.alias("score_r"))
    w = (
        Window.partitionBy(lang_col)
        .orderBy(F.col("score_r").desc_nulls_last(), F.col(id_col).asc())
    )
    name = (
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") < n_buckets, "middle")
        .otherwise("tail")
        if n_buckets == 3
        else F.col("bucket").cast("string")
    )
    return (
        scored.withColumn("bucket", F.ntile(n_buckets).over(w))
        .withColumn("bucket_name", name)
    )


def _bpe_merge_udf(left: str, right: str):
    """Arrow-batched greedy left-to-right merge of one (left, right) pair
    inside each symbol array — the rewrite step of a BPE iteration."""

    @F.pandas_udf("array<string>")
    def merge(sym: pd.Series) -> pd.Series:
        out = []
        for s in sym:
            s = list(s)
            r, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    r.append(left + right)
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            out.append(r)
        return pd.Series(out)

    return merge


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    min_count: int = 2,
    content_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 10,
):
    """Full BPE tokenizer training loop (Sennrich et al., arXiv:1508.07909)
    — the iterative trainer bpe_pair_counts is one step of. Returns
    (merges, vocab_df): ``merges`` is the ordered list of (left, right)
    merge rules (THE tokenizer artifact), ``vocab_df`` the final
    (word, freq, symbols) segmentation table.

    Scale shape (how real distributed BPE trainers run over 100 TB):
      * the corpus collapses ONCE to the word-frequency table (vocab-sized
        partial aggregate) — every later iteration works on the vocab,
        never the corpus; words carry their freq as a weight.
      * per iteration: adjacent-pair counts via a codegen zip_with over the
        symbol arrays (one vocab-sized partial-agg shuffle), top-1 pair to
        the driver (ONE row — the only driver state is the merge list),
        then an Arrow-batched merge map rewrites the symbol arrays.
      * lineage is truncated with localCheckpoint every
        ``checkpoint_every`` merges — n_merges chained maps otherwise
        stack an O(n) deep plan that re-analyzes per iteration.

    Words end with the classic '</w>' terminal symbol so end-of-word units
    merge distinctly from word-internal ones. Ties on count break by pair
    (left, right) ascending — deterministic across engines/partitionings.
    Iterative + order-dependent => not SQL-expressible; pinned against a
    pure-Python reference in tests/test_pipeline.py."""
    vocab = (
        docs.select(F.explode(_words(F.col(content_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(
            "word", "freq",
            F.concat(
                F.split(F.col("word"), ""), F.array(F.lit("</w>"))
            ).alias("symbols"),
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        pairs = vocab.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.col("symbols"),
                    F.slice(F.col("symbols"), 2,
                            F.greatest(F.size("symbols") - 1, F.lit(1))),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        ).where(F.col("p.r").isNotNull())
        top = (
            pairs.groupBy("p").agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.l"), F.asc("p.r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        left, right = top[0]["p"]["l"], top[0]["p"]["r"]
        merges.append((left, right))
        vocab = vocab.withColumn("symbols", _bpe_merge_udf(left, right)("symbols"))
        if (it + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges, vocab


def hash_embed_docs(
    docs: DataFrame,
    dim: int = 16,
    n_buckets: int = 1024,
    content_col: str = "text",
    id_col: str = "doc_id",
    packed: bool = True,
) -> DataFrame:
    """Cheap deterministic text embedding: hashed uni+bigram counts (the
    DSIR featurizer) signed-random-projected to ``dim`` dimensions and
    L2-normalized — the classic SimHash-style random projection (Charikar
    2002) kept UNQUANTIZED, so the output plugs straight into the embedding
    operators (cosine near-dup, ANN, SemDeDup) on corpora that have no
    neural embeddings.

    The projection matrix is never materialized: coefficient(bucket, d) =
    sign of bit 0 of xxhash64(bucket * dim + d), computed in codegen per
    exploded (gram-bucket, d) row. Projection sums are COUNT * (+/-1) —
    exact integers — so the result is bit-identical across engines and
    partitionings (the one float step, the final L2 division, is a single
    IEEE op on exact ints); the DuckDB oracle replays the same xxhash64
    via the pure-SQL XXH64 replica.

    Scale shape: narrow gram explode -> pmod bucket -> ONE groupBy(id)
    whose ``dim`` signed sums are all map-side combinable, so the single
    shuffle carries one (id, dim x int64) row per doc per task — the doc
    embedding folds WIDE (a packed row), never TALL (no per-(doc, dim)
    row fan-out, no second norm aggregate, no join; the embed_drift
    cells x (d+2) precedent). The norm is a plain expression over the
    folded row: the sum of squares stays exact int64 before the one
    float op, preserving cross-engine bit-equality. Returns (id,
    embedding array<double>[dim]) when ``packed``, else (id, d, val)
    rows."""
    from opentsdb_spark.pipeline.sampling import _hashed_ngram_feats

    feats = _hashed_ngram_feats(docs, content_col, id_col, n_buckets, F.xxhash64)

    def term(d: int):
        # coefficient(bucket, d) = +/-1 from bit 0 of xxhash64(bucket*dim+d);
        # summing the coefficient per occurrence equals summing
        # count(bucket) * coefficient per distinct bucket
        h = F.xxhash64((F.col("bucket") * dim + F.lit(d)).cast("long"))
        return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1)) \
            .otherwise(F.lit(-1)).cast("long")

    proj = feats.groupBy(id_col).agg(
        *[F.sum(term(d)).alias(f"__v{d}") for d in range(dim)])
    ssq = None
    for d in range(dim):
        sq = F.col(f"__v{d}") * F.col(f"__v{d}")
        ssq = sq if ssq is None else ssq + sq
    nrm = F.sqrt(ssq.cast("double"))
    vec = F.array(*[
        F.when(nrm > 0, F.col(f"__v{d}").cast("double") / nrm)
        .otherwise(F.lit(0.0)) for d in range(dim)
    ])
    if packed:
        return proj.select(id_col, vec.alias("embedding"))
    return proj.select(id_col, F.posexplode(vec).alias("d", "val"))


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE merge list (train_bpe output) to the corpus —
    the encode step: per word, repeatedly merge the present pair with the
    LOWEST merge rank (the standard greedy BPE encode, the exact inverse
    of the training loop's construction order) until no ranked pair
    remains. Returns (id, tokens array<string>, n_tokens).

    Scale shape: one Arrow-batched narrow map; the merge-rank table rides
    the UDF closure exactly as a production tokenizer's vocab ships to
    executors, and encodes memoize per DISTINCT word within a batch, so
    per-batch cost tracks the batch's vocabulary, not its token count.
    Encoding the training corpus with its own merges reproduces
    train_bpe's final segmentation table (pinned in tests)."""
    rank = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        import re as _re

        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is not None:
                return got
            s = list(word) + ["</w>"]
            while len(s) > 1:
                best, bi = None, None
                for i in range(len(s) - 1):
                    r = rank.get((s[i], s[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, bi = r, i
                if best is None:
                    break
                a, b = merges[best]
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            memo[word] = s
            return s

        res = []
        for t in texts:
            toks: list[str] = []
            for w in _re.findall(r"\S+", (t or "").lower()):
                toks.extend(enc(w))
            res.append(toks)
        return pd.Series(res)

    return docs.select(
        id_col, encode(F.col(content_col)).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens"))


def _jvm_long_array_lit(spark, values: list[int]):
    """ONE ArrayType(LongType) Literal Column from a Python long list.

    ``F.lit(list)`` lowers to CreateArray over len(values) literal nodes —
    rebuilt PER ROW in generated code (a measured 10x regression for the
    BM25 bloom bitmap) — whereas ``functions.lit(long[])`` on the JVM side
    is a single constant reference. The values cross the gateway as one
    byte[] (py4j per-element array writes are ~ms each). Returns None
    when no JVM gateway is reachable (Spark Connect) — callers treat the
    literal as an optional fast path."""
    import struct

    sc = getattr(spark, "sparkContext", None)
    jvm = getattr(spark, "_jvm", None)
    if sc is None or jvm is None:
        return None
    from pyspark.sql.column import Column as _PyCol

    n = len(values)
    jarr = sc._gateway.new_array(jvm.long, n)
    jvm.java.nio.ByteBuffer.wrap(
        struct.pack(f">{n}q", *values)).asLongBuffer().get(jarr)
    return _PyCol(jvm.org.apache.spark.sql.functions.lit(jarr))


def bm25_search(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    content_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
    literal_map_max_terms: int = 512,
) -> DataFrame:
    """Okapi BM25 lexical retrieval: score every document against each
    query string, return the top-``k`` docs per query — the sparse
    (keyword) complement to the dense ANN retrieval in
    ``pipeline.similarity``, and the standard first-stage ranker of a
    retrieval-augmented data pipeline.

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))      (Robertson/Lucene)
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))

    100 TB shape: NOTHING corpus-sized ever shuffles, and nothing joins.
    Every term-level statistic is BOUNDED BY THE QUERY (<= |terms| rows):
    document frequencies and the corpus N/avgdl scalars are collected to
    the driver and embedded as literal maps, so the scoring plan is two
    narrow corpus scans (one scalar-agg for dl stats, one probe) + one
    hit-sized groupBy(doc, term) shuffle + one tiny groupBy(query, doc) —
    no broadcast exchanges, no join stages at all. Query terms filter the
    token ARRAY before the explode (an In-set predicate), so non-hit
    tokens never materialize as rows. Top-k per query partitions the
    window by query id — no global sort, and with a handful of queries
    the ranked frame is tiny.

    NOTE: collecting df/N/avgdl makes this operator EAGER — it runs two
    small Spark jobs at call time (the collected frames are query-bounded,
    never corpus-bounded). The join-free shape exists because re-JITing
    the three join stages dominated warm CPU at small scale; at 100 TB the
    same shape simply removes three exchanges.

    LARGE QUERY SETS: the literal-map plan grows with the term count
    (create_map over 2*|terms| literals, an In-list of |terms| in the
    pre-explode filter) — fine for interactive retrieval, but a 10k-term
    batch query set would bloat the analyzed plan and the driver. Above
    ``literal_map_max_terms`` distinct terms the operator falls back to
    the BROADCAST-JOIN form: the term/query and df tables ride as
    broadcast frames (still query-bounded build sides) and token hits
    come from an explode + broadcast semi-probe instead of the In-list.
    Same expression tree after the join, so doubles — and therefore
    ranks — are identical between the two plans (pinned by tests).

    Ties break by doc id ascending for determinism.
    """
    from pyspark.sql import Window

    from opentsdb_spark.pipeline.dedup import _persist_small

    # token -> [query ids] (a term may serve several queries)
    qmap: dict[str, list[str]] = {}
    for qid, qtext in queries:
        for tok in dict.fromkeys(qtext.lower().split()):
            qmap.setdefault(tok, []).append(qid)
    empty = docs.limit(0).select(
        F.lit("").alias("query_id"), F.lit(0).alias("rank"), F.col(id_col),
        F.lit(0).cast("long").alias("matched_terms"),
        F.lit(0.0).alias("score"))
    if not qmap:
        return empty

    # _words is a \S+ extract: it cannot emit '' tokens, so size() == the
    # old sum-of-tf doc length and the N below counts docs with >= 1 token
    toks = docs.select(F.col(id_col), _words(F.col(content_col)).alias("__toks"))
    # regexp_count(\S+) == size(regexp_extract_all(\S+)): the stats scan
    # never materializes the token strings
    dl_only = docs.select(
        F.regexp_count(F.col(content_col), F.lit(r"\S+")).alias("dl"))
    n_row = dl_only.where(F.col("dl") > 0).agg(
        F.count("*").alias("__n"), F.avg("dl").alias("__avgdl")).first()
    n_docs, avgdl = int(n_row["__n"]), n_row["__avgdl"]
    if avgdl is None:  # empty corpus
        return empty

    term_set = list(qmap)
    use_literal = len(term_set) <= literal_map_max_terms
    spark = docs.sparkSession
    if use_literal:
        # query-term hits only: filter the token array BEFORE exploding, so
        # non-matching tokens never become rows and nothing joins
        hits = toks.select(
            F.col(id_col), F.size("__toks").alias("dl"),
            F.explode(
                F.filter("__toks", lambda x: x.isin(*term_set))
            ).alias("token"),
        )
    else:
        # broadcast semi-probe: the In-list would put |terms| literal nodes
        # in the plan; a broadcast hash probe of the term table keeps the
        # plan size constant while still dropping non-hit tokens before
        # anything corpus-sized shuffles. A Bloom bitmap of the term set
        # (k=2 disjoint 17-bit slices of ONE xxhash64 — the
        # bloom_decontaminate construction — over a 2^17-bit array packed
        # into ONE 2048-long array Literal) is the ONLY per-token gate:
        # a codegen .where() right after the explode. It REPLACES the
        # broadcast semi-probe rather than preceding it (the r9 warm-CPU
        # autopsy measured the probe itself — per-token murmur + build-
        # side lookup + row copy — at ~60% of the fallback's CPU over the
        # literal plan): the (token, query_id) INNER join downstream
        # already drops every bloom false positive exactly — an FP is by
        # definition not a query term, so it cannot match q_tbl — and FP
        # df rows are dropped with them, so results stay bit-identical to
        # the literal plan. FPs (~(2n/2^17)^2 of the non-term stream,
        # <3% even for a 10k-term batch set) only pad the hit-sized
        # postings groupBy. Two further deliberate shapes:
        #   * NOT inside an array-filter lambda — HOF lambdas evaluate
        #     INTERPRETED (no whole-stage codegen), measured 4x slower
        #     than this exploded codegen pipeline (the explode itself is
        #     pipelined-narrow generated code);
        #   * ONE JVM-side Literal, not F.lit(list) — the Python list
        #     form lowers to CreateArray over 2048 literal nodes, which
        #     re-builds the array PER ROW (measured 10x regression);
        #     functions.lit(long[]) through the gateway is a single
        #     constant reference in generated code. 2^17 bits (16 KiB)
        #     keeps plan dumps bounded — the constraint this fallback
        #     exists to honor.
        m_bits, k_hashes, wbits = 1 << 17, 2, 17
        mask = m_bits - 1
        words = [0] * (m_bits >> 6)
        from opentsdb_spark.pipeline.xxh64_sql import py_xxh64

        for t in term_set:
            h = py_xxh64(t.encode("utf-8")) & ((1 << 64) - 1)
            for i in range(k_hashes):
                p = (h >> (wbits * i)) & mask
                words[p >> 6] |= 1 << (p & 63)
        bitmap = _jvm_long_array_lit(spark, [
            wd - (1 << 64) if wd >= (1 << 63) else wd for wd in words])

        def _bloom_hit(tok):
            h = F.xxhash64(tok)
            tests = []
            for i in range(k_hashes):
                p = F.shiftrightunsigned(h, wbits * i).bitwiseAND(F.lit(mask))
                word = F.element_at(
                    bitmap, (F.shiftrightunsigned(p, 6) + 1).cast("int"))
                tests.append(
                    F.bit_get(word, p.bitwiseAND(F.lit(63))) == 1)
            out = tests[0]
            for t_ in tests[1:]:
                out = out & t_
            return out

        exploded = toks.select(
            F.col(id_col), F.size("__toks").alias("dl"),
            F.explode("__toks").alias("token"),
        )
        if bitmap is not None:
            hits = exploded.where(_bloom_hit(F.col("token")))
        else:
            # no JVM gateway (Spark Connect): exact broadcast semi-probe
            tdf = tiny_df(spark, [(t,) for t in sorted(term_set)],
                          "token string")
            hits = exploded.join(F.broadcast(tdf), on="token",
                                 how="left_semi")
    postings = _persist_small(
        hits.groupBy(id_col, "token").agg(
            F.count("*").alias("tf"), F.first("dl").alias("dl")),
        persist)
    if use_literal:
        # df is bounded by |terms|: collect and fold into a literal map
        # (the same expression tree as the join form, so doubles are
        # identical)
        dfs = {r["token"]: r["df"] for r in
               postings.groupBy("token").agg(F.count("*").alias("df")).collect()}
        df_map = F.create_map(
            *[F.lit(v) for t in dfs for v in (t, int(dfs[t]))])
        qid_map = F.create_map(
            *[F.lit(v) if not isinstance(v, list) else F.array(*map(F.lit, v))
              for t in term_set for v in (t, qmap[t])])
        scored = (
            postings
            .withColumn("query_id",
                        F.explode(F.element_at(qid_map, F.col("token"))))
            .withColumn("df", F.element_at(df_map, F.col("token")))
        )
    else:
        # both build sides stay query-bounded: df is the |terms|-row
        # aggregate of the postings, the (term, query) table is the parsed
        # query set itself — broadcast hash joins, never a shuffle
        df_tbl = postings.groupBy("token").agg(F.count("*").alias("df"))
        q_tbl = tiny_df(
            spark, [(t, q) for t in sorted(term_set) for q in qmap[t]],
            "token string, query_id string")
        scored = (
            postings
            .join(F.broadcast(q_tbl), on="token")
            .join(F.broadcast(df_tbl), on="token")
        )
    scored = (
        scored
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "w",
            F.col("idf")
            * F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("w").alias("score"), F.count("*").alias("matched_terms"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "matched_terms", "score")
    )


def vocab_topk_grouped(
    docs: DataFrame,
    k: int = 10,
    group_col: str = "lang",
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group vocabulary heavy hitters: the top-``k`` tokens of each
    language/source/domain by term frequency (ties by token asc) with
    document frequency alongside — the grouped sibling of ``vocab_topk``,
    the report that drives per-language tokenizer/mixture decisions.

    Scale shape: one tokenize+explode scan; (group, token) counts partial-
    aggregate map-side, so the shuffle carries the per-task distinct
    vocabulary, not the corpus; the top-k window partitions by group over
    the AGGREGATED vocab frame (rows = groups x distinct tokens, payload =
    two longs) — never over documents.
    """
    from pyspark.sql import Window

    words = docs.select(
        F.col(group_col),
        F.col(id_col),
        F.explode(_words(F.col(content_col))).alias("token"),
    ).where(F.col("token") != "")
    counts = words.groupBy(group_col, "token").agg(
        F.count("*").alias("tf"),
        F.count_distinct(id_col).alias("df"),
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("tf"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group_col, "rank", "token", "tf", "df")
    )


def token_entropy(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token-distribution Shannon entropy (bits) — the
    compression-proxy quality signal: near-zero entropy means a repetitive
    or templated document (the failure mode Gopher's repetition gates
    target), unusually high entropy for its length flags token soup. For
    counts c_t over dl tokens, H = log2(dl) - sum(c_t*log2(c_t))/dl.

    100 TB shape: tokens never shuffle as strings — counts key on
    xxhash64(token) (a collision could only merge two counts, changing a
    rounded value the oracle compare would expose), the (id, hash) count
    is map-side-combinable, and the per-doc fold is one more combinable
    aggregation. All codegen; no UDF, no window.

    Returns (id, n_tokens, entropy) for docs with >= 1 token."""
    tok = docs.select(
        F.col(id_col),
        F.explode(_words(F.col(content_col))).alias("__t"),
    ).select(id_col, F.xxhash64("__t").alias("__th"))
    cnt = tok.groupBy(id_col, "__th").agg(F.count("*").alias("__c"))
    return (
        cnt.groupBy(id_col)
        .agg(
            F.sum("__c").alias("__dl"),
            F.sum(F.col("__c") * F.log2("__c")).alias("__s"),
        )
        .select(
            id_col,
            F.col("__dl").cast("long").alias("n_tokens"),
            (F.log2("__dl") - F.col("__s") / F.col("__dl")).alias("entropy"),
        )
    )


def intra_doc_repetition(
    docs: DataFrame,
    k: int = 5,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Intra-document k-token window repetition — the generation-loop /
    template detector: the fraction of a doc's k-token windows whose
    exact window recurs WITHIN THE SAME document. Complements the other
    repetition signals at a finer grain: Gopher's distinct-token ratio
    catches token-level monotony, dup_frac catches cross-document
    copying; this catches the "same 20-word block pasted 50 times"
    failure (scraper loops, boilerplate stutter, LLM decode loops) that
    both can miss.

    Scale shape: windows collapse immediately to (id, xxhash64) — text
    never shuffles — then TWO map-side-combinable aggregations: counts
    per (id, hash), then the per-doc fold. A collision could only merge
    two windows in the same doc; the string-keyed oracle would expose it.

    Returns (id, n_windows, repeated_windows, rep_frac) for docs with
    >= k words — repeated_windows counts window OCCURRENCES that are part
    of any within-doc repeat (so a block pasted 3 times contributes all
    3 occurrences)."""
    from opentsdb_spark.pipeline.dedup import _gram_frame

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    win = (
        _gram_frame(docs, content_col, id_col, k, distinct=False)
        .select(id_col, F.explode("grams").alias("g"))
        .select(id_col, F.xxhash64("g").alias("__h"))
    )
    cnt = win.groupBy(id_col, "__h").agg(F.count("*").alias("__c"))
    return (
        cnt.groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("__c") >= 2, F.col("__c"))
                  .otherwise(F.lit(0))).cast("long")
            .alias("repeated_windows"),
        )
        .select(
            id_col, "n_windows", "repeated_windows",
            (F.col("repeated_windows").cast("double")
             / F.col("n_windows").cast("double")).alias("rep_frac"),
        )
    )


def gram_novelty(
    docs: DataFrame,
    n: int = 3,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's DISTINCT
    n-grams that appear in no other document (corpus document frequency
    1) — the inverse signal to dup_frac: near-0 novelty means the doc is
    assembled from corpus-common phrasing (template/boilerplate/spun
    content), near-1 means genuinely fresh text worth keeping even when
    other quality signals are borderline. The complement of the
    decontaminate/overlap family: those find WHAT is shared, this scores
    each doc by HOW MUCH of it is shared.

    Scale shape: per-doc distinct grams collapse to (id, xxhash64) rows
    (text never shuffles), persisted once; then TWO map-side-combinable
    aggregations — per-doc gram counts, and per-hash (df, min id) where a
    df-1 hash's single owner IS min(id) — joined at DOC granularity. The
    gram frame itself never rides a join: the previous formulation
    (grams JOIN df ON hash, then per-doc fold) shuffled every gram row
    twice through the hash join; this one shuffles only combined partials
    (docs + vocabulary), never gram occurrences. A hash collision could
    only merge two grams' df — the string-keyed oracle's value compare
    would expose it.

    Returns (id, n_grams, novel_grams, novelty) for docs with >= n
    words."""
    from opentsdb_spark.pipeline.dedup import _gram_frame, _persist_small

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = _persist_small(
        _gram_frame(docs, content_col, id_col, n, distinct=True)
        .select(id_col, F.explode("grams").alias("g"))
        .select(id_col, F.xxhash64("g").alias("__h")),
        True,
    )
    per_doc = grams.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_grams"))
    # df == 1 means the hash has exactly ONE (id, hash) row, so min(id) is
    # its sole owner — per-doc novel counts come from the vocabulary-
    # granularity aggregate alone, no join back to the gram frame
    novel = (
        grams.groupBy("__h")
        .agg(F.count("*").alias("__df"), F.min(id_col).alias(id_col))
        .where(F.col("__df") == 1)
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("novel_grams"))
    )
    return (
        per_doc.join(novel, on=id_col, how="left")
        .select(
            id_col, "n_grams",
            F.coalesce("novel_grams", F.lit(0)).cast("long").alias("novel_grams"),
        )
        .select(
            id_col, "n_grams", "novel_grams",
            (F.col("novel_grams").cast("double")
             / F.col("n_grams").cast("double")).alias("novelty"),
        )
    )


def doc_length_quantiles(
    docs: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_col: str = "source",
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT per-group document-length percentiles — the corpus-shape
    audit a mixture designer reads before setting packing lengths, chunk
    sizes and per-source caps (a source whose p99 token count collapses
    between crawls usually broke at extraction). Percentile convention is
    rank-ceil(q*n), 1-based — the reference's "upper" median rule
    (Aggregators.java:397-431), same as binned_percentile_downsample.

    Unlike percentile_approx (an opaque sketch) this is a pure
    deterministic function of the length multiset, SQL-replicable: token
    counts are INTEGERS, so per-(group, length) counts lose nothing —
    state is bounded by groups x DISTINCT lengths (<= the longest
    document, not the corpus), both aggregations are map-side
    combinable, and the cumulative scan is a window over that bounded
    frame ordered by length. No value list ever materializes.

    Returns one row per (group, q): (group, q, n_docs, q_len)."""
    from pyspark.sql import Window

    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"each q must be in (0, 1], got {qs!r}")
    lens = docs.select(
        F.coalesce(F.col(group_col).cast("string"),
                   F.lit("\x00__null__")).alias("__g"),
        F.size(_words(F.col(content_col))).cast("long").alias("__len"),
    )
    cnt = lens.groupBy("__g", "__len").agg(F.count("*").alias("__c"))
    w = Window.partitionBy("__g").orderBy("__len") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = Window.partitionBy("__g")
    cum = cnt.withColumn("__cum", F.sum("__c").over(w)) \
             .withColumn("__n", F.sum("__c").over(wn))
    qdf = tiny_df(docs.sparkSession, [(float(q),) for q in sorted(qs)],
                  "q double")
    hit = cum.crossJoin(F.broadcast(qdf)).where(
        F.col("__cum") >= F.ceil(F.col("q") * F.col("__n")))
    return (
        hit.groupBy("__g", "q")
        .agg(F.min("__len").alias("q_len"), F.first("__n").alias("n_docs"))
        .select(
            F.when(F.col("__g") == "\x00__null__", F.lit(None))
            .otherwise(F.col("__g")).alias(group_col),
            "q", F.col("n_docs").cast("long").alias("n_docs"), "q_len",
        )
    )


def vocab_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    top_n: int = 20,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram-distribution drift between two corpus snapshots — the TEXT
    twin of similarity.embedding_drift (crawl N vs crawl N+1, corpus vs
    incoming feed): compare each side's token relative frequencies and
    report
      * the ``top_n`` movers by absolute share delta (p_b - p_a), the
        tokens whose prevalence changed most — new spam vocabularies,
        boilerplate surges, language-mix shifts show up here by name;
      * the corpus-level Jensen-Shannon divergence (natural log) between
        the two unigram distributions as a constant ``jsd`` column — a
        healthy recrawl sits near 0, an encoding/pipeline regression
        jumps it.

    100 TB shape: classic wordcount on each side (map-side partial
    aggregation — the shuffle is vocabulary-sized, never occurrences),
    one full-outer vocab join, totals as two 1-row broadcast cross joins,
    and the JSD fold is one more combinable aggregate over the vocab
    frame. The mover selection is TakeOrderedAndProject (bounded heaps) —
    the vocabulary never globally sorts. Share/delta doubles are pure
    divisions of exact integer counts, so ordering keys are bit-identical
    in any engine; ln appears only inside the (rounded) JSD output, never
    in an ordering key (the lm_score rule).

    Returns top_n rows (token, cnt_a, cnt_b, p_a, p_b, delta, jsd),
    delta DESC-by-|.|, ties by token ASC."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")

    def wc(d: DataFrame, tag: str) -> DataFrame:
        return (
            d.select(F.explode(_words(F.col(content_col))).alias("token"))
            .groupBy("token").agg(F.count("*").alias(f"cnt_{tag}"))
        )

    j = wc(docs_a, "a").join(wc(docs_b, "b"), on="token", how="full")
    ca = F.coalesce(F.col("cnt_a"), F.lit(0)).cast("long")
    cb = F.coalesce(F.col("cnt_b"), F.lit(0)).cast("long")
    tot = j.agg(F.sum(ca).alias("__ta"), F.sum(cb).alias("__tb"))
    j = j.select("token", ca.alias("cnt_a"), cb.alias("cnt_b")) \
        .crossJoin(F.broadcast(tot))
    pa = F.col("cnt_a").cast("double") / F.col("__ta").cast("double")
    pb = F.col("cnt_b").cast("double") / F.col("__tb").cast("double")
    m = (pa + pb) / F.lit(2.0)
    # 0*ln(0/m) := 0 (absent-side tokens contribute only on their side)
    contrib = (
        F.when(F.col("cnt_a") > 0, F.lit(0.5) * pa * F.log(pa / m))
        .otherwise(F.lit(0.0))
        + F.when(F.col("cnt_b") > 0, F.lit(0.5) * pb * F.log(pb / m))
        .otherwise(F.lit(0.0))
    )
    scored = j.select(
        "token", "cnt_a", "cnt_b",
        pa.alias("p_a"), pb.alias("p_b"), (pb - pa).alias("delta"),
        contrib.alias("__c"),
    )
    jsd = scored.agg(F.sum("__c").alias("jsd"))
    return (
        scored.orderBy(F.abs(F.col("delta")).desc(), F.asc("token"))
        .limit(top_n)
        .crossJoin(F.broadcast(jsd))
        .select("token", "cnt_a", "cnt_b", "p_a", "p_b", "delta", "jsd")
    )


def source_ngram_overlap(
    docs: DataFrame,
    n: int = 3,
    group_col: str = "source",
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source n-gram contamination matrix — the audit a mixture
    designer runs before weighting sources: for every source pair, how
    much of their n-gram vocabulary is SHARED (Jaccard over distinct
    n-gram sets). High overlap between a "curated" and a "crawl" source
    means the crawl already contains the curated data (double-counting
    risk); near-zero overlap across shards of one provider flags a
    partitioning bug.

    100 TB shape: each source's gram set collapses to DISTINCT (source,
    xxhash64(gram)) rows first — map-side-combinable, bounded by
    sources x vocabulary however many times a gram repeats; then ONE
    vocabulary-granularity aggregate collects each gram's source SET
    (bounded by #sources) and expands it to its C(s, 2) ordered pairs
    in-place — no self-join, so the distinct frame is never shuffled
    through two extra exchanges. Source totals ride the same per-gram
    set frame. Output is one row per source pair. A hash collision could
    only merge two grams; the string-keyed oracle's value compare would
    expose it.

    Returns (source_a, source_b, grams_a, grams_b, shared_grams, jaccard)
    for pairs sharing >= 1 gram, source_a < source_b."""
    from opentsdb_spark.pipeline.dedup import _gram_frame, _persist_small

    sg = (
        _gram_frame(docs, content_col, id_col, n, distinct=True,
                    extra_cols=(group_col,))
        .select(group_col, F.explode("grams").alias("__g"))
        .select(group_col, F.xxhash64("__g").alias("__gh"))
        .distinct()
    )
    per_gram = _persist_small(
        sg.groupBy("__gh").agg(
            F.array_sort(F.collect_set(group_col)).alias("__ss")),
        True,
    )
    tot = per_gram.select(F.explode("__ss").alias(group_col)) \
        .groupBy(group_col).agg(F.count("*").alias("__tot"))
    ss = F.col("__ss")
    pair_arr = F.flatten(F.transform(
        ss,
        lambda a, i: F.transform(
            F.slice(ss, i + 2, F.size(ss)),
            lambda b: F.struct(a.alias("source_a"), b.alias("source_b")),
        ),
    ))
    inter = (
        per_gram.where(F.size("__ss") > 1)
        .select(F.explode(pair_arr).alias("__p"))
        .groupBy(F.col("__p.source_a").alias("source_a"),
                 F.col("__p.source_b").alias("source_b"))
        .agg(F.count("*").alias("shared_grams"))
    )
    ta = tot.select(F.col(group_col).alias("source_a"),
                    F.col("__tot").alias("grams_a"))
    tb = tot.select(F.col(group_col).alias("source_b"),
                    F.col("__tot").alias("grams_b"))
    return (
        inter.join(F.broadcast(ta), on="source_a")
        .join(F.broadcast(tb), on="source_b")
        .select(
            "source_a", "source_b", "grams_a", "grams_b", "shared_grams",
            (F.col("shared_grams")
             / (F.col("grams_a") + F.col("grams_b") - F.col("shared_grams"))
             ).alias("jaccard"),
        )
    )


def zipf_alpha(
    docs: DataFrame,
    k: int = 100,
    group_col: str = "lang",
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Zipf rank-frequency exponent per group (language/source): OLS fit
    of ln(tf) on ln(rank) over the group's top-``k`` tokens; alpha is the
    NEGATED slope (natural text sits near alpha ~ 1). The corpus-health
    audit behind tokenizer/mixture decisions: a source whose alpha
    collapses toward 0 is templated/boilerplate-heavy (flat frequencies),
    one far above ~1.2 is dominated by a few tokens (spam, log dumps) —
    the distribution-level complement of the per-document entropy gate.

    Scale shape: classic wordcount (map-side-combined (group, token)
    counts), a per-group top-k window over the AGGREGATED vocabulary
    (groups x distinct-token rows, two-long payload — never documents),
    then the regression folds as five combinable sum() aggregates over at
    most groups x k rows: slope = (n*sxy - sx*sy) / (n*sxx - sx^2). Pure
    ln/mul/add — the catalog oracle replays the identical formula.

    Returns (group, n_ranks, alpha, intercept): intercept = the fitted
    ln-frequency at rank 1. Groups with < 3 ranked tokens yield NULL
    alpha (a 2-point fit is not a law)."""
    from pyspark.sql import Window

    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    words = docs.select(
        F.col(group_col),
        F.explode(_words(F.col(content_col))).alias("token"),
    ).where(F.col("token") != "")
    counts = words.groupBy(group_col, "token").agg(F.count("*").alias("tf"))
    w = Window.partitionBy(group_col).orderBy(F.desc("tf"), F.asc("token"))
    ranked = (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("tf").cast("double"))
    fit = ranked.groupBy(group_col).agg(
        F.count("*").cast("double").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    n, sx, sy = F.col("__n"), F.col("__sx"), F.col("__sy")
    slope = (n * F.col("__sxy") - sx * sy) / (n * F.col("__sxx") - sx * sx)
    return fit.select(
        group_col,
        n.cast("int").alias("n_ranks"),
        F.when(n >= 3, -slope).alias("alpha"),
        F.when(n >= 3, (sy - slope * sx) / n).alias("intercept"),
    )


def pmi_collocations(
    docs: DataFrame,
    k: int = 20,
    min_count: int = 5,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information over
    ADJACENT word bigrams (Church & Hanks 1990): with unigram counts c_x
    over U total tokens and bigram counts c_xy over T total bigrams,
    PMI = ln( (c_xy / T) / ((c_x / U) * (c_y / U)) ) — pairs that co-occur
    far above chance. The phrase-mining signal behind tokenizer vocab
    extensions ("new york", "machine learning") and template detection
    (boilerplate word pairs score high too — inspect, don't auto-trust).
    ``min_count`` drops hapax pairs whose PMI is pure noise (the classic
    guard); ordering is (PMI desc, pair asc).

    Scale shape: unigram counts are wordcount (map-side combined,
    vocabulary-sized); bigrams explode one struct per adjacent token pair
    (O(corpus tokens) narrow rows) and partial-aggregate to the bigram
    vocabulary; the two count joins run at vocabulary granularity on
    token keys (AQE broadcasts when small); the final top-k is
    TakeOrderedAndProject. No window over occurrence-sized data.

    Returns (w1, w2, n_pair, n_w1, n_w2, pmi)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    ws = docs.select(_words(F.col(content_col)).alias("ws")).where(
        F.size("ws") >= 2
    )
    uni = (
        docs.select(F.explode(_words(F.col(content_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n_uni"))
    )
    # adjacent pairs; size >= 2 is guaranteed above (sequence(1, 0) would
    # COUNT DOWN — Spark infers step -1 when start > stop)
    big = ws.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> struct(ws[i-1] AS w1, ws[i] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    tot_b = bc.agg(F.sum("n_pair").alias("__t"))
    tot_u = uni.agg(F.sum("n_uni").alias("__u"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_uni").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_uni").alias("n_w2"))
    joined = (
        bc.where(F.col("n_pair") >= min_count)
        .join(u1, on="w1")
        .join(u2, on="w2")
        .crossJoin(F.broadcast(tot_b))
        .crossJoin(F.broadcast(tot_u))
    )
    t = F.col("__t").cast("double")
    u = F.col("__u").cast("double")
    pmi = F.log(
        (F.col("n_pair").cast("double") / t)
        / ((F.col("n_w1").cast("double") / u) * (F.col("n_w2").cast("double") / u))
    )
    return (
        joined.select("w1", "w2", "n_pair", "n_w1", "n_w2", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
