"""Text-analysis functions: tokens, counting, quality, language ID, fingerprints.

All pure built-in `pyspark.sql.functions` expressions (JVM-side, whole-stage
codegen) — deliberately NO Python UDFs so these run at full Tungsten speed over
100 TB of text and stay exactly reproducible in an ANSI-SQL oracle.

Reference analogs: Solr's language-ID update processor
(solr/modules/langid/src/java/org/apache/solr/update/processor/
LangDetectLanguageIdentifierUpdateProcessor.java) and the dedup-signature processor
(solr/core/src/java/org/apache/solr/update/processor/Lookup3Signature.java) — both
re-imagined as column transforms before write (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.stopwords import ENGLISH_STOPWORDS

# deterministic marker set for the stopword-ratio language heuristic
_EN_MARKERS = sorted(ENGLISH_STOPWORDS - {"stopworda", "stopwordb"})


def whitespace_tokens(col: Column | str) -> Column:
    """Whitespace tokenizer as a JVM expression: string -> array<string>.

    (The index path uses the UAX#29 analyzer in solr_spark.analysis; this cheap
    tokenizer is for corpus statistics / dedup shingling where exact UAX#29
    segmentation is not required.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Token count per document (whitespace tokenization)."""
    return F.size(whitespace_tokens(col))


def stop_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are English stopwords (0 for empty docs)."""
    toks = whitespace_tokens(col)
    stops = F.size(F.filter(toks, lambda t: F.lower(t).isin(_EN_MARKERS)))
    return F.when(F.size(toks) > 0, stops / F.size(toks)).otherwise(F.lit(0.0))


def lang_id(col: Column | str, threshold: float = 0.05) -> Column:
    """Heuristic language ID: 'en' when the English-stopword ratio clears the
    threshold, else 'und'. (A real model slots in as a pandas UDF; the plumbing —
    one pass, no shuffle — is the deliverable.)"""
    return F.when(stop_ratio(col) >= threshold, F.lit("en")).otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Document quality score in [0,1] from cheap surface statistics:
    length band (20..2000 tokens), mean token length band (3..12 chars), and a
    stopword-ratio band — the classic C4/Gopher-style heuristic shape, all as one
    codegen'd expression. Returns a struct(n_tokens, mean_token_len, stop_ratio,
    score)."""
    toks = whitespace_tokens(col)
    n = F.size(toks)
    mean_len = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0).cast("double"),
                    lambda acc, t: acc + F.length(t)) / n,
    ).otherwise(F.lit(0.0))
    sr = stop_ratio(col)
    len_ok = (n >= 20) & (n <= 2000)
    word_ok = (mean_len >= 3.0) & (mean_len <= 12.0)
    stop_ok = sr >= 0.01
    score = (len_ok.cast("double") + word_ok.cast("double") + stop_ok.cast("double")) / 3.0
    return F.struct(
        n.alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(sr, 4).alias("stop_ratio"),
        F.round(score, 4).alias("score"),
    )


def doc_fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 over the sorted distinct token set.

    Word-order-insensitive (catches shuffled duplicates), deterministic across
    engines (md5 of a canonical string). Reference analog: the dedup-signature
    update processor (update/processor/Lookup3Signature.java) which hashes
    configured fields into an indexed signature field.
    """
    toks = whitespace_tokens(col)
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return F.md5(canon)


def ngram_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows (dedup input).

    Documents shorter than n tokens yield their full token string as one shingle.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = whitespace_tokens(c)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def repetition_stats(col: Column | str, n: int = 2) -> Column:
    """Gopher-style repetition signals over word n-grams, per document, as one
    codegen'd expression (no shuffle — the shingle set algebra is row-local):

      * top_ngram_char_frac — duplication mass of the heaviest n-gram:
        max over grams of count * len(gram) / len(text). (Deterministic
        variant of the published "fraction of characters in the most common
        n-gram" — overlapping windows make exact coverage ill-defined, so we
        use the standard count*len approximation.)
      * dup_ngram_char_frac — sum of count * len over grams with count > 1,
        / len(text) (the published "fraction of characters in duplicate
        n-grams" approximation).
      * dup_token_frac — 1 - distinct/total tokens.

    The repetition filters of the large-scale LM data pipelines (Gopher /
    MassiveText rules; public) — a document failing these is boilerplate or a
    crawler trap. Per-gram counts come from ONE array_sort + run-length scan
    (a struct-accumulator `aggregate`), so the per-row cost is
    O(tokens log tokens) JVM work — documents are bounded, the corpus is not.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = whitespace_tokens(c)
    sorted_sh = F.array_sort(ngram_shingles(c, n))
    total = F.length(c).cast("double")
    # run-length scan over the sorted grams: acc = (prev gram, run length,
    # max single-gram mass, duplicated mass); mass of a run = count * len(gram)
    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.lit(0.0).alias("top"),
                    F.lit(0.0).alias("dup"))

    def _close_run(acc):
        mass = acc["run"].cast("double") * F.length(acc["prev"]).cast("double")
        mass = F.coalesce(mass, F.lit(0.0))
        return (F.greatest(acc["top"], mass),
                acc["dup"] + F.when(acc["run"] > 1, mass).otherwise(F.lit(0.0)))

    def _step(acc, g):
        top2, dup2 = _close_run(acc)
        same = acc["prev"].isNotNull() & (g == acc["prev"])
        return F.struct(
            g.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
             .alias("run"),
            F.when(same, acc["top"]).otherwise(top2).alias("top"),
            F.when(same, acc["dup"]).otherwise(dup2).alias("dup"))

    def _finish(acc):
        top2, dup2 = _close_run(acc)
        return F.struct(top2.alias("top"), dup2.alias("dup"))

    scanned = F.aggregate(sorted_sh, init, _step, _finish)
    top = scanned["top"] / total
    dup = scanned["dup"] / total
    dup_tok = (F.lit(1.0)
               - F.size(F.array_distinct(toks)).cast("double")
               / F.size(toks).cast("double"))
    from solr_spark.functions.portable import round_half_away

    return F.struct(
        round_half_away(top, 4).alias("top_ngram_char_frac"),
        round_half_away(dup, 4).alias("dup_ngram_char_frac"),
        round_half_away(dup_tok, 4).alias("dup_token_frac"),
    )


# conservative, lookaround-free patterns shared verbatim by the DuckDB twin
# (Java regex and RE2 agree on this subset)
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{9,}\b", "<NUM>"),
)


def pii_redact(col: Column | str) -> Column:
    """Training-data PII scrub: emails, IPv4 literals, and 9+ digit runs
    (phone/account/card shapes) replaced with typed placeholders — a chain of
    codegen regexp_replace calls, engine-portable (patterns avoid dialect
    features; identical in Java regex and RE2). Order matters (emails first,
    so their digits aren't half-eaten) and is part of the contract.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c


_SOUNDEX_FROM = "AEIOUYHWBFPVCGJKQSXZDTLMNR"
_SOUNDEX_TO = "00000099111122222222334556"


def soundex_code(col: Column | str) -> Column:
    """American (US-census) Soundex, implemented from the published algorithm
    as engine-portable Column algebra — the phonetic-matching role of Solr's
    PhoneticFilterFactory / SoundexFilter (reference surface:
    solr/solr-ref-guide/modules/indexing-guide/pages/phonetic-matching.adoc:101;
    Solr delegates to commons-codec — no code consulted or copied here).

    Pipeline (identical expression shape in the DuckDB twin):
      1. strip non-letters, uppercase; empty -> ''.
      2. translate letters to codes (vowels+Y -> 0; H,W -> 9; consonant
         groups -> 1..6), delete the 9s FIRST — that makes letters separated
         only by H/W adjacent, implementing the census H/W-transparency rule.
      3. collapse runs of each digit 1..6 (no regex backreferences, so the
         RE2-based oracle runs the same six replaces).
      4. drop the leading code — it belongs to the kept first letter — UNLESS
         the first letter is H or W (its 9 was already deleted, so the lead
         code belongs to the second letter and must survive: Wright -> W623).
      5. delete the 0s (vowels only separate), pad with '000', keep 3.
    Pinned by the published census vectors (Robert/Rupert -> R163,
    Ashcraft -> A261, Tymczak -> T522, Pfister -> P236, Jackson -> J250).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.upper(F.regexp_replace(c, "[^A-Za-z]+", ""))
    first = F.substring(s, 1, 1)
    mapped = F.translate(s, _SOUNDEX_FROM, _SOUNDEX_TO)
    nohw = F.regexp_replace(mapped, "9", "")
    collapsed = nohw
    for d in "123456":
        collapsed = F.regexp_replace(collapsed, d + "{2,}", d)
    body = F.when(first.isin("H", "W"), collapsed) \
            .otherwise(F.substring(collapsed, 2, 2147483647))
    digits = F.regexp_replace(body, "0", "")
    return F.when(F.length(s) == 0, F.lit("")).otherwise(
        F.concat(first, F.substring(F.concat(digits, F.lit("000")), 1, 3)))


def soundex_sql(expr: str) -> str:
    """The DuckDB twin of soundex_code — same pipeline, RE2-safe (global
    flags explicit; DuckDB regexp_replace is first-match by default)."""
    s = f"upper(regexp_replace({expr}, '[^A-Za-z]+', '', 'g'))"
    mapped = f"translate({s}, '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')"
    collapsed = f"regexp_replace({mapped}, '9', '', 'g')"
    for d in "123456":
        collapsed = f"regexp_replace({collapsed}, '{d}{{2,}}', '{d}', 'g')"
    body = (f"CASE WHEN substr({s}, 1, 1) IN ('H', 'W') THEN {collapsed} "
            f"ELSE substr({collapsed}, 2) END")
    digits = f"regexp_replace({body}, '0', '', 'g')"
    return (f"CASE WHEN length({s}) = 0 THEN '' "
            f"ELSE substr({s}, 1, 1) || substr({digits} || '000', 1, 3) END")


def phonetic_matches(df: DataFrame, text_col: str,
                     query_term: str) -> DataFrame:
    """Phonetic term matching: the distinct tokens of `text_col` whose Soundex
    equals the query term's — a sounds-like spellcheck/search primitive
    (PhoneticFilterFactory's query-side effect). Output: token, code (token
    asc). One distinct-aggregate over the exploded tokens; the token
    dictionary is vocabulary-sized, so this survives any corpus size.
    """
    toks = df.select(F.explode(whitespace_tokens(text_col)).alias("token"))
    coded = toks.select("token", soundex_code("token").alias("code")).distinct()
    return (coded.where(F.col("code") == soundex_code(F.lit(query_term)))
                 .orderBy("token"))


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass per-document text profile: id, n_tokens, n_chars, mean_token_len,
    stop_ratio, lang, fingerprint, quality struct."""
    q = quality_score(text_col)
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        q["mean_token_len"].alias("mean_token_len"),
        q["stop_ratio"].alias("stop_ratio"),
        lang_id(text_col).alias("lang_pred"),
        doc_fingerprint(text_col).alias("fingerprint"),
        q["score"].alias("quality"),
    )


def _jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0  # empty-vs-anything is 0, including empty-vs-empty (DuckDB twin)
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m1, m2 = [False] * l1, [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - md), min(l2, i + md + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3


def jaro_winkler_kernel(s1: str, s2: str,
                        prefix_scale: float = 0.1,
                        boost_threshold: float = 0.7) -> float:
    """Scalar Jaro-Winkler similarity (standard constants; matches DuckDB's
    jaro_winkler_similarity bit-for-bit on the conformance pairs in tests)."""
    j = _jaro(s1 or "", s2 or "")
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip((s1 or "")[:4], (s2 or "")[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * prefix_scale * (1 - j)


def jaro_winkler(col1: Column | str, col2: Column | str) -> Column:
    """`strdist(a, b, jw)` (ValueSourceParser.java "strdist"): Jaro-Winkler
    similarity as an Arrow-batched pandas UDF (the one strdist family member
    with no JVM builtin; edit distance is F.levenshtein, ngram distance is
    composable from ngram_shingles)."""
    import pandas as pd

    @F.pandas_udf("double")
    def _jw(a, b):
        return pd.Series([jaro_winkler_kernel(x, y) for x, y in zip(a, b)],
                         index=a.index, dtype="float64")

    c1 = F.col(col1) if isinstance(col1, str) else col1
    c2 = F.col(col2) if isinstance(col2, str) else col2
    return _jw(c1, c2)


def c4_filters(df: DataFrame, id_col: str, text_col: str,
               min_words_per_line: int = 3, min_sentences: int = 5,
               newline: str = "\n",
               out_col: str = "cleaned_text") -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2, as kept/tuned by
    FineWeb) as one map-only codegen pass — the heuristic companion to the
    Gopher repetition filters in `repetition_stats`.

    Line level (lines failing any rule are dropped, survivors rejoined in
    order): (1) must end in a terminal punctuation mark (. ! ? or a closing
    quote), (2) must have >= min_words_per_line words, (3) must not contain
    the word "javascript". Page level (flags + a `keep` verdict; the page
    text itself is judged, not the cleaned text, matching the reference
    pipeline order): pages containing "lorem ipsum" or "{" are dropped, and
    the cleaned page must retain >= min_sentences sentence terminators.
    (C4's bad-words list is a data dependency, not an operator — plug it in
    as an extra `filter` on the same line array.)

    Output: input columns + out_col, n_lines, n_lines_kept, n_sentences,
    has_lorem_ipsum, has_curly_brace, keep. Shuffle count: ZERO — every rule
    is a higher-order array expression over the line split, whole-stage
    codegen, embarrassingly parallel at any scale.
    """
    text = F.col(text_col)
    lines = F.split(text, newline)

    def _line_ok(line: Column) -> Column:
        stripped = F.rtrim(line)
        last = F.substring(stripped, -1, 1)
        ends_ok = last.isin(".", "!", "?", '"', "”")
        n_words = F.size(F.filter(F.split(line, r"\s+"),
                                  lambda w: w != ""))
        no_js = ~F.contains(F.lower(line), F.lit("javascript"))
        return ends_ok & (n_words >= min_words_per_line) & no_js

    kept = F.filter(lines, _line_ok)
    cleaned = F.array_join(kept, newline)
    n_sent = F.regexp_count(cleaned, F.lit(r"[.!?]"))
    has_lorem = F.contains(F.lower(text), F.lit("lorem ipsum"))
    has_brace = F.contains(text, F.lit("{"))
    return (df
            .withColumn(out_col, cleaned)
            .withColumn("n_lines", F.size(lines).cast("long"))
            .withColumn("n_lines_kept", F.size(kept).cast("long"))
            .withColumn("n_sentences", n_sent.cast("long"))
            .withColumn("has_lorem_ipsum", has_lorem)
            .withColumn("has_curly_brace", has_brace)
            .withColumn("keep",
                        ~has_lorem & ~has_brace
                        & (n_sent >= min_sentences)))


# GPT-2-style pre-tokenizer (the BPE *piece splitter*, before vocab merges):
# contractions, optionally-space-prefixed letter runs / digit runs /
# punctuation runs, then whitespace runs. Deviation from the reference
# pattern, documented: the trailing-space lookahead `\s+(?!\S)` is dropped so
# the SAME pattern runs on RE2-based engines (RE2 has no lookahead) — interior
# multi-space runs therefore absorb their last space instead of donating it to
# the next piece. Piece COUNTS shift by at most one per multi-space run.
BPE_PRETOKEN_PATTERN = ("'s|'t|'re|'ve|'m|'ll|'d"
                        "| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+")


def bpe_token_count(col: Column | str) -> Column:
    """LLM-token budget proxy: GPT-2 pre-tokenizer piece count as one codegen
    regexp pass (true BPE merge counts need the merge table — a data
    dependency, not an operator; the pre-token count is the standard cheap
    upper-bound proxy for budgeting/packing). Whitespace tokenization
    (`token_count`) undercounts code/punctuation-heavy text; this does not."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PRETOKEN_PATTERN))
