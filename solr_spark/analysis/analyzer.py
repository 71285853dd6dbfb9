"""Analyzer chain: UAX#29-style tokenizer -> stop filter -> lowercase.

Mirrors the reference's default text_general chain order (reference:
solr/server/solr/configsets/_default/conf/managed-schema.xml:299-314 —
StandardTokenizer -> StopFilter(ignoreCase=true) -> LowerCaseFilter, built by
TokenizerChain, solr/core/src/java/org/apache/solr/analysis/TokenizerChain.java:36-49).

Tokenizer semantics follow Unicode UAX#29 word segmentation as Lucene's
StandardTokenizer implements it (public behavior):
  * runs of letters / digits / underscore form one token (underscore is ExtendNumLet);
  * apostrophes (' ’) join letter runs ("it's", "O'Brien's" stay single tokens);
  * '.' and ':' join letter runs (MidNumLet / MidLetter: "example.com");
  * '.' and ',' join digit runs (MidNum: "3.14", "1,000", "v2.1.0");
  * Han / Hiragana ideographs emit ONE token per character; Katakana emits runs;
  * tokens longer than max_token_length are split at that length;
  * everything else (whitespace, punctuation) breaks tokens.

The stop filter runs with ignoreCase=true BEFORE lowercasing in the reference chain;
because the stop set is all-lowercase and the word-character classes are case-closed,
lowercase-first + case-sensitive stop filtering is observably identical (documented
equivalence, asserted by the conformance vectors in tests/test_analyzer.py).

Kernel shape: one C-vectorized `.str.lower()` over the whole Arrow batch, then a
single regex findall + frozenset stop-filter pass per document — the regex scan is
the only per-row Python and is the irreducible core of the work.
"""

from __future__ import annotations

import pandas as pd
import regex

from solr_spark.analysis.stopwords import ENGLISH_STOPWORDS
from solr_spark.config import DEFAULT_CONFIG, IndexConfig

# One token per Han/Hiragana char; Katakana runs; word runs with UAX#29 mid-joiners.
# All groups non-capturing so `findall` returns full matches directly — ~2x faster
# than a finditer loop, and this regex scan is the single hottest piece of the
# whole index build.
_TOKEN_RE = regex.compile(
    r"""
      [\p{Han}\p{Hiragana}]
    | \p{Katakana}+
    | [\p{L}\p{M}\p{Nd}\p{Nl}_]+
      (?:
          (?: (?<=\p{L})['’:.](?=\p{L}) | (?<=\p{Nd})[.,](?=\p{Nd}) )
          [\p{L}\p{M}\p{Nd}\p{Nl}_]+
      )*
    """,
    regex.VERBOSE | regex.V1,
)


def _scan(text: str, max_len: int) -> list[str]:
    toks = _TOKEN_RE.findall(text)
    if any(len(t) > max_len for t in toks):
        out: list[str] = []
        for t in toks:
            if len(t) <= max_len:
                out.append(t)
            else:
                out.extend(t[i : i + max_len] for i in range(0, len(t), max_len))
        return out
    return toks


def _stopset(config: IndexConfig) -> frozenset[str]:
    return ENGLISH_STOPWORDS if config.stopwords == "en" else frozenset()


# ---------------------------------------------------------------------------
# Char-filter stage (TokenizerChain's charFilters* slot — reference:
# solr/core/src/java/org/apache/solr/analysis/TokenizerChain.java:36-49).
# Runs on the RAW text before any tokenization, in every engine path.
#
# html_strip = HTMLStripCharFilterFactory role, as an ordered engine-portable
# regex pipeline (documented subset of Lucene's state machine): script/style
# bodies, comments, then every tag become one separator each (deviation:
# Lucene drops inline tags without a separator; here every tag separates
# tokens); the common named entities decode, with &amp; LAST so entities are
# single-pass decoded ("&amp;lt;" -> "&lt;", never "<"); numeric entities
# become separators. No lookaround/backrefs, so the identical patterns run on
# java.util.regex, RE2 (DuckDB), and Python `regex`.
_HTML_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&apos;", "'"),
    (r"&#[0-9]+;", " "),
    (r"&amp;", "&"),
]


def _char_filter_steps(config: IndexConfig) -> list[tuple[str, str]]:
    steps = list(_HTML_STRIP_STEPS) if config.html_strip else []
    steps.extend(config.pattern_replace)
    return steps


def _apply_char_filters(text: str, compiled) -> str:
    for pat, repl in compiled:
        text = pat.sub(repl, text)
    return text


def char_filters_sql(expr: str, config: IndexConfig) -> str:
    """DuckDB twin of the char-filter stage (RE2: 'g' for global, \\1-style
    backrefs in replacements)."""
    out = expr
    for pat, repl in _char_filter_steps(config):
        sql_pat = pat.replace("'", "''")
        sql_repl = repl.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{sql_repl}', 'g')"
    return out


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter role (config.word_delimiter) — the text_en_splitting
# chain: whitespace tokenize + split subwords on case/digit/delimiter
# boundaries (reference surface: WordDelimiterGraphFilterFactory, wired in
# sample schemas' text_en_splitting; Solr delegates the rules to Lucene — no
# reference code consulted or copied; rules re-derived from the documented
# behavior and pinned by conformance vectors in tests/test_analyzer.py).
#
# ONE ordered step table renders into all three engines (Python `regex`,
# Spark/Java regexp_replace, DuckDB/RE2) — global, non-overlapping,
# left-to-right replace semantics are identical in all three, which is what
# makes the full-hash oracle gate possible:
#   1. strip English possessives ('s / ’s at a word end — stemEnglishPossessive)
#   2. acronym boundary: Lu-run followed by a capitalized word ("USAToday")
#   3. camelCase boundary: Ll -> Lu ("PowerShot")
#   4/5. letter <-> digit transitions ("SD500", "500X")
#   6. every non-alphanumeric run becomes one separator
# then lowercase, split, drop empties. \b is ASCII-word-boundary in RE2 and
# (default-flags) Java but Unicode in Python `regex`; the difference is only
# observable for possessives glued to non-ASCII word chars, which the
# conformance vectors deliberately avoid.
_WD_STEPS: list[tuple[str, str]] = [
    (r"['’][sS]\b", ""),
    (r"(\p{Lu}+)(\p{Lu}\p{Ll})", r"\1 \2"),
    (r"(\p{Ll})(\p{Lu})", r"\1 \2"),
    (r"(\p{L})(\p{Nd})", r"\1 \2"),
    (r"(\p{Nd})(\p{L})", r"\1 \2"),
    (r"[^\p{L}\p{Nd}]+", " "),
]

_WD_COMPILED = [(regex.compile(pat), repl) for pat, repl in _WD_STEPS]


def _wd_tokens(text: str, max_len: int) -> list[str]:
    """Word-delimiter tokens of one ORIGINAL-CASE text (case drives the
    splits, so lowering happens after the boundary passes)."""
    for pat, repl in _WD_COMPILED:
        text = pat.sub(repl, text)
    toks = [t for t in text.lower().split(" ") if t]
    if any(len(t) > max_len for t in toks):
        toks = _chunk_long(toks, max_len)
    return toks


def word_delimiter_sql(expr: str) -> str:
    """DuckDB twin of the word-delimiter passes: returns the lowered,
    single-space-separated subword string (callers string_split on ' ' and
    drop empties). RE2 replacement backrefs are \\1-style; 'g' makes the
    replace global (DuckDB is first-match by default)."""
    out = expr
    for pat, repl in _WD_STEPS:
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{repl}', 'g')"
    return f"lower({out})"


def _fold_text(text: str) -> str:
    """ASCII folding, applied to the WHOLE document before tokenization.

    Canonical (NFD) decomposition + drop combining marks — the diacritic
    subset of Lucene's ASCIIFoldingFilter (which is a post-tokenize token
    filter). Pre-tokenize application is observably identical here because
    every folded codepoint is \\p{L} and every combining mark is \\p{M} —
    both word-characters to the tokenizer — so token boundaries cannot move
    (asserted in tests/test_analyzer.py). DuckDB's strip_accents computes the
    same function, which is what makes an exact SQL oracle possible.
    """
    if text.isascii():
        return text
    import unicodedata

    return "".join(c for c in unicodedata.normalize("NFD", text)
                   if not unicodedata.combining(c))


def _token_filter(config: IndexConfig):
    """Post-stop-filter per-token transform, or None when no filter is on.

    stem="porter" enables the text_en tail: EnglishPossessiveFilter (strip
    trailing 's) then PorterStemFilter (analysis/porter.py). Tokens in
    config.protected_words (KeywordMarkerFilter role, Solr protwords.txt)
    bypass the stemmer — checked after the possessive strip, mirroring the
    reference chain order possessive -> keywordmarker -> porter."""
    if config.stem == "none":
        return None
    if config.stem != "porter":
        raise ValueError(f"unknown stem mode {config.stem!r}")
    from solr_spark.analysis.porter import porter_stem_cached

    protected = frozenset(config.protected_words)

    def filt(tok: str) -> str:
        if tok.endswith(("'s", "’s")):
            tok = tok[:-2]
        if tok in protected:
            return tok
        return porter_stem_cached(tok)

    return filt


def analyze_text(text: str | None, config: IndexConfig = DEFAULT_CONFIG) -> list[str]:
    """Scalar analyzer (driver-side query analysis + pure-Python oracle).

    Lowercases the WHOLE text first, then tokenizes and stop-filters. For the
    reference chain (tokenize -> stop(ignoreCase) -> lowercase) this is
    observably identical on every conformance vector (the word-character classes
    are case-closed), and doing the lowercase once per document — vectorized in
    the batch path — is substantially cheaper than per-token lowering.
    """
    if not text:
        return []
    cf = _char_filter_steps(config)
    if cf:
        text = _apply_char_filters(text, [(regex.compile(p), r) for p, r in cf])
    stops = _stopset(config)
    filt = _token_filter(config)
    if config.word_delimiter:
        t = _fold_text(text) if config.fold_ascii else text
        toks = [tk for tk in _wd_tokens(t, config.max_token_length)
                if tk not in stops]
        return [filt(tk) for tk in toks] if filt else toks
    low = text.lower()
    if config.fold_ascii:
        low = _fold_text(low)
    toks = [t for t in _scan(low, config.max_token_length) if t not in stops]
    return [filt(t) for t in toks] if filt else toks


# A row whose lowercased text contains ONLY these characters tokenizes as its
# space-split non-empty runs — the UAX#29 regex is provably equivalent there
# (no joiner chars, no marks, no CJK), so the batch kernel skips it. ~90% of
# transcript-like corpora hit this path; measured 2.7x on the analyzed stage.
# (stdlib re: pandas .str.contains rejects third-party pattern objects)
import re as _re  # noqa: E402

_NON_SIMPLE_RE = _re.compile(r"[^a-z0-9_ ]")


def _chunk_long(toks: list[str], max_len: int) -> list[str]:
    return [p for tk in toks
            for p in ([tk] if len(tk) <= max_len else
                      [tk[i:i + max_len] for i in range(0, len(tk), max_len)])]


def _series_token_lists(texts: pd.Series, config: IndexConfig) -> list[list[str]]:
    """Shared batch core: lowercase once (C-vectorized), split rows into
    simple (space-split fast path) and general (fold + UAX#29 regex scan),
    then stop-filter and run the optional stem/fold token filter. The fast
    path chunks BEFORE stop-filtering, matching `_scan`'s order exactly."""
    max_len = config.max_token_length
    stops = _stopset(config)
    fold = _fold_text if config.fold_ascii else None
    filt = _token_filter(config)
    cf = _char_filter_steps(config)
    if cf:
        compiled = [(regex.compile(p), r) for p, r in cf]
        texts = texts.map(lambda t: _apply_char_filters(t, compiled)
                          if isinstance(t, str) else t)
    if config.word_delimiter:
        # Case drives the splits, so this path cannot share the
        # lowercase-first fast path; the per-row regex passes are the same
        # cost shape as _scan on the general path.
        out_wd: list[list[str]] = []
        for t in texts:
            if not isinstance(t, str) or not t:
                out_wd.append([])
                continue
            if fold is not None:
                t = fold(t)
            toks = [tk for tk in _wd_tokens(t, max_len) if tk not in stops]
            out_wd.append([filt(tk) for tk in toks] if filt else toks)
        return out_wd
    low = texts.str.lower()
    simple = ~low.str.contains(_NON_SIMPLE_RE, na=True)
    out: list[list[str]] = []
    for t, s in zip(low, simple):
        if not isinstance(t, str) or not t:
            out.append([])
            continue
        if s:
            toks = [tk for tk in t.split(" ") if tk]
            if any(len(tk) > max_len for tk in toks):
                toks = _chunk_long(toks, max_len)
            toks = [tk for tk in toks if tk not in stops]
        else:
            if fold is not None:
                t = fold(t)
            toks = [tk for tk in _scan(t, max_len) if tk not in stops]
        out.append([filt(tk) for tk in toks] if filt else toks)
    return out


def analyze_series(texts: pd.Series, config: IndexConfig = DEFAULT_CONFIG) -> pd.Series:
    """Batch analyzer: Series[str] -> Series[list[str]] (pandas-UDF kernel body).

    One C-vectorized lowercase over the whole series, then a single pass per
    row; simple-text rows bypass the regex entirely (_series_token_lists).
    """
    return pd.Series(_series_token_lists(texts, config), index=texts.index)


def analyze_series_joined(texts: pd.Series,
                          config: IndexConfig = DEFAULT_CONFIG) -> pd.Series:
    """Batch analyzer, space-joined output: Series[str] -> Series[str]."""
    return pd.Series([" ".join(toks)
                      for toks in _series_token_lists(texts, config)],
                     index=texts.index)


def make_tokenize_udf(config: IndexConfig = DEFAULT_CONFIG):
    """Arrow-vectorized tokenize UDF: string column -> array<string> column."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokenize(texts: pd.Series) -> pd.Series:
        return analyze_series(texts, config)

    return tokenize


def make_tokenize_joined_udf(config: IndexConfig = DEFAULT_CONFIG):
    """Arrow-vectorized tokenize UDF returning ONE space-joined string per row.

    Same analysis as `make_tokenize_udf`, but the Arrow transfer back to the JVM
    is one string per document instead of an array of token strings — an
    order-of-magnitude fewer Arrow offsets/values on long documents, which is
    what the index build's analyzed stage is bound by. Tokens cannot contain
    spaces, so the join is lossless.
    """
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def tokenize_joined(texts: pd.Series) -> pd.Series:
        return analyze_series_joined(texts, config)

    return tokenize_joined


def make_tokenize_joined_multi_udf(config: IndexConfig = DEFAULT_CONFIG):
    """Multivalued (array<string>) analyzer UDF: each value analyzed
    independently, values joined with a POSITION GAP of
    config.position_increment_gap (reference: multiValued=true fields,
    schema/FieldProperties.java:66, with the fieldType's
    positionIncrementGap — 100 in the stock text types).

    Gap encoding: the forward index stores positions implicitly as token
    indices in the space-joined string, so a gap of G between values is G
    EMPTY tokens = G+1 consecutive spaces. Empty tokens never become
    postings (the encoder drops them), never count toward dl (write_analyzed
    counts non-empty tokens), and can never equal a query term — so phrase /
    span / sloppy positions shift past the boundary exactly like Lucene's
    position increments, and a phrase cannot match across values.
    """
    from pyspark.sql import functions as F

    sep = " " * (config.position_increment_gap + 1)

    @F.pandas_udf("string")
    def tokenize_joined_multi(vals: pd.Series) -> pd.Series:
        counts = [0 if a is None else len(a) for a in vals]
        flat = pd.Series([v if v is not None else ""
                          for a in vals if a is not None for v in a])
        toks = analyze_series_joined(flat, config) if len(flat) else flat
        out, i = [], 0
        for c in counts:
            out.append(sep.join(toks.iloc[i:i + c]) if c else "")
            i += c
        return pd.Series(out, index=vals.index)

    return tokenize_joined_multi


from functools import lru_cache as _lru_cache  # noqa: E402


@_lru_cache(maxsize=1)
def _fold_translate_tables() -> tuple[str, str]:
    """(src, dst) for F.translate implementing _fold_text JVM-side: every BMP
    codepoint whose NFD form is one base char + combining marks maps to the
    base (Latin, Cyrillic, Greek incl. Greek Extended, ... — the FULL BMP is
    scanned so the pure-JVM twin folds exactly what the Python analyzer
    folds); bare combining marks (all \\p{Mn} in the BMP) map to nothing
    (translate deletes src chars beyond len(dst), so they sit at the tail).

    Codepoints whose bases are THEMSELVES decomposable (e.g. Greek Extended
    with multiple marks) recurse through _fold_text so the table maps straight
    to the fully-stripped base. Built once per process (~3k entries)."""
    import unicodedata

    src, dst = [], []
    marks = []
    for cp in range(0x00C0, 0x10000):
        ch = chr(cp)
        if unicodedata.combining(ch):
            marks.append(ch)
            continue
        folded = _fold_text(ch)
        if len(folded) == 1 and folded != ch:
            src.append(ch)
            dst.append(folded)
    return "".join(src) + "".join(marks), "".join(dst)


# Java-regex rendition of _TOKEN_RE (Spark regexp_extract_all runs java.util.regex;
# script classes spell \p{IsHan} there). Alternation order matters and is
# preserved: single Han/Hiragana chars match before the generic word-run branch.
_TOKEN_RE_JAVA = (
    "[\\p{IsHan}\\p{IsHiragana}]"
    "|\\p{IsKatakana}+"
    "|[\\p{L}\\p{M}\\p{Nd}\\p{Nl}_]+"
    "(?:(?:(?<=\\p{L})['\u2019:.](?=\\p{L})|(?<=\\p{Nd})[.,](?=\\p{Nd}))"
    "[\\p{L}\\p{M}\\p{Nd}\\p{Nl}_]+)*"
)


def tokenize_column(col, config: IndexConfig = DEFAULT_CONFIG):
    """Whole-analyzer as a pure JVM Column: string -> array<string> of tokens.

    Identical output to `analyze_series` (asserted against every conformance
    vector and a randomized corpus in tests/test_analyzer.py) but runs inside
    whole-stage codegen: lower -> regexp_extract_all -> (rare) max-length
    chunking -> stop filter. No Python worker, no Arrow pipe — the build's
    tokenize stage scales with cores instead of with the Python allocator.
    """
    from pyspark.sql import functions as F

    if config.stem != "none":
        raise NotImplementedError(
            "stemming has no JVM expression form — use the Arrow analyzer "
            "(make_tokenize_udf / make_tokenize_joined_udf); the index build "
            "already does")
    import re as _stdre

    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in _char_filter_steps(config):
        # java.util.regex replacements use $N backrefs; configs carry the
        # portable \N form (same as RE2/Python)
        c = F.regexp_replace(c, pat, _stdre.sub(r"\\(\d)", r"$\1", repl))
    if config.fold_ascii:
        src, dst = _fold_translate_tables()
        c = F.translate(c, src, dst)
    if config.word_delimiter:
        # Same ordered passes as _wd_tokens, Java-regex rendition
        # ($1-style backrefs); java.util.regex replace is global,
        # non-overlapping, left-to-right — identical to the Python kernel.
        for pat, repl in _WD_STEPS:
            c = F.regexp_replace(
                c, pat, repl.replace("\\1", "$1").replace("\\2", "$2"))
        toks = F.filter(F.split(F.lower(c), " "), lambda t: t != "")
    else:
        toks = F.regexp_extract_all(F.lower(c), F.lit(_TOKEN_RE_JAVA), 0)
    max_len = config.max_token_length
    toks = F.when(
        F.exists(toks, lambda t: F.length(t) > max_len),
        F.flatten(F.transform(
            toks, lambda t: F.regexp_extract_all(
                t, F.lit(".{1,%d}" % max_len), 0))),
    ).otherwise(toks)
    stops = sorted(_stopset(config))
    if stops:
        toks = F.filter(toks, lambda t: ~t.isin(*stops))
    return toks


def tokenize_column_joined(col, config: IndexConfig = DEFAULT_CONFIG):
    """JVM tokenizer, space-joined: string -> one analyzed-token string."""
    from pyspark.sql import functions as F

    return F.array_join(tokenize_column(col, config), " ")


def analyze_stages(text: str | None,
                   config: IndexConfig = DEFAULT_CONFIG) -> list[tuple[str, object]]:
    """Analysis-debug surface (FieldAnalysisRequestHandler /
    analysis.field — handler/FieldAnalysisRequestHandler.java:55,
    AnalysisRequestHandlerBase.analyzeValue): the value after EVERY stage of
    the analyzer chain, in chain order, so index/query analysis mismatches
    can be inspected the way the reference's Analysis screen shows them.

    Driver-side admin helper (one value, not a distributed op). Stages
    mirror this engine's chain (module doc): char filters (HTML strip ...)
    -> tokenizer (UAX#29-style or word-delimiter) -> stop filter ->
    lowercase/fold (applied text-wide before tokenize here; reported in
    reference chain order, which is observably identical — see
    analyze_text) -> optional stem/fold token filter. Returns
    [(stage_name, text-or-token-list), ...]; the last entry equals
    analyze_text(text, config).
    """
    out: list[tuple[str, object]] = [("input", text or "")]
    if not text:
        return out + [("tokens", [])]
    cf = _char_filter_steps(config)
    if cf:
        text = _apply_char_filters(
            text, [(regex.compile(p), r) for p, r in cf])
        out.append(("charFilters", text))
    stops = _stopset(config)
    if config.word_delimiter:
        t = _fold_text(text) if config.fold_ascii else text
        toks = _wd_tokens(t, config.max_token_length)
        out.append(("tokenizer(word_delimiter)", list(toks)))
    else:
        low = text.lower()
        if config.fold_ascii:
            low = _fold_text(low)
        toks = _scan(low, config.max_token_length)
        out.append(("tokenizer", list(toks)))
    toks = [tk for tk in toks if tk not in stops]
    out.append(("stopFilter", list(toks)))
    filt = _token_filter(config)
    if filt:
        toks = [filt(tk) for tk in toks]
        out.append(("tokenFilter", list(toks)))
    out.append(("tokens", toks))
    return out
