"""Engine configuration.

BM25 defaults k1=1.2, b=0.75 mirror the reference's implicit default similarity
(reference: solr/core/src/java/org/apache/solr/search/similarities/
BM25SimilarityFactory.java:48-49, SchemaSimilarityFactory.java:106).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    """Tunables for the inverted-index build + query layer.

    range_shift: postings for one term are chunked into docid ranges of width
        2**range_shift.  This bounds the size of any single aggregation group during
        the posting build (a hot term appearing in 10% of a 10^12-turn corpus still
        never produces a group larger than 2**range_shift postings), which is the
        Spark-native analog of the reference's hot-term special-casing
        (solr/core/src/java/org/apache/solr/search/facet/UnInvertedField.java:108-149).
    block_size: postings inside a range row are sub-divided into blocks of this many
        postings; per-block max impact metadata drives block-max WAND pruning
        (reference exposure: solr/core/.../handler/component/QueryComponent.java:448-452).
    num_term_buckets: segment files are hive-partitioned by
        term_bucket = crc32(term) % num_term_buckets so query-time posting reads are
        partition-pruned to the query's terms.
    """

    k1: float = 1.2
    b: float = 0.75
    range_shift: int = 16           # 65536 docids per posting-range row
    block_size: int = 128           # Lucene-like posting block
    num_term_buckets: int = 64
    max_token_length: int = 255
    stopwords: str = "en"           # "en" | "none"
    # positionIncrementGap between the values of a multivalued (array<string>)
    # text field (reference: managed-schema.xml text types set 100;
    # FieldProperties.java:66 multiValued). Encoded as gap empty tokens in the
    # forward index, so phrases cannot match across value boundaries.
    position_increment_gap: int = 100
    lucene_norms: bool = True       # SmallFloat-quantized doc lengths (parity mode)
    # Analyzer filters (both default off = the text_general chain; both on
    # approximates the reference's text_en chain, managed-schema.xml:320-340):
    #   stem: "none" | "porter" — PorterStemFilter + EnglishPossessiveFilter
    #   fold_ascii: canonical-decompose + drop combining marks
    #   (ASCIIFoldingFilter's diacritic subset; ligature table not included)
    stem: str = "none"
    fold_ascii: bool = False
    # KeywordMarkerFilter role (Solr's protwords.txt,
    # managed-schema.xml text_en <filter class="solr.KeywordMarkerFilterFactory">):
    # tokens in this set bypass the stemmer (matched AFTER lowercasing and
    # possessive strip, like the reference's post-tokenizer position).
    # A tuple so the dataclass stays hashable/JSON-stable for config_hash.
    protected_words: tuple = ()
    # WordDelimiterGraphFilter role (Solr's text_en_splitting fieldType:
    # WhitespaceTokenizer + WordDelimiterGraphFilter, reference surface
    # managed-schema.xml / WordDelimiterGraphFilterFactory). When on, the
    # UAX#29 tokenizer is replaced by whitespace splitting (the reference
    # pairing — WDGF is documented as incompatible with StandardTokenizer)
    # and each token is split on non-alphanumerics, lower->Upper case
    # changes, Lu-run->capitalized-word boundaries, and letter<->digit
    # transitions, with English possessives stripped first
    # (stemEnglishPossessive=1 default). Scope: the phrase-safe subset
    # (generateWordParts/generateNumberParts/splitOnCaseChange/
    # splitOnNumerics); catenateWords/preserveOriginal are out of scope
    # because they emit stacked positions, which Lucene itself warns break
    # index-time phrase queries without FlattenGraph.
    word_delimiter: bool = False
    # Char-filter stage (TokenizerChain's charFilters* slot, reference:
    # solr/core/src/java/org/apache/solr/analysis/TokenizerChain.java:36-49;
    # applied to the RAW text before tokenization in every engine path):
    #   html_strip: HTMLStripCharFilterFactory role — removes script/style
    #     bodies, comments and tags (each becomes one separator) and decodes
    #     the common named entities; numeric entities become separators
    #     (documented subset of Lucene's full state machine).
    #   pattern_replace: PatternReplaceCharFilterFactory role — ordered
    #     (pattern, replacement) pairs in the engine-portable regex subset
    #     (no lookaround/backrefs, so the same pattern runs on java.util.regex,
    #     RE2/DuckDB, and Python `regex`).
    html_strip: bool = False
    pattern_replace: tuple = ()

    def __post_init__(self):
        # JSON round-trips (stats.json -> IndexConfig(**d)) deliver lists;
        # normalize so equality and config_hash are representation-free.
        if not isinstance(self.protected_words, tuple):
            object.__setattr__(self, "protected_words",
                               tuple(self.protected_words))
        if not isinstance(self.pattern_replace, tuple) or any(
                not isinstance(p, tuple) for p in self.pattern_replace):
            object.__setattr__(
                self, "pattern_replace",
                tuple(tuple(p) for p in self.pattern_replace))

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


DEFAULT_CONFIG = IndexConfig()
