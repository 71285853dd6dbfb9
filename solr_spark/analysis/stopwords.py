"""English stopword list mirroring the reference's shipped list.

Reference: solr/server/solr/configsets/_default/conf/lang/stopwords_en.txt — 35
non-comment entries (the classic 33-word Lucene English list plus the two test
placeholders the reference file ships with, reproduced verbatim for parity).
The `_default` configset's text_general field type actually points at an EMPTY
stopwords.txt (reference managed-schema.xml:299-314 + stopwords.txt), so the engine
supports stopwords="none" as well; the English list is our default chain per
FIXTURES.md §4.
"""

ENGLISH_STOPWORDS = frozenset(
    """
    stopworda stopwordb
    a an and are as at be but by for if in into is it no not of on or such that the
    their then there these they this to was will with
    """.split()
)
