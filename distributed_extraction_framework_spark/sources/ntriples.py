"""N-Triples / N-Quads reader — the inverse of the RDF sinks.

The reference only ever *writes* N-Triples (its diff harness compares
emitted dump files textually); consuming a previously-emitted dataset
back into the engine means re-running extraction. This source closes the
loop: ``read_ntriples`` turns ``.nt`` / ``.nq`` dumps (the engine's own
output, or any spec-conformant file) back into the quads DataFrame shape
that every downstream operator (BGP queries, graph tables, linking)
accepts.

Scale shape: a line-per-statement format is the ideal Spark input —
``spark.read.text`` splits on newlines, so a 100 TB dump parallelizes to
byte-range splits with zero coordination, and the whole parse is
Catalyst ``regexp_extract`` / ``when`` chains (JVM-side, whole-stage
codegen; no Python in the row path). Comment and blank lines are
dropped; malformed lines are surfaced in a ``_corrupt`` column rather
than silently skipped (counted cheaply via ``observe`` by callers) —
mirroring the reference's failed-page accounting
(extraction/src/main/scala/org/dbpedia/extraction/dump/extract/
DistExtractionJob.scala:71-75).

Literal unescaping reverses the sink's escaper (plans/materialize.py
``_esc``): ``\\\\`` first via a control-char sentinel (N-Triples forbids
raw control characters, so ``\\x00`` cannot occur in valid data), then
``\\" \\n \\r \\t``, so ``"a\\\\nb"`` round-trips to a backslash + ``n``,
not a newline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import RDF_LANGSTRING

# <s> <p> <o> .  |  <s> <p> "lit" .  |  "lit"@lang  |  "lit"^^<dt>
# optional 4th term (<graph>) makes the same regex cover N-Quads.
# The literal body is greedy ``(.*)``, NOT the grammar-faithful
# (?:[^"\]|\\.)* — Java's regex engine recurses once per iteration of an
# alternation loop, so the faithful form StackOverflows on multi-KB
# literals (abstracts). Greedy-dot backtracking is iterative (constant
# stack), and it is exact here because only the object position may hold
# a literal: the closing quote is always the LAST double quote on a
# valid line (lang tags, datatypes, and graph URIs cannot contain one).
# The tradeoff is leniency — a lone interior backslash is accepted
# rather than rejected; _unescape passes it through unchanged.
_URI = r"<([^<>\s]+)>"
_LIT = r'"(.*)"(?:@([A-Za-z][\w-]*)|\^\^<([^<>\s]+)>)?'
_LINE = (
    rf"^\s*{_URI}\s+{_URI}\s+(?:{_URI}|{_LIT})"
    rf"(?:\s+{_URI})?\s*\.\s*$"
)
# regexp_extract group indexes within _LINE
_G_SUBJ, _G_PRED, _G_OURI, _G_OLIT, _G_LANG, _G_DT, _G_CTX = 1, 2, 3, 4, 5, 6, 7


def _unescape(c: Column) -> Column:
    sentinel = "\x00"
    c = F.regexp_replace(c, r"\\\\", sentinel)
    c = F.regexp_replace(c, r'\\"', '"')
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\t", "\t")
    return F.regexp_replace(c, sentinel, r"\\")


def parse_ntriples_lines(lines: DataFrame, col: str = "line") -> DataFrame:
    """One N-Triples/N-Quads line per row → quads columns.

    Output: ``subj, pred, obj, lang, datatype, context, _corrupt`` —
    ``context`` is NULL for triples; ``_corrupt`` carries the raw text of
    lines that are neither statements, comments, nor blank (all other
    columns NULL on those rows). Filter ``_corrupt IS NULL`` for the
    strict view; ``observe`` a count of the rest for lineage.
    """
    line = F.col(col)
    is_noise = line.rlike(r"^\s*(#.*)?$")
    matched = line.rlike(_LINE)

    def g(i: int) -> Column:
        ex = F.regexp_extract(line, _LINE, i)
        return F.when(matched & (ex != ""), ex)

    obj_lit = F.regexp_extract(line, _LINE, _G_OLIT)
    is_lit = matched & F.regexp_extract(line, _LINE, _G_OURI).eqNullSafe("")
    return (
        lines.filter(~is_noise)
        .select(
            g(_G_SUBJ).alias("subj"),
            g(_G_PRED).alias("pred"),
            F.when(matched,
                   F.when(is_lit, _unescape(obj_lit))
                   .otherwise(F.regexp_extract(line, _LINE, _G_OURI)))
            .alias("obj"),
            g(_G_LANG).alias("lang"),
            # RDF 1.1: a lang-tagged literal's datatype is implicitly
            # rdf:langString and is never serialized — reconstruct it so
            # render→parse round-trips are exact against the extractors'
            # quads representation.
            F.coalesce(
                g(_G_DT),
                F.when(g(_G_LANG).isNotNull(), F.lit(RDF_LANGSTRING)),
            ).alias("datatype"),
            g(_G_CTX).alias("context"),
            F.when(~matched, line).alias("_corrupt"),
        )
    )


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Read ``.nt`` / ``.nq`` file(s) (optionally compressed — Hadoop
    codecs apply by suffix) into the quads DataFrame shape."""
    return parse_ntriples_lines(spark.read.text(path), "value")
