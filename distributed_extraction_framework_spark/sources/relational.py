"""W3C Direct Mapping (RDB2RDF) — relational tables as a triple source.

A KG built from web pages almost always fuses with relational exports
(product catalogs, gazetteer dumps, CRM tables); the W3C's "A Direct
Mapping of Relational Data to RDF" (REC-rdb-direct-mapping-20120927)
defines the canonical row→resource translation this module implements:

* row subject        ``<base><table>/<pk>=<value>``
* column predicate   ``<base><table>#<column>``
* literal object     column value with the xsd datatype implied by the
                     column's SQL type (the spec's natural mapping)
* foreign key        ``<base><table>#ref-<column>`` → the REFERENCED
                     row's subject URI (an object property, no literal)

Spark-native: the whole mapping is ONE projection per table — no joins,
no shuffle, no Python; a 10^9-row table maps at scan speed. NULL columns
emit no triple (RDF has no null). Composite keys concatenate with ';'
(the spec's separator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schema as S

# Spark SQL type → xsd datatype (the Direct Mapping's natural datatypes)
_XSD_BY_TYPE: list[tuple[type, str]] = [
    (T.BooleanType, S.XSD + "boolean"),
    (T.ByteType, S.XSD_INTEGER),
    (T.ShortType, S.XSD_INTEGER),
    (T.IntegerType, S.XSD_INTEGER),
    (T.LongType, S.XSD_INTEGER),
    (T.FloatType, S.XSD_DOUBLE),
    (T.DoubleType, S.XSD_DOUBLE),
    (T.DecimalType, S.XSD + "decimal"),
    (T.DateType, S.XSD_DATE),
    (T.TimestampType, S.XSD_DATETIME),
]


def _xsd_for(dt: T.DataType) -> str | None:
    for cls, uri in _XSD_BY_TYPE:
        if isinstance(dt, cls):
            return uri
    return None


def _lexical(col: Column, dt: T.DataType) -> Column:
    """Canonical lexical form per xsd type (dates/timestamps ISO-8601;
    booleans lowercase — both engines agree on these exactly)."""
    if isinstance(dt, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")
    if isinstance(dt, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dt, T.BooleanType):
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    return col.cast("string")


def _iri_safe(col: Column) -> Column:
    """Percent-encode a value embedded in a row/FK IRI (W3C Direct
    Mapping §7.2 percent-encodes key values). ``url_encode`` is
    form-encoding (space → '+'), so '+' is rewritten to '%20' after —
    '+' itself encodes to '%2B' first, so the rewrite is unambiguous.
    Without this, values containing ';'/'=' made DIFFERENT composite-key
    rows concatenate to the SAME subject IRI, silently fusing their
    triples (code-review r5 wave-4 #8)."""
    return F.regexp_replace(F.url_encode(col.cast("string")), r"\+", "%20")


def _row_subject(base: str, table: str, pk: list[str]) -> Column:
    parts: list[Column] = [F.lit(f"{base}{table}/")]
    for i, k in enumerate(pk):
        if i:
            parts.append(F.lit(";"))
        parts.append(F.lit(f"{k}="))
        parts.append(_iri_safe(F.col(k)))
    return F.concat(*parts)


def direct_map(
    df: DataFrame,
    table: str,
    pk: str | list[str],
    base: str = "http://kg.example.org/rdb/",
    fks: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Direct-map one table → triples ``(subj, pred, obj, datatype)``.

    ``pk``: primary-key column(s) forming the row subject. ``fks``:
    ``{column: (referenced_table, referenced_pk)}`` — those columns emit
    a reference triple (predicate ``#ref-<column>``, object = the
    referenced row's subject URI) INSTEAD of a literal, per the spec.
    """
    pk_cols = [pk] if isinstance(pk, str) else list(pk)
    fks = fks or {}
    # rows with a NULL primary-key column have no subject (concat
    # null-propagates) and previously emitted (NULL, pred, obj) rows —
    # invalid RDF (code-review r5 wave-4 #3). The spec maps keyless rows
    # to fresh blank nodes; a deterministic, engine-portable subset of
    # that is to DROP them (fresh bnodes are per-ROW identities that a
    # re-run could not reproduce), documented here.
    for k in pk_cols:
        df = df.where(F.col(k).isNotNull())
    subj = _row_subject(base, table, pk_cols)
    pieces: list[DataFrame] = []
    for field in df.schema.fields:
        c = field.name
        # pk columns also emit their literal triple (spec behavior) —
        # they fall through to the plain-column branch below
        if c in fks:
            ref_table, ref_pk = fks[c]
            obj = F.concat(
                F.lit(f"{base}{ref_table}/{ref_pk}="),
                _iri_safe(F.col(c)),
            )
            pieces.append(
                df.where(F.col(c).isNotNull()).select(
                    subj.alias("subj"),
                    F.lit(f"{base}{table}#ref-{c}").alias("pred"),
                    obj.alias("obj"),
                    F.lit(None).cast("string").alias("datatype"),
                )
            )
            continue
        dt_uri = _xsd_for(field.dataType)
        pieces.append(
            df.where(F.col(c).isNotNull()).select(
                subj.alias("subj"),
                F.lit(f"{base}{table}#{c}").alias("pred"),
                _lexical(F.col(c), field.dataType).alias("obj"),
                F.lit(dt_uri).cast("string").alias("datatype"),
            )
        )
    # rdf:type row triple: every row is a <base><table> instance
    pieces.append(
        df.select(
            subj.alias("subj"),
            F.lit(S.RDF_TYPE).alias("pred"),
            F.lit(f"{base}{table}").alias("obj"),
            F.lit(None).cast("string").alias("datatype"),
        )
    )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
