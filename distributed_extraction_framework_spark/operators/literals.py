"""XSD canonical lexical forms for typed literals.

The reference's infobox value parsers emit whatever lexical form the
wikitext carried ("+07", "1.50", "TRUE" — reference:
extraction/src/main/scala/.../dataparser/*Parser.scala guesses the
TYPE but keeps the surface form); a published KG wants one canonical
lexical per value so that exact-match joins, dedup digests and sort
orders behave. This operator rewrites the object column of typed quads
to the XML Schema 1.0 canonical representation for the integer family,
``xsd:boolean`` and ``xsd:decimal``; every other datatype (doubles,
dates, custom units) passes through unchanged — documented subset, no
silent lossy edits.

Everything is pure Catalyst (CASE + ``regexp_replace`` inside
whole-stage codegen, zero Python, zero shuffles). Regex portability:
patterns stick to the Java-regex ∩ RE2 subset (no lookaround) so the
driver gate hash-verifies the exact semantics against DuckDB.

Canonicalization rules:

* all handled types: surrounding whitespace trimmed (XSD whitespace
  facet = collapse for these types);
* integer family (``integer``/``long``/``int``/``short``/``byte`` and
  the unsigned/non-negative/positive variants): leading ``+`` dropped,
  leading zeros dropped, ``-0`` → ``0``;
* ``boolean``: lowercased, ``1`` → ``true``, ``0`` → ``false``;
* ``decimal``: leading ``+`` dropped, a decimal point is required
  (``3`` → ``3.0``), exactly one leading integer digit minimum
  (``.5`` → ``0.5``), no redundant leading zeros (``007.1`` → ``7.1``),
  no trailing fractional zeros beyond one (``2.500`` → ``2.5``,
  ``2.000`` → ``2.0``), negative zero collapses to ``0.0``;
* values that do not parse as the declared type are passed through
  unchanged (crawl data is hostile; flagging belongs to
  operators/validation.py, not a rewrite pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"

INTEGER_TYPES = tuple(
    XSD + t for t in (
        "integer", "long", "int", "short", "byte",
        "nonNegativeInteger", "nonPositiveInteger",
        "positiveInteger", "negativeInteger",
        "unsignedLong", "unsignedInt", "unsignedShort", "unsignedByte",
    )
)
BOOLEAN_TYPE = XSD + "boolean"
DECIMAL_TYPE = XSD + "decimal"

# lexical validity guards (full-string anchors, RE2-safe)
_INT_LEX = r"^[+-]?[0-9]+$"
_BOOL_LEX = r"^(?i)(true|false|1|0)$"
_DEC_LEX = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"


def _canon_integer(v: Column) -> Column:
    c = F.regexp_replace(v, r"^\+", "")
    c = F.regexp_replace(c, r"^(-?)0+([0-9])", r"$1$2")
    return F.when(c.isin("-0", "0"), F.lit("0")).otherwise(c)


def _canon_boolean(v: Column) -> Column:
    low = F.lower(v)
    return (F.when(low == "1", F.lit("true"))
            .when(low == "0", F.lit("false"))
            .otherwise(low))


def _canon_decimal(v: Column) -> Column:
    c = F.regexp_replace(v, r"^\+", "")
    # require a decimal point, then at least one digit each side
    c = F.when(~c.contains("."), F.concat(c, F.lit(".0"))).otherwise(c)
    c = F.regexp_replace(c, r"^-\.", "-0.")
    c = F.regexp_replace(c, r"^\.", "0.")
    c = F.regexp_replace(c, r"^(-?)0+([0-9])", r"$1$2")
    # trailing fractional zeros (the '.' breaks the run, so integer-part
    # zeros are never touched); restore the mandatory final digit
    c = F.regexp_replace(c, r"0+$", "")
    c = F.when(c.endswith("."), F.concat(c, F.lit("0"))).otherwise(c)
    return F.when(F.regexp_like(c, F.lit(r"^-0\.0$")), F.lit("0.0")).otherwise(c)


def canonical_literal(obj: Column, datatype: Column) -> Column:
    """Column form — the single definition the gate's oracle mirrors."""
    t = F.trim(obj)
    return (
        F.when(datatype.isin(*INTEGER_TYPES) & F.regexp_like(t, F.lit(_INT_LEX)),
               _canon_integer(t))
        .when((datatype == BOOLEAN_TYPE) & F.regexp_like(t, F.lit(_BOOL_LEX)),
              _canon_boolean(t))
        .when((datatype == DECIMAL_TYPE) & F.regexp_like(t, F.lit(_DEC_LEX)),
              _canon_decimal(t))
        .otherwise(obj)
    )


def canonicalize_literals(
    quads: DataFrame,
    obj_col: str = "obj",
    dt_col: str = "datatype",
) -> DataFrame:
    """Rewrite ``obj_col`` to its XSD canonical lexical form wherever
    ``dt_col`` declares a handled datatype. Pure projection — the plan
    shape of the input is preserved (no exchange, no Python)."""
    return quads.withColumn(
        obj_col, canonical_literal(F.col(obj_col), F.col(dt_col))
    )


def normalize_unit_values(
    quads: DataFrame,
    obj_col: str = "obj",
    datatype_col: str = "datatype",
) -> DataFrame:
    """Convert unit-typed literals to their SI standard — the reference
    framework's UnitValueParser behavior (a parsed ``"5 km"`` publishes
    as ``5000.0`` typed ``datatype/metre``, so area/length/mass values
    from different templates COMPARE in SPARQL without per-query
    arithmetic).

    Rows whose datatype is a known unit (``schema.UNIT_SI``) get
    ``obj × factor`` (both engines multiply the same double literal —
    bit-identical) and the dimension's SI datatype; every other row
    passes through untouched. Pure projection: no exchange, no Python,
    shape preserved — safe to drop into any quads pipeline stage.
    """
    from .. import schema as S

    dt = F.col(datatype_col)
    factor = F.lit(None).cast("double")
    si_dt = F.lit(None).cast("string")
    for suffix, (f_, si) in S.UNIT_SI.items():
        unit_uri = S.UNIT_DATATYPES[suffix]
        factor = F.when(dt == unit_uri, F.lit(f_)).otherwise(factor)
        si_dt = F.when(dt == unit_uri, F.lit(si)).otherwise(si_dt)
    converted = F.col(obj_col).try_cast("double") * factor
    ok = factor.isNotNull() & converted.isNotNull()
    return quads.withColumn(
        obj_col,
        F.when(ok, converted.cast("string")).otherwise(F.col(obj_col)),
    ).withColumn(
        datatype_col, F.when(ok, si_dt).otherwise(F.col(datatype_col))
    )
