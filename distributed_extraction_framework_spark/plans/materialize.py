"""Graph materialization: N-Triples rendering + partitioned graph tables.

Replaces the reference's 392-LoC multiplexing OutputFormat stack
(DBpediaCompositeOutputFormat / DBpediaDatasetOutputFormat /
MultipleTextOutputFormat — SURVEY.md K1) with declarative writes:

* the (dataset × format) fan-out is ``write.partitionBy("dataset")``;
* N-Triples/N-Quads rendering is ONE ``concat``/``when`` projection —
  whole-stage codegen, no custom RecordWriter;
* graph tables (nodes / edges / predicates / literals) are plain
  aggregations, written parquet here and Iceberg on a real cluster
  (``.format("iceberg")`` + catalog conf is the only difference; the
  container has no Iceberg jar — session.py documents the switch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _esc(c: Column) -> Column:
    """N-Triples literal escaping (backslash first, then quote/newlines)."""
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', r'\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    return F.regexp_replace(c, "\t", r"\\t")


def _is_resource(quads_obj: Column, datatype: Column) -> Column:
    return datatype.isNull() & quads_obj.rlike(r"^https?://")


def render_ntriples(quads: DataFrame, quad_form: bool = False) -> DataFrame:
    """(dataset, line) — one rendered N-Triples (or N-Quads) line per quad.

    Object rendering: resource → ``<uri>``; lang literal → ``"lex"@lang``;
    typed literal → ``"lex"^^<dt>``; plain literal → ``"lex"``.
    """
    obj = F.col("obj")
    dt = F.col("datatype")
    lang = F.col("lang")
    obj_rendered = (
        F.when(_is_resource(obj, dt), F.concat(F.lit("<"), obj, F.lit(">")))
        .when(
            lang.isNotNull(),
            F.concat(F.lit('"'), _esc(obj), F.lit('"@'), lang),
        )
        .when(
            dt.isNotNull(),
            F.concat(F.lit('"'), _esc(obj), F.lit('"^^<'), dt, F.lit(">")),
        )
        .otherwise(F.concat(F.lit('"'), _esc(obj), F.lit('"')))
    )
    parts = [
        F.lit("<"), F.col("subj"), F.lit("> <"), F.col("pred"), F.lit("> "),
        obj_rendered,
    ]
    if quad_form:
        parts += [F.lit(" <"), F.col("context"), F.lit(">")]
    parts += [F.lit(" .")]
    return quads.select(
        F.col("dataset"), F.concat(*parts).alias("line")
    )


def write_ntriples(quads: DataFrame, path: str, quad_form: bool = False) -> None:
    """Dataset-multiplexed N-Triples sink: one directory per dataset
    (`.../dataset=labels/part-*.txt`), the reference's
    ``{lang}wiki-{date}-{dataset}.nt`` fan-out as partitioned text."""
    render_ntriples(quads, quad_form).write.mode("overwrite").partitionBy(
        "dataset"
    ).text(path)


# --------------------------------------------------------------------------
# graph tables
# --------------------------------------------------------------------------

def edges_table(quads: DataFrame) -> DataFrame:
    """Resource→resource edges (datatype null, object is a URI)."""
    return quads.filter(_is_resource(F.col("obj"), F.col("datatype"))).select(
        "subj", "pred", "obj", "dataset", "context"
    )


def literals_table(quads: DataFrame) -> DataFrame:
    """Attribute quads (object is a literal)."""
    return quads.filter(~_is_resource(F.col("obj"), F.col("datatype"))).select(
        "subj", "pred", "obj", "lang", "datatype", "dataset", "context"
    )


def nodes_table(quads: DataFrame) -> DataFrame:
    """(uri, n_out, n_in) degree-annotated node set.

    One union + one groupBy: partial aggregation (map-side combine) makes
    this a single shuffle of (uri, partial-counts) — never of full quads.
    """
    e = edges_table(quads)
    out_deg = e.select(F.col("subj").alias("uri"), F.lit(1).alias("o"), F.lit(0).alias("i"))
    in_deg = e.select(F.col("obj").alias("uri"), F.lit(0).alias("o"), F.lit(1).alias("i"))
    subj_only = quads.select(F.col("subj").alias("uri"), F.lit(0).alias("o"), F.lit(0).alias("i"))
    return (
        out_deg.union(in_deg).union(subj_only)
        .groupBy("uri")
        .agg(F.sum("o").alias("n_out"), F.sum("i").alias("n_in"))
    )


def predicates_table(quads: DataFrame) -> DataFrame:
    """(pred, dataset, n_quads, n_subjects) predicate statistics."""
    return quads.groupBy("pred", "dataset").agg(
        F.count("*").alias("n_quads"),
        F.approx_count_distinct("subj").alias("n_subjects"),
    )


def write_graph_tables(quads: DataFrame, warehouse: str) -> dict[str, int]:
    """Materialize nodes/edges/predicates/literals under ``warehouse``.

    Edges and literals partition by ``dataset`` (the reference's output
    multiplexing key); row counts return for lineage.
    """
    counts: dict[str, int] = {}
    e = edges_table(quads)
    e.write.mode("overwrite").partitionBy("dataset").parquet(f"{warehouse}/edges")
    lit = literals_table(quads)
    lit.write.mode("overwrite").partitionBy("dataset").parquet(f"{warehouse}/literals")
    n = nodes_table(quads)
    n.write.mode("overwrite").parquet(f"{warehouse}/nodes")
    p = predicates_table(quads)
    p.write.mode("overwrite").parquet(f"{warehouse}/predicates")
    spark = quads.sparkSession
    for name in ("edges", "literals", "nodes", "predicates"):
        counts[name] = spark.read.parquet(f"{warehouse}/{name}").count()
    return counts
