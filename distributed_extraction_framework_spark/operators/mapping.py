"""MappingExtractor — ontology-typed triples from community template
mappings (reference: MappingsLoader, DistConfigLoader.scala:182-206;
semantics are the published DBpedia mappings-wiki behavior).

The reference loads per-language template→ontology mapping XML driver-side
and dispatches inside the extractor. Spark-native: the mapping is a small
DataFrame broadcast-joined against the parsed infobox key/values —
a map-side join, so the mapped extraction stays shuffle-free.

Outputs:
* ``instance_types``       — rdf:type ontology-class per mapped template
* ``mappingbased_objects`` — ontology predicate ← link-valued property
* ``mappingbased_literals``— ontology predicate ← typed literal property
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schema as S
from .extractors import base_norm, enrich_pages, prepare_pages, quad, resource_uri, ucfirst

# (template, class) — which ontology class a mapped template types
TEMPLATE_CLASS_SCHEMA = "template string, onto_class string"
# (template, key, onto_pred, range) — range: 'object' | an xsd datatype URI
PROPERTY_MAP_SCHEMA = "template string, key string, onto_pred string, range string"

# a small built-in mapping set covering the synthetic corpus's infoboxes
# (the real system feeds these tables from the mappings wiki)
DEFAULT_TEMPLATE_CLASSES = [
    ("Infobox_settlement", S.ONTOLOGY + "Settlement"),
    ("Infobox_company", S.ONTOLOGY + "Company"),
    ("Infobox_person", S.ONTOLOGY + "Person"),
    ("Infobox_thing", S.ONTOLOGY + "Thing"),
]
DEFAULT_PROPERTY_MAPPINGS = [
    ("Infobox_settlement", "population", S.ONTOLOGY + "populationTotal", S.XSD_INTEGER),
    ("Infobox_settlement", "area_km2", S.ONTOLOGY + "areaTotal", S.XSD_DOUBLE),
    ("Infobox_settlement", "located_in", S.ONTOLOGY + "isPartOf", "object"),
    ("Infobox_company", "website", S.ONTOLOGY + "homepage", "object"),
    ("Infobox_company", "located_in", S.ONTOLOGY + "locationCountry", "object"),
    ("Infobox_person", "name", S.ONTOLOGY + "birthName", S.XSD_STRING),
    ("Infobox_thing", "population", S.ONTOLOGY + "populationTotal", S.XSD_INTEGER),
    ("Infobox_thing", "located_in", S.ONTOLOGY + "isPartOf", "object"),
]


def mapping_tables(
    spark: SparkSession,
    template_classes=None,
    property_mappings=None,
) -> tuple[DataFrame, DataFrame]:
    tc = spark.createDataFrame(
        template_classes or DEFAULT_TEMPLATE_CLASSES, TEMPLATE_CLASS_SCHEMA
    )
    pm = spark.createDataFrame(
        property_mappings or DEFAULT_PROPERTY_MAPPINGS, PROPERTY_MAP_SCHEMA
    )
    return tc, pm


# --------------------------------------------------------------------------
# mappings-wiki / ontology XML loaders (reference DistConfigLoader.scala:
# 124-139 loads ontology.xml, 182-206 loads per-language Mapping_<lang>.xml
# — both MediaWiki-export XML whose page text holds {{Class}} /
# {{ObjectProperty}} / {{DatatypeProperty}} / {{TemplateMapping}} /
# {{PropertyMapping}} templates; same published shapes parsed here)
# --------------------------------------------------------------------------

def _iter_export_pages(path: str):
    """(title, text) per <page> of a MediaWiki export XML, namespace-agnostic,
    streaming (iterparse — ontology.xml is tens of MB; never fully in RAM)."""
    import xml.etree.ElementTree as ET

    for _, elem in ET.iterparse(path):
        if elem.tag.rsplit("}", 1)[-1] != "page":
            continue
        title, text = "", ""
        for child in elem.iter():
            tag = child.tag.rsplit("}", 1)[-1]
            if tag == "title" and not title:
                title = child.text or ""
            elif tag == "text":
                text = child.text or ""
        yield title, text
        elem.clear()


def _template_kv(parts: list[str]) -> dict[str, str]:
    kv: dict[str, str] = {}
    for part in parts:
        if "=" not in part:
            continue
        k, _, v = part.partition("=")
        kv[k.strip()] = v.strip()
    return kv


def parse_ontology_xml(path: str) -> dict[str, str]:
    """OntologyProperty pages → {property: range} where range is 'object'
    (ObjectProperty) or a datatype URI (DatatypeProperty rdfs:range)."""
    from ..functions.wikitext import find_top_level_templates, split_template

    ranges: dict[str, str] = {}
    for title, text in _iter_export_pages(path):
        if not title.startswith("OntologyProperty:"):
            continue
        # MediaWiki ucfirsts titles; property names are lcfirst camelCase
        # ('OntologyProperty:BirthPlace' → 'birthPlace'), as the reference's
        # OntologyReader restores them
        prop = title.split(":", 1)[1].strip()
        prop = prop[:1].lower() + prop[1:]
        for src in find_top_level_templates(text):
            name, parts = split_template(src)
            if name == "ObjectProperty":
                ranges[prop] = "object"
            elif name == "DatatypeProperty":
                r = _template_kv(parts).get("rdfs:range", "xsd:string")
                if r.startswith("xsd:"):
                    ranges[prop] = S.XSD + r.split(":", 1)[1]
                else:  # custom unit datatype name
                    ranges[prop] = S.DATATYPE_NS + r
    return ranges


def load_mappings_xml(
    spark: SparkSession,
    mappings_path: str,
    ontology_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Parse a mappings-wiki export ('Mapping en:Infobox foo' pages holding
    {{TemplateMapping|mapToClass=...|mappings={{PropertyMapping|...}}}})
    into the broadcastable (template→class, (template,key)→predicate)
    DataFrames mapping_extract consumes.

    Property ranges resolve through the ontology export when given
    (object vs typed literal); unknown properties default to plain
    lang-tagged literals (xsd:string) — the benign fallback.
    """
    from ..functions.wikitext import find_top_level_templates, split_template

    ranges = parse_ontology_xml(ontology_path) if ontology_path else {}
    tclasses: list[tuple[str, str]] = []
    pmaps: list[tuple[str, str, str, str]] = []
    for title, text in _iter_export_pages(mappings_path):
        # 'Mapping en:Infobox settlement' → 'Infobox_settlement'
        tmpl = title.split(":", 1)[1] if ":" in title else title
        tmpl = tmpl.strip().replace(" ", "_")
        tmpl = tmpl[:1].upper() + tmpl[1:]
        for src in find_top_level_templates(text):
            name, parts = split_template(src)
            kv = _template_kv(parts)
            if name in ("TemplateMapping", "ConditionalMapping"):
                cls = kv.get("mapToClass", "")
                if cls:
                    tclasses.append((tmpl, S.ONTOLOGY + cls))
            elif name == "PropertyMapping":
                tp, op = kv.get("templateProperty", ""), kv.get("ontologyProperty", "")
                if tp and op:
                    rng = ranges.get(op, S.XSD_STRING)
                    pmaps.append(
                        (tmpl, tp.replace(" ", "_"), S.ONTOLOGY + op, rng)
                    )
    return mapping_tables(spark, tclasses or [("__none__", "")], pmaps or [("__none__", "", "", "")])


def mapping_extract(
    pages: DataFrame,
    template_classes: DataFrame,
    property_mappings: DataFrame,
) -> DataFrame:
    """Quads from mapped infobox templates (broadcast joins, no shuffle)."""
    e = enrich_pages(prepare_pages(pages), with_parse=True).filter(
        F.col("ns") == S.NS_MAIN
    )
    kv = e.select(
        "subj", "lang", "context",
        F.explode("parsed.infobox").alias("ib"),
    ).select(
        "subj", "lang", "context",
        ucfirst(base_norm(F.col("ib.template"))).alias("template"),
        F.regexp_replace(F.trim(F.col("ib.key")), " ", "_").alias("key"),
        F.trim(F.col("ib.value")).alias("value"),
    )

    # rdf:type from the template→class table
    types = (
        kv.select("subj", "context", "template").distinct()
        .join(F.broadcast(template_classes), "template")
        .select(
            F.lit("instance_types").alias("dataset"),
            F.col("subj"),
            F.lit(S.RDF_TYPE).alias("pred"),
            F.col("onto_class").alias("obj"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("datatype"),
            F.col("context"),
        )
    )

    # typed properties from the (template, key) → predicate table
    mapped = kv.join(F.broadcast(property_mappings), ["template", "key"])
    link_t = F.regexp_extract(F.col("value"), r"^\[\[([^\[\]|]+)(\|[^\[\]]*)?\]\]$", 1)
    obj_val = F.when(
        F.col("range") == "object",
        F.when(link_t != "", resource_uri(F.col("lang"), ucfirst(base_norm(link_t))))
        .otherwise(F.col("value")),
    ).otherwise(F.regexp_replace(F.col("value"), ",", ""))
    objects = mapped.filter(F.col("range") == "object").select(
        F.lit("mappingbased_objects").alias("dataset"),
        F.col("subj"),
        F.col("onto_pred").alias("pred"),
        obj_val.alias("obj"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("datatype"),
        F.col("context"),
    )
    literals = mapped.filter(F.col("range") != "object").select(
        F.lit("mappingbased_literals").alias("dataset"),
        F.col("subj"),
        F.col("onto_pred").alias("pred"),
        obj_val.alias("obj"),
        F.when(F.col("range") == S.XSD_STRING, F.col("lang"))
        .otherwise(F.lit(None).cast("string")).alias("lang"),
        F.col("range").alias("datatype"),
        F.col("context"),
    )
    return types.unionByName(objects).unionByName(literals)
