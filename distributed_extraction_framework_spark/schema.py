"""Schemas and vocabulary for the KG-construction engine.

The two record types mirror the reference's data model (SURVEY.md §1):

* the input page  — reference ``WikiPage`` (WikiPageSerializer.scala:15-23),
  re-shaped per BASELINE.json input_hint as a Common-Crawl-style row
  ``(url, warc_ts, html, text, lang)``;
* the output quad — reference ``Quad`` (7 strings,
  QuadSeqWritableTest.scala:16-22).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# input table: Common-Crawl-style web pages (BASELINE.json input_hint)
# --------------------------------------------------------------------------
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# derived columns added by operators.extractors.prepare_pages()
PREPARED_EXTRA_COLS = ("title", "ns", "page_id", "rev_id", "subj", "context")

# --------------------------------------------------------------------------
# output record: the RDF quad (reference Quad — 7 flat strings)
# --------------------------------------------------------------------------
QUAD_COLS = ("dataset", "subj", "pred", "obj", "lang", "datatype", "context")

QUAD_SCHEMA = StructType(
    [
        StructField("dataset", StringType(), False),
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("datatype", StringType(), True),
        StructField("context", StringType(), True),
    ]
)

# result of the single vectorized parse pass (functions.wikitext.parse_page_udf)
PARSED_PAGE_SCHEMA = StructType(
    [
        StructField(
            "infobox",
            ArrayType(
                StructType(
                    [
                        StructField("template", StringType()),
                        StructField("key", StringType()),
                        StructField("value", StringType()),
                    ]
                )
            ),
        ),
        StructField(
            "coords",
            ArrayType(
                StructType(
                    [
                        StructField("lat", DoubleType()),
                        StructField("lon", DoubleType()),
                    ]
                )
            ),
        ),
    ]
)

# --------------------------------------------------------------------------
# namespaces (the reference's int-keyed enum — SURVEY.md §1.1;
# namespace filter set: DistConfigLoader.scala:105-112)
# --------------------------------------------------------------------------
NS_MAIN = 0
NS_FILE = 6
NS_TEMPLATE = 10
NS_CATEGORY = 14
EXTRACTION_NAMESPACES = (NS_MAIN, NS_FILE, NS_TEMPLATE, NS_CATEGORY)

NS_PREFIXES = {"Category": NS_CATEGORY, "Template": NS_TEMPLATE, "File": NS_FILE}

# --------------------------------------------------------------------------
# vocabulary (public W3C/FOAF/DC vocab + this engine's own ontology ns)
# --------------------------------------------------------------------------
RESOURCE_HOST = "kg.example.org"


def resource_prefix(lang: str) -> str:
    """Language-localized resource namespace (en is the bare host)."""
    host = RESOURCE_HOST if lang == "en" else f"{lang}.{RESOURCE_HOST}"
    return f"http://{host}/resource/"


ONTOLOGY = "http://kg.example.org/ontology/"
PROPERTY = "http://kg.example.org/property/"  # raw infobox properties

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
DCT_SUBJECT = "http://purl.org/dc/terms/subject"
FOAF_PRIMARY_TOPIC = "http://xmlns.com/foaf/0.1/primaryTopic"
FOAF_IS_PRIMARY_TOPIC_OF = "http://xmlns.com/foaf/0.1/isPrimaryTopicOf"
FOAF_DOCUMENT = "http://xmlns.com/foaf/0.1/Document"
SKOS_CONCEPT = "http://www.w3.org/2004/02/skos/core#Concept"
SKOS_PREFLABEL = "http://www.w3.org/2004/02/skos/core#prefLabel"
SKOS_BROADER = "http://www.w3.org/2004/02/skos/core#broader"
GEO_LAT = "http://www.w3.org/2003/01/geo/wgs84_pos#lat"
GEO_LONG = "http://www.w3.org/2003/01/geo/wgs84_pos#long"
GEORSS_POINT = "http://www.georss.org/georss/point"
PROV_DERIVED_FROM = "http://www.w3.org/ns/prov#wasDerivedFrom"

DBO_WIKI_PAGE_ID = ONTOLOGY + "wikiPageID"
DBO_WIKI_REVISION_ID = ONTOLOGY + "wikiPageRevisionID"
DBO_WIKI_REDIRECTS = ONTOLOGY + "wikiPageRedirects"
DBO_WIKI_LINK = ONTOLOGY + "wikiPageWikiLink"
DBO_WIKI_EXTERNAL_LINK = ONTOLOGY + "wikiPageExternalLink"
DBO_WIKI_USES_TEMPLATE = ONTOLOGY + "wikiPageUsesTemplate"
DBO_WIKI_DISAMBIGUATES = ONTOLOGY + "wikiPageDisambiguates"
DBO_ABSTRACT = ONTOLOGY + "abstract"

XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"

# unit-carrying infobox values (the reference's ParserUtils/Datatype
# guessing — KryoExtractionRegistrator.scala:46-47): suffix → datatype URI
DATATYPE_NS = "http://kg.example.org/datatype/"
UNIT_DATATYPES = {
    # length
    "km": DATATYPE_NS + "kilometre",
    "m": DATATYPE_NS + "metre",
    "cm": DATATYPE_NS + "centimetre",
    "mm": DATATYPE_NS + "millimetre",
    "mi": DATATYPE_NS + "mile",
    "ft": DATATYPE_NS + "foot",
    "in": DATATYPE_NS + "inch",
    # area
    "km2": DATATYPE_NS + "squareKilometre",
    "m2": DATATYPE_NS + "squareMetre",
    "mi2": DATATYPE_NS + "squareMile",
    "ft2": DATATYPE_NS + "squareFoot",
    "ha": DATATYPE_NS + "hectare",
    # mass
    "kg": DATATYPE_NS + "kilogram",
    "g": DATATYPE_NS + "gram",
    "lb": DATATYPE_NS + "pound",
    "t": DATATYPE_NS + "tonne",
    # time
    "s": DATATYPE_NS + "second",
    "min": DATATYPE_NS + "minute",
    "h": DATATYPE_NS + "hour",
    # speed
    "km/h": DATATYPE_NS + "kilometrePerHour",
    "mph": DATATYPE_NS + "milePerHour",
    # power / frequency / volume
    "kW": DATATYPE_NS + "kilowatt",
    "MW": DATATYPE_NS + "megawatt",
    "Hz": DATATYPE_NS + "hertz",
    "km3": DATATYPE_NS + "cubicKilometre",
    "m3": DATATYPE_NS + "cubicMetre",
    "L": DATATYPE_NS + "litre",
}
XSD_INTEGER = XSD + "integer"
XSD_DOUBLE = XSD + "double"
XSD_FLOAT = XSD + "float"
XSD_STRING = XSD + "string"
XSD_DATETIME = XSD + "dateTime"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

# dataset names (the multiplexing key of the reference's sink — SURVEY.md D1/K1)
DATASETS = (
    "labels",
    "page_ids",
    "revision_ids",
    "revision_uris",
    "wikipedia_links",
    "redirects",
    "category_labels",
    "article_categories",
    "skos_categories",
    "page_links",
    "external_links",
    "interlanguage_links",
    "geo_coordinates",
    "article_templates",
    "infobox_properties",
    "mappingbased_objects",
    "mappingbased_literals",
    "instance_types",
    "abstracts",
    "disambiguations",
)

# DDL string of a quad struct (for typed empty-array literals / casts)
QUAD_STRUCT_DDL = (
    "struct<dataset:string,subj:string,pred:string,obj:string,"
    "lang:string,datatype:string,context:string>"
)

# SI normalization for unit-typed literals (the reference framework's
# UnitValueParser converts parsed unit values to the unit's standard —
# published conversion constants; speed factors are the IEEE-double
# nearest value so any engine multiplying by the same literal agrees
# bit-for-bit). suffix → (factor, SI datatype URI)
UNIT_SI = {
    # length → metre
    "km": (1000.0, DATATYPE_NS + "metre"),
    "m": (1.0, DATATYPE_NS + "metre"),
    "cm": (0.01, DATATYPE_NS + "metre"),
    "mm": (0.001, DATATYPE_NS + "metre"),
    "mi": (1609.344, DATATYPE_NS + "metre"),
    "ft": (0.3048, DATATYPE_NS + "metre"),
    "in": (0.0254, DATATYPE_NS + "metre"),
    # area → square metre
    "km2": (1.0e6, DATATYPE_NS + "squareMetre"),
    "m2": (1.0, DATATYPE_NS + "squareMetre"),
    "mi2": (2589988.110336, DATATYPE_NS + "squareMetre"),
    "ft2": (0.09290304, DATATYPE_NS + "squareMetre"),
    "ha": (10000.0, DATATYPE_NS + "squareMetre"),
    # mass → kilogram
    "kg": (1.0, DATATYPE_NS + "kilogram"),
    "g": (0.001, DATATYPE_NS + "kilogram"),
    "lb": (0.45359237, DATATYPE_NS + "kilogram"),
    "t": (1000.0, DATATYPE_NS + "kilogram"),
    # time → second
    "s": (1.0, DATATYPE_NS + "second"),
    "min": (60.0, DATATYPE_NS + "second"),
    "h": (3600.0, DATATYPE_NS + "second"),
    # speed → metre per second
    "km/h": (0.2777777777777778, DATATYPE_NS + "metrePerSecond"),
    "mph": (0.44704, DATATYPE_NS + "metrePerSecond"),
    # power → watt
    "kW": (1000.0, DATATYPE_NS + "watt"),
    "MW": (1.0e6, DATATYPE_NS + "watt"),
    # frequency → hertz (already SI)
    "Hz": (1.0, DATATYPE_NS + "hertz"),
    # volume → cubic metre
    "km3": (1.0e9, DATATYPE_NS + "cubicMetre"),
    "m3": (1.0, DATATYPE_NS + "cubicMetre"),
    "L": (0.001, DATATYPE_NS + "cubicMetre"),
}
