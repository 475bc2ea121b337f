"""The orchestrated webtext KG DAG (plans/webkg.py): stage protocol,
redirect resolution, skolemized export, resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_extraction_framework_spark.plans.webkg import (
    WebKGConfig,
    WebKGPipeline,
    triples_to_quads,
)


def _pages(spark):
    rows = []
    for i in range(8):
        if i % 4 == 1:   # 301 capture: no html, Location one step down
            rows.append((f"https://w/{i}", "2024-01-01 00:00:00", None,
                         301, f"https://w/{i - 1}"))
        else:
            html = (
                f'<a href="https://w/{(i + 1) % 8}">next</a>'
                f'<script type="application/ld+json">'
                f'{{"@id":"https://e/{i}","n":"v"}}</script>'
            )
            rows.append((f"https://w/{i}", "2024-01-01 00:00:00", html,
                         200, None))
    return spark.createDataFrame(
        rows, "url string, warc_ts string, html string, "
              "http_status int, http_location string"
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


def test_webkg_pipeline_stages_resolution_and_resume(spark, tmp_path):
    wh = str(tmp_path / "wh")
    cfg = WebKGConfig(warehouse=wh, output_formats={"nt": "n-triples"})
    out = WebKGPipeline(spark, cfg).run(_pages(spark))
    assert set(out) == {"web_pages", "web_redirect_closure",
                        "web_triples", "web_triples_resolved"}
    # 1-hop 301 chains resolved
    cl = {(r["src"], r["dst"])
          for r in out["web_redirect_closure"].collect()}
    assert cl == {("https://w/1", "https://w/0"),
                  ("https://w/5", "https://w/4")}
    # link objects pointing at a redirecting URL are rewritten to its
    # target; others pass through
    links = {(r["subj"], r["obj"])
             for r in out["web_triples_resolved"]
             .filter("pred = 'links_to'").collect()}
    assert ("https://w/0", "https://w/0") in links    # w/1 -> w/0
    assert ("https://w/4", "https://w/4") in links    # w/5 -> w/4
    assert ("https://w/2", "https://w/3") in links    # untouched
    # export is valid N-Triples with namespaced bare predicates
    nt = spark.read.text(wh + "/exports/nt/dataset=web")
    lines = [r["value"] for r in nt.collect()]
    assert lines and all(ln.endswith(" .") for ln in lines)
    assert any("/voc#links_to>" in ln for ln in lines)
    # second run resumes every stage (no new run_ids, no new rows)
    WebKGPipeline(spark, cfg).run(_pages(spark))
    lin = spark.read.parquet(wh + "/lineage")
    runs = {r["stage"]: r["n"] for r in lin.groupBy("stage")
            .agg(F.countDistinct("run_id").alias("n")).collect()}
    assert set(runs) >= {"web_pages", "web_redirect_closure",
                         "web_triples", "web_triples_resolved", "exports"}
    assert all(n == 1 for n in runs.values())


def test_triples_to_quads_skolemization(spark):
    t = spark.createDataFrame(
        [(0, "_:b1", "knows", "_:b2", "bnode"),
         (0, "https://s", "https://p/x", "plain text", "literal"),
         (0, "https://s", "og:t", "https://looks-like-iri/", "literal")],
        "id long, subj string, pred string, obj string, obj_kind string",
    )
    q = {(r["subj"], r["pred"], r["obj"], r["datatype"])
         for r in triples_to_quads(t, "https://b").collect()}
    # bnodes -> RDF 1.1 skolem IRIs on both sides
    assert ("https://b/.well-known/genid/b1", "https://b/voc#knows",
            "https://b/.well-known/genid/b2", None) in q
    # scheme'd predicates pass through; plain literal untyped
    assert ("https://s", "https://p/x", "plain text", None) in q
    # literal that LOOKS like an IRI is pinned to xsd:string so the
    # renderer cannot emit it as a resource
    assert ("https://s", "og:t", "https://looks-like-iri/",
            "http://www.w3.org/2001/XMLSchema#string") in q


def test_webkg_empty_stage_and_resume(spark, tmp_path):
    # degenerate-but-legal corpus: every capture is a redirect -> the
    # partitioned web_triples stage is EMPTY; the persisted _schema.json
    # must carry read-back and resume past it (no UNABLE_TO_INFER_SCHEMA)
    pages = spark.createDataFrame(
        [("https://w/1", "2024-01-01 00:00:00", None, 301, "https://w/0")],
        "url string, warc_ts string, html string, http_status int, "
        "http_location string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    cfg = WebKGConfig(warehouse=str(tmp_path / "wh"))
    out = WebKGPipeline(spark, cfg).run(pages)
    assert out["web_triples_resolved"].count() == 0
    assert out["web_redirect_closure"].count() == 1
    out2 = WebKGPipeline(spark, cfg).run(pages)   # resume over empty stage
    assert out2["web_triples_resolved"].count() == 0
    assert out2["web_triples_resolved"].columns == [
        "id", "subj", "pred", "obj", "obj_kind", "url",
    ][:len(out2["web_triples_resolved"].columns)]


def test_webkg_cdx_stage_and_resume(spark, tmp_path):
    import glob

    wh = str(tmp_path / "wh")
    cfg = WebKGConfig(warehouse=wh, cdx=True, cdx_files=2,
                      output_formats=None)
    WebKGPipeline(spark, cfg).run(_pages(spark))
    parts = sorted(glob.glob(wh + "/cdx/part-*"))
    lines = [ln for p in parts for ln in open(p).read().splitlines()]
    assert len(lines) == 8                     # ALL captures, 301s included
    keys = [tuple(ln.split(" ", 2)[:2]) for ln in lines]
    assert keys == sorted(keys)                # globally ordered shards
    # redirect captures carry their status and the empty-payload digest
    import hashlib
    redirs = [ln for ln in lines if " 301 " in ln]
    assert len(redirs) == 2
    assert all(hashlib.md5(b"").hexdigest() in ln for ln in redirs)
    # second run resumes the cdx stage too (one lineage run per stage)
    WebKGPipeline(spark, cfg).run(_pages(spark))
    lin = spark.read.parquet(wh + "/lineage")
    runs = {r["stage"]: r["n"] for r in lin.groupBy("stage")
            .agg(F.countDistinct("run_id").alias("n")).collect()}
    assert runs["cdx"] == 1
    cdx_rows = lin.filter("stage = 'cdx'").collect()
    assert len(cdx_rows) == 1 and cdx_rows[0]["n_rows"] == 8


def test_incremental_web_triples_patches_not_reextracts(spark):
    from distributed_extraction_framework_spark.operators.structured_data import (  # noqa: E501
        web_page_triples,
    )
    from distributed_extraction_framework_spark.plans.webkg import (
        incremental_web_triples,
    )

    def pg(u, target):
        return (u, f'<a href="https://t/{target}">x</a>'.encode())

    # html as BINARY — the input_hint crawl schema
    v1 = spark.createDataFrame(
        [pg("https://w/keep", "k"), pg("https://w/change", "old"),
         pg("https://w/drop", "d")],
        "url string, html binary",
    )
    v2 = spark.createDataFrame(
        [pg("https://w/keep", "k"), pg("https://w/change", "new"),
         pg("https://w/add", "a")],
        "url string, html binary",
    )
    old = web_page_triples(v1, id_col="url")
    # plant a sentinel on the UNCHANGED page: if the patch re-extracted
    # it, the sentinel would be overwritten — surviving proves the
    # unchanged slice never went back through extraction
    old = old.withColumn(
        "obj",
        F.when(F.col("id") == "https://w/keep", F.lit("SENTINEL"))
        .otherwise(F.col("obj")),
    )
    got = {(r["id"], r["pred"], r["obj"])
           for r in incremental_web_triples(old, v1, v2).collect()}
    assert got == {
        ("https://w/keep", "links_to", "SENTINEL"),
        ("https://w/change", "links_to", "https://t/new"),
        ("https://w/add", "links_to", "https://t/a"),
    }


def test_webkg_fused_stage_credits_publishing_page(spark, tmp_path):
    # e0 is anchored by pages on hostA (value "good") and hostB
    # (value "bad"), plus a third hostC page agreeing with hostA; the
    # (id, entity) anchor join must NOT credit hostB with "good".
    rows = []
    for host, val in (("a", "good"), ("b", "bad"), ("c", "good")):
        rows.append((
            f"https://{host}.ex/p", "2024-01-01 00:00:00",
            '<meta property="og:m" content="pm">'
            '<script type="application/ld+json">'
            f'{{"@id":"https://e/0","n":"{val}"}}</script>',
        ))
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, html string"
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    cfg = WebKGConfig(warehouse=str(tmp_path / "wh"),
                      resolve_redirects=False, fuse_literals=True)
    out = WebKGPipeline(spark, cfg).run(pages)
    fused = {(r.subj, r.pred): r for r in out["web_fused"].collect()}
    ent = fused[("https://e/0", "n")]
    assert ent.obj == "good"
    assert ent.votes == 2 and ent.n_values == 2 and ent.n_sources == 3
    # page-level meta literals ride along as single-source claims
    assert fused[("https://a.ex/p", "og:m")].obj == "pm"
    assert fused[("https://a.ex/p", "og:m")].n_sources == 1
    # the stage participates in the resume protocol
    out2 = WebKGPipeline(spark, cfg).run(pages)
    lin = spark.read.parquet(str(tmp_path / "wh") + "/lineage")
    n_runs = (lin.filter("stage = 'web_fused'")
              .select("run_id").distinct().count())
    assert n_runs == 1
    assert out2["web_fused"].count() == out["web_fused"].count()
