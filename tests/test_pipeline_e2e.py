"""End-to-end web -> training-data pipeline composition: crawl a
synthetic HTML web, then run the fetched bodies through the full
curation chain — boilerplate removal -> C4 line/doc filters -> line-level
corpus dedup -> exact dedup -> token-budget sampling -> sequence packing
— and assert the whole composition is a pure function of the input
(byte-identical across partitionings, every stage non-vacuous). This is
the "a user can run their whole pipeline on this engine" claim as one
executable test."""

import tempfile

import pytest
from pyspark.sql import functions as F

from fetcho_spark import fixtures as fx
from fetcho_spark.catalog import Catalog
from fetcho_spark.crawl import CrawlConfig, CrawlEngine
from fetcho_spark.operators.boilerplate import extract_content
from fetcho_spark.operators.dedup import exact_dedup_groups
from fetcho_spark.operators.lines import c4_filter, line_dedup
from fetcho_spark.operators.textops import pack_sequences, token_budget_sample

pytestmark = [pytest.mark.spark, pytest.mark.slow]

N_PAGES, N_HOSTS, N_IMAGES = 80, 10, 12


def _crawl_fetched(spark, tmpdir):
    cfg = CrawlConfig(max_chunk=60, n_seen_buckets=4,
                      bits_per_bucket=1 << 14)
    cat = Catalog(spark, tmpdir)
    eng = CrawlEngine(spark, cat, cfg)
    wg = fx.gen_webgraph(N_PAGES, N_HOSTS, N_IMAGES, html_bodies=True)
    eng.init(fx.gen_seeds(wg, 10),
             fx.webgraph_df(spark, N_PAGES, N_HOSTS, N_IMAGES,
                            html_bodies=True),
             fx.images_df(spark, N_IMAGES), fx.robots_df(spark, N_HOSTS),
             fx.hosts_df(spark, N_HOSTS))
    eng.run(2)
    return cat.read("fetched")


def _docs(fetched):
    return (fetched
            .filter((F.col("status") == 200) & F.col("body").isNotNull())
            .select(F.col("url").alias("doc_id"),
                    F.col("host").alias("source"),
                    F.col("body").alias("html")))


def _pipeline(fetched, n_parts):
    """fetched bodies -> curated, deduped, budgeted, packed sequences."""
    docs = _docs(fetched).repartition(n_parts, "doc_id")
    # loose thresholds: fixture bodies are link soup, not prose — the
    # pipeline shape is under test, the English stopword model is not
    content = (extract_content(docs, html_col="html", id_col="doc_id",
                               min_len=10, stop_pct=0)
               .filter(F.length("content") > 0)
               .select("doc_id", F.col("content").alias("text")))
    c4 = (c4_filter(content)
          .select("doc_id", "text", "keep_doc"))
    deduped = line_dedup(c4.select("doc_id", "text"), min_df=3)
    survivors = (exact_dedup_groups(deduped, text_col="text",
                                    id_col="doc_id")
                 .select(F.col("keep_id").alias("doc_id"))
                 .join(deduped, "doc_id")
                 .join(_docs(fetched).select("doc_id", "source"), "doc_id"))
    budget = token_budget_sample(survivors, key_col="doc_id",
                                 group_col="source", text_col="text",
                                 budget=400)
    packed = pack_sequences(
        budget.filter("selected")
        .join(survivors.select("doc_id", "text"), "doc_id"),
        key_col="doc_id", text_col="text", window=64)
    return (packed.select("doc_id", "n_tokens", "tok_offset", "pack_id",
                          "pack_offset", "n_packs")
            .orderBy("doc_id"))


def test_pipeline_composes_and_is_deterministic(spark):
    with tempfile.TemporaryDirectory() as td:
        fetched = _crawl_fetched(spark, td).persist()
        a = [tuple(r) for r in _pipeline(fetched, 3).collect()]
        b = [tuple(r) for r in _pipeline(fetched, 11).collect()]
        assert a == b, "pipeline must be partition-invariant"
        assert len(a) > 0, "pipeline must keep some documents"

        # every stage was non-vacuous on this universe
        docs = _docs(fetched)
        n_fetched = docs.count()
        assert n_fetched > 10
        blocks = extract_content(docs, html_col="html", id_col="doc_id",
                                 min_len=10, stop_pct=0)
        dropped_blocks = blocks.agg(
            F.sum(F.col("n_blocks") - F.col("n_kept"))).first()[0]
        assert dropped_blocks and dropped_blocks > 0, \
            "boilerplate classification dropped nothing"
        assert len(a) < n_fetched, \
            "curation + budget must cut below the fetched count"
        # packing produced a gapless global layout
        offsets = sorted((r[2], r[1]) for r in a)  # (tok_offset, n_tokens)
        pos = 0
        for off, n in offsets:
            assert off == pos
            pos += n
        fetched.unpersist()
