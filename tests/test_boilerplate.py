"""Boilerplate removal (operators/boilerplate.py): Spark ≡ pure-Python
twin on hand-built pages, per-rule isolation, anchor accounting, entity
decode, script/style immunity, JVM-only plan."""

import pytest
from pyspark.sql import functions as F

from fetcho_spark.operators import boilerplate as BP

pytestmark = [pytest.mark.spark]

GOOD_PARA = ("It is the case that the crawler keeps the long article text "
             "and this is the body of it, written with many of the usual "
             "function words in it.")
NAV = '<div id="nav"><a href="/">Home</a> <a href="/about">About</a></div>'
PAGE = f"""<html><head><title>T</title>
<style>p {{ color: red }}</style>
<script type="text/javascript">var q = "<p>phantom block</p>";</script>
</head><body>
{NAV}
<h1>Story of the day</h1>
<p>{GOOD_PARA}</p>
<p>alpha beta gamma delta epsilon zeta eta theta</p>
<p>Short.</p>
<ul><li><a href="/1">one thing</a></li><li><a href="/2">two</a></li></ul>
<p>A paragraph with an <a href="/in">inline link of notable size</a> plus
the rest of the words being plain prose of the document and more.</p>
<!-- <p>commented out</p> -->
<footer>Copyright &copy; 2026 &amp; <a href="/tos">Terms</a></footer>
</body></html>"""


def _spark_blocks(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = BP.block_classify(df).orderBy("block_idx").collect()
    return [{k: r[k] for k in ("text", "total_len", "anchor_len",
                               "n_words", "n_stop", "keep")} for r in rows]


def test_spark_matches_local_twin(spark):
    got = _spark_blocks(spark, PAGE)
    ref = BP.classify_blocks_local(PAGE)
    assert got == ref
    assert len(got) >= 7


def test_rule_outcomes(spark):
    ref = {b["text"]: b for b in BP.classify_blocks_local(PAGE)}
    # the long stopword-rich paragraph survives
    assert ref[GOOD_PARA]["keep"]
    # nav: two anchors, tiny text -> dropped (short + link-dense);
    # all chars but the separating space are anchor text
    nav = next(b for b in ref.values() if b["text"].startswith("Home"))
    assert not nav["keep"] and nav["anchor_len"] == nav["total_len"] - 1
    # mid-length word soup with no stopwords -> dropped (low-stopword)
    soup = ref["alpha beta gamma delta epsilon zeta eta theta"]
    assert not soup["keep"] and soup["n_stop"] == 0 \
        and soup["total_len"] >= BP.MIN_LEN
    # 'Short.' -> dropped by length alone
    assert not ref["Short."]["keep"] and ref["Short."]["total_len"] < 25
    # footer: copyright + anchors -> dropped; entities decoded
    foot = next(b for b in ref.values() if "Copyright" in b["text"])
    assert not foot["keep"] and "(c) 2026 &" in foot["text"]
    # inline link inside prose: anchor chars counted, block still kept
    inline = next(b for b in ref.values() if "inline link" in b["text"])
    assert inline["keep"]
    assert inline["anchor_len"] == len("inline link of notable size")
    # script/style/comment payloads never became blocks
    assert not any("phantom" in b["text"] or "color" in b["text"]
                   or "commented" in b["text"] for b in ref.values())


def test_extract_content_document_view(spark):
    df = spark.createDataFrame([(7, PAGE)], "doc_id long, html string")
    row = BP.extract_content(df).head()
    ref = BP.classify_blocks_local(PAGE)
    assert row["n_blocks"] == len(ref)
    assert row["n_kept"] == sum(1 for b in ref if b["keep"])
    assert row["content"] == "\n".join(b["text"] for b in ref if b["keep"])
    assert GOOD_PARA in row["content"] and "Home" not in row["content"]


def test_tag_name_boundaries(spark):
    # <link> must not split on the li branch; <pre> not on the p branch
    html = ('<p>the start of it all, a line that is long enough to stay '
            'in the set here</p><link rel="x" href="y">'
            '<pre>the code of the block that is also long enough to be '
            'kept as it is</pre>')
    got = _spark_blocks(spark, html)
    assert got == BP.classify_blocks_local(html)
    assert len(got) == 2 and all(b["keep"] for b in got)


def test_case_insensitive_and_attrless_anchors(spark):
    html = ('<P>the first of the two long blocks, with more of the '
            'filler text of it</P><BR><p>an <A HREF="/x">upper case '
            'anchor</A> in the middle of the other long block of the '
            'page text</p>')
    got = _spark_blocks(spark, html)
    ref = BP.classify_blocks_local(html)
    assert got == ref
    assert ref[1]["anchor_len"] == len("upper case anchor")


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    for frame in (BP.block_classify(df), BP.extract_content(df)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_thresholds_configurable(spark):
    html = "<p>tiny</p>"
    assert not BP.classify_blocks_local(html)[0]["keep"]
    loose = BP.classify_blocks_local(html, min_len=1, stop_pct=0)
    assert loose[0]["keep"]
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    row = BP.block_classify(df, min_len=1, stop_pct=0).head()
    assert row["keep"]
