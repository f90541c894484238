"""script_profile: per-script char counts + dominant script."""
import pytest


@pytest.mark.spark
def test_script_profile_counts_and_dominant(spark):
    from fetcho_spark.operators.textops import script_profile
    ru = "".join(chr(0x0410 + i) for i in range(6))        # cyrillic
    zh = "".join(chr(0x4E16 + i) for i in range(4))        # han
    hira = "".join(chr(0x3042 + i) for i in range(3))      # hiragana
    ar = "".join(chr(0x0627 + i) for i in range(5))        # arabic
    rows = [
        (0, "plain latin text"),
        (1, ru + " " + ru),                                # cyrillic only
        (2, "mix " + zh + hira),                           # han 4 > latin 3
        (3, ar),
        (4, "123 !!! ???"),                                # no script: none
        (5, "ab " + ru[:2]),                               # tie 2-2: latin first
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert got[0]["script"] == "latin" and got[0]["n_latin"] == 14
    assert got[0]["n_chars"] == 14
    assert got[1]["script"] == "cyrillic" and got[1]["n_cyrillic"] == 12
    assert got[2]["script"] == "han"
    assert got[2]["n_han"] == 4 and got[2]["n_hiragana"] == 3
    assert got[2]["n_latin"] == 3
    assert got[3]["script"] == "arabic" and got[3]["n_arabic"] == 5
    assert got[4]["script"] == "none" and got[4]["n_chars"] == 9
    assert got[5]["script"] == "latin"                     # priority tie-break
    assert got[6]["script"] == "none" and got[6]["n_chars"] == 0
