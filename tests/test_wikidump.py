"""S1 full: Wikipedia XML dump source — markup strip, page filtering,
paragraph split, anchor harvest (ref WikiOccurrenceSource.scala:90-170,
WikiMarkupStripper.scala:35-190)."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.io.corpora import gold_occurrences
from dbpedia_spotlight_spark.io.wikidump import (
    dump_corpus,
    parse_paragraph_links,
    read_xml_dump,
    strip_wiki_markup,
)

DUMP = """<mediawiki>
<page>
  <title>Alpha Beta</title>
  <ns>0</ns>
  <revision><text>'''Alpha Beta''' is a thing.&quot;q&quot; __NOTOC__
{{Infobox|key={{nested|x}}}}

It links to [[Gamma Delta|the gammas]] and [[Epsilon]].&lt;tag&gt;
More<ref name="a">cite</ref> text with [[File:Pic.png|thumb|caption]] media.

== See also ==
* [[Unrelated]]

</text></revision>
</page>
<page>
  <title>Redirect Page</title>
  <ns>0</ns>
  <redirect title="Alpha Beta" />
  <revision><text>#REDIRECT [[Alpha Beta]]</text></revision>
</page>
<page>
  <title>Epsilon (disambiguation)</title>
  <ns>0</ns>
  <revision><text>{{disambig}}
[[Epsilon (letter)]] or [[Epsilon (rocket)]]</text></revision>
</page>
<page>
  <title>Talk page</title>
  <ns>1</ns>
  <revision><text>chatter [[Links]]</text></revision>
</page>
</mediawiki>"""


def test_strip_wiki_markup_chain(spark):
    out = (
        spark.createDataFrame([(DUMP,)], "m string")
        .select(strip_wiki_markup(F.col("m")).alias("s"))
        .collect()[0]["s"]
    )
    assert "'''" not in out and "{{" not in out and "<ref" not in out
    assert "__NOTOC__" not in out
    assert "[[Gamma Delta|the gammas]]" in out  # links survive
    assert '"q"' in out  # entities decoded


def test_parse_paragraph_links_reference_rules():
    text, gold = parse_paragraph_links(
        "See [[United States|the USA (country)]] and "
        "[[The Example]] and [[File:X.png|thumb|cap]] end"
    )
    # stripMultiPipe takes the last part; ' (...)$' and '^The ' are cleaned
    assert text == "See the USA and Example and cap end"
    assert gold[0] == ("United_States", "the USA", 4, 1.0)
    assert gold[1] == ("The_Example", "Example", 16, 1.0)
    assert len(gold) == 2  # File: link adds text but no occurrence


def test_read_xml_dump_end_to_end(spark, tmp_path):
    p = tmp_path / "dump.xml"
    p.write_text(DUMP)
    corpus = read_xml_dump(spark, str(p))
    rows = {r["doc_id"]: r for r in corpus.collect()}
    # only the Main-namespace article survives; redirect/disambig/talk don't
    assert all(k.startswith("Alpha_Beta-p") for k in rows)
    # paragraph 2 carries the links with clean-text offsets
    occs = {
        (r["doc_id"], r["surface_form"], r["uri"], r["offset"])
        for r in gold_occurrences(corpus).collect()
    }
    p2 = rows["Alpha_Beta-p2"]["text"]
    assert ("Alpha_Beta-p2", "the gammas", "Gamma_Delta", 12) in occs
    assert p2[12 : 12 + len("the gammas")] == "the gammas"
    eps = next(o for o in occs if o[2] == "Epsilon")
    assert p2[eps[3] : eps[3] + len("Epsilon")] == "Epsilon"
    # see-also section stripped -> no Unrelated occurrence
    assert not any(o[2] == "Unrelated" for o in occs)


def test_dump_to_model_tables(spark, tmp_path):
    """The dump feeds the model build: uri/pair counts from harvested occs
    (the reference's index_db.sh entry path)."""
    from dbpedia_spotlight_spark.operators.modelbuild import (
        pair_counts,
        uri_counts,
    )

    p = tmp_path / "dump.xml"
    p.write_text(DUMP)
    occs = gold_occurrences(read_xml_dump(spark, str(p)))
    uri = {r["uri"]: r["support"] for r in uri_counts(occs).collect()}
    assert uri == {"Gamma_Delta": 1, "Epsilon": 1}
    pairs = {
        (r["surface_form"], r["uri"]): r["pair_count"]
        for r in pair_counts(occs).collect()
    }
    assert pairs[("the gammas", "Gamma_Delta")] == 1
