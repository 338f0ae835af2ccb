"""Surface-containment coreference chains (operators/coref.py)."""

from dbpedia_spotlight_spark.operators.coref import (
    coref_chain_ids,
    coref_links,
)


def _mentions(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, pos int, surface_form string"
    )


def test_links_multi_token_containment(spark):
    m = _mentions(
        spark,
        [
            ("d1", 0, "barack obama"),
            ("d1", 5, "obama"),          # contained in pos 0
            ("d1", 9, "obama"),          # exact repeat -> nearest is pos 5
            ("d1", 12, "michelle obama"),  # NOT contained in barack obama
            ("d2", 3, "obama"),          # other doc: no antecedent
        ],
    )
    links = {
        (r.doc_id, r.pos): (r.antecedent_pos, r.antecedent_sf)
        for r in coref_links(m).collect()
    }
    assert links[("d1", 5)] == (0, "barack obama")
    assert links[("d1", 9)] == (5, "obama")
    assert ("d1", 12) not in links
    assert ("d1", 0) not in links
    assert ("d2", 3) not in links


def test_no_partial_token_match(spark):
    # "man" must not match inside "manchester" (whole-token containment)
    m = _mentions(spark, [("d", 0, "manchester united"), ("d", 4, "man")])
    assert coref_links(m).count() == 0


def test_chain_ids_resolve_to_root(spark):
    m = _mentions(
        spark,
        [
            ("d", 0, "barack obama"),
            ("d", 5, "obama"),
            ("d", 9, "obama"),
            ("d", 20, "paris"),
        ],
    )
    ids = {
        (r.doc_id, r.pos): r.chain_id
        for r in coref_chain_ids(m, coref_links(m)).collect()
    }
    # the pos-9 "obama" chains through pos 5 to the pos-0 root
    assert ids[("d", 0)] == 0
    assert ids[("d", 5)] == 0
    assert ids[("d", 9)] == 0
    assert ids[("d", 20)] == 20


def test_chain_ids_long_chain_pointer_doubling(spark):
    # 10 exact repeats: every mention resolves to the first, in
    # O(log 10) rounds rather than 10
    m = _mentions(spark, [("d", i, "acme") for i in range(10)])
    ids = {
        r.pos: r.chain_id
        for r in coref_chain_ids(m, coref_links(m)).collect()
    }
    assert ids == {i: 0 for i in range(10)}
