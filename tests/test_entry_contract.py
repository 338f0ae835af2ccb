"""Driver-contract sanity for __spark_entry__: every oracle key has a query,
queries run at sf0.001, and the micro-world derivations are consistent."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="driver testdata not present",
)


def test_oracle_keys_subset_of_queries():
    q = E.queries()
    for name in E.oracle_sql():
        assert name in q, f"oracle {name} has no query"


def test_dict_is_consistent():
    for sf, uri, pc, rank, n, prior in E.DICT:
        n_actual = sum(1 for r in E.DICT if r[0] == sf)
        assert n == n_actual, (sf, n, n_actual)
        assert 1 <= rank <= n
    # cand_rank must order by pair_count desc, uri asc within each sf
    by_sf = {}
    for sf, uri, pc, rank, n, prior in E.DICT:
        by_sf.setdefault(sf, []).append((rank, pc, uri))
    for sf, rows in by_sf.items():
        rows.sort()
        ordered = sorted(rows, key=lambda r: (-r[1], r[2]))
        assert rows == ordered, f"cand_rank disordered for {sf}"


def test_representative_queries_run(spark):
    for name in ["spot_dictionary", "m6_cooccurrence", "interleave_roundtrip"]:
        df = E.queries()[name](spark, SF_DIR)
        assert df.count() >= 0


def test_interleave_roundtrip_all_ok(spark):
    rows = E.q_interleave_roundtrip(spark, SF_DIR).collect()
    assert rows and all(r["ok"] for r in rows)
