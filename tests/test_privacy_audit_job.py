"""End-to-end privacy-audit job (jobs/privacy_audit_job.py): report /
suppression / gate semantics over the customer table."""

import json
import os
import sys

import pytest

SF_DIR = "/root/testdata/sf0.001"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_privacy_audit_job_gate_and_suppression(spark, tmp_path, capsys):
    import privacy_audit_job

    out = str(tmp_path / "priv")
    rc = privacy_audit_job.main(
        [
            "--input", f"{SF_DIR}/customer.parquet",
            "--output", out,
            "--quasi", "c_nationkey",
            "--quasi", "c_mktsegment",
            "--sensitive", "c_acctbal",
            "-k", "3",
            "--suppress",
            "--fail-on-violations",
        ]
    )
    line = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ][-1]
    m = json.loads(line)
    # the tiny customer dim cannot be 3-anonymous on (nation, segment)
    assert m["n_under_k_classes"] > 0 and m["gate_failed"] is True
    assert rc == 1

    # the suppressed table masks exactly the under-k rows' QI values
    sup = spark.read.parquet(f"{out}/suppressed")
    n_masked = sup.filter(
        (sup["c_nationkey"] == "*") & (sup["c_mktsegment"] == "*")
    ).count()
    assert n_masked == m["n_rows_suppressed"]
    assert sup.count() == m["n_rows"]

    # report totals reconcile: class sizes sum to the row count
    rep = spark.read.parquet(f"{out}/report")
    assert (
        rep.groupBy().sum("class_size").first()[0] == m["n_rows"]
    )


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_privacy_audit_job_passing_gate(spark, tmp_path, capsys):
    import privacy_audit_job

    out = str(tmp_path / "priv_ok")
    rc = privacy_audit_job.main(
        [
            "--input", f"{SF_DIR}/customer.parquet",
            "--output", out,
            "--quasi", "c_mktsegment",
            "--sensitive", "c_acctbal",
            "-k", "2",
            "--fail-on-violations",
        ]
    )
    line = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ][-1]
    m = json.loads(line)
    # 5 segments over 150 customers: every class >= 2 -> gate passes
    assert m["n_under_k_classes"] == 0 and m["gate_failed"] is False
    assert rc == 0
