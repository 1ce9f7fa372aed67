"""Owner/grants informational surface on the lake manifest (C6 tail:
reference parity with oracle_sde.py:784-799's privileges introspection)."""

import sys

import pytest

sys.path.insert(0, ".")
from geopetl_spark import LakeTable  # noqa: E402
from tests.test_cdc_engine import DOC_SCHEMA  # noqa: E402


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable(spark, str(tmp_path / "lake")).create(
        DOC_SCHEMA, key_col="doc_id", n_buckets=4, owner="pipeline_svc"
    )


def test_owner_starts_with_all(table):
    assert table.manifest()["owner"] == "pipeline_svc"
    assert table.privileges() == {"pipeline_svc": ["ALL"]}
    d = table.describe()
    assert d["owner"] == "pipeline_svc"
    assert d["privileges"] == {"pipeline_svc": ["ALL"]}


def test_grant_revoke_roundtrip_is_versioned(table):
    v0 = table.manifest()["version"]
    table.grant("analyst", ["SELECT"])
    table.grant("etl_job", ["INSERT", "UPDATE"])
    assert table.privileges() == {
        "pipeline_svc": ["ALL"],
        "analyst": ["SELECT"],
        "etl_job": ["INSERT", "UPDATE"],
    }
    # ACL changes are metadata-only manifest commits (versioned, replay-safe)
    assert table.manifest()["version"] == v0 + 2
    table.revoke("etl_job", "UPDATE")
    assert table.privileges()["etl_job"] == ["INSERT"]
    table.revoke("etl_job")
    assert "etl_job" not in table.privileges()
    # revoking an unknown principal is a no-op, not an error
    assert table.revoke("ghost")["noop"] is True


def test_partial_revoke_from_all_holder_narrows(table):
    # 'ALL' - 'SELECT' must expand to the concrete op list, not no-op
    table.grant("analyst", "ALL")
    table.revoke("analyst", "SELECT")
    assert table.privileges()["analyst"] == ["DELETE", "INSERT", "UPDATE"]
    table.revoke("analyst", ["INSERT", "UPDATE", "DELETE"])
    assert "analyst" not in table.privileges()
    # revoking 'ALL' from an ALL holder removes the principal outright
    table.grant("etl", "ALL")
    table.revoke("etl", "ALL")
    assert "etl" not in table.privileges()


def test_grant_all_collapses_and_validates(table):
    table.grant("analyst", ["SELECT", "ALL"])
    assert table.privileges()["analyst"] == ["ALL"]
    with pytest.raises(ValueError, match="unknown ops"):
        table.grant("analyst", ["DROP TABLE"])


def test_acl_survives_data_commits(spark, table):
    table.grant("analyst", "SELECT")
    batch = spark.createDataFrame(
        [("k1", [1], 1, "s", "I", 1)],
        "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long",
    )
    table.merge(batch, epoch_id=0, lsn_col="lsn", op_col="op")
    assert table.privileges() == {"pipeline_svc": ["ALL"], "analyst": ["SELECT"]}
