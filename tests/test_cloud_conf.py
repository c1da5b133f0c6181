"""Cloud deployment conf assembly (S6/S7 live forms) — pure, no network."""

from __future__ import annotations

import pytest

from admob_data_pipeline_spark.session import (
    BIGQUERY_CONNECTOR_PACKAGE,
    GCS_CONNECTOR_PACKAGE,
    cloud_conf,
)
from admob_data_pipeline_spark.sinks.writers import bigquery_writer_options


def test_cloud_conf_assembles_connectors_and_auth():
    conf = cloud_conf(
        {
            "GCP_PROJECT": "proj-1",
            "GCS_BUCKET_NAME": "stage-bucket",
            "GOOGLE_APPLICATION_CREDENTIALS": "/secrets/sa.json",
        }
    )
    pkgs = conf["spark.jars.packages"].split(",")
    assert GCS_CONNECTOR_PACKAGE in pkgs and BIGQUERY_CONNECTOR_PACKAGE in pkgs
    assert (
        conf["spark.hadoop.fs.gs.impl"]
        == "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
    )
    assert conf["spark.hadoop.fs.gs.project.id"] == "proj-1"
    assert conf["spark.hadoop.google.cloud.auth.service.account.enable"] == "true"
    assert (
        conf["spark.hadoop.google.cloud.auth.service.account.json.keyfile"]
        == "/secrets/sa.json"
    )
    assert conf["spark.conf.temporaryGcsBucket"] == "stage-bucket"


def test_cloud_conf_minimal_env_omits_optional_keys():
    conf = cloud_conf({})
    assert "spark.jars.packages" in conf
    assert "spark.hadoop.fs.gs.project.id" not in conf
    assert "spark.conf.temporaryGcsBucket" not in conf
    assert "spark.hadoop.google.cloud.auth.service.account.enable" not in conf


def test_bigquery_options_indirect_requires_bucket():
    with pytest.raises(ValueError, match="temporary_gcs_bucket"):
        bigquery_writer_options("ds.t")
    opts = bigquery_writer_options("proj.ds.t", "stage-bucket")
    assert opts == {
        "table": "proj.ds.t",
        "writeMethod": "indirect",
        "temporaryGcsBucket": "stage-bucket",
        "partitionField": "date",
        "partitionType": "DAY",
    }


def test_bigquery_options_direct_and_validation():
    opts = bigquery_writer_options("ds.t", write_method="direct", partition_field=None)
    assert opts == {"table": "ds.t", "writeMethod": "direct"}
    with pytest.raises(ValueError, match="direct|indirect"):
        bigquery_writer_options("ds.t", write_method="streaming")
