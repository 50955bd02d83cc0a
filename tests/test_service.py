"""Service lifecycle smoke test: env config → wiring → catch-up → live
tail → graceful stop (reference system.clj/main.clj behavior)."""

from __future__ import annotations

import time

from cdc_init_spark.service import Service, ServiceConfig
from cdc_init_spark.streaming.model import CCD


def test_config_from_env():
    cfg = ServiceConfig.from_env(
        {
            "CDC_CONTROL_LOG": "/x/control",
            "CDC_SOURCE_PKS": "nation=n_nationkey,lineitem=l_orderkey+l_linenumber",
        }
    )
    assert cfg.control_log == "/x/control"
    assert cfg.source_pks == {
        "nation": ["n_nationkey"],
        "lineitem": ["l_orderkey", "l_linenumber"],
    }


def test_config_kafka_url():
    cfg = ServiceConfig(control_log="kafka://broker:9092/ctl")
    # construction of the kafka log itself is lazy/cheap
    assert cfg.control_log.startswith("kafka://")


def test_service_end_to_end(spark, tmp_path):
    cfg = ServiceConfig(
        control_log=str(tmp_path / "control"),
        topic_root=str(tmp_path / "topics"),
        store_root=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "chk"),
        source_root="/root/testdata/sf0.001",
        source_pks={"region": ["r_regionkey"]},
    )
    svc = Service(cfg, spark=spark)
    # backlog CCD present before start
    svc.control_log.append(CCD(table="erp.region", queue="region_cdc", queue_table="r_qt"))
    results = svc.start()
    try:
        assert [r.status for r in results] == ["active"]
        assert len(svc.topic_store.read_messages("region_cdc")) == 5
        # live submission through the tail
        svc.seed_store  # same store serves the tail
        svc.control_log.append(
            CCD(table="erp.region", queue="region_cdc2", queue_table="r_qt2")
        )
        deadline = time.time() + 30
        while time.time() < deadline:
            svc.initializer._query.processAllAvailable()
            if (
                svc.topic_store.topic_exists("region_cdc2")
                and len(svc.topic_store.read_messages("region_cdc2")) == 5
            ):
                break
            time.sleep(0.2)
        assert len(svc.topic_store.read_messages("region_cdc2")) == 5
    finally:
        svc.stop()
    assert svc.initializer._query is None


def test_service_missing_pk_spec_is_clean_error(spark, tmp_path):
    cfg = ServiceConfig(
        control_log=str(tmp_path / "control"),
        topic_root=str(tmp_path / "topics"),
        store_root=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "chk"),
        source_root="/root/testdata/sf0.001",
        source_pks={},
    )
    svc = Service(cfg, spark=spark)
    svc.control_log.append(CCD(table="erp.region", queue="rq", queue_table="rqt"))
    results = svc.initializer.catch_up(spark)
    # seeding fails → compensated error state, not a crash (A25)
    assert results[0].status == "error"
    assert "primary-key" in results[0].error["message"]
