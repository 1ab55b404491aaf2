"""Config validation parity tests (TaskConfigChecker.java:15-34)."""

import pytest

from jly_flink_spark.config import (
    ConfigError,
    SinkConfig,
    SourceInfo,
    TaskConfig,
    check_task_config,
    demo_task_config,
)


def test_valid_config_passes():
    check_task_config(demo_task_config())


def test_empty_tables_rejected():
    cfg = demo_task_config()
    cfg.tables = []
    with pytest.raises(ConfigError, match="tables"):
        check_task_config(cfg)


def test_empty_sources_rejected():
    cfg = demo_task_config()
    cfg.sources = []
    with pytest.raises(ConfigError, match="sources"):
        check_task_config(cfg)


def test_duplicate_instance_name_rejected():
    cfg = demo_task_config()
    cfg.sources.append(SourceInfo(instance_name="src-0", fb_no="FBX"))
    with pytest.raises(ConfigError, match="duplicate"):
        check_task_config(cfg)


def test_sink_config_defaults():
    # SinkConfig.java:20-21 defaults
    sc = SinkConfig.from_dict({})
    assert sc.batch_size == 100
    assert sc.flush_interval_ms == 5000


def test_table_list_expansion():
    # StartJob.java:55-57: db.table per source
    cfg = TaskConfig(
        db_alias="x",
        tables=["a", "b"],
        sources=[SourceInfo("s1", "F1", db_name="db1")],
    )
    assert cfg.table_list() == ["db1.a", "db1.b"]


def test_camel_case_yaml_keys():
    cfg = TaskConfig.from_dict(
        {
            "dbAlias": "demo",
            "tables": ["t"],
            "sources": [{"instanceName": "s", "fbNo": "F", "serverId": "1-9"}],
        }
    )
    assert cfg.db_alias == "demo"
    assert cfg.sources[0].instance_name == "s"
    assert cfg.sources[0].fb_no == "F"
