"""CLI smoke test: `python -m jly_flink_spark` wires config selection
(--db_listened → application-<name>.yaml), conditional SR sink (C3),
and the run-to-completion drain — the reference's launch surface
(StartJob.java:36-108) end to end on local dirs."""

import glob
import json
import os

import yaml

from jly_flink_spark.__main__ import main

APP_YAML = {
    "db_alias": "demo",
    "tables": ["t_orders", "t_items"],
    "sources": [
        {
            "instance_name": f"src-{i}",
            "server_id": f"{5400 + i}-{5404 + i}",
            "host": "db.example.internal",
            "port": 3306,
            "username": "PLACEHOLDER",
            "password": "PLACEHOLDER",
            "fb_no": f"FB{i}",
            "db_name": "demo",
        }
        for i in range(3)
    ],
}

ENVELOPES = [
    ("src-0", {"op": "d", "ts_ms": 1754000000000,
               "source": {"db": "demo", "table": "t_orders"},
               "before": {"id": "11"}}),
    ("src-1", {"op": "i", "ts_ms": 1754000001000,
               "source": {"db": "demo", "table": "t_orders"},
               "before": {"id": "12"}}),
    ("src-2", {"op": "d", "ts_ms": 1754000002000,
               "source": {"db": "demo", "table": "t_items"},
               "before": {"id": "13"}}),
]


def test_cli_once_drains_to_both_sinks(spark, tmp_path):
    conf = tmp_path / "conf"
    conf.mkdir()
    with open(conf / "application-demo.yaml", "w") as f:
        yaml.safe_dump(APP_YAML, f)

    env_dir = tmp_path / "envelopes"
    env_dir.mkdir()
    with open(env_dir / "b0.txt", "w") as f:
        for inst, env in ENVELOPES:
            f.write(f"{inst}|{json.dumps(env, separators=(',', ':'))}\n")

    rc = main(
        [
            "--db_listened", "demo",
            "--config-dir", str(conf),
            "--envelopes", str(env_dir),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--adb-out", str(tmp_path / "adb"),
            "--sr-out", str(tmp_path / "sr"),
            "--sink_to_sr", "true",
            "--once",
        ]
    )
    assert rc == 0
    adb_rows = spark.read.parquet(str(tmp_path / "adb")).collect()
    assert sorted(r["id"] for r in adb_rows) == ["11", "13"]
    assert sorted(set(r["db_tb_name"] for r in adb_rows)) == [
        "demo_t_items", "demo_t_orders",
    ]
    # SR-style sink got the same records (dual fan-out)
    sr_files = glob.glob(str(tmp_path / "sr" / "**" / "*"), recursive=True)
    assert any(os.path.isfile(p) for p in sr_files)
