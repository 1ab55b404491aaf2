"""CLI entry point — the Spark analog of the reference's job launcher
(StartJob.main, StartJob.java:36-108):

    python -m jly_flink_spark \\
        --db_listened demo \\
        --config-dir ./conf \\
        --envelopes /data/envelopes \\
        --checkpoint /ckpt/demo \\
        --adb-out /sink/adb --sr-out /sink/sr \\
        --sink_to_sr true --once

Mirrored semantics:
- ``--db_listened <name>`` selects ``application-<name>.yaml`` in the
  config dir (StartJob.java:42-46) and validates it (TaskConfigChecker).
- the ADB-style sink is always attached; the SR-style sink only with
  ``--sink_to_sr true`` (StartJob.java:94-104, C3).
- ``--trigger-seconds`` is the flush interval (T9); ``--once`` drains
  the source and exits (the harness/replay mode).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="jly_flink_spark")
    p.add_argument("--db_listened", required=True)
    p.add_argument("--config-dir", default="conf")
    p.add_argument("--envelopes", required=True, help="envelope source dir")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--adb-out", required=True)
    p.add_argument("--sr-out", default=None)
    p.add_argument("--sink_to_sr", default="false")
    p.add_argument("--trigger-seconds", type=float, default=5.0)
    p.add_argument("--sr-batch-size", type=int, default=100)
    p.add_argument("--once", action="store_true")
    args = p.parse_args(argv)

    from .config import check_task_config, load_task_config
    from .session import get_spark
    from .streaming.job import run_archival_once, start_archival_stream
    from .streaming.sinks import (
        AdbStyleSink,
        DualSink,
        LocalDirTransport,
        SrStyleSink,
    )

    cfg_path = os.path.join(
        args.config_dir, f"application-{args.db_listened}.yaml"
    )
    cfg = load_task_config(cfg_path)
    check_task_config(cfg)

    sink_to_sr = str(args.sink_to_sr).lower() == "true"
    if sink_to_sr and not args.sr_out:
        p.error("--sr-out is required with --sink_to_sr true")

    adb = AdbStyleSink(args.adb_out)
    sr = (
        SrStyleSink(
            LocalDirTransport(args.sr_out), batch_size=args.sr_batch_size
        )
        if sink_to_sr
        else None
    )
    # query_id namespaces the idempotency labels / JDBC cleanup keys:
    # per-task (db alias), so two tasks sharing sink targets can never
    # collide on epoch numbers.
    sink = DualSink(adb, sr, query_id=f"task_{args.db_listened}")

    spark = get_spark(f"save-del-his-{args.db_listened}")
    if args.once:
        run_archival_once(
            spark, args.envelopes, cfg, sink, args.checkpoint
        )
        return 0
    q = start_archival_stream(
        spark,
        args.envelopes,
        cfg,
        sink,
        args.checkpoint,
        trigger_seconds=args.trigger_seconds,
    )
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
