"""spark-submit daemon: config-driven periodic indexing + HTTP API —
the ``flow-indexer daemon`` analogue (/root/reference/cmd/daemon.go,
flowindexer/flowindexer.go:439-465 RunDaemon: per-indexer periodic
IndexRecent loops + startWeb).

    python jobs/daemon_job.py --config pipeline_config.json
    python jobs/daemon_job.py --config pipeline_config.json --once

Config file: see ``example_pipeline_config.json`` /
``flow_indexer_spark.config.load_config``. Each tick runs every
indexer's incremental ingest (manifest anti-join -> O(new partitions),
the IndexRecent analogue) in parallel FAIR pools, then re-opens the
HTTP layer's table handles (the RefreshStores analogue — parquet file
listings are plan-time snapshots). ``--once`` runs a single tick and
exits, printing one JSON metrics line per tick either way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="flow_indexer_spark daemon")
    ap.add_argument("--config", required=True, help="pipeline config JSON")
    ap.add_argument("--interval", type=float, default=60.0,
                    help="seconds between ingest ticks (reference: 60)")
    ap.add_argument("--once", action="store_true",
                    help="one tick, no web server, then exit")
    ap.add_argument("--no-web", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from flow_indexer_spark.config import index_all, load_config, open_indexers
    from flow_indexer_spark.generator import make_dims
    from flow_indexer_spark.server import make_server
    from flow_indexer_spark.session import get_spark

    cfg = load_config(args.config)
    spark = get_spark(
        app_name="flow-indexer-daemon",
        master=f"local[{args.cpus}]" if args.cpus else None,
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tool_registry, role_taxonomy = make_dims(spark)

    def tick() -> dict:
        metrics = index_all(spark, cfg, tool_registry, role_taxonomy)
        print(json.dumps({"tick": metrics}, default=str), flush=True)
        return metrics

    tick()
    if args.once:
        spark.stop()
        return

    server = None
    if not args.no_web and cfg.http_bind:
        host, _, port = cfg.http_bind.rpartition(":")
        server = make_server(
            spark, open_indexers(spark, cfg), host=host or "127.0.0.1",
            port=int(port),
        )
        threading.Thread(target=server.serve_forever, daemon=True).start()
        bound = server.server_address
        print(json.dumps({"listening": f"{bound[0]}:{bound[1]}"}), flush=True)

    try:
        while True:
            time.sleep(args.interval)
            tick()
            if server is not None:
                # RefreshStores: swap in handles that see the new files
                # (atomic class-attribute assignment; in-flight requests
                # keep the handles they already grabbed). previous= keeps
                # a stale-but-serving handle for any indexer whose output
                # became unreadable this tick (per-indexer isolation).
                server.RequestHandlerClass.indexers = open_indexers(
                    spark, cfg, previous=server.RequestHandlerClass.indexers
                )
    except KeyboardInterrupt:
        pass
    finally:
        if server is not None:
            server.shutdown()
            server.server_close()
        spark.stop()


if __name__ == "__main__":
    main()
