"""Command-line pipeline driver — the `aser-pipe` equivalent
(/root/reference/setup.py:52-54, aser/pipe/cli.py).

    python -m aser_spark.cli build-kg --input <transcripts parquet> \
        --workdir /data/kg --n-parts 256
    python -m aser_spark.cli gen --n-convs 10000 --out /data/transcripts
    python -m aser_spark.cli stats --workdir /data/kg
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(prog="aser-spark")
    p.add_argument("--cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-kg", help="transcripts -> checkpointed KG tables")
    b.add_argument("--input", required=True, help="transcripts parquet path")
    b.add_argument("--workdir", required=True)
    b.add_argument("--n-parts", type=int, default=64)
    b.add_argument("--no-core", action="store_true")
    b.add_argument("--mode", choices=("seed", "discourse"), default="seed",
                   help="extraction path: v1 seed rules or v2 discourse (clause-split)")

    g = sub.add_parser("gen", help="generate a deterministic transcript corpus")
    g.add_argument("--n-convs", type=int, required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--out", required=True)

    s = sub.add_parser("stats", help="KG table statistics")
    s.add_argument("--workdir", required=True)

    e = sub.add_parser("export-sqlite",
                       help="workdir KG tables -> reference-schema KG.db")
    e.add_argument("--workdir", required=True)
    e.add_argument("--db", required=True)

    v = sub.add_parser("serve", help="request/reply daemon over a KG.db "
                       "(the reference aser-server loop; serving_net.py)")
    v.add_argument("--db", default=None, help="KG.db path (lookups)")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8000)
    v.add_argument("--mode", choices=("seed", "discourse"), default="seed")

    args = p.parse_args(argv)

    if args.cmd == "serve":
        # no Spark session: serving is kernel + SQLite only
        from .serving_net import ASERServingServer

        srv = ASERServingServer(db_path=args.db, mode=args.mode,
                                host=args.host, port=args.port)
        host, port = srv.address
        print(json.dumps({"serving": f"{host}:{port}", "db": args.db}),
              flush=True)
        try:
            srv._server.serve_forever()
        except KeyboardInterrupt:
            srv.stop()
        return

    from pyspark.sql import SparkSession

    from .config import get_spark

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(app=f"aser-cli-{args.cmd}", cpus=args.cpus)
    try:
        if args.cmd == "build-kg":
            from .pipeline.runner import build_kg

            transcripts = spark.read.parquet(args.input)
            out = build_kg(spark, transcripts, workdir=args.workdir,
                           core=not args.no_core, n_parts=args.n_parts,
                           mode=args.mode)
            print(json.dumps(out.get("metrics", {})))
        elif args.cmd == "gen":
            from .datagen import transcripts_df

            transcripts_df(spark, args.n_convs, seed=args.seed) \
                .write.mode("overwrite").parquet(args.out)
            print(json.dumps({"written": args.out, "n_convs": args.n_convs}))
        elif args.cmd == "stats":
            from .store import KGStore

            print(json.dumps(KGStore(spark, args.workdir).stats()))
        elif args.cmd == "export-sqlite":
            from .serving_sqlite import export_kg_to_sqlite
            from .store import KGStore

            store = KGStore(spark, args.workdir)
            stats = export_kg_to_sqlite(store.nodes, store.edges, args.db)
            print(json.dumps({"db": args.db, **stats}))
    finally:
        if not preexisting:  # don't tear down a caller-owned session
            spark.stop()


if __name__ == "__main__":
    main()
