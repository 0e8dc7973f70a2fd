"""Serve an existing triple store over HTTP SPARQL.

The Spark-native twin of the reference's Fuseki launcher
(reference: runHBaseSparqlEngine.sh + fuseki-config-hbase.ttl):

    spark-submit scripts/serve_sparql.py --store /path/to/store \
        --port 3030 [--cpus 8] [--cache]

Then:  curl 'http://localhost:3030/sparql?query=SELECT...'
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="triple store root dir")
    ap.add_argument("--port", type=int, default=3030)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--max-rows", type=int, default=10_000)
    ap.add_argument(
        "--cache", action="store_true",
        help="pin indexes + dictionary in executor memory before serving",
    )
    args = ap.parse_args()

    from hbase_rdf_spark.engine import KgEngine
    from hbase_rdf_spark.service import SparqlService
    from hbase_rdf_spark.session import get_spark

    spark = get_spark(
        app_name="hbase-rdf-spark-sparql-endpoint",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
    )
    spark.sparkContext.setLogLevel("WARN")
    eng = KgEngine(spark, args.store)
    if args.cache:
        eng.cache()
    svc = SparqlService(eng, host=args.host, port=args.port,
                        max_rows=args.max_rows)
    port = svc.start()
    print(f"SPARQL endpoint listening on http://{args.host}:{port}/sparql")
    try:
        svc._thread.join()
    except KeyboardInterrupt:
        svc.stop()


if __name__ == "__main__":
    main()
