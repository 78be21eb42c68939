#!/usr/bin/env python
"""trcli-equivalent CLI: activate / upload / check a transfer.yaml.

≈ ``cmd/trcli/{activate,upload}`` in transferia/transferia (the
``replicate`` verb is the ReplicationPipeline API — continuous queries
don't fit a one-shot CLI process; see
transferia_spark.streaming.pipeline).

Usage:
  python scripts/trcli.py activate --transfer transfer.yaml
  python scripts/trcli.py upload   --transfer transfer.yaml --tables t1,t2
  python scripts/trcli.py check    --transfer transfer.yaml   # parse+validate only
  python scripts/trcli.py checksum --transfer transfer.yaml   # verify delivery
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser(prog="trcli")
    ap.add_argument("verb", choices=["activate", "upload", "check", "checksum"])
    ap.add_argument("--transfer", required=True, help="path to transfer.yaml")
    ap.add_argument("--tables", default="", help="comma list (upload/checksum)")
    args = ap.parse_args()

    from transferia_spark.plans.config import transfer_from_yaml

    spec = transfer_from_yaml(args.transfer)
    if args.verb == "check":
        print(f"OK: type={spec.type.value} "
              f"transformers={len(spec.transformation.transformers)}")
        return 0

    from transferia_spark.plans.transfer import activate, upload
    from transferia_spark.session import get_spark

    spark = get_spark()
    tables = [t for t in args.tables.split(",") if t]
    if args.verb == "checksum":
        # ≈ trcli's verification path (tasks.VerifyDelivery / Checksum)
        from transferia_spark.tasks.checksum import verify_transfer

        results = verify_transfer(spark, spec, tables or None)
        bad = 0
        for name, errs in sorted(results.items()):
            status = "OK" if not errs else "; ".join(errs)
            bad += bool(errs)
            print(f"{name}: {status}")
        return 1 if bad else 0
    if args.verb == "activate":
        written = activate(spark, spec)
    else:
        if not tables:
            ap.error("upload needs --tables")
        written = upload(spark, spec, tables)
    for name in written:
        print(f"written: {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
