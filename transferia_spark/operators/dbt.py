"""dbt post-load ELT transformer (stub-gated).

≈ ``registry/dbt/transformer.go:30`` + ``runner.go`` in
transferia/transferia: after a snapshot lands in the destination, run a
dbt project against that destination (the reference shells out to a
dockerized dbt). The operator therefore does nothing per-batch — it is
a *post-load hook* on the transfer, and we model it the same way.

The dbt binary is not installed in this environment: ``run()`` raises
``NotImplementedError`` unless a ``dbt`` executable is found on PATH;
the hook wiring (pass-through apply + post-load invocation order) is
real and tested.
"""

from __future__ import annotations

import shutil
import subprocess

from pyspark.sql import DataFrame

from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID


@register
class DbtTransformer(Transformer):
    TYPE = "dbt"

    def __init__(
        self,
        project_dir: str,
        profiles_dir: str | None = None,
        operation: str = "build",
    ):
        self.project_dir = project_dir
        self.profiles_dir = profiles_dir
        self.operation = operation

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        # per-batch no-op: dbt is a post-load hook, not a row transform
        return [(table, df)]

    def post_load(self) -> None:
        """Invoke after the destination write completes (the reference
        wires this as a pluggable sink middleware)."""
        self.run()

    def run(self) -> None:
        exe = shutil.which("dbt")
        if exe is None:
            raise NotImplementedError(
                "dbt binary not available; install dbt or run in an image with it"
            )
        cmd = [exe, self.operation, "--project-dir", self.project_dir]
        if self.profiles_dir:
            cmd += ["--profiles-dir", self.profiles_dir]
        subprocess.run(cmd, check=True)
