"""dbt post-load ELT transformer: binary runner + Spark-native models.

≈ ``registry/dbt/transformer.go:30`` + ``runner.go`` in
transferia/transferia: after a snapshot lands in the destination, run a
dbt project against that destination (the reference shells out to a
dockerized dbt). The operator therefore does nothing per-batch — it is
a *post-load hook* on the transfer, and we model it the same way.

Two execution paths:

- ``run()`` — the real dbt binary (gated: not installed here).
- ``run_spark(spark, sources)`` — a Spark-native model runner: parse
  the dbt project's ``models/*.sql``, resolve ``{{ ref('m') }}`` /
  ``{{ source('s', 't') }}`` / strip ``{{ config(...) }}``, topo-sort
  the ref DAG, and execute each model as ``spark.sql`` over temp views
  (= dbt's view materialization). The project layout and jinja calls
  are dbt's public contract, so a project that runs under real dbt runs
  here against the freshly-loaded tables — which is exactly what the
  reference's post-load hook wants, minus the subprocess.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess

from pyspark.sql import DataFrame, SparkSession

from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID

_REF_RE = re.compile(r"\{\{\s*ref\(\s*['\"](\w+)['\"]\s*\)\s*\}\}")
_SOURCE_RE = re.compile(
    r"\{\{\s*source\(\s*['\"](\w+)['\"]\s*,\s*['\"](\w+)['\"]\s*\)\s*\}\}"
)
# non-greedy to the closing '}}' so config(...) args containing '}'
# (e.g. dict literals) are still stripped whole (ADVICE r4)
_CONFIG_RE = re.compile(r"\{\{\s*config\(.*?\)\s*\}\}", re.DOTALL)


def parse_models(project_dir: str, model_paths: list[str] | None = None):
    """Discover model SQL files and their ref/source edges. Model name
    is the file stem (dbt's rule); returns {name: (sql, refs, sources)}."""
    try:
        import yaml

        with open(os.path.join(project_dir, "dbt_project.yml")) as f:
            proj = yaml.safe_load(f) or {}
        model_paths = model_paths or proj.get(
            "model-paths", proj.get("source-paths", ["models"])
        )
    except (FileNotFoundError, ImportError):
        # no dbt_project.yml OR no PyYAML in the env — either way fall
        # back to dbt's default model path (ADVICE r4)
        model_paths = model_paths or ["models"]
    models: dict[str, tuple[str, list[str], list[tuple[str, str]]]] = {}
    for mp in model_paths:
        root = os.path.join(project_dir, mp)
        for dirpath, _dirs, files in os.walk(root):
            for fname in sorted(files):
                if not fname.endswith(".sql"):
                    continue
                name = fname[: -len(".sql")]
                with open(os.path.join(dirpath, fname)) as f:
                    sql = f.read()
                refs = _REF_RE.findall(sql)
                sources = [tuple(m) for m in _SOURCE_RE.findall(sql)]
                models[name] = (sql, refs, sources)
    return models


def topo_order(models) -> list[str]:
    """Dependency order over ref edges; unknown refs and cycles are
    loud errors (dbt fails the same way at parse time)."""
    order: list[str] = []
    state: dict[str, int] = {}  # 0 visiting, 1 done

    def visit(name: str, chain: tuple):
        if name not in models:
            raise ValueError(f"model {chain[-1]!r} refs unknown model {name!r}")
        if state.get(name) == 1:
            return
        if state.get(name) == 0:
            raise ValueError(f"ref cycle through {name!r}")
        state[name] = 0
        for dep in models[name][1]:
            visit(dep, chain + (name,))
        state[name] = 1
        order.append(name)

    for name in sorted(models):
        visit(name, ())
    return order


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
                "dbt binary not available; install dbt, or use "
                "run_spark(spark, sources) — the Spark-native model runner"
            )
        cmd = [exe, self.operation, "--project-dir", self.project_dir]
        if self.profiles_dir:
            cmd += ["--profiles-dir", self.profiles_dir]
        subprocess.run(cmd, check=True)

    def run_spark(
        self,
        spark: SparkSession,
        sources: dict[str | tuple[str, str], DataFrame] | None = None,
    ) -> dict[str, DataFrame]:
        """Execute the project's models on Spark in dependency order.

        ``sources`` maps dbt source names — ``(schema, table)`` tuples
        or plain table names — to the freshly-loaded DataFrames (the
        post-load contract: dbt transforms what the transfer just
        delivered). Each model materializes as a temp view (dbt's view
        materialization) and the dict of result DataFrames is returned
        in execution order.
        """
        models = parse_models(self.project_dir)
        order = topo_order(models)
        for key, df in (sources or {}).items():
            view = "_".join(key) if isinstance(key, tuple) else key
            df.createOrReplaceTempView(view)
        out: dict[str, DataFrame] = {}
        for name in order:
            sql, _refs, _srcs = models[name]
            sql = _CONFIG_RE.sub("", sql)
            sql = _REF_RE.sub(lambda m: m.group(1), sql)
            sql = _SOURCE_RE.sub(lambda m: f"{m.group(1)}_{m.group(2)}", sql)
            df = spark.sql(sql)
            df.createOrReplaceTempView(name)
            out[name] = df
        return out
