"""transfer.yaml → TransferSpec (trcli config parity).

≈ ``cmd/trcli/config/model.go:39-54`` (``TransferYamlView``: id, type,
src/dst endpoints, transformation, data_objects, regular_snapshot,
type_system_version) and ``config.go:38-64`` (``ParseTransfer``:
endpoint construction via the provider registries + transformer
validation at parse time) in transferia/transferia.

YAML shape::

    id: my-transfer
    type: SNAPSHOT_ONLY
    src:
      type: file
      params: {path: /data/in, format: parquet, tables: [lineitem]}
    dst:
      type: file
      params: {path: /data/out, format: parquet}
    transformation:
      transformers:
        - filter_columns: {include: [l_orderkey, l_quantity]}
        - mask_field: {columns: [l_comment], salt: s}
    data_objects:
      include_objects: ["lineitem"]
    regular_snapshot: {enabled: true, interval: 3600}
    type_system_version: 10
"""

from __future__ import annotations

from typing import Any

from transferia_spark.operators import Transformation, build
from transferia_spark.plans.transfer import TransferSpec, TransferType
from transferia_spark.sinks.base import CleanupPolicy, build_sink
from transferia_spark.sources.base import build_source
from transferia_spark.sources.incremental import IncrementalState


def _endpoint(section: Any) -> tuple[str, dict]:
    if not isinstance(section, dict) or "type" not in section:
        raise ValueError("endpoint needs {type: ..., params: {...}}")
    return section["type"], dict(section.get("params") or {})


def _transformation(section: Any) -> Transformation:
    chain = Transformation()
    if not section:
        return chain
    transformers = section.get("transformers", section) if isinstance(section, dict) else section
    for item in transformers:
        # each list item is a single-key mapping {type: config}, same as
        # the reference's transformer.Transformers yaml form
        if isinstance(item, str):
            chain.add(build(item))
            continue
        if len(item) != 1:
            raise ValueError(f"transformer entry must be one {{type: config}}: {item}")
        (name, config), = item.items()
        chain.add(build(name, **(config or {})))  # construct now = parse-time validation
    return chain


def spec_from_dict(doc: dict) -> TransferSpec:
    src_type, src_params = _endpoint(doc.get("src"))
    dst_type, dst_params = _endpoint(doc.get("dst"))
    data_objects = doc.get("data_objects") or {}
    incremental = doc.get("incremental") or {}
    state_path = incremental.get("state_path")
    return TransferSpec(
        src=build_source(src_type, **src_params),
        dst=build_sink(dst_type, **dst_params),
        type=TransferType(doc.get("type", "SNAPSHOT_ONLY")),
        transformation=_transformation(doc.get("transformation")),
        include=data_objects.get("include_objects"),
        exclude=list(data_objects.get("exclude_objects") or []),
        cleanup=CleanupPolicy(doc.get("cleanup_policy", "drop")),
        filters=dict(doc.get("filters") or {}),
        cursor_cols=dict(incremental.get("cursor_cols") or {}),
        state=IncrementalState(state_path) if state_path else None,
        keys=dict(doc.get("keys") or {}),
        type_system_version=int(doc.get("type_system_version", 0)) or None,
        regular_snapshot=dict(doc.get("regular_snapshot") or {}),
        replication=dict(doc.get("replication") or {}),
    )


def transfer_from_yaml(text_or_path: str) -> TransferSpec:
    """Parse a transfer.yaml document (path or inline text)."""
    import os

    import yaml

    if os.path.exists(text_or_path):
        with open(text_or_path) as f:
            doc = yaml.safe_load(f)
    else:
        doc = yaml.safe_load(text_or_path)
    if not isinstance(doc, dict):
        raise ValueError("transfer.yaml must be a mapping")
    return spec_from_dict(doc)
