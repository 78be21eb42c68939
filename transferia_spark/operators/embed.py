"""Embedding generation: the model-inference stage of a training-data
pipeline, as a first-class operator.

The reference has no embedding stage (SURVEY §8 extension); what an
engine owes this stage is the DISTRIBUTED shape, not the model:
Arrow-batched inference micro-batches sized independently of Spark
partitions, a typed ``array<T>`` embedding column that feeds the ANN /
embedding-dedup operators, and deterministic retry behavior.
Providers follow the repo's gated-provider pattern:

- ``hash`` (default): a deterministic pseudo-encoder — each component
  derives from the text's portable polynomial hash through the exact
  integer-hash chain (``pt_hash`` → ``pt_ihash(seed=dim)``), scaled to
  [-1, 1]. Pure Catalyst (zero Python, zero shuffle), identical in the
  DuckDB oracle — so the full downstream embedding stack (ANN index,
  cosine dedup) is exercisable end-to-end with exact cross-engine
  checks.
- ``callable``: an injected ``encoder(list[str]) -> sequence of
  vectors`` runs inside ``mapInPandas`` with explicit ``batch_size``
  micro-batching (the inference-batch knob — model throughput depends
  on it, not on Spark's Arrow batch size). This is the production
  shape; tests inject a recording encoder.
- ``st``: sentence-transformers, feature-detected; absent in this
  container → ``NotImplementedError`` with the install remedy, per the
  gated-provider convention.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.functions import portable as pf
from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID

#: component quantization: h % (2*SCALE + 1) - SCALE, divided by SCALE —
#: integers in [-SCALE, SCALE] so the float division is the same IEEE
#: operation in both engines
EMBED_SCALE = 1000


def hash_embedding(text, dims: int):
    """Catalyst expression: deterministic ``dims``-component embedding
    of a text column. The dimension seed passes through a SECOND hash
    round so it enters multiplied by the hash constant — a single round
    only ADDS the seed, which would make the components of one vector
    consecutive integers (and every pair of vectors near-parallel
    ramps)."""
    h0 = pf.pt_hash(text)
    return F.array(
        *[
            (
                (
                    pf.pt_ihash(pf.pt_ihash(h0, seed=d + 1))
                    % F.lit(2 * EMBED_SCALE + 1)
                )
                - F.lit(EMBED_SCALE)
            )
            / F.lit(float(EMBED_SCALE))
            for d in range(dims)
        ]
    )


def sql_hash_embedding_component(text_expr: str, d: int) -> str:
    """The DuckDB mirror of one component (0-indexed dimension d)."""
    h = pf.sql_pt_ihash(pf.sql_pt_ihash(pf.sql_pt_hash(text_expr), seed=d + 1))
    return (
        f"((({h}) % {2 * EMBED_SCALE + 1}) - {EMBED_SCALE}) / {float(EMBED_SCALE)}"
    )


@register
class EmbedDocuments(Transformer):
    TYPE = "embed_documents"

    def __init__(
        self,
        text_col: str,
        id_col: str,
        dims: int = 16,
        provider: str = "hash",
        batch_size: int = 64,
        encoder: Callable | None = None,
        out_col: str = "embedding",
    ):
        if provider not in ("hash", "callable", "st"):
            raise ValueError(f"unknown embed provider {provider!r}")
        if provider == "callable" and encoder is None:
            raise ValueError("provider='callable' needs encoder=")
        self.text_col, self.id_col = text_col, id_col
        self.dims, self.provider = dims, provider
        self.batch_size, self.encoder = batch_size, encoder
        self.out_col = out_col

    def _encode_map(self, df: DataFrame, encoder) -> DataFrame:
        """mapInPandas with explicit inference micro-batches: rows
        accumulate to ``batch_size`` texts per encoder call regardless
        of Arrow batch boundaries (the model-throughput knob)."""
        id_col, text_col, out_col = self.id_col, self.text_col, self.out_col
        batch_size, dims = self.batch_size, self.dims

        def run(batches):
            import pandas as pd

            ids: list = []
            texts: list[str] = []

            def flush():
                if not ids:
                    return None
                vecs = encoder(list(texts))
                out = pd.DataFrame(
                    {
                        id_col: list(ids),
                        out_col: [list(map(float, v)) for v in vecs],
                    }
                )
                ids.clear()
                texts.clear()
                return out

            for pdf in batches:
                for i, t in zip(pdf[id_col], pdf[text_col]):
                    ids.append(i)
                    texts.append("" if t is None else str(t))
                    if len(ids) >= batch_size:
                        yield flush()
            tail = flush()
            if tail is not None:
                yield tail

        return df.select(self.id_col, self.text_col).mapInPandas(
            run, f"{id_col} long, {out_col} array<double>"
        )

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        if self.provider == "hash":
            out = df.select(
                self.id_col,
                hash_embedding(F.col(self.text_col), self.dims).alias(
                    self.out_col
                ),
            )
            return [(table, out)]
        if self.provider == "callable":
            return [(table, self._encode_map(df, self.encoder))]
        try:  # pragma: no cover - env-dependent
            from sentence_transformers import SentenceTransformer
        except ImportError as e:
            raise NotImplementedError(
                "embed provider='st' needs sentence-transformers "
                "(pip install sentence-transformers); provider='hash' "
                "runs without it, provider='callable' accepts any "
                "encoder callable"
            ) from e
        model_holder: dict = {}

        def st_encoder(texts):  # pragma: no cover - env-dependent
            if "m" not in model_holder:
                model_holder["m"] = SentenceTransformer("all-MiniLM-L6-v2")
            return model_holder["m"].encode(texts)

        return [(table, self._encode_map(df, st_encoder))]


__all__ = [
    "EMBED_SCALE",
    "EmbedDocuments",
    "hash_embedding",
    "sql_hash_embedding_component",
]
