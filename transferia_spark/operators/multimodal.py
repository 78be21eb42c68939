"""Multimodal (image/audio/video) column handling.

Media lives in DataFrames as an opaque ``binary`` payload column plus
a typed metadata struct — the layout every large multimodal corpus
uses (payload bytes, media kind, source). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` UDFs: the
payloads stream through Python in columnar batches, never row-at-a-
time, and the surrounding plan (partitioning, pruning, the schema of
the UDF output) is ordinary Catalyst.

The actual codecs (PIL / torchaudio / pyav) are NOT installed in this
environment, so the decode body is gated: ``mode="meta"`` runs a
deterministic byte-level metadata extraction (real plumbing, fake
decode); any other mode raises ``NotImplementedError`` at the point a
codec would be invoked. Swapping in a real decoder changes only
``_decode_batch`` — schema, batching and partitioning stay as tested.

Scale notes: payload columns dominate I/O — always project them out
(`select`) before wide shuffles, and size
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of
payloads fits executor memory (e.g. 256 rows × 4 MB images ≈ 1 GB).
``repartition`` by a size-balanced key before decode to avoid
stragglers from skewed payload sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID

ADLER_MOD = 65521

DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Test-fixture media table: utf-8 bytes of a text column as the
    binary payload + a kind tag. Real pipelines read payloads from
    parquet/object storage directly."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.when(F.col(id_col) % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
    )


def _decode_batch(pdf: pd.DataFrame, mode: str) -> pd.DataFrame:
    """Per-Arrow-batch decode. ``meta`` mode computes deterministic
    byte metadata; real codec modes are stubbed."""
    if mode != "meta":
        # real implementation: PIL.Image.open(io.BytesIO(b)) / torchaudio.load /
        # av.open — not available in this environment
        raise NotImplementedError(f"media decode mode {mode!r} needs a codec")
    payloads = pdf["payload"]
    n_bytes = payloads.map(len)
    # Adler-style checksum over code points (engine-agnostic; ASCII
    # payloads make this equal to the byte sum)
    checksum = pdf["_text"].map(lambda s: sum(ord(c) for c in s) % ADLER_MOD)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "kind": pdf["kind"],
            "n_bytes": n_bytes,
            "checksum": checksum,
            "width": 64 + (checksum % 512),
            "height": 64 + ((checksum // 7) % 512),
        }
    )


@register
class MediaDecode(Transformer):
    """Decode/inspect a binary media column via ``mapInPandas``.

    Emits one metadata row per payload. The Arrow batch size bounds
    peak Python memory; the operator never collects to the driver.
    """

    TYPE = "media_decode"

    def __init__(self, mode: str = "meta"):
        self.mode = mode

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        mode = self.mode
        # keep the decoded text beside the payload for the fake decode;
        # a real decoder uses only the bytes
        src = df.withColumn("_text", F.decode(F.col("payload"), "utf-8"))

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _decode_batch(pdf, mode)

        return [(table, src.mapInPandas(run, DECODED_META_SCHEMA))]


@register
class FrameSample(Transformer):
    """Deterministic frame/chunk sampling plan for video/audio payloads:
    emits (doc_id, frame_idx) rows for every ``stride``-th frame of a
    payload, where the frame count derives from payload size and a
    per-kind frame size. The decode of each sampled frame is the
    stubbed codec path above."""

    TYPE = "frame_sample"

    FRAME_BYTES = {"image": 1 << 62, "audio": 32, "video": 64}

    def __init__(self, stride: int = 4):
        self.stride = stride

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        frame_bytes = F.create_map(
            *[
                x
                for k, v in self.FRAME_BYTES.items()
                for x in (F.lit(k), F.lit(v))
            ]
        )
        n_frames = F.greatest(
            F.lit(1),
            F.floor(F.length("payload") / frame_bytes[F.col("kind")]).cast("long"),
        )
        out = df.select(
            "doc_id",
            "kind",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(self.stride))
            ).alias("frame_idx"),
        )
        return [(table, out)]


__all__ = ["MediaDecode", "FrameSample", "attach_payload", "DECODED_META_SCHEMA"]


@register
class AudioEnergy(Transformer):
    """Per-frame audio energy features from the raw payload bytes —
    the VAD/silence-trim primitive of audio-corpus curation.

    Payload bytes are interpreted as signed 8-bit PCM samples (the
    deterministic stand-in for a real decoder; swap ``_pcm_batch`` for
    torchaudio/soundfile when codecs exist — framing, schema, and the
    numpy kernel are decoder-agnostic). Per ``frame_len``-sample frame:
    exact integer energy (Σ s²), peak |s|, and zero crossings — all
    int64, so results are vectorization-independent and reproducible.
    Empty payloads emit no frames (SQL aggregates over an empty slice
    are NULL — skipping keeps oracle parity). Oracle parity holds for
    ASCII payloads, where byte == code point and |s| == s; non-ASCII
    bytes still compute fine but a text-derived SQL oracle would frame
    differently.

    Scale: one Arrow-batched mapInPandas over the payload column —
    no shuffle; the output drops the payload so downstream aggs are
    narrow-row.
    """

    TYPE = "audio_energy"

    def __init__(
        self, frame_len: int = 32, kind: str = "audio", decoder: str = "pcm8"
    ):
        self.frame_len, self.kind, self.decoder = frame_len, kind, decoder

    @staticmethod
    def decode_samples(payload: bytes, decoder: str):
        """Payload bytes → int64 sample vector.

        - ``pcm8``: raw signed 8-bit PCM (the deterministic oracle-
          checked spec — any byte string is valid input).
        - ``wav``: a REAL RIFF/WAV decode via the stdlib ``wave``
          module — 8/16/32-bit PCM, first channel of multi-channel
          files. No third-party codec needed, so this path runs (and is
          tested) in this environment.
        - anything else: the codec gate (torchaudio/soundfile/ffmpeg).
        """
        import numpy as np

        if decoder == "pcm8":
            return np.frombuffer(bytes(payload), dtype=np.int8).astype(np.int64)
        if decoder == "wav":
            import io
            import wave

            with wave.open(io.BytesIO(bytes(payload))) as w:
                nch, width = w.getnchannels(), w.getsampwidth()
                raw = w.readframes(w.getnframes())
            dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
            if dtype is None:
                raise NotImplementedError(
                    f"wav sample width {width} needs a real codec"
                )
            s = np.frombuffer(raw, dtype=dtype).astype(np.int64)
            if width == 1:
                s -= 128  # 8-bit WAV is unsigned; recentre to signed
            return s[::nch]  # first channel
        raise NotImplementedError(
            f"audio decoder {decoder!r} needs a codec (torchaudio/soundfile)"
        )

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        import numpy as np

        frame_len = self.frame_len
        kind = self.kind
        decoder = self.decoder
        schema = (
            "doc_id long, frame_idx long, energy long, peak long, "
            "zero_crossings long"
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = {
                    "doc_id": [], "frame_idx": [], "energy": [],
                    "peak": [], "zero_crossings": [],
                }
                for doc_id, payload, k in zip(
                    pdf["doc_id"], pdf["payload"], pdf["kind"]
                ):
                    if k != kind or payload is None:
                        continue
                    s = AudioEnergy.decode_samples(payload, decoder)
                    if len(s) == 0:
                        # no samples → no frames (a zero row would
                        # diverge from SQL aggregates over an empty
                        # slice, which are NULL)
                        continue
                    n_frames = max(1, len(s) // frame_len)
                    for i in range(n_frames):
                        f = s[i * frame_len : (i + 1) * frame_len]
                        rows["doc_id"].append(doc_id)
                        rows["frame_idx"].append(i)
                        rows["energy"].append(int((f * f).sum()))
                        rows["peak"].append(int(np.abs(f).max(initial=0)))
                        rows["zero_crossings"].append(
                            int((np.signbit(f[:-1]) != np.signbit(f[1:])).sum())
                        )
                yield pd.DataFrame(rows)

        out = df.select("doc_id", "payload", "kind").mapInPandas(run, schema)
        return [(table, out)]


@register
class ImageResize(Transformer):
    """Resize plan for image payloads: compute aspect-preserving target
    dimensions against a ``max_side`` bound and emit the resized
    payload. The geometry math (fit WITHIN max_side×max_side, never
    upscale, round-half-down via integer arithmetic) is the real
    operator contract; the pixel resample is the codec-gated part —
    ``mode="stub"`` emits a deterministic byte subsample standing in
    for the interpolation, any other mode raises where PIL/cv2 would
    be called. Swapping in a real backend touches only
    ``_resample``; schema, batching, and the dimension math are final.

    Scale: one mapInPandas pass; payloads stream through Arrow batches
    (size with ``spark.sql.execution.arrow.maxRecordsPerBatch``).
    Output payload is ≤ input, so the stage shrinks the table.
    """

    TYPE = "image_resize"

    def __init__(self, max_side: int = 256, mode: str = "stub", kind: str = "image"):
        self.max_side, self.mode, self.kind = max_side, mode, kind

    @staticmethod
    def target_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
        """Aspect-preserving fit into max_side² without upscaling."""
        if max(w, h) <= max_side:
            return w, h
        if w >= h:
            return max_side, max(1, h * max_side // w)
        return max(1, w * max_side // h), max_side

    def _resample(self, payload: bytes, out_w: int, out_h: int, in_w: int, in_h: int) -> bytes:
        if self.mode == "stub":
            # deterministic stand-in: stride-subsample the payload bytes
            # to the output pixel count (bounded, reproducible, the
            # oracle-checked spec)
            n_out = max(1, min(len(payload), out_w * out_h))
            step = max(1, len(payload) // n_out)
            return payload[::step][:n_out]
        if self.mode == "nearest":
            # REAL nearest-neighbor resample over a grayscale raster —
            # pure numpy, runs in this environment. The payload is the
            # in_w×in_h uint8 raster (row-major), padded/truncated; the
            # standard index map rows=floor(y·in_h/out_h) picks source
            # pixels exactly as PIL's Image.NEAREST does.
            import numpy as np

            buf = np.zeros(in_w * in_h, dtype=np.uint8)
            src = np.frombuffer(payload[: in_w * in_h], dtype=np.uint8)
            buf[: len(src)] = src
            raster = buf.reshape(in_h, in_w)
            ys = (np.arange(out_h) * in_h) // out_h
            xs = (np.arange(out_w) * in_w) // out_w
            return raster[np.ix_(ys, xs)].tobytes()
        if self.mode == "pil":
            # feature-detected Pillow path: full-codec decode (JPEG/PNG/
            # …) + LANCZOS resample, re-encoded as PNG
            try:
                import io

                from PIL import Image
            except ImportError as e:
                raise NotImplementedError(
                    "image_resize mode 'pil' needs Pillow (pip install "
                    "Pillow); 'nearest' is the codec-free real resample"
                ) from e
            img = Image.open(io.BytesIO(payload))
            img = img.resize((out_w, out_h), Image.LANCZOS)
            out = io.BytesIO()
            img.save(out, format="PNG")
            return out.getvalue()
        raise NotImplementedError(
            f"image_resize mode {self.mode!r} needs a codec"
        )

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        import numpy as np  # noqa: F401 (parity with sibling kernels)

        max_side, kind = self.max_side, self.kind
        schema = (
            "doc_id long, in_w long, in_h long, out_w long, out_h long, "
            "payload binary"
        )
        # dims from the (stub) decode metadata — a real pipeline carries
        # them in the typed metadata struct alongside the payload
        meta = MediaDecode(mode="meta")
        src = df.join(
            meta.apply(table, df)[0][1].select("doc_id", "width", "height"),
            "doc_id",
        ).filter(F.col("kind") == kind)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = {k: [] for k in (
                    "doc_id", "in_w", "in_h", "out_w", "out_h", "payload")}
                for doc_id, payload, w, h in zip(
                    pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"]
                ):
                    ow, oh = ImageResize.target_dims(int(w), int(h), max_side)
                    rows["doc_id"].append(doc_id)
                    rows["in_w"].append(int(w))
                    rows["in_h"].append(int(h))
                    rows["out_w"].append(ow)
                    rows["out_h"].append(oh)
                    rows["payload"].append(
                        self._resample(bytes(payload), ow, oh, int(w), int(h))
                    )
                yield pd.DataFrame(rows)

        out = src.select("doc_id", "payload", "width", "height").mapInPandas(
            run, schema
        )
        return [(table, out)]
