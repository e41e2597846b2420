"""Multimodal (binary-column) stages.

Images/audio/video are opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The image/audio codec libraries are NOT in
this container, so the codec kernel is STUBBED — clearly marked — but
the Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is real and tested:

- ``DecodeStub(real_codecs=True)`` raises NotImplementedError at the
  exact point a codec would run;
- ``DecodeStub(real_codecs=False)`` (default) produces a deterministic
  fake decode (dims/duration derived from a content hash) so the
  pipeline shape is exercisable end-to-end.

Batch-size guidance baked into the helpers: binary payloads are wide —
callers should pass small ``batch_size`` (64-256) and rely on
``target_max_block_size`` so a batch x pool concurrency fits the heap.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa


class DecodeStub:
    """binary payload -> (width, height, n_channels, ok). STUB."""

    def __init__(self, payload_col: str = "payload", real_codecs: bool = False):
        self.payload_col = payload_col
        self.real_codecs = real_codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_codecs:
            raise NotImplementedError(
                "image/audio codecs are not available in this environment; "
                "plug a real decoder here (e.g. PIL.Image.open on the payload bytes)"
            )
        widths, heights, channels, oks = [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            if not payload:
                widths.append(0), heights.append(0), channels.append(0), oks.append(False)
                continue
            # md5-derived fake dims: the first 8 digest bytes as a
            # little-endian u64 equal DuckDB's md5_number_upper, so the
            # stub's output is SQL-reproducible (oracle-checked)
            d = hashlib.md5(payload).digest()
            w, h = struct.unpack("<HH", d[:4])
            widths.append(64 + w % 1024)
            heights.append(64 + h % 1024)
            channels.append(3)
            oks.append(True)
        return (
            batch.drop_columns([self.payload_col])
            .append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("n_channels", pa.array(channels, pa.int32()))
            .append_column("decode_ok", pa.array(oks, pa.bool_()))
        )


class FeatureExtractStub:
    """binary payload -> fixed-dim feature vector (list<float>). STUB:
    deterministic hash-derived embedding; swap __init__ for a model
    load + __call__ body for batched inference in a real deployment."""

    def __init__(self, payload_col: str = "payload", dim: int = 16):
        self.payload_col = payload_col
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        # component i = md5-derived exact fixed-point in [-1, 1]:
        # (md5_number_lower(payload|i) % 2000001 - 10^6) / 10^6. Both
        # the modulus and the division of exact ints are bit-identical
        # in DuckDB (md5_number_lower == int.from_bytes(md5[8:],'le')),
        # so even the stubbed embedding is SQL-value-checkable.
        feats = []
        for payload in batch[self.payload_col].to_pylist():
            vec = [
                (
                    int.from_bytes(
                        hashlib.md5((payload or b"") + b"|" + str(i).encode()).digest()[8:],
                        "little",
                    )
                    % 2000001
                    - 1_000_000
                )
                / 1_000_000.0
                for i in range(self.dim)
            ]
            feats.append(vec)
        return batch.drop_columns([self.payload_col]).append_column(
            "features", pa.array(feats, pa.list_(pa.float64()))
        )


def feature_stub_sql(dim: int = 16) -> str:
    """DuckDB oracle for FeatureExtractStub over documents.text, one
    scalar column per component (list cells don't hash-compare across
    pandas/duckdb string forms)."""
    cols = ",\n       ".join(
        f"(CAST(md5_number_lower(text || '|{i}') % 2000001 AS BIGINT) - 1000000)"
        f" / 1000000.0 AS f{i:02d}"
        for i in range(dim)
    )
    return f"SELECT doc_id,\n       {cols}\nFROM documents\nORDER BY doc_id\n"


class ResizeStub:
    """binary payload -> resized binary payload + output dims. STUB:
    emits a deterministic content-hash-derived payload of a size
    proportional to target area; a real implementation decodes,
    resamples (e.g. PIL ``Image.resize``), and re-encodes. Output
    schema (payload stays binary, dims typed) is the real contract the
    downstream stages consume."""

    def __init__(self, payload_col: str = "payload", target_w: int = 256, target_h: int = 256,
                 real_codecs: bool = False):
        self.payload_col = payload_col
        self.target_w = target_w
        self.target_h = target_h
        self.real_codecs = real_codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_codecs:
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "plug decode->resize->encode here"
            )
        out_payloads, ws, hs = [], [], []
        for payload in batch[self.payload_col].to_pylist():
            payload = payload or b""
            seed = hashlib.blake2b(
                payload + struct.pack("<II", self.target_w, self.target_h), digest_size=32
            ).digest()
            # deterministic fake "re-encoded" bytes, ~1 byte per 64 px
            n = max(16, (self.target_w * self.target_h) // 64)
            reps = (n + len(seed) - 1) // len(seed)
            out_payloads.append((seed * reps)[:n])
            ws.append(self.target_w)
            hs.append(self.target_h)
        return (
            batch.drop_columns([self.payload_col])
            .append_column("payload", pa.array(out_payloads, pa.binary()))
            .append_column("width", pa.array(ws, pa.int32()))
            .append_column("height", pa.array(hs, pa.int32()))
        )


class FrameSampleStub:
    """video payload -> k deterministic "frame" payloads (list<binary>).
    STUB: slices the payload; a real implementation seeks key frames."""

    def __init__(self, payload_col: str = "payload", k: int = 4):
        self.payload_col = payload_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames_col = []
        for payload in batch[self.payload_col].to_pylist():
            payload = payload or b""
            step = max(1, len(payload) // self.k)
            frames_col.append([payload[i * step : i * step + 16] for i in range(self.k)])
        return batch.append_column("frames", pa.array(frames_col, pa.list_(pa.binary())))
