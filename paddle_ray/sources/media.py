"""Deterministic synthetic multimodal `media` table.

Multimodal payloads are opaque ``binary`` columns with typed metadata
(schema below) — the engine treats them exactly as the reference treats
page images (numpy arrays moved as opaque blobs, `model.py:300-368`): the
Ray-side plumbing (schema, batch sizes, actor signatures, output layout)
is real; only the codec is a stand-in, because no image/audio libraries
ship in this container (see stages/multimodal.py for the import-gated
real-codec path).

Fake container formats (self-describing, deterministic):

    b"FIMG" + uint32 header_len + json{width,height,channels} + pixel bytes
    b"FAUD" + uint32 header_len + json{sample_rate,n_samples}  + sample bytes
    b"FVID" + uint32 header_len + json{width,height,n_frames}  + frame bytes

Pixel/sample bytes are splitmix64-seeded so every decode is reproducible.

Schema:
    media_id: int64, kind: string (image|audio|video), payload: binary,
    width: int32, height: int32, n_frames: int32, sample_rate: int32
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)

_MAGICS = {"image": b"FIMG", "audio": b"FAUD", "video": b"FVID"}


def _bytes_for(seed: int, n: int) -> bytes:
    # deterministic pseudo-pixels; cheap (vectorized) and seed-stable
    rng = np.random.Generator(np.random.Philox(seed))
    return rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()


def pack_media(kind: str, header: dict, body: bytes) -> bytes:
    h = json.dumps(header, sort_keys=True).encode()
    return _MAGICS[kind] + struct.pack("<I", len(h)) + h + body


def unpack_media(payload: bytes) -> tuple[str, dict, bytes]:
    """Inverse of pack_media. Raises ValueError on unknown container."""
    magic = payload[:4]
    for kind, m in _MAGICS.items():
        if magic == m:
            if len(payload) < 8:
                raise ValueError(f"truncated media container ({len(payload)} bytes)")
            (hlen,) = struct.unpack("<I", payload[4:8])
            if 8 + hlen > len(payload):
                # a corrupted/truncated hlen would otherwise parse to an
                # empty body with decoded_ok=True downstream — corruption
                # must surface, not silently read as valid media
                raise ValueError(
                    f"corrupt media container: header length {hlen} exceeds "
                    f"payload ({len(payload)} bytes)"
                )
            header = json.loads(payload[8 : 8 + hlen])
            return kind, header, payload[8 + hlen :]
    raise ValueError(f"unknown media container magic {magic!r}")


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """n deterministic media rows cycling image/audio/video kinds."""
    ids, kinds, payloads, ws, hs, fs, srs = [], [], [], [], [], [], []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        base = seed * 1_000_003 + i
        if kind == "image":
            w, h = 64 + (i * 37) % 1600, 48 + (i * 53) % 1200
            body = _bytes_for(base, min(w * h, 4096))  # truncated pseudo-pixels
            payload = pack_media(kind, {"width": w, "height": h, "channels": 3}, body)
            nf, sr = 1, 0
        elif kind == "audio":
            sr = (8000, 16000, 44100)[(i // 3) % 3]
            ns = 1000 + (i * 101) % 50_000
            body = _bytes_for(base, min(ns, 4096))
            payload = pack_media(kind, {"sample_rate": sr, "n_samples": ns}, body)
            w = h = 0
            nf = 0
        else:
            w, h = 320, 240
            nf = 2 + (i * 7) % 30
            body = _bytes_for(base, min(nf * 64, 4096))
            payload = pack_media(kind, {"width": w, "height": h, "n_frames": nf}, body)
            sr = 0
        ids.append(i)
        kinds.append(kind)
        payloads.append(payload)
        ws.append(w)
        hs.append(h)
        fs.append(nf)
        srs.append(sr)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_frames": pa.array(fs, pa.int32()),
            "sample_rate": pa.array(srs, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
