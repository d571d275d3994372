"""Multimodal actor-pool stages: decode, resize, frame-sample.

Mirrors the reference's image dataflow as Ray Data stages:

- ``MediaDecoder``   ≙ page/image decode (`model.py:300-368` PyMuPDF/PIL
  render loop): binary payload -> typed feature columns.
- ``ImageResizer``   ≙ render-scale + size-cap math (M1/M3,
  `model.py:320-325` ``scale = min(1.5, 2200/max_dim)`` and
  `model.py:355-363` 6000px bilinear cap).
- ``FrameSampler``   ≙ page iteration (S3/S4): one video row in ->
  N sampled-frame rows out (flat-map shape).

All three are callable CLASSES for ``map_batches(Cls, concurrency=...)``
actor pools: one-time codec init in ``__init__`` (≙ per-Triton-instance
model load `blip-caption/1/model.py:99-145`), batched work in ``__call__``.

**Codec stubbing**: real decoders (PIL / soundfile / av) are NOT in this
container. Construction tries to import them; absent, the stage decodes
only the deterministic fake containers from sources/media.py and raises
``NotImplementedError`` for real JPEG/PNG/WAV payloads — the Ray plumbing
(schemas, batching, actor pools, flat-map explosion) is identical either
way, so swapping in real codecs is a pure __init__/decode change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.media import _MAGICS, pack_media, unpack_media

# fake-container magics are owned by sources/media.py (_MAGICS) — no
# inline copies that could drift from the container format
_FAKE_MAGICS = tuple(_MAGICS.values())
_REAL_IMAGE_MAGICS = (b"\x89PNG", b"\xff\xd8\xff", b"GIF8", b"RIFF", b"II*\x00", b"MM\x00*")


def _try_import_codecs():
    """Import real codec libs if present (they are not, in this sandbox):
    PIL for images, soundfile for audio, av for video."""
    codecs = {}
    try:  # pragma: no cover - not installed here
        import PIL.Image  # noqa: F401

        codecs["image"] = PIL.Image
    except ImportError:
        pass
    try:  # pragma: no cover - not installed here
        import soundfile  # noqa: F401

        codecs["audio"] = soundfile
    except ImportError:
        pass
    try:  # pragma: no cover - not installed here
        import av  # noqa: F401

        codecs["video"] = av
    except ImportError:
        pass
    return codecs


class MediaDecoder:
    """payload binary -> feature columns (decoded_ok, width, height,
    n_frames, duration_s, mean_byte). Never drops a row: undecodable
    payloads get decoded_ok=False + error (≙ 422 path `model.py:569-589`)."""

    def __init__(self):
        self.codecs = _try_import_codecs()  # once per actor

    def _decode_one(self, payload: bytes, row_kind: str) -> dict:
        if payload[:4] in _FAKE_MAGICS:
            kind, header, body = unpack_media(payload)
            arr = np.frombuffer(body, dtype=np.uint8)
            mean_byte = float(arr.mean()) if arr.size else 0.0
            if kind == "image":
                return {
                    "width": header["width"],
                    "height": header["height"],
                    "n_frames": 1,
                    "duration_s": 0.0,
                    "mean_byte": round(mean_byte, 4),
                }
            if kind == "audio":
                return {
                    "width": 0,
                    "height": 0,
                    "n_frames": 0,
                    "duration_s": round(header["n_samples"] / header["sample_rate"], 6),
                    "mean_byte": round(mean_byte, 4),
                }
            return {
                "width": header["width"],
                "height": header["height"],
                "n_frames": header["n_frames"],
                "duration_s": round(header["n_frames"] / 25.0, 6),
                "mean_byte": round(mean_byte, 4),
            }
        # real codecs route by the row's declared kind — RIFF alone is
        # ambiguous (WebP images AND WAV/AVI audio/video share it), so a
        # magic-only image path gave audio payloads misleading image errors
        if row_kind != "image":
            raise NotImplementedError(
                f"real {row_kind} codec (soundfile/av) not available in this environment"
            )
        if any(payload.startswith(m) for m in _REAL_IMAGE_MAGICS):
            if "image" not in self.codecs:
                raise NotImplementedError(
                    "real image codec (PIL) not available in this environment"
                )
            img = self.codecs["image"].open(__import__("io").BytesIO(payload))  # pragma: no cover
            return {
                "width": img.width,
                "height": img.height,
                "n_frames": getattr(img, "n_frames", 1),
                "duration_s": 0.0,
                "mean_byte": 0.0,
            }
        raise ValueError("unknown payload container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, frames, durs, means, oks, errs = [], [], [], [], [], [], []
        for payload, row_kind in zip(batch["payload"].to_pylist(), batch["kind"].to_pylist()):
            try:
                r = self._decode_one(payload or b"", row_kind)
                widths.append(r["width"])
                heights.append(r["height"])
                frames.append(r["n_frames"])
                durs.append(r["duration_s"])
                means.append(r["mean_byte"])
                oks.append(True)
                errs.append(None)
            except Exception as e:
                widths.append(0)
                heights.append(0)
                frames.append(0)
                durs.append(0.0)
                means.append(0.0)
                oks.append(False)
                errs.append(f"{type(e).__name__}: {e}")
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": batch["payload"],
                "decoded_ok": pa.array(oks, pa.bool_()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_frames": pa.array(frames, pa.int32()),
                "duration_s": pa.array(durs, pa.float64()),
                "mean_byte": pa.array(means, pa.float64()),
                "error": pa.array(errs, pa.string()),
            }
        )


def render_scale(w: int, h: int, zoom: float = 1.5, cap: int = 2200) -> float:
    """EXACT reference render-scale semantics (`model.py:320-325`):
    scale = zoom, reduced so max(w,h)*scale <= cap (never upscaled above
    zoom)."""
    m = max(w, h)
    if m <= 0:
        return zoom
    return min(zoom, cap / m)


class ImageResizer:
    """Adds target_width/target_height via reference scale math; payload
    "resize" re-packs the fake container with the new dims (deterministic).
    Non-image rows pass through unchanged."""

    def __init__(self, zoom: float = 1.5, cap: int = 2200, hard_cap: int = 6000):
        self.zoom = zoom
        self.cap = cap
        self.hard_cap = hard_cap  # ≙ model.py:355-363 downscale-over-6000px

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        payloads = batch["payload"].to_pylist()
        tws, ths, out_payloads = [], [], []
        oks = (
            batch["decoded_ok"].to_pylist()
            if "decoded_ok" in batch.column_names
            else [True] * len(kinds)
        )
        for kind, ok_, w, h, payload in zip(kinds, oks, ws, hs, payloads):
            if kind != "image" or not ok_:
                # pass through rows the decoder could not handle — resizing
                # an undecoded payload raised and killed the whole batch
                tws.append(w)
                ths.append(h)
                out_payloads.append(payload)
                continue
            # hard_cap COMPOSES with the render cap (monotonic in input
            # size); the old either/or branch let >hard_cap inputs skip
            # the render cap entirely and produce LARGER outputs than
            # slightly-smaller inputs
            m = max(w, h)
            s = render_scale(w, h, self.zoom, self.cap)
            if m > 0:
                s = min(s, self.hard_cap / m)
            tw, th = int(round(w * s)), int(round(h * s))
            tws.append(tw)
            ths.append(th)
            if payload[:4] in _FAKE_MAGICS:
                _, header, body = unpack_media(payload)
                header = dict(header, width=tw, height=th)
                out_payloads.append(pack_media("image", header, body))
            else:
                # real-codec payload (PIL-decoded): dims are recorded in
                # the target columns; re-encoding is the real codec's job
                out_payloads.append(payload)
        return (
            batch.set_column(
                batch.schema.get_field_index("payload"), "payload", pa.array(out_payloads, pa.binary())
            )
            .append_column("target_width", pa.array(tws, pa.int32()))
            .append_column("target_height", pa.array(ths, pa.int32()))
        )


class FrameSampler:
    """video row -> one row per sampled frame (every ``stride``-th, capped
    at ``max_frames`` ≙ the 200-page hard cap `model.py:35`). Non-video
    rows pass through as frame_index=0. Flat-map shape: output rows !=
    input rows."""

    def __init__(self, stride: int = 5, max_frames: int = 200):
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, frame_idx = [], [], []
        for mid, kind, nf in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(), batch["n_frames"].to_pylist()
        ):
            if kind == "video" and nf and nf > 0:
                sampled = list(range(0, int(nf), self.stride))[: self.max_frames]
                ids.extend([mid] * len(sampled))
                kinds.extend([kind] * len(sampled))
                frame_idx.extend(sampled)
            else:
                ids.append(mid)
                kinds.append(kind)
                frame_idx.append(0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "frame_index": pa.array(frame_idx, pa.int32()),
            }
        )
