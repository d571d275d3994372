"""Multimodal pipeline: decode -> resize -> frame-sample over the synthetic
media table (sources/media.py), all actor-pool map_batches stages.

`media_features` is the driver-facing entry (rows-only check: the fake
codec's outputs are engine-defined, not SQL-expressible); determinism is
locked by tests/test_multimodal.py instead.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..sources.media import synth_media
from ..stages.multimodal import FrameSampler, ImageResizer, MediaDecoder

N_MEDIA = 600


def media_dataset(n: int = N_MEDIA, seed: int = 42, n_slices: int = 16) -> rd.Dataset:
    t = synth_media(n, seed)
    step = max(1, t.num_rows // n_slices)
    return rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])


def decoded_media(n: int = N_MEDIA, seed: int = 42) -> rd.Dataset:
    """decode -> resize actor pools (binary payloads => small batches)."""
    return (
        media_dataset(n, seed)
        .map_batches(MediaDecoder, batch_format="pyarrow", batch_size=32, concurrency=(1, 4), num_cpus=1)
        .map_batches(ImageResizer, batch_format="pyarrow", batch_size=32, concurrency=(1, 2), num_cpus=1)
    )


def media_features(sf_dir: str) -> pd.DataFrame:
    """Per-kind rollup of the full decode/resize/frame-sample pipeline.
    sf_dir is unused (media is synthesized deterministically — the driver
    contract passes it to every query). Value-oracled by
    MEDIA_FEATURES_SQL: the corpus and fake codecs are deterministic, so
    the rollup is a fixed table — the oracle pins those golden values
    (same contract as the pytest golden hashes, enforced by the driver)."""
    # materialize the decoded/resized blocks once — both consumers (feature
    # rollup + frame explode) read the same blocks instead of re-running the
    # decode/resize actor pools; the decoded projection is slim (features +
    # payload) so this is object-store-resident, not a driver collect
    ds = decoded_media().materialize()
    frames = ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=64, concurrency=(1, 2), num_cpus=1
    )
    feat = ds.select_columns(
        ["media_id", "kind", "decoded_ok", "width", "height", "duration_s", "target_width"]
    ).to_pandas()
    per_kind = feat.groupby("kind", as_index=False).agg(
        n_items=("media_id", "size"),
        n_decoded=("decoded_ok", "sum"),
        mean_width=("width", "mean"),
        mean_target_width=("target_width", "mean"),
        sum_duration_s=("duration_s", "sum"),
    )
    fr = frames.to_pandas().groupby("kind", as_index=False).agg(n_frame_rows=("media_id", "size"))
    out = per_kind.merge(fr, on="kind", how="left").sort_values("kind").reset_index(drop=True)
    out["mean_width"] = out.mean_width.round(4)
    out["mean_target_width"] = out.mean_target_width.round(4)
    out["sum_duration_s"] = out.sum_duration_s.round(4)
    return out.astype({"n_items": "int64", "n_decoded": "int64", "n_frame_rows": "int64"})


# Golden-constant oracle: media_dataset(600, seed=42) + the deterministic
# fake codecs make this rollup a fixed table independent of sf_dir. A
# VALUES oracle upgrades the driver check from rows-only to value-bearing
# (rowcount + schema + value hash); any drift in synth, decode, resize or
# frame-sample semantics now FAILS the gate instead of passing silently.
# Regenerate by running media_features() after an INTENTIONAL change.
MEDIA_FEATURES_SQL = """
SELECT * FROM (VALUES
  ('audio', 200, 200, 0.0,   0.0,     313.7337, 200),
  ('image', 200, 200, 852.5, 1261.96, 0.0,      200),
  ('video', 200, 200, 320.0, 320.0,   140.0,    780)
) AS t(kind, n_items, n_decoded, mean_width, mean_target_width,
       sum_duration_s, n_frame_rows)
ORDER BY kind
"""
