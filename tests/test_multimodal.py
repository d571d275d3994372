"""Multimodal stage tests: container roundtrip, decode determinism,
reference resize math, frame-sample explosion, actor-pool plumbing,
real-codec stub gating."""

import numpy as np
import pyarrow as pa
import pytest

from paddle_ray.pipelines.multimodal import media_features
from paddle_ray.sources.media import pack_media, synth_media, unpack_media
from paddle_ray.stages.multimodal import FrameSampler, ImageResizer, MediaDecoder, render_scale


def test_container_roundtrip():
    body = b"\x01\x02\x03" * 100
    p = pack_media("image", {"width": 10, "height": 20, "channels": 3}, body)
    kind, header, out = unpack_media(p)
    assert kind == "image" and header == {"channels": 3, "height": 20, "width": 10}
    assert out == body


def test_synth_media_deterministic():
    a, b = synth_media(50), synth_media(50)
    assert a.equals(b)
    kinds = set(a["kind"].to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_decoder_features_and_error_rows():
    t = synth_media(30)
    # append one garbage row: must become decoded_ok=False, not a crash
    bad = pa.table(
        {
            "media_id": pa.array([999], pa.int64()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([b"\x00garbage"], pa.binary()),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
            "n_frames": pa.array([0], pa.int32()),
            "sample_rate": pa.array([0], pa.int32()),
        }
    )
    batch = pa.concat_tables([t, bad])
    out = MediaDecoder()(batch)
    assert out.num_rows == 31
    oks = out["decoded_ok"].to_pylist()
    assert oks[:-1] == [True] * 30 and oks[-1] is False
    assert "ValueError" in out["error"].to_pylist()[-1]
    # decode twice -> identical
    out2 = MediaDecoder()(batch)
    assert out.equals(out2)


def test_real_codec_payload_raises_not_implemented():
    d = MediaDecoder()
    if d.codecs:  # pragma: no cover - PIL present
        pytest.skip("real codec installed")
    with pytest.raises(NotImplementedError):
        d._decode_one(b"\x89PNG\r\n\x1a\nrest", "image")
    # RIFF is ambiguous (WebP vs WAV/AVI): routing is by the row's kind,
    # so an audio payload names the AUDIO codec, not a misleading image one
    with pytest.raises(NotImplementedError, match="audio"):
        d._decode_one(b"RIFF....WAVE", "audio")


def test_render_scale_reference_semantics():
    # model.py:320-325: scale = min(1.5, 2200/max_dim)
    assert render_scale(100, 200) == 1.5
    assert render_scale(4400, 100) == pytest.approx(0.5)
    assert render_scale(2200, 2200) == pytest.approx(1.0)


def test_resizer_caps_and_passthrough():
    dec = MediaDecoder()(synth_media(30))
    out = ImageResizer()(dec)
    for kind, w, tw, th in zip(
        out["kind"].to_pylist(),
        out["width"].to_pylist(),
        out["target_width"].to_pylist(),
        out["target_height"].to_pylist(),
    ):
        if kind == "image":
            assert max(tw, th) <= 6000
            assert tw > 0
        else:
            assert tw == w  # non-image untouched
    # resized payload headers carry the new dims
    for kind, payload, tw in zip(
        out["kind"].to_pylist(), out["payload"].to_pylist(), out["target_width"].to_pylist()
    ):
        if kind == "image":
            _, header, _ = unpack_media(payload)
            assert header["width"] == tw


def test_frame_sampler_explodes_video_rows():
    dec = MediaDecoder()(synth_media(30))
    out = FrameSampler(stride=5)(dec)
    df = out.to_pandas()
    vids = dec.to_pandas().query("kind == 'video'")
    expect = int(sum(int(np.ceil(nf / 5)) for nf in vids.n_frames))
    got = len(df[df.kind == "video"])
    assert got == expect
    assert (df[df.kind != "video"].frame_index == 0).all()


def test_media_features_pipeline(ray_session):
    out = media_features("unused")
    assert list(out.kind) == ["audio", "image", "video"]
    assert (out.n_decoded == out.n_items).all()
    assert int(out.loc[out.kind == "video", "n_frame_rows"].iloc[0]) > int(
        out.loc[out.kind == "video", "n_items"].iloc[0]
    )
    # deterministic across runs
    out2 = media_features("unused")
    pd_testing_assert(out, out2)


def pd_testing_assert(a, b):
    import pandas.testing as pdt

    pdt.assert_frame_equal(a, b)


def test_phash_image_dedup_recall_and_no_false_pairs(ray_session):
    """Engine == independent single-process dHash sweep over ALL pairs
    (no banding — so the 5-band pigeonhole's completeness at hamming <=
    4 is itself verified); recall over the planted re-encode twins is
    exactly 100% and there are zero non-planted pairs."""
    import itertools

    import numpy as np

    from paddle_ray.pipelines import multimodal as mm
    from paddle_ray.sources.media import synth_media, unpack_media

    t = synth_media(600, seed=42)
    hashes = {}
    planted = set()
    for mid, kind, payload in zip(
        t["media_id"].to_pylist(), t["kind"].to_pylist(), t["payload"].to_pylist()
    ):
        if kind != "image":
            continue
        _, _, body = unpack_media(payload)
        arr = np.frombuffer(body, dtype=np.uint8)
        hashes[mid] = mm._dhash64(arr)
        if mid % 9 == 0:
            a = arr.copy()
            for j in range(25):
                p = (j * 97) % len(a)
                a[p] = (int(a[p]) + 1) % 256
            hashes[mid + 10_000] = mm._dhash64(a)
            planted.add((mid, mid + 10_000))

    ref = {}
    for a, b in itertools.combinations(sorted(hashes), 2):
        h = bin(hashes[a] ^ hashes[b]).count("1")
        if h <= mm.PHASH_HAM_T:
            ref[(a, b)] = h

    out = mm.phash_image_dedup("unused")
    got = {(int(r.id_a), int(r.id_b)): int(r.hamming) for r in out.itertuples()}
    assert got == ref
    assert set(got) == planted  # 100% recall, zero false pairs
    assert all(h <= mm.PHASH_HAM_T for h in got.values())


def test_curate_images_v1_matches_single_process_reference(ray_session):
    """The image-path end-to-end composition (VERDICT r4 #7) vs a fully
    single-process reference: same corpus, direct extractor calls, the
    SAME noise arms, dHash, brute-force ALL-PAIRS hamming (no banding —
    independent of the pigeonhole), dict union-find, min-id reps, direct
    captioner calls, pandas rollup. Also asserts the dedup semantics the
    chain promises: every unique-tail image survives, every non-rep
    viral/pristine copy is dropped, and banding missed no <=T pair."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from paddle_ray.core.config import ExtractConfig
    from paddle_ray.functions.bbox import DEFAULT_CAPTION_PROMPT
    from paddle_ray.pipelines.multimodal import (
        CI_N_PAGES,
        CI_PDF_EVERY,
        CI_SEED,
        PHASH_HAM_T,
        _dhash64,
        curate_images_v1,
    )
    from paddle_ray.sources.media import pack_media, unpack_media
    from paddle_ray.sources.pages import synth_pages
    from paddle_ray.stages.caption import CAPTION_MODELS
    from paddle_ray.stages.extract import DocumentExtractor
    from paddle_ray.stages.sniff import make_sniff_batch

    engine = curate_images_v1("unused")

    # ---- single-process reference ------------------------------------
    cfg = ExtractConfig(deterministic_sort=False, captioning_enabled=False)
    pages, _ = synth_pages(CI_N_PAGES, seed=CI_SEED, pdf_every=CI_PDF_EVERY, outlier_every=0)
    rows = make_sniff_batch(cfg)(pages)
    rows = DocumentExtractor(cfg)(rows)

    recs = []  # (mid, cat, box_key, arm, hash)
    for url, imgs in zip(rows["url"].to_pylist(), rows["images"].to_pylist()):
        if not imgs:
            continue
        doc_i = int(url.rsplit("/", 1)[1])
        cat = url.split("/")[3]
        for j, (k, v) in enumerate(imgs):
            mid = doc_i * 64 + j
            _, _, raw = unpack_media(v)
            a = np.frombuffer(raw, dtype=np.uint8)
            if mid % 7 == 3:
                pat = (np.arange(len(a), dtype=np.int64) * (mid * 2 + 1)) % 251
                a = ((a.astype(np.int64) + pat) % 256).astype(np.uint8)
                arm = "unique"
            elif mid % 3 == 1:
                a = a.copy()
                for t in range(25):
                    p = (t * 97) % len(a)
                    a[p] = (int(a[p]) + 1) % 256
                arm = "viral"
            else:
                arm = "pristine"
            recs.append((mid, cat, k, arm, _dhash64(a)))
    assert len(recs) == int(engine.n_images.sum())

    # brute-force all-pairs clustering at hamming <= T
    parent = {m: m for m, *_ in recs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            if bin(recs[i][4] ^ recs[j][4]).count("1") <= PHASH_HAM_T:
                a, b = find(recs[i][0]), find(recs[j][0])
                if a != b:
                    parent[max(a, b)] = min(a, b)
    reps = {m for m, *_ in recs if find(m) == m}

    # chain-semantics assertions (all three arms live)
    arms = {m: arm for m, _, _, arm, _ in recs}
    uniq = {m for m, a in arms.items() if a == "unique"}
    assert uniq and uniq <= reps, "every unique-tail image must survive"
    assert len(reps) < len(recs), "dedup must actually drop copies"
    assert any(a == "viral" for a in arms.values())

    model = CAPTION_MODELS["blip"]()
    ref_rows = []
    for m, cat, k, _, _ in recs:
        kept = m in reps
        cap = model.generate([k], [DEFAULT_CAPTION_PROMPT], 512)[0] if kept else None
        ref_rows.append((cat, 1, int(kept), len(cap) if kept else 0))
    ref = (
        pd.DataFrame(ref_rows, columns=["cat", "n_images", "n_kept", "caption_chars"])
        .groupby("cat", as_index=False)
        .sum()
        .sort_values("cat")
        .reset_index(drop=True)
        .astype({"n_images": "int64", "n_kept": "int64", "caption_chars": "int64"})
    )
    pd.testing.assert_frame_equal(engine, ref)
