"""Multimodal binary-column plumbing: schema, batch shape, determinism."""

from __future__ import annotations

import pytest

from re_shacl_spark.ops import multimodal as MM


def test_synth_assets_schema_and_kinds(spark):
    a = MM.synth_assets(spark, 30)
    assert a.schema == MM.ASSET_SCHEMA
    kinds = {r.kind: r for r in a.collect()}
    assert set(kinds) == {"image", "audio", "video"}
    img = kinds["image"]
    assert bytes(img.payload)[:4] == b"IMG0" and img.meta.codec == "syn-gray8"


def test_image_features_deterministic(spark):
    a = MM.synth_assets(spark, 60)
    f1 = sorted((r.asset_id, r.width, r.height, round(r.mean_px, 6), tuple(r.hist8))
                for r in MM.image_features(a).collect())
    f2 = sorted((r.asset_id, r.width, r.height, round(r.mean_px, 6), tuple(r.hist8))
                for r in MM.image_features(a.repartition(7)).collect())
    assert f1 == f2 and len(f1) == 20
    for _, w, h, mean, hist in f1:
        assert sum(hist) == w * h and 0 <= mean <= 255


def test_audio_stats(spark):
    a = MM.synth_assets(spark, 30)
    rows = MM.audio_stats(a).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.sample_rate == 8000 and r.rms > 0 and r.peak <= 1024


def test_frame_sampling_fanout(spark):
    a = MM.synth_assets(spark, 30)
    frames = MM.sample_frames(a, every=2).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    for aid, fr in by_asset.items():
        assert [f.frame_idx for f in sorted(fr, key=lambda x: x.frame_idx)] == list(
            range(0, 4 + aid % 4, 2)
        )
        assert all(len(bytes(f.frame)) == 32 for f in fr)


def test_resize_stub_gated(spark):
    a = MM.synth_assets(spark, 3)
    if not MM._HAVE_PIL:
        with pytest.raises(NotImplementedError):
            MM.resize_images(a, 4, 4)


def test_strict_raises_on_foreign_payload(spark):
    import pandas as pd

    foreign = spark.createDataFrame(
        pd.DataFrame({"asset_id": [1], "kind": ["image"], "payload": [b"\x89PNG fake"],
                      "meta": [None]}),
        MM.ASSET_SCHEMA,
    )
    if MM._HAVE_PIL:
        return  # real decoder would handle it
    with pytest.raises(Exception):
        MM.image_features(foreign, strict=True).collect()
