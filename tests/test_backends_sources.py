"""Engine fallback chain, sharpen kernel, source interface."""

from __future__ import annotations

import numpy as np

from ocr_text_recognition_spark.kernel import backends, imageops, render
from ocr_text_recognition_spark.kernel.imgcodec import encode_image


def test_engine_chain_terminates_with_builtin():
    chain = backends.engine_chain()
    assert chain[-1][0] == "builtin"  # hermetic fallback always present


def test_recognize_with_fallback():
    img = render.render_text_image(["FALLBACK 42"])
    text, engine = backends.recognize_with_fallback(encode_image(img))
    assert text == "FALLBACK 42"
    assert engine in {"builtin", "tesseract", "easyocr"}
    assert backends.recognize_with_fallback(None) == ("", "none")
    # corrupt bytes: every engine raises or returns '' -> chain degrades
    text, _ = backends.recognize_with_fallback(b"garbage")
    assert text == ""


def test_rotate90_if_portrait():
    portrait = np.zeros((30, 10), np.uint8)
    portrait[0, 0] = 255  # top-left marker
    rot = imageops.rotate90_if_portrait(portrait)
    assert rot.shape == (10, 30)
    assert rot[0, -1] == 255  # CW: top-left -> top-right
    landscape = np.zeros((10, 30), np.uint8)
    assert imageops.rotate90_if_portrait(landscape) is landscape


def test_sharpen_increases_edge_contrast():
    img = np.full((20, 20), 200, np.uint8)
    img[8:12, 8:12] = 100
    sharp = imageops.sharpen(img)
    # edges get pushed apart; flat interior far from edges unchanged
    assert sharp[0, 0] == 200
    assert int(sharp[8, 8]) < 100  # dark pixel next to bright edge gets darker


def test_read_write_table_parquet_fallback(spark, tmp_path):
    from ocr_text_recognition_spark import sources

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    path = str(tmp_path / "t")
    sources.write_table(df, path)
    back = sources.read_table(spark, path)
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}
    # partition overwrite is idempotent
    sources.write_table(df, path, partition_by=["id"])
    sources.write_table(df, path, partition_by=["id"])
    assert sources.read_table(spark, path).count() == 2
