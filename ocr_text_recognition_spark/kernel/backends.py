"""Recognition engine backends + fallback chain.

The reference tries Tesseract first and falls back to EasyOCR on error
(/root/reference/src/services/table_ocr_service.py:204-219, enhanced:247-259).
This module keeps the same chain shape with the deterministic builtin kernel
as the always-available terminal fallback; external engines load behind
import-try (this container ships neither) and drop in without touching the
pipeline — the UDFs only see ``recognize(data: bytes) -> (text, engine)``.
"""

from __future__ import annotations

from collections.abc import Callable

from ocr_text_recognition_spark.kernel import reference_kernel

Recognizer = Callable[[bytes], str]


def _try_tesseract() -> Recognizer | None:
    try:
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError:
        return None

    def run(data: bytes) -> str:
        import io

        import pytesseract
        from PIL import Image

        return pytesseract.image_to_string(Image.open(io.BytesIO(data)), config="--psm 6")

    return run


def _try_easyocr() -> Recognizer | None:
    try:
        import easyocr  # noqa: F401
    except ImportError:
        return None

    _reader = []

    def run(data: bytes) -> str:
        import numpy as np

        if not _reader:  # per-process singleton (ocr_model.py:26-31 pattern)
            import easyocr

            _reader.append(easyocr.Reader(["en", "vi"], gpu=False))
        results = _reader[0].readtext(np.frombuffer(data, dtype=np.uint8))
        return "\n".join(t for _, t, conf in results if conf > 0.5)

    return run


def _builtin(data: bytes) -> str:
    return reference_kernel.recognize_media_bytes(data)


def engine_chain() -> list[tuple[str, Recognizer]]:
    """Ordered (name, fn) chain: external engines first when present, the
    hermetic builtin kernel always last."""
    chain: list[tuple[str, Recognizer]] = []
    for name, factory in (("tesseract", _try_tesseract), ("easyocr", _try_easyocr)):
        fn = factory()
        if fn is not None:
            chain.append((name, fn))
    chain.append(("builtin", _builtin))
    return chain


def recognize_with_fallback(data: bytes | None) -> tuple[str, str]:
    """Run the chain; on exception fall through to the next engine
    (the reference's try/except chain). Returns (text, engine_used)."""
    if not data:
        return "", "none"
    for name, fn in engine_chain():
        try:
            return fn(bytes(data)), name
        except Exception:
            continue
    return "", "none"
