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

# Import-probe results memoized ONCE PER PROCESS (the probe-once shape the
# language probe in _try_tesseract uses): rebuilding the factory closure on
# every image would re-run the import machinery per UDF invocation across
# millions of cells. Keyed by engine name; value is the run closure or None.
_PROBE_CACHE: dict[str, object] = {}


def _probe_once(name: str, factory):
    if name not in _PROBE_CACHE:
        _PROBE_CACHE[name] = factory()
    return _PROBE_CACHE[name]


def _reset_probe_cache() -> None:
    """Test hook: forget cached probes (fake-module injection tests)."""
    _PROBE_CACHE.clear()


def _try_tesseract() -> Recognizer | None:
    try:
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError:
        return None

    # Probe the language pack ONCE per process, not per image: the
    # reference's metadata path requests Vietnamese+English
    # (table_ocr_service.py:441), but retrying a failed vie+eng call for
    # every image would double tesseract subprocess cost across millions
    # of UDF invocations when vie traineddata is absent.
    lang_mode: list[str | None] = []

    def run(data: bytes) -> str:
        import io

        import pytesseract
        from PIL import Image

        img = Image.open(io.BytesIO(data))
        if not lang_mode:
            try:
                langs = set(pytesseract.get_languages(config=""))
            except Exception:
                langs = set()
            lang_mode.append("vie+eng" if {"vie", "eng"} <= langs else None)
        if lang_mode[0]:
            return pytesseract.image_to_string(img, lang=lang_mode[0], config="--psm 6")
        return pytesseract.image_to_string(img, config="--psm 6")

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


# Per-cell recognition charset (reference enhanced_table_ocr_service.py:249-252):
# digits + ASCII letters + the full Vietnamese diacritic set + ' .,()-'.
TESSERACT_CELL_WHITELIST = (
    "0123456789"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "ÀÁÂÃÈÉÊÌÍÒÓÔÕÙÚĂĐĨŨƠàáâãèéêìíòóôõùúăđĩũơ"
    "ƯĂẠẢẤẦẨẪẬẮẰẲẴẶẸẺẼỀỀỂưăạảấầẩẫậắằẳẵặẹẻẽềềể"
    "ỄỆỈỊỌỎỐỒỔỖỘỚỜỞỠỢỤỦỨỪễệỉịọỏốồổỗộớờởỡợụủứừ"
    "ỬỮỰỲỴÝỶỸửữựỳỵýỷỹ .,()-"
)

# Token-box confidence gate (reference table_ocr_service.py:245:
# int(conf) > 30 and text.strip()).
TOKEN_MIN_CONF = 30

TokenRecognizer = Callable[[bytes], list[dict]]


def _try_tesseract_tokens() -> TokenRecognizer | None:
    """image_to_data --psm 6 token boxes (reference
    table_ocr_service.py:207-211): (text, left, top, width, height, conf)
    dicts with the conf>30 + non-blank filter applied — the shape
    operators.sessionize.tokens_to_grid consumes."""
    try:
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError:
        return None

    def run(data: bytes) -> list[dict]:
        import io

        import pytesseract
        from PIL import Image

        d = pytesseract.image_to_data(
            Image.open(io.BytesIO(data)),
            output_type=pytesseract.Output.DICT,
            config="--psm 6",
        )
        out = []
        for i in range(len(d["text"])):
            txt = (d["text"][i] or "").strip()
            if txt and int(float(d["conf"][i])) > TOKEN_MIN_CONF:
                out.append(
                    {
                        "text": txt,
                        "left": int(d["left"][i]),
                        "top": int(d["top"][i]),
                        "width": int(d["width"][i]),
                        "height": int(d["height"][i]),
                        "conf": float(d["conf"][i]),
                    }
                )
        return out

    return run


# The reference groups EasyOCR tokens into rows with a slightly larger
# y-gap than the Tesseract path ("slightly larger for EasyOCR",
# table_ocr_service.py:402) — callers pass this to tokens_to_grid(y_gap=).
EASYOCR_ROW_GAP = 30

# Token-box confidence gate for EasyOCR results (reference
# table_ocr_service.py:376: confidence > 0.5 and text.strip()).
EASYOCR_TOKEN_MIN_CONF = 0.5


def _try_easyocr_tokens() -> TokenRecognizer | None:
    """EasyOCR token-box fallback (reference _extract_table_with_easyocr,
    table_ocr_service.py:354-390): each readtext 4-point bbox is reduced to
    (left, top, width, height) ints exactly as :377-390 — min/max over the
    corner coordinates — with the conf>0.5 + non-blank filter. Emits the
    SAME dict shape as the Tesseract twin, so tokens_to_grid (y_gap=
    EASYOCR_ROW_GAP) works on EasyOCR-only deployments."""
    try:
        import easyocr  # noqa: F401
    except ImportError:
        return None

    _reader = []  # per-process singleton (ocr_model.py:26-31 pattern)

    def run(data: bytes) -> list[dict]:
        import easyocr

        if not _reader:
            _reader.append(easyocr.Reader(["en", "vi"], gpu=False))
        out = []
        for bbox, text, conf in _reader[0].readtext(bytes(data)):
            if conf > EASYOCR_TOKEN_MIN_CONF and text.strip():
                xs = [p[0] for p in bbox]
                ys = [p[1] for p in bbox]
                out.append(
                    {
                        "text": text.strip(),
                        "left": int(min(xs)),
                        "top": int(min(ys)),
                        "width": int(max(xs) - min(xs)),
                        "height": int(max(ys) - min(ys)),
                        "conf": float(conf),
                    }
                )
        return out

    return run


def _try_tesseract_cell() -> Recognizer | None:
    """Per-cell recognizer: --psm 8 (single word/line) with the Vietnamese
    character whitelist (reference enhanced_table_ocr_service.py:249-252)."""
    try:
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError:
        return None

    def run(data: bytes) -> str:
        import io

        import pytesseract
        from PIL import Image

        return pytesseract.image_to_string(
            Image.open(io.BytesIO(data)),
            config=f"--psm 8 -c tessedit_char_whitelist={TESSERACT_CELL_WHITELIST}",
        ).strip()

    return run


def derotate_bytes_for_external(data: bytes) -> bytes:
    """Rotation-deskew an image payload before handing it to an EXTERNAL
    engine — the reference preprocesses (minAreaRect angle + warpAffine,
    table_ocr_service.py:73-110) BEFORE invoking Tesseract/EasyOCR, so
    real-scan deployments get the rotation model by default here, while
    the builtin kernel keeps its exactly-invertible shear default (the
    fixture-exact path; see kernel/imageops.py). Estimation runs on the
    binarized mask; the correction is applied to the GRAYSCALE image
    (fill = median background level, the warpAffine borderValue analog)
    and re-encoded in the same container format, so the engine sees a
    straightened page, not a binary mask. Sub-dead-band angles (the
    reference's 0.5 deg gate) return the payload unchanged."""
    import numpy as np

    from ocr_text_recognition_spark.kernel import imageops
    from ocr_text_recognition_spark.kernel.imgcodec import decode_image, encode_image

    try:
        img = decode_image(bytes(data))
    except Exception:
        return bytes(data)  # not ours to decode: pass through untouched
    gray = imageops.to_grayscale(img)
    mask = imageops.otsu_binarize(imageops.gaussian_blur(gray))
    r = imageops.estimate_rotation_millideg(mask)
    if abs(r) <= imageops.ROTATION_DEAD_BAND_MILLIDEG:
        return bytes(data)
    bg = int(np.median(gray))
    return encode_image(imageops.rotate_mask(gray, -r, fill=bg))


def tokens_from_bytes(data: bytes | None) -> list[dict] | None:
    """Token boxes for an image payload, or None when no token-box engine
    is installed (callers then use the builtin kernel's own segmentation).
    Chain mirrors the reference: Tesseract image_to_data first, EasyOCR
    bbox reduction on Tesseract error/absence (table_ocr_service.py:
    204-219 fallback, :354-390 EasyOCR path). The returned dicts plug
    straight into tokens_to_grid's (doc_id, top, left, text) input after
    adding the doc key. Probes are memoized once per process."""
    if not data:
        return []
    fixed: bytes | None = None  # rotation-deskewed lazily, once, only if
    for name, factory in (  # an external engine is actually present
        ("tesseract_tokens", _try_tesseract_tokens),
        ("easyocr_tokens", _try_easyocr_tokens),
    ):
        fn = _probe_once(name, factory)
        if fn is None:
            continue
        if fixed is None:
            fixed = derotate_bytes_for_external(bytes(data))
        try:
            return fn(fixed)
        except Exception:
            continue
    return None


def recognize_cell_bytes(data: bytes | None) -> str | None:
    """Whitelisted per-cell text, or None when no external engine (callers
    fall back to the builtin glyph recognizer). Probe memoized once per
    process."""
    if not data:
        return ""
    fn = _probe_once("tesseract_cell", _try_tesseract_cell)
    if fn is None:
        return None
    try:
        return fn(bytes(data))
    except Exception:
        return None


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
    fixed: bytes | None = None  # rotation-deskewed lazily, external only:
    for name, fn in engine_chain():  # builtin keeps the fixture-exact bytes
        try:
            if name == "builtin":
                return fn(bytes(data)), name
            if fixed is None:
                fixed = derotate_bytes_for_external(bytes(data))
            return fn(fixed), name
        except Exception:
            continue
    return "", "none"
